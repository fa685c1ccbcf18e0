"""Profiling hooks: jax.profiler traces and wall-clock stage timers.

The reference has no in-library tracing (SURVEY.md section 5); its scripts
wrap ``time.perf_counter`` around stages.  Here both live behind one API:
``stage_timer`` records wall-clock per stage into a dict (with a hard device
sync at exit — see ``utils.timing.force_sync``), and ``trace`` captures an
XLA/TPU profile viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax

from .timing import force_sync


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage_timer(timings: dict, name: str, sync_on=None):
    """Record wall-clock seconds for a stage into ``timings[name]``.

    Args:
        timings: dict to write into.
        name: stage key.
        sync_on: optional array/pytree to force-sync before stopping the
            clock (true completion barrier on async backends).
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_on is not None:
            force_sync(sync_on)
        timings[name] = time.perf_counter() - t0
