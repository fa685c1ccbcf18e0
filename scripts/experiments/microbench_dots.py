"""Probe: raw MXU throughput of chained (M,K)@(K,128) dot sequences.

Resolves the conv-kernel design question: per-tap K=128 dots imply a weight
tile reload every M rows — if larger-K dots run significantly faster, the
conv should be decomposed with fewer, deeper taps (double space-to-depth).
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(M, K, n_dots, reps=6000):
    """Time n_dots chained (M,K)@(K,128) dots inside one kernel invocation."""

    def kern(x_ref, w_ref, o_ref):
        def body(i, _):
            acc = jnp.zeros((M, 128), jnp.float32)
            for t in range(n_dots):
                acc = acc + jnp.dot(
                    x_ref[...], w_ref[t],
                    preferred_element_type=jnp.float32,
                )
            o_ref[:] = acc.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, reps, body, 0)

    x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (n_dots, K, 128), jnp.bfloat16)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda a, b: f(a, b))
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    force_sync(jf(x, w))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        force_sync(jf(x, w))
        times.append(time.perf_counter() - t0)
    per = min(times)
    flops = 2 * M * K * 128 * n_dots * reps
    print(
        f"M={M:5d} K={K:4d} dots={n_dots:3d}: {flops/per/1e12:7.1f} TF/s",
        flush=True,
    )


if __name__ == "__main__":
    for M, K, n in [
        (128, 128, 18),
        (256, 128, 18),
        (512, 128, 18),
        (1024, 128, 18),
        (256, 256, 9),
        (512, 256, 9),
        (256, 512, 5),
        (512, 512, 5),
        (1024, 512, 5),
        (512, 1152, 2),
        (512, 2304, 1),
    ]:
        probe(M, K, n)
