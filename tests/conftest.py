"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sharded-runtime tests (the TPU analog of multi-node testing) need multiple
devices; everything else is indifferent.  Setting the XLA flag before JAX is
imported gives us 8 virtual CPU devices in any environment.
"""

import os
import sys

# EMU_TEST_TPU=1 keeps the real accelerator visible so the TPU-gated
# compiled-kernel tests (tests/test_pallas_conv.py::TestWinoPallasOnTpu)
# can run; the default CPU forcing is what the portable CI tier uses.
if not os.environ.get("EMU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment may pre-register an accelerator backend (e.g. a tunneled
# TPU) that ignores the JAX_PLATFORMS env var; the config knob still wins.
if not os.environ.get("EMU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the fast tier's wall-clock is dominated by
# XLA compiles of the tiny fixture models (measured ~2x on a cold/warm
# A-B at the single-model level); warm reruns — the tier a developer
# actually iterates with — skip almost all of it.  EMU_TEST_NO_CACHE=1
# disables (e.g. to measure true compile paths).
if not os.environ.get("EMU_TEST_NO_CACHE"):
    _cache_dir = os.path.expanduser(
        os.environ.get("EMU_TEST_CACHE", "~/.cache/jax_nbody_tests")
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
# This JAX build's default fp32 matmul/conv uses a reduced-precision fast
# path (~2e-3 rel error); tests need deterministic fp32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not marked ``slow`` is the fast smoke tier (``-m fast``)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
