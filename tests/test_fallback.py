"""OOM-fallback machinery: ``geometry.fallback_ladder`` + ``bench.run_with_fallback``.

VERDICT r4 weak #1: the driver's one-shot ``python bench.py`` crashed with
``RESOURCE_EXHAUSTED`` on a geometry whose audit fit — allocator
fragmentation at the HBM edge.  The fix is a fallback ladder of strictly
smaller working sets plus a retry loop in the bench harness; these tests
pin (a) the ladder's monotone shrinkage and validity, (b) the retry loop's
recovery/exhaustion/propagation behavior, including a forced-OOM run
through a REAL tiny processor.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import bench
from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorVelCore,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.chunked import ChunkedHierarchicalConfig
from jax_nbody_emulator_with_dj_tpu.geometry import (
    estimate_peak_bytes,
    fallback_ladder,
    is_oom_error,
)
from jax_nbody_emulator_with_dj_tpu.hierarchical import (
    HierarchicalConfig,
    HierarchicalProcessor,
)


def flagship_config():
    """The headline bench geometry (512^3 bf16 vel) — the one that crashed."""
    return HierarchicalConfig(
        size=(512, 512, 512), slab=64, slab_h=256, tile=(128, 128, 128),
        tile1=64, dtype=jnp.bfloat16, output_dtype=np.float16,
    )


class TestFallbackLadder:
    def test_monotone_shrinkage_and_ends_chunked(self):
        cfg = flagship_config()
        rungs = list(fallback_ladder(cfg, compute_vel=True))
        names = [n for n, _ in rungs]
        assert names[:2] == ["slim", "slim2"]
        assert any(n.startswith("chunked") for n in names)
        # Monolithic rungs: strictly decreasing estimated peak.
        prev = estimate_peak_bytes(cfg, True)
        for name, c in rungs:
            if isinstance(c, HierarchicalConfig):
                peak = estimate_peak_bytes(c, True)
                assert peak < prev, (name, peak, prev)
                prev = peak
        # Chunked rungs: strictly decreasing inner volume.
        chunked = [c for _, c in rungs if isinstance(c, ChunkedHierarchicalConfig)]
        vols = [int(np.prod(c.inner_size)) for c in chunked]
        assert vols == sorted(vols, reverse=True)
        assert all(v < int(np.prod(cfg.size)) for v in vols)

    def test_slim_halves_the_transient_knobs(self):
        (_, slim), *_ = fallback_ladder(flagship_config(), compute_vel=True)
        assert slim.slab == 32
        assert slim.slab_h == 128
        assert slim.tile1 == 32
        assert tuple(slim.tile) == (64, 64, 64)

    def test_never_grows_at_tiny_sizes(self):
        cfg = HierarchicalConfig(
            size=(32, 32, 32), slab=16, tile=(16, 16, 16), tile1=8,
        )
        for _, c in fallback_ladder(cfg, compute_vel=True):
            if isinstance(c, HierarchicalConfig):
                assert c.slab <= cfg.slab
                assert all(a <= b for a, b in zip(c.tile, cfg.tile))
                assert c.tile1 <= cfg.tile1

    def test_every_rung_constructs_a_valid_config(self):
        # __post_init__ validates divisibility/alignment; reaching here
        # without a raise is the assertion.
        rungs = list(fallback_ladder(flagship_config(), compute_vel=True))
        assert len(rungs) >= 4


class TestIsOomError:
    def test_matches_the_driver_crash_text(self):
        e = RuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
        )
        assert is_oom_error(e)

    def test_matches_cpu_oom(self):
        assert is_oom_error(MemoryError("Out of memory allocating 8 bytes"))

    def test_rejects_other_errors(self):
        assert not is_oom_error(ValueError("tile 7 must divide size"))
        assert not is_oom_error(RuntimeError("INVALID_ARGUMENT: bad shape"))


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    sp = StyleNBodyEmulatorVelCore(mid_chan=8).init(jax.random.key(0))
    params = modulate_emulator_parameters_vel(sp, z=0.0, Om=0.3175)
    return NBodyEmulatorVelCore(mid_chan=8), params


def tiny_config():
    return HierarchicalConfig(
        size=(32, 32, 32), slab=16, tile=(16, 16, 16), tile1=8,
        dtype=jnp.float32, output_dtype=np.float32,
    )


class TestRunWithFallback:
    def test_recovers_after_forced_oom(self, tiny_model):
        """First rung OOMs (mocked raise), second runs the REAL process_box."""
        model, params = tiny_model
        proc0 = HierarchicalProcessor(model, params, tiny_config())
        seen = []

        def measure(proc, chunked):
            seen.append(proc.config)
            if len(seen) == 1:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)"
                )
            box = np.random.default_rng(0).normal(size=(3, 32, 32, 32))
            out = proc.process_box(
                box.astype(np.float32), z=0.0, Om=0.3175, as_numpy=True
            )
            assert np.all(np.isfinite(out[0])) and np.all(np.isfinite(out[1]))
            return [1.25]

        times, trail, proc = bench.run_with_fallback(
            measure, proc0, False, model, params, True
        )
        assert times == [1.25]
        assert len(trail) == 1
        assert trail[0]["geometry"]["runtime"] == "hierarchical"
        assert "RESOURCE_EXHAUSTED" in trail[0]["error"]
        assert trail[0]["recovered_with"] == bench.geometry_desc(proc.config)
        # The retry really ran on a slimmer geometry.
        assert proc.config.slab <= proc0.config.slab
        assert proc.config.tile1 <= proc0.config.tile1

    def test_exhaustion_returns_none_with_full_trail(self, tiny_model):
        model, params = tiny_model
        proc0 = HierarchicalProcessor(model, params, tiny_config())
        n_rungs = len(list(fallback_ladder(tiny_config(), compute_vel=True)))

        def measure(proc, chunked):
            raise RuntimeError("RESOURCE_EXHAUSTED: out of HBM")

        times, trail, proc = bench.run_with_fallback(
            measure, proc0, False, model, params, True
        )
        assert times is None and proc is None
        assert len(trail) == n_rungs + 1  # every rung visible in the record

    def test_non_oom_errors_propagate(self, tiny_model):
        model, params = tiny_model
        proc0 = HierarchicalProcessor(model, params, tiny_config())

        def measure(proc, chunked):
            raise ValueError("a real bug, not an OOM")

        with pytest.raises(ValueError, match="real bug"):
            bench.run_with_fallback(measure, proc0, False, model, params, True)
