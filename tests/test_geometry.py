"""Auto-geometry planner + create_emulator runtime dispatch.

The planner (``geometry.auto_hierarchical_config``) encodes the measured
v5e 16 GB geometry rules; these tests pin its structural invariants (every
returned config validates, fits its own estimate, and switches to the
chunked decomposition exactly when the monolithic buffers cannot fit) and
that ``create_emulator(processor_config=...)`` builds the matching runtime
for all three config types (reference ``nbody_emulator.py:268-384`` only
has the subbox runtime to dispatch to).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    ChunkedHierarchicalConfig,
    HierarchicalConfig,
    NBodyEmulatorCore,
    SubboxConfig,
    auto_hierarchical_config,
    create_emulator,
)
from jax_nbody_emulator_with_dj_tpu.chunked import ChunkedHierarchicalProcessor
from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters
from jax_nbody_emulator_with_dj_tpu.geometry import (
    _HEADROOM,
    estimate_peak_bytes,
)
from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalProcessor
from jax_nbody_emulator_with_dj_tpu.subbox import SubboxProcessor

HBM = 16 << 30


class TestAutoConfig:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    @pytest.mark.parametrize("vel", [False, True])
    def test_512_monolithic_fits(self, dtype, vel):
        cfg = auto_hierarchical_config(512, dtype=dtype, compute_vel=vel)
        assert isinstance(cfg, HierarchicalConfig)
        assert estimate_peak_bytes(cfg, vel) <= HBM * _HEADROOM
        for s, t in zip(cfg.size, cfg.tile):
            assert s % t == 0
        f32 = jnp.dtype(dtype) == jnp.float32
        assert (jnp.dtype(cfg.buf_dtype) == jnp.bfloat16) == (
            f32 or jnp.dtype(dtype) == jnp.bfloat16
        )

    def test_512_reproduces_measured_bench_geometry(self):
        """The planner must emit the hand-measured v5e table at 512^3."""
        want = {  # (f32, vel) -> (slab, slab_h, tile, tile1)
            (False, False): (32, None, (128, 256, 256), 128),
            # round 4: the Winograd conv path's padded windows shrank the
            # fitting bf16 vel tile to 128^3 (measured: (128,128,256) OOM,
            # 128^3 = the 11.6 s bench geometry)
            (False, True): (64, 256, (128, 128, 128), 64),
            (True, False): (32, 128, (128, 128, 256), 128),
            (True, True): (32, 128, (128, 128, 64), 64),
        }
        for (f32, vel), (slab, slab_h, tile, tile1) in want.items():
            cfg = auto_hierarchical_config(
                512, dtype=jnp.float32 if f32 else jnp.bfloat16,
                compute_vel=vel,
            )
            got = (cfg.slab, cfg.slab_h, cfg.tile, cfg.tile1)
            assert got == (slab, slab_h, tile, tile1), (f32, vel, got)

    def test_512_f32_vel_narrows_tile(self):
        """The f32 velocity working set forces a narrow phase-3 tile."""
        cfg = auto_hierarchical_config(512, dtype=jnp.float32, compute_vel=True)
        assert int(np.prod(cfg.tile)) <= 128 * 128 * 64
        # the full (128,128,128) tile would blow the budget (measured OOM)
        wide = HierarchicalConfig(
            size=(512,) * 3, slab=cfg.slab, slab_h=cfg.slab_h,
            tile=(128, 128, 128), tile1=cfg.tile1, dtype=jnp.float32,
            buf_dtype=jnp.bfloat16,
        )
        assert estimate_peak_bytes(wide, True) > HBM * _HEADROOM

    def test_1024_goes_chunked(self):
        cfg = auto_hierarchical_config(1024, dtype=jnp.bfloat16, compute_vel=False)
        assert isinstance(cfg, ChunkedHierarchicalConfig)
        assert all(c >= 2 for c in cfg.chunks)
        inner = cfg.inner_config()
        assert estimate_peak_bytes(inner, False) <= HBM * _HEADROOM

    def test_2048_vel_goes_chunked(self):
        cfg = auto_hierarchical_config(2048, dtype=jnp.bfloat16, compute_vel=True)
        assert isinstance(cfg, ChunkedHierarchicalConfig)
        inner = cfg.inner_config()
        assert estimate_peak_bytes(inner, True) <= HBM * _HEADROOM

    def test_small_boxes_validate(self):
        for n in (16, 32, 48, 128, 256):
            cfg = auto_hierarchical_config(n)
            assert isinstance(cfg, HierarchicalConfig)
        # 640^3 vel has ~2x the voxels of the just-fitting 512^3 — the
        # planner must hand back a chunked config whose inner run fits
        cfg = auto_hierarchical_config(640)
        assert isinstance(cfg, ChunkedHierarchicalConfig)
        assert estimate_peak_bytes(cfg.inner_config(), True) <= HBM * _HEADROOM

    def test_anisotropic(self):
        cfg = auto_hierarchical_config((256, 512, 128), compute_vel=True)
        assert isinstance(cfg, HierarchicalConfig)
        for s, t in zip(cfg.size, cfg.tile):
            assert s % t == 0

    def test_rejects_unpackable_extents(self):
        with pytest.raises(ValueError, match="divisible by 16"):
            auto_hierarchical_config(104)

    def test_smaller_budget_forces_chunking_earlier(self):
        mono = auto_hierarchical_config(512, compute_vel=True)
        assert isinstance(mono, HierarchicalConfig)
        tight = auto_hierarchical_config(
            512, compute_vel=True, hbm_bytes=4 << 30
        )
        assert isinstance(tight, ChunkedHierarchicalConfig)


class TestCreateEmulatorDispatch:
    @pytest.fixture(scope="class")
    def style_params(self):
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore

        return StyleNBodyEmulatorVelCore(mid_chan=4).init(jax.random.key(3))

    def test_dispatch_types(self, style_params):
        n = (16,) * 3
        cases = [
            (SubboxConfig(size=n, ndiv=(2, 2, 2), dtype=jnp.float32), SubboxProcessor),
            (
                HierarchicalConfig(size=n, slab=8, tile=(8, 8, 8), tile1=8,
                                   dtype=jnp.float32),
                HierarchicalProcessor,
            ),
            (
                ChunkedHierarchicalConfig(size=(128,) * 3, chunks=(2, 1, 1),
                                          pad=48, dtype=jnp.float32),
                ChunkedHierarchicalProcessor,
            ),
        ]
        for cfg, proc_cls in cases:
            em = create_emulator(
                premodulate=True, compute_vel=False, params=style_params,
                premodulate_z=0.0, premodulate_Om=0.3, mid_chan=4,
                processor_config=cfg,
            )
            assert isinstance(em.processor, proc_cls), type(cfg).__name__

    def test_dispatch_rejects_unknown(self, style_params):
        with pytest.raises(TypeError, match="processor_config"):
            create_emulator(
                premodulate=True, compute_vel=False, params=style_params,
                premodulate_z=0.0, premodulate_Om=0.3, mid_chan=4,
                processor_config={"size": 16},
            )

    def test_bundle_runs_hierarchical(self, style_params):
        """process_box through the bundle == direct HierarchicalProcessor."""
        n = (16,) * 3
        cfg = HierarchicalConfig(size=n, slab=8, tile=(8, 8, 8), tile1=8,
                                 dtype=jnp.float32)
        em = create_emulator(
            premodulate=True, compute_vel=False, params=style_params,
            premodulate_z=0.5, premodulate_Om=0.3, mid_chan=4,
            processor_config=cfg,
        )
        box = np.random.default_rng(0).normal(size=(3,) + n).astype(np.float32)
        got = em.process_box(box, z=0.5, Om=0.3)
        model = NBodyEmulatorCore(mid_chan=4)
        params = modulate_emulator_parameters(style_params, z=0.5, Om=0.3)
        ref = HierarchicalProcessor(model, params, cfg).process_box(
            box, z=0.5, Om=0.3
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=1e-5, atol=1e-5,
        )


class TestMidChanScaling:
    """The planner's HBM estimate scales with the model width, so callers
    must forward mid_chan (the pipeline and batch driver now do)."""

    def test_wider_model_larger_estimate(self):
        cfg = auto_hierarchical_config((512,) * 3, compute_vel=True)
        assert isinstance(cfg, HierarchicalConfig)
        e64 = estimate_peak_bytes(cfg, True, mid_chan=64)
        e128 = estimate_peak_bytes(cfg, True, mid_chan=128)
        assert e128 > e64 * 1.5

    def test_wider_model_changes_plan(self):
        """At 512^3 f32 velocity, mid_chan=128 buffers alone exceed the
        chip: the planner must fall back to chunking (mid_chan=64 fits
        monolithic with bf16 buffers)."""
        import jax.numpy as jnp

        base = auto_hierarchical_config(
            (512,) * 3, dtype=jnp.float32, compute_vel=True
        )
        wide = auto_hierarchical_config(
            (512,) * 3, dtype=jnp.float32, compute_vel=True, mid_chan=128
        )
        from jax_nbody_emulator_with_dj_tpu.chunked import (
            ChunkedHierarchicalConfig,
        )

        assert isinstance(wide, ChunkedHierarchicalConfig) or (
            estimate_peak_bytes(wide, True, 128)
            > estimate_peak_bytes(base, True, 64)
        )
