"""Hierarchical runtime must reproduce the subbox runtime exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorVelCore,
    SubboxConfig,
    SubboxProcessor,
)
from jax_nbody_emulator_with_dj_tpu.emulator import (
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.hierarchical import (
    HierarchicalConfig,
    HierarchicalProcessor,
)

KEY = jax.random.key(17)
MID = 4
N = 16  # tiny box; tiles 8^3, slab 4


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorVelCore(mid_chan=MID).init(KEY)


@pytest.fixture(scope="module")
def box():
    return np.asarray(jax.random.normal(KEY, (3, N, N, N), jnp.float32))


@pytest.fixture(scope="module")
def subbox_reference(style_params, box):
    params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
    model = NBodyEmulatorCore(mid_chan=MID)
    cfg = SubboxConfig(size=(N,) * 3, ndiv=(2, 2, 2), dtype=jnp.float32)
    return SubboxProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)


class TestHierarchicalDisp:
    @pytest.mark.slow
    def test_matches_subbox(self, style_params, box, subbox_reference):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        proc = HierarchicalProcessor(model, params, cfg)
        out = proc.process_box(box, 0.5, 0.3175)
        assert out.shape == (3, N, N, N)
        np.testing.assert_allclose(out, subbox_reference, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_slab_and_tile_invariance(self, style_params, box):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        outs = []
        for slab, tile in [(4, (8, 8, 8)), (16, (16, 16, 8))]:
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=slab, tile=tile,
                dtype=jnp.float32, output_dtype=np.float32,
            )
            outs.append(HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


class TestHierarchicalVel:
    @pytest.mark.slow
    def test_matches_subbox_vel(self, style_params, box):
        params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=MID)
        scfg = SubboxConfig(size=(N,) * 3, ndiv=(2, 2, 2), dtype=jnp.float32)
        d_ref, v_ref = SubboxProcessor(model, params, scfg).process_box(box, 0.5, 0.3175)
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        d, v = HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
        np.testing.assert_allclose(d, d_ref, rtol=2e-4, atol=2e-5)
        scale = np.abs(v_ref).max()
        np.testing.assert_allclose(v / scale, v_ref / scale, rtol=2e-4, atol=2e-4)


class TestPackedMode:
    """Space-to-depth packed interior must match the unpacked path exactly
    (same math, different operand shapes — bf16/f32 reorder tolerance)."""

    @pytest.mark.slow
    def test_packed_matches_unpacked_disp(self, style_params, box):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        outs = []
        for packed in (False, True):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8),
                dtype=jnp.float32, output_dtype=np.float32, packed=packed,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
            )
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_packed_matches_unpacked_vel(self, style_params, box):
        params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=MID)
        outs = []
        for packed in (False, True):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8),
                dtype=jnp.float32, output_dtype=np.float32, packed=packed,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
            )
        (d0, v0), (d1, v1) = outs
        np.testing.assert_allclose(d0, d1, rtol=2e-4, atol=2e-5)
        scale = np.abs(v0).max()
        np.testing.assert_allclose(v0 / scale, v1 / scale, rtol=2e-4, atol=2e-4)

    def test_packed_geometry_validation(self):
        with pytest.raises(ValueError):
            HierarchicalConfig(size=(24, 24, 24), slab=4, tile=(8, 8, 6), packed=True)


class TestValidation:
    def test_rejects_non_model(self, style_params):
        cfg = HierarchicalConfig(size=(N,) * 3, slab=8, tile=(8, 8, 8))
        with pytest.raises(TypeError):
            HierarchicalProcessor(object(), style_params, cfg)


class TestStyleHierarchical:
    """Flexible-cosmology (style) models ride the hierarchical runtime via
    the per-call premodulation fold — must match the style subbox path."""

    def test_style_matches_style_subbox_disp(self, style_params, box):
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorCore

        model = StyleNBodyEmulatorCore(mid_chan=MID)
        scfg = SubboxConfig(size=(N,) * 3, ndiv=(2, 2, 2), dtype=jnp.float32)
        ref = SubboxProcessor(model, style_params, scfg).process_box(box, 0.5, 0.3175)
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        out = HierarchicalProcessor(model, style_params, cfg).process_box(
            box, 0.5, 0.3175
        )
        assert out.shape == (3, N, N, N)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_style_matches_style_subbox_vel(self, style_params, box):
        model = StyleNBodyEmulatorVelCore(mid_chan=MID)
        scfg = SubboxConfig(size=(N,) * 3, ndiv=(2, 2, 2), dtype=jnp.float32)
        d_ref, v_ref = SubboxProcessor(model, style_params, scfg).process_box(
            box, 0.5, 0.3175
        )
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        d, v = HierarchicalProcessor(model, style_params, cfg).process_box(
            box, 0.5, 0.3175
        )
        np.testing.assert_allclose(d, d_ref, rtol=2e-4, atol=2e-5)
        scale = np.abs(v_ref).max()
        np.testing.assert_allclose(v / scale, v_ref / scale, rtol=2e-4, atol=2e-4)

    def test_style_fold_different_cosmologies_differ(self, style_params, box):
        """The per-call fold must actually respond to (z, Om)."""
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorCore

        model = StyleNBodyEmulatorCore(mid_chan=MID)
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        proc = HierarchicalProcessor(model, style_params, cfg)
        a = proc.process_box(box, 0.0, 0.3175)
        b = proc.process_box(box, 1.0, 0.25)
        assert not np.allclose(a, b)

    def test_geometry_validation(self):
        with pytest.raises(ValueError):
            HierarchicalConfig(size=(16, 16, 16), slab=3)
        with pytest.raises(ValueError):
            HierarchicalConfig(size=(16, 16, 16), slab=8, tile=(5, 8, 8))
        with pytest.raises(ValueError):
            HierarchicalConfig(size=(12, 12, 12), slab=4, tile=(4, 4, 4))


class TestPhase1HSplit:
    @pytest.mark.slow
    def test_slab_h_matches_full_h(self, style_params, box):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        outs = []
        for sh in (None, 8):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, slab_h=sh, tile=(8, 8, 8),
                dtype=jnp.float32, output_dtype=np.float32,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
            )
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)


class TestBufDtype:
    """f32 compute with bf16 inter-phase buffers (the TPU f32 big-box mode).

    Every level-buffer consumer is a conv; on TPU, XLA rounds f32 conv
    operands to bf16 anyway (default matmul precision), so bf16 buffer
    storage only moves that rounding to the write.  On CPU (true-f32
    convs) the rounding is real, so this asserts bf16-level agreement
    with the all-f32 runs, plus exact equality of the no-op default.
    """

    @pytest.mark.slow
    def test_bf16_buffers_match_f32(self, style_params, box, subbox_reference):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32, output_dtype=np.float32,
            buf_dtype=jnp.bfloat16,
        )
        out = HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
        scale = np.abs(subbox_reference).max()
        np.testing.assert_allclose(
            out / scale, subbox_reference / scale, rtol=0.05, atol=0.03
        )

    @pytest.mark.slow
    def test_bf16_buffers_match_f32_vel(self, style_params, box):
        params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=MID)
        outs = []
        for buf_dtype in (None, jnp.bfloat16):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8),
                dtype=jnp.float32, output_dtype=np.float32,
                buf_dtype=buf_dtype,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)
            )
        (d0, v0), (d1, v1) = outs
        ds, vs = np.abs(d0).max(), np.abs(v0).max()
        np.testing.assert_allclose(d1 / ds, d0 / ds, rtol=0.05, atol=0.03)
        # velocity is a derivative — one tail element can exceed 0.05 under
        # real (CPU) bf16 rounding; on TPU the rounding already happens in
        # the all-f32 run's conv operands, so the two paths coincide there
        np.testing.assert_allclose(v1 / vs, v0 / vs, rtol=0.05, atol=0.1)

    def test_default_is_identity(self):
        cfg = HierarchicalConfig(size=(N,) * 3, slab=8, tile=(8, 8, 8),
                                 dtype=jnp.float32)
        assert jnp.dtype(cfg.buf_dtype) == jnp.float32
        cfg = HierarchicalConfig(size=(N,) * 3, slab=8, tile=(8, 8, 8))
        assert jnp.dtype(cfg.buf_dtype) == jnp.bfloat16


class TestY0CacheEquivalence:
    """The cached phase-3 decode (``y0_cache=True``) must match the
    monolithic decode — a user enabling the documented option gets the
    same science (ADVICE r4: the ~250-line strip/coordinate path had no
    equivalence pin).  f32 compute, wino off (CPU): identical math up to
    XLA re-fusion order."""

    @pytest.mark.parametrize("packed", [True, False])
    def test_disp(self, style_params, box, packed):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        outs = []
        for y0_cache in (False, True):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8), packed=packed,
                dtype=jnp.float32, output_dtype=np.float32,
                y0_cache=y0_cache, wino=False,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(
                    box, 0.5, 0.3175
                )
            )
        np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("packed", [True, False])
    def test_vel(self, style_params, box, packed):
        params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=MID)
        outs = []
        for y0_cache in (False, True):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8), packed=packed,
                dtype=jnp.float32, output_dtype=np.float32,
                y0_cache=y0_cache, wino=False,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(
                    box, 0.5, 0.3175
                )
            )
        np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=2e-5, atol=2e-5)

    def test_y0_slab_h_segments(self, style_params, box):
        """Non-default y0_slab_h (segmented strip fill) changes nothing."""
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        outs = []
        for sh in (None, 8, 4):
            cfg = HierarchicalConfig(
                size=(N,) * 3, slab=8, tile=(8, 8, 8),
                dtype=jnp.float32, output_dtype=np.float32,
                y0_cache=True, y0_slab_h=sh, wino=False,
            )
            outs.append(
                HierarchicalProcessor(model, params, cfg).process_box(
                    box, 0.5, 0.3175
                )
            )
        np.testing.assert_allclose(outs[1], outs[0], rtol=1e-6)
        np.testing.assert_allclose(outs[2], outs[0], rtol=1e-6)
