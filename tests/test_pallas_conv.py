"""Pallas fused-conv kernel tests (interpreter mode on CPU).

The same kernel runs compiled on TPU; interpreter mode pins the math
(s2d weight fold, halo DMA windows, tap accumulation, fused epilogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.ops.conv3d import conv3d, leaky_relu
from jax_nbody_emulator_with_dj_tpu.ops.pallas_conv import (
    conv3d_pallas,
    s2d_pack,
    s2d_unpack,
    s2d_weights,
)

KEY = jax.random.key(0)
C = 64


@pytest.fixture(scope="module")
def wb():
    w = (jax.random.normal(KEY, (3, 3, 3, C, C)) * 0.05).astype(jnp.float32)
    b = jax.random.normal(jax.random.key(1), (C,)) * 0.1
    return w, b


class TestS2DTransform:
    def test_pack_unpack_roundtrip(self):
        x = jax.random.normal(KEY, (2, 4, 4, 8, C))
        np.testing.assert_array_equal(np.asarray(s2d_unpack(s2d_pack(x))), np.asarray(x))

    def test_packed_conv_equals_plain(self, wb):
        """conv3x3x3(x, W) == unpack(conv3x3x2(pack(x), W')) via XLA convs."""
        w, _ = wb
        x = jax.random.normal(KEY, (1, 10, 10, 12, C), jnp.float32)
        y_plain = conv3d(x, w)
        from jax.lax import conv_general_dilated

        xp = s2d_pack(x)
        wp = s2d_weights(w)
        yp = conv_general_dilated(
            xp, wp, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y_s2d = s2d_unpack(yp)
        np.testing.assert_allclose(
            np.asarray(y_plain), np.asarray(y_s2d), rtol=1e-4, atol=1e-5
        )

    def test_weight_fold_blocks(self, wb):
        w, _ = wb
        wp = np.asarray(s2d_weights(w))
        # p=0,q=1,a=1 block must be W[kw=3] = zero-block? 2a+q-p = 3 -> zero
        assert np.all(wp[:, :, 1, C:, :C] == 0)
        # p=1,q=0,a=0 -> kw=-1 -> zero
        assert np.all(wp[:, :, 0, :C, C:] == 0)
        # p=0,q=0,a=0 -> kw=0
        np.testing.assert_array_equal(wp[:, :, 0, :C, :C], np.asarray(w[:, :, 0]))


class TestPallasKernel:
    def test_matches_xla_with_bias_and_leaky(self, wb):
        w, b = wb
        x = jax.random.normal(KEY, (1, 12, 12, 16, C), jnp.float32)
        y_ref = leaky_relu(conv3d(x, w) + b)
        y = conv3d_pallas(x, w, b, leaky=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_no_bias_no_activation(self, wb):
        w, _ = wb
        x = jax.random.normal(KEY, (1, 12, 12, 16, C), jnp.float32)
        y_ref = conv3d(x, w)
        y = conv3d_pallas(x, w, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_batched(self, wb):
        w, b = wb
        x = jax.random.normal(KEY, (2, 12, 12, 16, C), jnp.float32)
        y_ref = leaky_relu(conv3d(x, w) + b)
        y = conv3d_pallas(x, w, b, leaky=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_non_block_aligned_shape(self, wb):
        """Odd output dims exercise the padding/clipping path."""
        w, b = wb
        x = jax.random.normal(KEY, (1, 13, 15, 20, C), jnp.float32)
        y_ref = conv3d(x, w) + b
        y = conv3d_pallas(x, w, b, interpret=True)
        assert y.shape == y_ref.shape == (1, 11, 13, 18, C)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )


class TestWinogradPallasKernel:
    """F(2,3)^2 Winograd Pallas kernel vs the direct conv (interpret mode).

    The weight transform is shared with the tested XLA Winograd form
    (``ops.winograd.transform_packed_w3``), so these pin the in-kernel
    input transform, the fused inverse/epilogue, and the parity
    de-interleave of the output block.
    """

    def _wino(self, x, w, b=None, leaky=False, block=None):
        from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
            conv3d_wino_pallas,
        )

        return conv3d_wino_pallas(x, w, b, leaky=leaky, interpret=True,
                                  block=block)

    def test_matches_direct_with_bias_and_leaky(self, wb):
        w, b = wb
        x = jax.random.normal(KEY, (1, 10, 10, 16, C), jnp.float32)
        y_ref = leaky_relu(conv3d(x, w) + b)
        y = self._wino(x, w, b, leaky=True, block=(4, 4, 8))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_multi_block_grid_and_clipping(self, wb):
        """Non-divisible output extents exercise padding + block clipping."""
        w, b = wb
        x = jax.random.normal(KEY, (1, 12, 15, 22, C), jnp.float32)
        y_ref = conv3d(x, w) + b
        y = self._wino(x, w, b, block=(4, 4, 8))
        assert y.shape == y_ref.shape == (1, 10, 13, 20, C)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_bf16_error_comparable_to_direct(self, wb):
        """bf16 Winograd reassociation stays the same order as direct bf16."""
        w, b = wb
        x = jax.random.normal(KEY, (1, 10, 10, 16, C), jnp.float32)
        y_f32 = np.asarray(conv3d(x, w) + b)
        y_direct = np.asarray(
            conv3d(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
            + b.astype(jnp.bfloat16),
            np.float32,
        )
        y_wino = np.asarray(
            self._wino(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b,
                       block=(4, 4, 8)),
            np.float32,
        )
        scale = np.abs(y_f32).max()
        err_direct = np.abs(y_direct - y_f32).max() / scale
        err_wino = np.abs(y_wino - y_f32).max() / scale
        assert err_wino < max(4 * err_direct, 0.05), (err_wino, err_direct)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Winograd kernel needs a TPU backend",
)
class TestWinoPallasOnTpu:
    """Compiled-kernel equivalence on real hardware (the interpret-mode
    tests above validate semantics; these validate the Mosaic compile and
    the integrated hierarchical path end to end — they run only on TPU
    hosts and are skipped on the CPU CI tier)."""

    def test_rectangular_channels_match_xla(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d
        from jax_nbody_emulator_with_dj_tpu.ops.winograd import (
            transform_packed_w3,
        )
        from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
            conv3d_wino_pallas_packed,
        )

        for ci, co in [(64, 64), (128, 64), (64, 128)]:
            x = jax.random.normal(KEY, (1, 12, 20, 18, 2 * ci), jnp.bfloat16)
            w = jax.random.normal(KEY, (3, 3, 3, ci, co), jnp.float32) * 0.05
            wp = s2d.pack_w3(w).astype(jnp.bfloat16)
            bias = jnp.ones((co,), jnp.float32) * 0.1
            ref = s2d.conv3_packed(x, wp) + s2d.pack_bias(bias).astype(x.dtype)
            got = conv3d_wino_pallas_packed(x, transform_packed_w3(wp), bias)
            err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
            rel = err.max() / np.abs(np.asarray(ref)).max()
            assert rel < 0.03, (ci, co, rel)

    def test_hierarchical_vel_wino_matches_xla_path(self):
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalConfig,
            HierarchicalProcessor,
        )
        from jax_nbody_emulator_with_dj_tpu.models.cores import (
            NBodyEmulatorVelCore,
        )

        model = NBodyEmulatorVelCore()
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 3, 128, 128, 128), jnp.float32),
            jnp.ones((1,)), jnp.ones((1,)),
        )
        box = np.asarray(
            jax.random.normal(KEY, (3, 128, 128, 128), jnp.float32)
        ) * 0.5
        outs = {}
        for wino in (False, True):
            cfg = HierarchicalConfig(
                size=(128,) * 3, slab=32, tile=(128, 128, 128),
                wino=wino, output_dtype=np.float32,
            )
            outs[wino] = HierarchicalProcessor(model, params, cfg).process_box(
                box, z=0.0, Om=0.3
            )
        d0, v0 = outs[False]
        d1, v1 = outs[True]
        # disp: bf16 reassociation class; vel: the LeakyReLU-tangent mask
        # flips near zero under ANY bf16 perturbation (measured: the XLA
        # bf16 path itself deviates ~0.03 rms / ~0.6 max_rel from f32),
        # so compare in rms.
        assert np.abs(d1 - d0).max() / np.abs(d0).max() < 0.02
        assert (v1 - v0).std() / v0.std() < 0.08


class TestPairKernelInterpret:
    """Fused factored-tangent pair kernel vs the reference epilogue math
    (interpret mode): y = conv(x, W) + b, dy = conv(s, W) - c (.) conv(x, W),
    optional fused LeakyReLU pair.  This is the flagship vel layers' op
    (models/blocks.py::_apply_packed_vel "g" path, round 5)."""

    def _pair(self, x, s, w, b, c, leaky, block=(4, 4, 8)):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d
        from jax_nbody_emulator_with_dj_tpu.ops.winograd import (
            transform_packed_w3,
        )
        from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
            conv3d_wino_pallas_pair_packed,
        )

        xp, sp = s2d.pack(x), s2d.pack(s)
        what = transform_packed_w3(s2d.pack_w3(w.astype(x.dtype)))
        y, dy = conv3d_wino_pallas_pair_packed(
            xp, sp, what, b, jnp.tile(c, 2), leaky=leaky,
            interpret=True, block=block,
        )
        return s2d.unpack(y), s2d.unpack(dy)

    @pytest.mark.parametrize("leaky", [False, True])
    def test_matches_reference_epilogue(self, wb, leaky):
        w, b = wb
        c = jax.random.normal(jax.random.key(2), (C,)) * 0.3
        x = jax.random.normal(KEY, (1, 12, 15, 22, C), jnp.float32)
        s = jax.random.normal(jax.random.key(3), (1, 12, 15, 22, C), jnp.float32)
        z, zt = conv3d(x, w), conv3d(s, w)
        y_ref = z + b
        dy_ref = zt - c * z
        if leaky:
            dy_ref = jnp.where(y_ref > 0, dy_ref, 0.01 * dy_ref)
            y_ref = leaky_relu(y_ref)
        y, dy = self._pair(x, s, w, b, c, leaky)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5
        )

    def test_none_bias_and_fold_are_raw_convs(self, wb):
        """bias=None / c=None run y = conv(x), dy = conv(s) — the per-part
        form the packed-cat vel layer uses."""
        from jax_nbody_emulator_with_dj_tpu.ops import s2d
        from jax_nbody_emulator_with_dj_tpu.ops.winograd import (
            transform_packed_w3,
        )
        from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
            conv3d_wino_pallas_pair_packed,
        )

        w, _ = wb
        x = jax.random.normal(KEY, (1, 10, 10, 16, C), jnp.float32)
        s = jax.random.normal(jax.random.key(3), (1, 10, 10, 16, C), jnp.float32)
        xp, sp = s2d.pack(x), s2d.pack(s)
        what = transform_packed_w3(s2d.pack_w3(w))
        y, dy = conv3d_wino_pallas_pair_packed(
            xp, sp, what, None, None, interpret=True, block=(4, 4, 8)
        )
        np.testing.assert_allclose(
            np.asarray(s2d.unpack(y)), np.asarray(conv3d(x, w)),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s2d.unpack(dy)), np.asarray(conv3d(s, w)),
            rtol=1e-4, atol=1e-5,
        )


class TestWino43Interpret:
    """Mixed F(2,3)xF(4,3) kernel vs the direct conv (interpret mode).

    MEASURED NEGATIVE for production (round 5): 63.7 vs 66.7 TF/s at the
    narrow phase-3 shapes and 94.7 vs 96.3 at wide phase-1 shapes on a
    v5e (scripts/experiments/microbench_wino43.py) — the 25% MAC cut is
    eaten by the {2,4,5}-coefficient VPU transforms and halved dot rows.
    The kernel is kept as a validated experiment; these tests pin its
    correctness so the measurement stands on exact code.
    """

    def _wino43(self, x, w, b=None, leaky=False, block=(4, 8, 8)):
        from jax_nbody_emulator_with_dj_tpu.ops.winograd43_pallas import (
            conv3d_wino43_pallas,
        )

        return conv3d_wino43_pallas(x, w, b, leaky=leaky, interpret=True,
                                    block=block)

    def test_matches_direct_with_bias_and_leaky(self, wb):
        w, b = wb
        x = jax.random.normal(KEY, (1, 10, 14, 16, C), jnp.float32)
        y_ref = leaky_relu(conv3d(x, w) + b)
        y = self._wino43(x, w, b, leaky=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-5
        )

    def test_multi_block_grid_and_clipping(self, wb):
        w, b = wb
        x = jax.random.normal(KEY, (1, 12, 15, 22, C), jnp.float32)
        y_ref = conv3d(x, w) + b
        y = self._wino43(x, w, b)
        assert y.shape == y_ref.shape == (1, 10, 13, 20, C)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-5
        )

    def test_bf16_error_within_gate_order(self, wb):
        """F(4,3)'s {4,5,8} coefficients amplify bf16 rounding ~2x vs
        F(2,3); the physics gate has ~50x margin (README)."""
        w, b = wb
        x = jax.random.normal(KEY, (1, 10, 14, 16, C), jnp.float32)
        y_f32 = np.asarray(conv3d(x, w) + b)
        y_wino = np.asarray(
            self._wino43(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b),
            np.float32,
        )
        scale = np.abs(y_f32).max()
        assert np.abs(y_wino - y_f32).max() / scale < 0.08


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled pair kernel needs a TPU backend",
)
class TestPairKernelOnTpu:
    """Compiled pair-kernel equivalence on real hardware."""

    def test_pair_matches_two_singles_compiled(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d
        from jax_nbody_emulator_with_dj_tpu.ops.winograd import (
            transform_packed_w3,
        )
        from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
            conv3d_wino_pallas_packed,
            conv3d_wino_pallas_pair_packed,
        )

        x = jax.random.normal(KEY, (1, 20, 22, 24, 128), jnp.bfloat16)
        s = jax.random.normal(jax.random.key(3), (1, 20, 22, 24, 128),
                              jnp.bfloat16)
        w = jax.random.normal(KEY, (3, 3, 3, 64, 64), jnp.float32) * 0.05
        what = transform_packed_w3(s2d.pack_w3(w).astype(jnp.bfloat16))
        b = jnp.ones((64,), jnp.float32) * 0.1
        c = (jax.random.normal(jax.random.key(2), (128,)) * 0.3).astype(
            jnp.float32
        )
        z = conv3d_wino_pallas_packed(x, what)
        zt = conv3d_wino_pallas_packed(s, what)
        y_ref = z + jnp.tile(b, 2).astype(z.dtype)
        dy_ref = zt - c.astype(z.dtype) * z
        # Raw (no-leaky) pair: identical dots, only the bf16 epilogue
        # reassociation differs (the pair folds bias/c on the f32
        # accumulators; the reference folds on bf16-rounded z).
        y, dy = conv3d_wino_pallas_pair_packed(x, s, what, b, c, leaky=False)
        for got, ref in ((y, y_ref), (dy, dy_ref)):
            got = np.asarray(got, np.float32)
            ref = np.asarray(ref, np.float32)
            assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6) < 0.02
        # Leaky pair: dy's mask (y > 0) flips where the f32-precision y
        # and the bf16-rounded reference y disagree in SIGN near zero —
        # dy jumps 1 <-> 0.01 there under ANY epilogue rounding change
        # (same phenomenon as the hierarchical wino test above), so dy
        # compares in rms; y still compares elementwise (near zero the
        # flip changes y itself by < |y|).
        dy_ref_l = jnp.where(y_ref > 0, dy_ref, 0.01 * dy_ref)
        y_ref_l = jnp.where(y_ref > 0, y_ref, 0.01 * y_ref)
        y_l, dy_l = conv3d_wino_pallas_pair_packed(x, s, what, b, c, leaky=True)
        y_l, dy_l = np.asarray(y_l, np.float32), np.asarray(dy_l, np.float32)
        ref_y = np.asarray(y_ref_l, np.float32)
        ref_dy = np.asarray(dy_ref_l, np.float32)
        assert np.abs(y_l - ref_y).max() / np.abs(ref_y).max() < 0.02
        assert (dy_l - ref_dy).std() / ref_dy.std() < 0.05
