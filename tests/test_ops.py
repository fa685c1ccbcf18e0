"""Unit tests for conv primitives and the style-modulation identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.ops.conv3d import (
    conv3d,
    conv3d_up,
    leaky_relu,
    leaky_relu_with_tangent,
)
from jax_nbody_emulator_with_dj_tpu.ops.style import (
    modulated_style_weight,
    premodulate_layer,
    style_modulation,
    style_vector,
)
from jax_nbody_emulator_with_dj_tpu.models.blocks import (
    apply_conv_layer,
    apply_conv_layer_vel,
    init_conv_layer,
)

KEY = jax.random.key(42)


def _rand(shape, key=KEY, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class TestConv3D:
    def test_valid_shrinks_by_kernel_minus_one(self):
        x = _rand((2, 10, 10, 10, 3))
        w = _rand((3, 3, 3, 3, 5))
        y = conv3d(x, w)
        assert y.shape == (2, 8, 8, 8, 5)

    def test_k1_preserves_size(self):
        x = _rand((1, 6, 6, 6, 4))
        w = _rand((1, 1, 1, 4, 2))
        assert conv3d(x, w).shape == (1, 6, 6, 6, 2)

    def test_stride2_halves(self):
        x = _rand((1, 8, 8, 8, 4))
        w = _rand((2, 2, 2, 4, 4))
        assert conv3d(x, w, stride=2).shape == (1, 4, 4, 4, 4)

    def test_upsample_doubles(self):
        x = _rand((1, 5, 5, 5, 4))
        w = _rand((2, 2, 2, 4, 4))
        assert conv3d_up(x, w).shape == (1, 10, 10, 10, 4)

    def test_matches_manual_dot_k1(self):
        # 1x1x1 conv is a per-voxel matmul.
        x = _rand((1, 4, 4, 4, 3))
        w = _rand((1, 1, 1, 3, 2))
        y = conv3d(x, w)
        expected = jnp.einsum("bdhwi,io->bdhwo", x, w[0, 0, 0])
        np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-5, atol=1e-6)

    def test_bf16_output_dtype(self):
        x = _rand((1, 6, 6, 6, 8)).astype(jnp.bfloat16)
        w = _rand((3, 3, 3, 8, 8)).astype(jnp.bfloat16)
        assert conv3d(x, w).dtype == jnp.bfloat16
        assert conv3d(x, w, accum_dtype=jnp.float32).dtype == jnp.float32


class TestLeakyReLU:
    def test_slope(self):
        x = jnp.array([-2.0, -1.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(leaky_relu(x)), [-0.02, -0.01, 0.0, 1.0], rtol=1e-6
        )

    def test_tangent(self):
        x = jnp.array([-1.0, 2.0])
        dx = jnp.array([3.0, 3.0])
        y, dy = leaky_relu_with_tangent(x, dx)
        np.testing.assert_allclose(np.asarray(dy), [0.03, 3.0], rtol=1e-6)
        # matches jax.jvp of leaky_relu
        _, dy_ad = jax.jvp(leaky_relu, (x,), (dx,))
        np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ad), rtol=1e-6)


class TestStyleIdentity:
    """The input/output-scaling formulation must equal explicit per-sample
    modulated-demodulated weights (the reference's formulation)."""

    @pytest.fixture(scope="class")
    def layer(self):
        return init_conv_layer(KEY, 6, 5, "conv", style=True, vel=False)

    def test_norm_matches_explicit(self, layer):
        s = style_vector(jnp.array([0.25, 0.35]), jnp.array([0.7, 1.1]))
        m, norm = style_modulation(layer, s)
        # Explicit: norm over (K,K,K,Ci) of modulated weight
        w = layer["weight"][None] * m[:, None, None, None, :, None]
        norm_explicit = jnp.sqrt(jnp.sum(w**2, axis=(1, 2, 3, 4)) + 1e-8)
        np.testing.assert_allclose(np.asarray(norm), np.asarray(norm_explicit), rtol=1e-5)

    def test_conv_identity(self, layer):
        s = style_vector(jnp.array([0.25, 0.35]), jnp.array([0.7, 1.1]))
        x = _rand((2, 8, 8, 8, 6))
        # Ours: input-scale + shared conv + output-scale
        y = apply_conv_layer(layer, x, "conv", s=s)
        # Explicit per-sample weights (reference formulation)
        w_mod = modulated_style_weight(layer, s)  # (B,K,K,K,Ci,Co)
        ys = []
        for b in range(2):
            yb = conv3d(x[b : b + 1], w_mod[b]) + layer["bias"]
            ys.append(yb[0])
        y_explicit = jnp.stack(ys)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_explicit), rtol=1e-4, atol=1e-5
        )

    def test_unit_style_roughly_demodulates(self, layer):
        # demodulated weights have unit norm per output channel
        s = style_vector(0.3, 1.0)
        w_mod = modulated_style_weight(layer, s)[0]
        norms = jnp.sqrt(jnp.sum(w_mod**2, axis=(0, 1, 2, 3)))
        np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-4)


class TestPremodulateLayer:
    @pytest.fixture(scope="class")
    def layer(self):
        return init_conv_layer(KEY, 4, 3, "conv", style=True, vel=False)

    def test_weight_matches_explicit(self, layer):
        s = style_vector(0.32, 0.85)
        folded = premodulate_layer(layer, s[0])
        w_explicit = modulated_style_weight(layer, s)[0]
        np.testing.assert_allclose(
            np.asarray(folded["weight"]), np.asarray(w_explicit), rtol=1e-5
        )
        assert "dweight" not in folded

    def test_dweight_matches_autodiff(self, layer):
        """The analytic tangent fold must equal d/dDz of the folded weight."""
        Om = 0.3175

        def folded_weight(Dz):
            s = style_vector(Om, Dz)[0]
            return premodulate_layer(layer, s)["weight"]

        Dz0 = jnp.float32(0.8)
        _, dw_ad = jax.jvp(folded_weight, (Dz0,), (jnp.float32(1.0),))
        s = style_vector(Om, Dz0)[0]
        folded = premodulate_layer(layer, s, vel=True, first_layer=False)
        np.testing.assert_allclose(
            np.asarray(folded["dweight"]), np.asarray(dw_ad), rtol=1e-4, atol=1e-6
        )

    def test_first_layer_rule(self, layer):
        s = style_vector(0.3175, 0.8)[0]
        plain = premodulate_layer(layer, s, vel=True, first_layer=False)
        first = premodulate_layer(layer, s, vel=True, first_layer=True)
        extra = np.asarray(first["dweight"]) - np.asarray(plain["dweight"])
        np.testing.assert_allclose(
            extra, np.asarray(plain["weight"]) / 0.8, rtol=1e-4, atol=1e-7
        )


class TestPremodVelLayer:
    def test_tangent_composition(self):
        p = init_conv_layer(KEY, 3, 4, "conv", style=False, vel=True)
        x = _rand((2, 8, 8, 8, 3))
        dx = _rand((2, 8, 8, 8, 3), jax.random.key(7))
        y, dy = apply_conv_layer_vel(p, x, dx, "conv")
        y_ref = conv3d(x, p["weight"]) + p["bias"]
        dy_ref = conv3d(x, p["dweight"]) + conv3d(dx, p["weight"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-4, atol=1e-5)

    def test_first_layer_none_tangent(self):
        p = init_conv_layer(KEY, 3, 4, "conv", style=False, vel=True)
        x = _rand((1, 8, 8, 8, 3))
        _, dy = apply_conv_layer_vel(p, x, None, "conv")
        dy_ref = conv3d(x, p["dweight"])
        np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=1e-5, atol=1e-6)


class TestEntryExitPacked:
    """Entry convs (NCDHW small-C input -> packed output) and the exit
    relayout must match the reference conv exactly (ops/s2d.py)."""

    def test_conv3_entry_matches_conv3d(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        x = jax.random.normal(jax.random.key(0), (2, 3, 10, 12, 16), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (3, 3, 3, 3, 5), jnp.float32)
        ref = conv3d(jnp.moveaxis(x, 1, -1), w)
        y = s2d.conv3_entry_packed(x, s2d.pack_w3_entry(w))
        yu = s2d.unpack(y)
        np.testing.assert_allclose(yu, ref, rtol=1e-5, atol=1e-5)

    def test_conv3_entry_im2col_matches_per_tap(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        x = jax.random.normal(jax.random.key(2), (1, 3, 10, 12, 16), jnp.float32)
        w = jax.random.normal(jax.random.key(3), (3, 3, 3, 3, 5), jnp.float32)
        wf = s2d.pack_w3_entry(w)
        ref = s2d.conv3_entry_packed(x, wf)
        got = s2d.conv3_entry_im2col(x, s2d.entry_cols(wf))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_conv3_packed_narrow_output(self):
        # The 64->3 tail's narrow-Cols packed conv must match the
        # reference conv (tap-stacked reformulations were tried and
        # rejected — see the conv3_packed docstring).
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        w = jax.random.normal(jax.random.key(4), (3, 3, 3, 16, 3), jnp.float32)
        wp = s2d.pack_w3(w)
        x = jax.random.normal(jax.random.key(5), (1, 8, 9, 6, 32), jnp.float32)
        y = s2d.conv3_packed(x, wp)
        ref = conv3d(s2d.unpack(x), w)
        np.testing.assert_allclose(s2d.unpack(y), ref, rtol=1e-4, atol=1e-4)

    def test_conv1_entry_matches_matmul(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        x = jax.random.normal(jax.random.key(2), (1, 3, 6, 8, 10), jnp.float32)
        w = jax.random.normal(jax.random.key(3), (1, 1, 1, 3, 4), jnp.float32)
        ref = jnp.einsum("bdhwc,co->bdhwo", jnp.moveaxis(x, 1, -1), w.reshape(3, 4))
        y = s2d.conv1_entry_packed(x, s2d.pack_w1_entry(w))
        np.testing.assert_allclose(s2d.unpack(y), ref, rtol=1e-5, atol=1e-6)

    def test_unpack_to_ncdhw_roundtrip(self):
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        y = jax.random.normal(jax.random.key(4), (1, 4, 6, 5, 6), jnp.float32)
        ncdhw = s2d.unpack_to_ncdhw(y)
        assert ncdhw.shape == (1, 3, 4, 6, 10)
        # same data as channels-last unpack, reordered
        ndhwc = s2d.unpack(y)
        np.testing.assert_array_equal(ncdhw, jnp.moveaxis(ndhwc, -1, 1))

    def test_entry_block_matches_unpacked(self):
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            apply_resnet_block,
            apply_resnet_entry_packed,
            pack_resnet_entry_params,
            init_resnet_block,
        )
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        p = init_resnet_block(jax.random.key(5), "CACA", 3, 8, style=False, vel=False)
        x = jax.random.normal(jax.random.key(6), (1, 3, 12, 14, 16), jnp.float32)
        ref = apply_resnet_block(p, x, "CACA", in_fmt="NCDHW")
        pp = pack_resnet_entry_params(p, "CACA")
        y = s2d.unpack(apply_resnet_entry_packed(pp, x))
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    def test_entry_block_vel_matches_unpacked(self):
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            apply_resnet_block_vel,
            apply_resnet_entry_vel_packed,
            pack_resnet_entry_params,
            init_resnet_block,
        )
        from jax_nbody_emulator_with_dj_tpu.ops import s2d

        p = init_resnet_block(jax.random.key(7), "CACA", 3, 8, style=False, vel=True)
        x = jax.random.normal(jax.random.key(8), (1, 3, 12, 14, 16), jnp.float32)
        ref, dref = apply_resnet_block_vel(p, x, None, "CACA", in_fmt="NCDHW")
        pp = pack_resnet_entry_params(p, "CACA", vel=True)
        y, dy = apply_resnet_entry_vel_packed(pp, x)
        np.testing.assert_allclose(s2d.unpack(y), ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s2d.unpack(dy), dref, rtol=1e-5, atol=1e-5)


class TestDweightFactors:
    """Rank structure of the style-derived tangent kernel (factored vel path).

    ``premodulate_layer``'s analytic tangent satisfies
    ``dW = W⊙g_in − W⊙c_out`` exactly; the packed velocity layers exploit it
    to run the tangent as ONE conv sharing the primal kernel
    (``models/blocks.py::_apply_packed_vel``).  Reference semantics being
    factored: ``/root/reference/src/jax_nbody_emulator/nbody_emulator.py:221-266``.
    """

    @pytest.fixture(scope="class")
    def layer(self):
        return init_conv_layer(jax.random.key(3), 6, 4, "conv", style=True, vel=False)

    def test_exact_factors_reproduce_dweight(self, layer):
        s = style_vector(0.28, 0.9)[0]
        folded = premodulate_layer(layer, s, vel=True, factors=True)
        w = np.asarray(folded["weight"], np.float64)
        dw = np.asarray(folded["dweight"], np.float64)
        g = np.asarray(folded["dfac_in"], np.float64)
        c = np.asarray(folded["dfac_out"], np.float64)
        np.testing.assert_allclose(
            w * (g[:, None] - c[None, :]), dw, rtol=0, atol=2e-6 * np.abs(dw).max()
        )
        # gauge: c centered at 0 (minimizes the c*z cancellation term)
        assert abs(c.mean()) < 1e-6 * (np.abs(c).max() + 1e-30)

    def test_first_layer_factor(self, layer):
        Dz = 0.8
        s = style_vector(0.3175, Dz)[0]
        plain = premodulate_layer(layer, s, vel=True, factors=True)
        first = premodulate_layer(layer, s, vel=True, first_layer=True, factors=True)
        # first-layer rule adds w/Dz == +1/Dz on g (mod the shared gauge shift)
        dg = np.asarray(first["dfac_in"]) - np.asarray(plain["dfac_in"])
        dc = np.asarray(first["dfac_out"]) - np.asarray(plain["dfac_out"])
        np.testing.assert_allclose(dg - dc.mean(), 1.0 / Dz, rtol=1e-5)

    def test_recovery_roundtrip(self, layer):
        from jax_nbody_emulator_with_dj_tpu.ops.style import recover_dweight_factors

        s = style_vector(0.35, 1.3)[0]
        folded = premodulate_layer(layer, s, vel=True)
        g, c, ok = recover_dweight_factors(folded["weight"], folded["dweight"])
        assert ok
        w = np.asarray(folded["weight"], np.float64)
        dw = np.asarray(folded["dweight"], np.float64)
        np.testing.assert_allclose(
            w * (g[:, None] - c[None, :]), dw, rtol=0, atol=1e-5 * np.abs(dw).max()
        )

    def test_recovery_rejects_learned_dweight(self, layer):
        from jax_nbody_emulator_with_dj_tpu.ops.style import recover_dweight_factors

        s = style_vector(0.35, 1.3)[0]
        folded = premodulate_layer(layer, s, vel=True)
        rng = np.random.default_rng(0)
        fake = rng.normal(size=np.asarray(folded["dweight"]).shape).astype(np.float32)
        _, _, ok = recover_dweight_factors(folded["weight"], fake)
        assert not ok

    @pytest.mark.parametrize("kind", ["conv", "skip", "down", "up"])
    def test_factored_apply_matches_materialized(self, layer, kind):
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            _apply_packed_vel,
            pack_conv_layer_params,
        )
        import jax_nbody_emulator_with_dj_tpu.ops.style as style_mod

        lyr = init_conv_layer(jax.random.key(5), 8, 8, kind, style=True, vel=False)
        s = style_vector(0.3, 1.1)[0]
        folded = premodulate_layer(lyr, s, vel=True)
        ppf = pack_conv_layer_params(folded, kind, vel=True)
        assert "g" in ppf, "recovery should enable the factored path"
        orig = style_mod.recover_dweight_factors
        style_mod.recover_dweight_factors = lambda *a, **k: (None, None, False)
        try:
            ppw = pack_conv_layer_params(folded, kind, vel=True)
        finally:
            style_mod.recover_dweight_factors = orig
        assert "wcat" in ppw
        x = _rand((1, 8, 8, 4, 16), jax.random.key(6))
        dx = _rand((1, 8, 8, 4, 16), jax.random.key(7))
        yf, dyf = _apply_packed_vel(ppf, x, dx, kind)
        yw, dyw = _apply_packed_vel(ppw, x, dx, kind)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yw), rtol=1e-5, atol=1e-6)
        scale = np.abs(np.asarray(dyw)).max()
        np.testing.assert_allclose(
            np.asarray(dyf) / scale, np.asarray(dyw) / scale, rtol=1e-3, atol=2e-5
        )
