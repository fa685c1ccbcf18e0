"""Layer-level contract suite: the per-kind conv-layer behaviors the
reference pins in ``tests/test_layers.py`` / ``test_layers_vel.py`` /
``test_style_layers{,_vel}.py`` (shape contracts for every alias, param
init shapes, numerical health across dtypes, down->up chains, tangent
propagation, manual-vs-autodiff JVP, batched styles, mixed formats).

The reference spreads these over 4 files / ~138 tests keyed to its Flax
module aliases (``layers.py:136-139``, ``layers_vel.py:189-192``,
``style_layers.py:194-197``, ``style_layers_vel.py:278-281``); here one
parametrized file covers the same contracts for the functional layer API
(`models/blocks.py::{init,apply}_conv_layer{,_vel}` over kinds
'conv'/'skip'/'down'/'up' == Conv3D/Skip3D/DownSample3D/UpSample3D).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.models.blocks import (
    apply_conv_layer,
    apply_conv_layer_vel,
    init_conv_layer,
)
from jax_nbody_emulator_with_dj_tpu.ops.style import (
    premodulate_layer,
    style_vector,
)

KEY = jax.random.key(3)
KINDS = ("conv", "skip", "down", "up")


def _out_size(kind: str, n: int) -> int:
    return {"conv": n - 2, "skip": n, "down": n // 2, "up": 2 * n}[kind]


def _rand(shape, key=KEY, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# Shape + parameter contracts (reference test_layers.py shape/init classes)
# ---------------------------------------------------------------------------


class TestKindShapeContracts:
    @pytest.mark.parametrize("kind", KINDS)
    @pytest.mark.parametrize("n", (6, 8, 12))
    def test_spatial_contract(self, kind, n):
        p = init_conv_layer(KEY, 4, 5, kind, style=False, vel=False)
        y = apply_conv_layer(p, _rand((2, n, n, n, 4)), kind)
        m = _out_size(kind, n)
        assert y.shape == (2, m, m, m, 5)

    @pytest.mark.parametrize("kind", KINDS)
    def test_anisotropic_input(self, kind):
        p = init_conv_layer(KEY, 3, 3, kind, style=False, vel=False)
        y = apply_conv_layer(p, _rand((1, 6, 8, 10, 3)), kind)
        assert y.shape[1:4] == tuple(_out_size(kind, n) for n in (6, 8, 10))

    @pytest.mark.parametrize("kind", KINDS)
    def test_vel_output_pair_shapes_match(self, kind):
        p = init_conv_layer(KEY, 4, 4, kind, style=False, vel=True)
        x, dx = _rand((1, 8, 8, 8, 4)), _rand((1, 8, 8, 8, 4), jax.random.key(1))
        y, dy = apply_conv_layer_vel(p, x, dx, kind)
        assert y.shape == dy.shape and y.dtype == dy.dtype

    @pytest.mark.parametrize("kind", KINDS)
    def test_styled_matches_plain_shape(self, kind):
        p = init_conv_layer(KEY, 4, 5, kind, style=True, vel=False)
        x = _rand((2, 8, 8, 8, 4))
        s = style_vector(jnp.array([0.3, 0.32]), jnp.array([0.8, 0.6]))
        y_styled = apply_conv_layer(p, x, kind, s=s)
        y_plain = apply_conv_layer(p, x, kind)
        assert y_styled.shape == y_plain.shape


class TestParamContracts:
    @pytest.mark.parametrize("kind", KINDS)
    def test_plain_param_shapes(self, kind):
        p = init_conv_layer(KEY, 4, 5, kind, style=False, vel=False)
        k = {"conv": 3, "skip": 1, "down": 2, "up": 2}[kind]
        assert p["weight"].shape == (k, k, k, 4, 5)
        assert p["bias"].shape == (5,)
        assert set(p) == {"weight", "bias"}

    def test_style_params_added(self):
        p = init_conv_layer(KEY, 4, 5, "conv", style=True, vel=False)
        assert p["style_weight"].shape == (4, 2)
        assert p["style_bias"].shape == (4,)
        # style_bias inits to ones: zero style vector ~ plain conv scale
        np.testing.assert_array_equal(np.asarray(p["style_bias"]), 1.0)

    def test_vel_dweight_added_only_when_premodulated(self):
        p = init_conv_layer(KEY, 4, 5, "conv", style=False, vel=True)
        assert p["dweight"].shape == p["weight"].shape
        # style+vel layers derive the tangent analytically -> no dweight
        p = init_conv_layer(KEY, 4, 5, "conv", style=True, vel=True)
        assert "dweight" not in p

    def test_bias_initializes_to_zero(self):
        p = init_conv_layer(KEY, 4, 5, "conv", style=False, vel=False)
        np.testing.assert_array_equal(np.asarray(p["bias"]), 0.0)

    def test_weight_scale_tracks_fan_in(self):
        # lecun-normal: std ~ 1/sqrt(Cin*K^3); 8x the fan-in -> ~1/sqrt(8) std
        p_small = init_conv_layer(KEY, 8, 64, "conv", style=False, vel=False)
        p_big = init_conv_layer(KEY, 64, 64, "conv", style=False, vel=False)
        ratio = float(jnp.std(p_big["weight"]) / jnp.std(p_small["weight"]))
        assert 0.25 < ratio < 0.5  # expect ~1/sqrt(8) = 0.354


# ---------------------------------------------------------------------------
# Numerical health (reference's NaN/Inf + fp16-path classes)
# ---------------------------------------------------------------------------


class TestNumericalHealth:
    @pytest.mark.parametrize("kind", KINDS)
    @pytest.mark.parametrize("dtype", (jnp.float32, jnp.bfloat16))
    def test_finite_and_dtype_preserved(self, kind, dtype):
        p = init_conv_layer(KEY, 4, 4, kind, style=False, vel=False)
        y = apply_conv_layer(p, _rand((1, 8, 8, 8, 4), dtype=dtype), kind)
        assert y.dtype == dtype
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())

    @pytest.mark.parametrize("kind", KINDS)
    def test_styled_finite_bf16(self, kind):
        p = init_conv_layer(KEY, 4, 4, kind, style=True, vel=False)
        s = style_vector(0.3175, 0.8)
        y = apply_conv_layer(p, _rand((1, 8, 8, 8, 4), dtype=jnp.bfloat16), kind, s=s)
        assert y.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())

    @pytest.mark.parametrize("kind", KINDS)
    def test_vel_finite_bf16(self, kind):
        p = init_conv_layer(KEY, 4, 4, kind, style=False, vel=True)
        x = _rand((1, 8, 8, 8, 4), dtype=jnp.bfloat16)
        y, dy = apply_conv_layer_vel(p, x, x, kind)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        assert bool(jnp.isfinite(dy.astype(jnp.float32)).all())

    def test_large_amplitude_input_no_overflow_f32(self):
        p = init_conv_layer(KEY, 4, 4, "conv", style=False, vel=False)
        y = apply_conv_layer(p, 1e4 * _rand((1, 6, 6, 6, 4)), "conv")
        assert bool(jnp.isfinite(y).all())


# ---------------------------------------------------------------------------
# Resample chains (reference's down->up chain class)
# ---------------------------------------------------------------------------


class TestResampleChains:
    def test_down_then_up_restores_size(self):
        pd = init_conv_layer(KEY, 4, 8, "down", style=False, vel=False)
        pu = init_conv_layer(KEY, 8, 4, "up", style=False, vel=False)
        x = _rand((1, 8, 8, 8, 4))
        y = apply_conv_layer(pu, apply_conv_layer(pd, x, "down"), "up")
        assert y.shape == x.shape

    def test_three_level_round_trip(self):
        # the U-Net's own depth: 3 downs then 3 ups at matching widths
        x = _rand((1, 16, 16, 16, 4))
        h = x
        for i in range(3):
            p = init_conv_layer(jax.random.key(i), 4, 4, "down", style=False, vel=False)
            h = apply_conv_layer(p, h, "down")
        assert h.shape[1:4] == (2, 2, 2)
        for i in range(3):
            p = init_conv_layer(jax.random.key(10 + i), 4, 4, "up", style=False, vel=False)
            h = apply_conv_layer(p, h, "up")
        assert h.shape == x.shape

    def test_conv_chain_shrinks_linearly(self):
        x = _rand((1, 12, 12, 12, 4))
        p = init_conv_layer(KEY, 4, 4, "conv", style=False, vel=False)
        for i in range(1, 4):
            x = apply_conv_layer(p, x, "conv")
            assert x.shape[1] == 12 - 2 * i


# ---------------------------------------------------------------------------
# Tangent propagation (reference test_layers_vel.py TestTangentPropagation /
# TestDweightParameter / TestManualVsAutoAD)
# ---------------------------------------------------------------------------


class TestTangentPropagation:
    @pytest.mark.parametrize("kind", KINDS)
    def test_zero_tangent_and_zero_dweight_give_zero(self, kind):
        p = dict(init_conv_layer(KEY, 4, 4, kind, style=False, vel=True))
        p["dweight"] = jnp.zeros_like(p["dweight"])
        x = _rand((1, 8, 8, 8, 4))
        _, dy = apply_conv_layer_vel(p, x, jnp.zeros_like(x), kind)
        np.testing.assert_allclose(np.asarray(dy), 0.0, atol=1e-6)

    @pytest.mark.parametrize("kind", KINDS)
    def test_tangent_linear_in_dx(self, kind):
        p = dict(init_conv_layer(KEY, 4, 4, kind, style=False, vel=True))
        p["dweight"] = jnp.zeros_like(p["dweight"])  # isolate conv(dx, W)
        x = _rand((1, 8, 8, 8, 4))
        dx = _rand((1, 8, 8, 8, 4), jax.random.key(9))
        _, dy1 = apply_conv_layer_vel(p, x, dx, kind)
        _, dy2 = apply_conv_layer_vel(p, x, 2.0 * dx, kind)
        np.testing.assert_allclose(np.asarray(dy2), 2 * np.asarray(dy1), rtol=2e-5, atol=1e-5)

    @pytest.mark.parametrize("kind", KINDS)
    def test_fused_concat_matches_two_convs(self, kind):
        """dy = conv(concat[x,dx], concat[dW,W]) == conv(x,dW) + conv(dx,W)."""
        p = init_conv_layer(KEY, 4, 4, kind, style=False, vel=True)
        x = _rand((1, 8, 8, 8, 4))
        dx = _rand((1, 8, 8, 8, 4), jax.random.key(9))
        _, dy = apply_conv_layer_vel(p, x, dx, kind)
        pw = {"weight": p["dweight"], "bias": jnp.zeros_like(p["bias"])}
        pv = {"weight": p["weight"], "bias": jnp.zeros_like(p["bias"])}
        want = apply_conv_layer(pw, x, kind) + apply_conv_layer(pv, dx, kind)
        np.testing.assert_allclose(np.asarray(dy), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("kind", KINDS)
    def test_primal_of_vel_layer_matches_plain(self, kind):
        p = init_conv_layer(KEY, 4, 4, kind, style=False, vel=True)
        x = _rand((1, 8, 8, 8, 4))
        y, _ = apply_conv_layer_vel(p, x, jnp.zeros_like(x), kind)
        plain = {"weight": p["weight"], "bias": p["bias"]}
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(apply_conv_layer(plain, x, kind)),
            rtol=1e-6, atol=1e-6,
        )

    @pytest.mark.parametrize("kind", KINDS)
    def test_folded_tangent_matches_style_jvp(self, kind):
        """The premodulated layer tangent == jax.jvp of the styled layer
        w.r.t. Dz (style slot 1) — per kind, the layer-level version of the
        reference's TestManualVsAutoAD (``test_style_layers_vel.py``)."""
        p = init_conv_layer(jax.random.key(7), 3, 5, kind, style=True, vel=False)
        x = _rand((1, 8, 8, 8, 3), dtype=jnp.float32)
        Om, Dz = 0.3175, 0.8

        def styled(dz):
            return apply_conv_layer(p, x, kind, s=style_vector(Om, dz)[0])

        y_ref, dy_ref = jax.jvp(styled, (jnp.float32(Dz),), (jnp.float32(1.0),))
        folded = premodulate_layer(p, style_vector(Om, Dz)[0], vel=True)
        y, dy = apply_conv_layer_vel(folded, x, None, kind)
        # first_layer=False fold has no w/Dz term; dx=None means dy=conv(x,dW)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Styled-layer contracts (reference test_style_layers.py)
# ---------------------------------------------------------------------------


class TestStyledLayer:
    @pytest.mark.parametrize("kind", KINDS)
    def test_batched_styles_match_per_sample(self, kind):
        """B styled samples == per-sample single calls (the reference vmaps
        per-sample modulated kernels; this engine's channel-scaling identity
        must agree sample-by-sample)."""
        p = init_conv_layer(KEY, 4, 5, kind, style=True, vel=False)
        x = _rand((3, 8, 8, 8, 4))
        s = style_vector(jnp.array([0.25, 0.3175, 0.45]), jnp.array([0.5, 0.8, 1.0]))
        y = apply_conv_layer(p, x, kind, s=s)
        for b in range(3):
            yb = apply_conv_layer(p, x[b : b + 1], kind, s=s[b : b + 1])
            np.testing.assert_allclose(np.asarray(y[b]), np.asarray(yb[0]), rtol=2e-5, atol=2e-5)

    def test_style_sensitivity(self):
        p = init_conv_layer(KEY, 4, 5, "conv", style=True, vel=False)
        x = _rand((1, 8, 8, 8, 4))
        y1 = apply_conv_layer(p, x, "conv", s=style_vector(0.3175, 0.8))
        y2 = apply_conv_layer(p, x, "conv", s=style_vector(0.3175, 1.0))
        assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-4

    @pytest.mark.parametrize("kind", KINDS)
    def test_styled_equals_explicit_modulated_weight(self, kind):
        """Channel-scaling identity == materialized demodulated kernel."""
        from jax_nbody_emulator_with_dj_tpu.ops.style import modulated_style_weight

        p = init_conv_layer(KEY, 4, 5, kind, style=True, vel=False)
        x = _rand((1, 8, 8, 8, 4))
        s = style_vector(0.3175, 0.8)
        y = apply_conv_layer(p, x, kind, s=s)
        w_exp = modulated_style_weight(p, s)[0]
        y_exp = apply_conv_layer({"weight": w_exp, "bias": p["bias"]}, x, kind)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_exp), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Mixed memory formats (this engine's boundary-layer contract)
# ---------------------------------------------------------------------------


class TestMixedFormats:
    @pytest.mark.parametrize("kind", ("conv", "skip"))
    @pytest.mark.parametrize("in_fmt,out_fmt", [
        ("NCDHW", "NDHWC"), ("NDHWC", "NCDHW"), ("NCDHW", "NCDHW"),
    ])
    def test_format_permutations_agree(self, kind, in_fmt, out_fmt):
        p = init_conv_layer(KEY, 4, 5, kind, style=False, vel=False)
        x = _rand((1, 8, 8, 8, 4))
        base = apply_conv_layer(p, x, kind)  # NDHWC -> NDHWC
        xin = jnp.transpose(x, (0, 4, 1, 2, 3)) if in_fmt == "NCDHW" else x
        y = apply_conv_layer(p, xin, kind, in_fmt=in_fmt, out_fmt=out_fmt)
        if out_fmt == "NCDHW":
            y = jnp.transpose(y, (0, 2, 3, 4, 1))
        np.testing.assert_allclose(np.asarray(y), np.asarray(base), rtol=2e-5, atol=2e-5)

    def test_vel_format_permutation(self):
        p = init_conv_layer(KEY, 4, 4, "conv", style=False, vel=True)
        x = _rand((1, 8, 8, 8, 4))
        dx = _rand((1, 8, 8, 8, 4), jax.random.key(2))
        y, dy = apply_conv_layer_vel(p, x, dx, "conv")
        yt, dyt = apply_conv_layer_vel(
            p,
            jnp.transpose(x, (0, 4, 1, 2, 3)),
            jnp.transpose(dx, (0, 4, 1, 2, 3)),
            "conv",
            in_fmt="NCDHW",
            out_fmt="NCDHW",
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(yt, (0, 2, 3, 4, 1))), np.asarray(y), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(dyt, (0, 2, 3, 4, 1))), np.asarray(dy), rtol=2e-5, atol=2e-5
        )
