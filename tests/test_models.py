"""Model-level contract tests: shapes, variant cross-consistency, velocity.

Small configs (levels=1, mid_chan=4, 32^3 inputs) keep CPU runtime modest;
the shape algebra guarantees the same code path as the canonical
levels=3 / 128^3 configuration, which is exercised in the parity tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.models import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
    input_margin,
    min_input_size,
    output_size,
    valid_input_size,
)
from jax_nbody_emulator_with_dj_tpu.emulator import (
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)

KEY = jax.random.key(0)
CFG = dict(levels=1, mid_chan=4)
N = 32  # min valid input for levels=1 (margin 12 -> 8^3 output)


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(KEY, (2, 3, N, N, N), jnp.float32)


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorCore(**CFG).init(KEY)


class TestShapeAlgebra:
    def test_canonical_128_to_32(self):
        assert output_size(128, 3) == 32
        assert input_margin(3) == 48

    def test_margins(self):
        assert input_margin(1) == 12
        assert input_margin(2) == 24

    def test_min_sizes_valid(self):
        for lv in (1, 2, 3):
            n = min_input_size(lv)
            assert valid_input_size(n, lv)
            assert output_size(n, lv) == n - 2 * input_margin(lv)

    def test_invalid_sizes_rejected(self):
        assert not valid_input_size(100, 3)  # odd at a down
        assert not valid_input_size(96, 3)  # too small
        with pytest.raises(ValueError):
            output_size(33, 1)

    def test_all_valid_sizes_are_margin_consistent(self):
        for n in range(104, 200, 8):
            if valid_input_size(n, 3):
                assert output_size(n, 3) == n - 96


class TestModelShapes:
    def test_style_disp(self, x, style_params):
        m = StyleNBodyEmulatorCore(**CFG)
        y = m.apply(style_params, x, jnp.array([0.3, 0.32]), jnp.array([0.8, 1.0]))
        assert y.shape == (2, 3, 8, 8, 8)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_style_vel(self, x, style_params):
        m = StyleNBodyEmulatorVelCore(**CFG)
        d, v = m.apply(
            style_params, x, jnp.array([0.3, 0.32]), jnp.array([0.8, 1.0]),
            jnp.array([50.0, 52.0]),
        )
        assert d.shape == v.shape == (2, 3, 8, 8, 8)

    def test_premod_disp(self, x):
        m = NBodyEmulatorCore(**CFG)
        p = m.init(KEY)
        y = m.apply(p, x, jnp.array([0.8, 1.0]))
        assert y.shape == (2, 3, 8, 8, 8)

    def test_premod_vel(self, x):
        m = NBodyEmulatorVelCore(**CFG)
        p = m.init(KEY)
        d, v = m.apply(p, x, jnp.array([0.8, 1.0]), jnp.array([50.0, 52.0]))
        assert d.shape == v.shape == (2, 3, 8, 8, 8)

    def test_unbatched_input(self, x, style_params):
        m = StyleNBodyEmulatorCore(**CFG)
        y_b = m.apply(style_params, x[:1], 0.3, 0.8)
        y_u = m.apply(style_params, x[0], 0.3, 0.8)
        assert y_u.shape == (3, 8, 8, 8)
        np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_b[0]), rtol=1e-5)

    def test_jit_stable(self, x, style_params):
        m = StyleNBodyEmulatorCore(**CFG)
        f = jax.jit(m.apply)
        y1 = f(style_params, x, jnp.array([0.3, 0.3]), jnp.array([0.8, 0.8]))
        y2 = m.apply(style_params, x, jnp.array([0.3, 0.3]), jnp.array([0.8, 0.8]))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)

    def test_param_tree_structure(self, style_params):
        blocks = set(style_params["params"].keys())
        assert blocks == {
            "conv_l00", "conv_l01", "down_l0", "conv_c", "up_r0", "conv_r00", "conv_r01",
        }
        assert set(style_params["params"]["conv_l00"].keys()) == {"skip", "conv_0", "conv_1"}
        layer = style_params["params"]["conv_l00"]["conv_0"]
        assert layer["weight"].shape == (3, 3, 3, 3, 4)  # DHWIO
        assert layer["style_weight"].shape == (3, 2)

    def test_growth_factor_sensitivity(self, x, style_params):
        m = StyleNBodyEmulatorCore(**CFG)
        y1 = m.apply(style_params, x, 0.3, 0.5)
        y2 = m.apply(style_params, x, 0.3, 1.0)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    @pytest.mark.slow
    def test_bf16_path(self, x, style_params):
        m = StyleNBodyEmulatorCore(**CFG)
        y = m.apply(style_params, x.astype(jnp.bfloat16), 0.3, 0.8)
        assert y.dtype == jnp.bfloat16
        y32 = m.apply(style_params, x, 0.3, 0.8)
        # bf16 has ~3 decimal digits
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(y32), rtol=0.15, atol=0.15
        )


class TestVariantConsistency:
    """The four variants must agree where they overlap."""

    def test_style_vel_disp_equals_style_disp(self, x, style_params):
        d1 = StyleNBodyEmulatorCore(**CFG).apply(style_params, x, 0.3, 0.8)
        d2, _ = StyleNBodyEmulatorVelCore(**CFG).apply(style_params, x, 0.3, 0.8, 50.0)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-5)

    def test_premod_equals_style_at_fold_point(self, x, style_params):
        """Premodulation is an exact fold: outputs must match the style model."""
        z, om = 0.5, 0.3175
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor

        dz = growth_factor(z, om)
        d_style = StyleNBodyEmulatorCore(**CFG).apply(style_params, x, om, dz)
        folded = modulate_emulator_parameters(style_params, z, om)
        d_premod = NBodyEmulatorCore(**CFG).apply(folded, x, dz)
        np.testing.assert_allclose(
            np.asarray(d_style), np.asarray(d_premod), rtol=1e-4, atol=1e-5
        )

    def test_premod_vel_equals_style_vel_at_fold_point(self, x, style_params):
        """The analytic dweight fold must reproduce the style model's JVP."""
        z, om = 0.5, 0.3175
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

        dz = growth_factor(z, om)
        vf = vel_norm(z, om)
        d_s, v_s = StyleNBodyEmulatorVelCore(**CFG).apply(style_params, x, om, dz, vf)
        folded = modulate_emulator_parameters_vel(style_params, z, om)
        d_p, v_p = NBodyEmulatorVelCore(**CFG).apply(folded, x, dz, vf)
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_p), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_p), rtol=2e-3, atol=0.3)

    def test_velocity_matches_finite_difference(self, x, style_params):
        """velocity ~ vel_fac * d(disp)/dDz (reference bar: correlation > 0.9)."""
        m = StyleNBodyEmulatorVelCore(**CFG)
        md = StyleNBodyEmulatorCore(**CFG)
        _, v = m.apply(style_params, x, 0.3, 0.8, 50.0)
        e = 1e-2
        da = md.apply(style_params, x, 0.3, 0.8 + e)
        db = md.apply(style_params, x, 0.3, 0.8 - e)
        fd = 50.0 * (np.asarray(da) - np.asarray(db)) / (2 * e)
        corr = np.corrcoef(np.asarray(v).ravel(), fd.ravel())[0, 1]
        assert corr > 0.95


class TestBatchedCosmologySweep:
    """A batched multi-cosmology forward (BASELINE config 5): per-sample
    (z, Om) styles through one call must match per-sample single calls."""

    def test_batched_styles_match_single(self, x, style_params):
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor

        model = StyleNBodyEmulatorCore(**CFG)
        zs = np.array([0.0, 1.0], np.float32)
        oms = np.array([0.2, 0.4], np.float32)
        Dz = growth_factor(zs, oms)
        out_b = model.apply(style_params, x, jnp.asarray(oms), Dz)
        assert out_b.shape[0] == 2
        for i in range(2):
            out_i = model.apply(
                style_params, x[i : i + 1],
                jnp.atleast_1d(oms[i]), jnp.atleast_1d(Dz[i]),
            )
            np.testing.assert_allclose(out_b[i], out_i[0], rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_batched_styles_match_single_vel(self, x, style_params):
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

        model = StyleNBodyEmulatorVelCore(**CFG)
        zs = np.array([0.5, 2.0], np.float32)
        oms = np.array([0.25, 0.35], np.float32)
        Dz = growth_factor(zs, oms)
        vf = vel_norm(zs, oms)
        d_b, v_b = model.apply(style_params, x, jnp.asarray(oms), Dz, vf)
        for i in range(2):
            d_i, v_i = model.apply(
                style_params, x[i : i + 1],
                jnp.atleast_1d(oms[i]), jnp.atleast_1d(Dz[i]), jnp.atleast_1d(vf[i]),
            )
            np.testing.assert_allclose(d_b[i], d_i[0], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(v_b[i], v_i[0], rtol=1e-5, atol=2e-5)


class TestAutodiff:
    """Differentiability contracts (reference TestJAXCompatibility classes:
    gradient flow through blocks/models, e.g. test_blocks.py:481-571).

    The engine is inference-first but every forward is a pure function of
    the parameter pytree, so reverse-mode AD must flow — this is what makes
    the package trainable/fine-tunable downstream.
    """

    def test_grad_wrt_params_finite_and_nonzero(self, x, style_params):
        model = StyleNBodyEmulatorCore(**CFG)

        def loss(p):
            y = model.apply(p, x[:1], 0.3, 1.2)
            return jnp.mean(y * y)

        grads = jax.grad(loss)(style_params)
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0.0

    def test_grad_wrt_input(self, x, style_params):
        model = StyleNBodyEmulatorCore(**CFG)

        def loss(xi):
            y = model.apply(style_params, xi, 0.3, 1.2)
            return jnp.mean(y * y)

        g = jax.grad(loss)(x[:1])
        assert g.shape == x[:1].shape
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0.0

    def test_grad_through_style_vector(self, x, style_params):
        """d(output)/d(Om) through the modulation path is finite & nonzero."""
        model = StyleNBodyEmulatorCore(**CFG)

        def loss(om):
            y = model.apply(style_params, x[:1], om, 1.2)
            return jnp.mean(y * y)

        g = jax.grad(loss)(jnp.float32(0.3))
        assert np.isfinite(float(g)) and abs(float(g)) > 0.0

    def test_vjp_jvp_consistency(self, x, style_params):
        """<J v, u> == <v, J^T u> on the full model forward."""
        model = StyleNBodyEmulatorCore(**CFG)
        f = lambda xi: model.apply(style_params, xi, 0.3, 1.2)
        x0 = x[:1]
        v = jax.random.normal(jax.random.key(5), x0.shape)
        y, jv = jax.jvp(f, (x0,), (v,))
        u = jax.random.normal(jax.random.key(6), y.shape)
        _, vjp = jax.vjp(f, x0)
        (jtu,) = vjp(u)
        lhs = float(jnp.vdot(jv, u))
        rhs = float(jnp.vdot(v, jtu))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_grad_through_vel_model(self, x, style_params):
        """Reverse-mode over the manual-JVP velocity path (grad of jvp)."""
        model = StyleNBodyEmulatorVelCore(**CFG)

        def loss(p):
            d, v = model.apply(p, x[:1], 0.3, 1.2, 0.7)
            return jnp.mean(d * d) + jnp.mean(v * v)

        grads = jax.grad(loss)(style_params)
        assert all(
            np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
        )


class TestResidualPhysics:
    """Zero-weight network == linear-theory passthrough.

    With every conv weight (and tangent kernel) zeroed the U-Net contributes
    nothing and the heads reduce to their closed forms (reference
    style_nbody_emulator_vel_core.py:187-193):

        disp = x_crop * Dz          (input scaled by Dz/6, head *6)
        vel  = x_crop * vel_fac     (dx == 0; x0 * vel_fac*6/Dz term)

    This pins the residual wiring, the Dz/6 input normalization, and the
    velocity-head formula independently of any learned behavior.
    """

    def _zero(self, tree):
        return jax.tree.map(jnp.zeros_like, tree)

    def test_premod_disp_reduces_to_residual(self, x):
        model = NBodyEmulatorCore(**CFG)
        params = self._zero(model.init(KEY))
        Dz = 0.73
        y = model.apply(params, x[:1], Dz)
        m = input_margin(CFG["levels"])
        expect = np.asarray(x[:1, :, m:-m, m:-m, m:-m]) * Dz
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-6)

    def test_premod_vel_reduces_to_linear_velocity(self, x):
        model = NBodyEmulatorVelCore(**CFG)
        params = self._zero(model.init(KEY))
        Dz, vel_fac = 0.73, 0.41
        d, v = model.apply(params, x[:1], Dz, vel_fac)
        m = input_margin(CFG["levels"])
        crop = np.asarray(x[:1, :, m:-m, m:-m, m:-m])
        np.testing.assert_allclose(np.asarray(d), crop * Dz, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), crop * vel_fac, rtol=1e-5, atol=1e-6)

    def test_style_disp_reduces_to_residual(self, x, style_params):
        model = StyleNBodyEmulatorCore(**CFG)
        params = self._zero(style_params)
        Dz = 1.1
        y = model.apply(params, x[:1], 0.3, Dz)
        m = input_margin(CFG["levels"])
        expect = np.asarray(x[:1, :, m:-m, m:-m, m:-m]) * Dz
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-6)

    def test_style_vel_reduces_to_linear_velocity(self, x):
        model = StyleNBodyEmulatorVelCore(**CFG)
        params = self._zero(model.init(KEY))
        Dz, vel_fac = 1.1, 0.52
        d, v = model.apply(params, x[:1], 0.3, Dz, vel_fac)
        m = input_margin(CFG["levels"])
        crop = np.asarray(x[:1, :, m:-m, m:-m, m:-m])
        np.testing.assert_allclose(np.asarray(d), crop * Dz, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v), crop * vel_fac, rtol=1e-5, atol=1e-6)
