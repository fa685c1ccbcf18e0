"""Physics-contract tests for the cosmology module.

Mirrors the reference test strategy (reference tests/test_cosmology.py):
D(0)=1, monotonicity, Einstein-de-Sitter limit, finite-difference
cross-checks of the analytic derivatives, high-z growth-rate asymptote,
continuity of the hypergeometric branch switch, and jit/vmap/batch smoke.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.cosmology import (
    acc_norm,
    dlogD_dz,
    dlogH_dloga,
    dlogH_dz,
    growth_factor,
    growth_rate,
    hubble_rate,
    vel_norm,
)


class TestGrowthFactor:
    def test_normalized_at_z0(self):
        for om in [0.1, 0.25, 0.3, 0.3175, 0.5, 0.9]:
            assert np.isclose(float(growth_factor(0.0, om)), 1.0, atol=1e-5)

    @pytest.mark.slow
    def test_monotonically_decreasing_in_z(self):
        z = jnp.linspace(0.0, 10.0, 64)
        d = np.asarray(growth_factor(z, 0.3))
        assert np.all(np.diff(d) < 0)

    @pytest.mark.slow
    def test_einstein_de_sitter_limit(self):
        # Om -> 1: D(z) = 1 / (1 + z)
        z = jnp.array([0.0, 0.5, 1.0, 3.0, 9.0])
        d = np.asarray(growth_factor(z, 0.99999))
        np.testing.assert_allclose(d, 1.0 / (1.0 + np.asarray(z)), rtol=1e-4)

    def test_high_z_matter_domination(self):
        # At high z, LCDM growth approaches a/const: D(z1)/D(z2) ~ (1+z2)/(1+z1)
        d1 = float(growth_factor(50.0, 0.3))
        d2 = float(growth_factor(100.0, 0.3))
        assert np.isclose(d1 / d2, 101.0 / 51.0, rtol=1e-3)

    @pytest.mark.slow
    def test_batched_matches_scalar(self):
        z = jnp.array([0.0, 0.5, 1.0, 2.0])
        om = jnp.array([0.2, 0.3, 0.4, 0.3175])
        batched = np.asarray(growth_factor(z, om))
        scalar = np.array([float(growth_factor(zi, oi)) for zi, oi in zip(z, om)])
        np.testing.assert_allclose(batched, scalar, rtol=1e-6)

    @pytest.mark.slow
    def test_vmap(self):
        z = jnp.linspace(0.0, 3.0, 8)
        out = jax.vmap(lambda zz: growth_factor(zz, 0.3))(z)
        np.testing.assert_allclose(np.asarray(out), np.asarray(growth_factor(z, 0.3)), rtol=1e-6)

    @pytest.mark.slow
    def test_shape_preserved(self):
        z = jnp.zeros((2, 3))
        assert growth_factor(z, 0.3).shape == (2, 3)

    @pytest.mark.slow
    def test_branch_continuity_near_x0(self):
        # Om -> 1 puts the hypergeometric argument near 0; check continuity.
        oms = jnp.array([0.999, 0.9999, 0.99999])
        d = np.asarray(growth_factor(1.0, oms))
        assert np.all(np.isfinite(d))
        assert np.all(np.abs(np.diff(d)) < 1e-3)


class TestHubbleRate:
    def test_z0_value(self):
        assert np.isclose(float(hubble_rate(0.0, 0.3)), 100.0, rtol=1e-6)

    def test_eds_scaling(self):
        h = float(hubble_rate(3.0, 1.0))
        assert np.isclose(h, 100.0 * 4.0**1.5, rtol=1e-6)

    def test_monotonic(self):
        z = jnp.linspace(0.0, 10.0, 32)
        h = np.asarray(hubble_rate(z, 0.3))
        assert np.all(np.diff(h) > 0)


class TestDerivatives:
    @pytest.mark.parametrize("om", [0.25, 0.3, 0.4])
    @pytest.mark.slow
    def test_dlogD_dz_matches_finite_difference(self, om):
        z = np.array([0.1, 0.5, 1.0, 2.0], dtype=np.float32)
        eps = 1e-3
        fd = (
            np.log(np.asarray(growth_factor(z + eps, om)))
            - np.log(np.asarray(growth_factor(z - eps, om)))
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dlogD_dz(z, om)), fd, rtol=1e-3)

    def test_dlogH_dz_matches_finite_difference(self):
        z = np.array([0.0, 0.5, 1.0, 3.0], dtype=np.float32)
        eps = 1e-3
        fd = (
            np.log(np.asarray(hubble_rate(z + eps, 0.3)))
            - np.log(np.asarray(hubble_rate(z - eps, 0.3)))
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dlogH_dz(z, 0.3)), fd, rtol=1e-3, atol=1e-5)

    @pytest.mark.slow
    def test_growth_rate_eds_limit(self):
        # Om -> 1: f = 1 exactly.
        f = np.asarray(growth_rate(jnp.array([0.0, 1.0, 5.0]), 0.99999))
        np.testing.assert_allclose(f, 1.0, atol=1e-3)

    def test_growth_rate_high_z_asymptote(self):
        # f(z) ~ Om(z)^0.55 at moderate z.
        z = 3.0
        om = 0.3
        om_z = om * (1 + z) ** 3 / (om * (1 + z) ** 3 + 1 - om)
        assert np.isclose(float(growth_rate(z, om)), om_z**0.55, rtol=2e-2)

    def test_dlogH_dloga_eds(self):
        # EdS: H ~ a^{-3/2} -> dlogH/dloga = -3/2
        v = float(dlogH_dloga(1.0, 0.99999))
        assert np.isclose(v, -1.5, rtol=1e-3)


class TestNormalizations:
    def test_vel_norm_composition(self):
        z, om = 0.5, 0.3
        expected = (
            float(growth_factor(z, om))
            * float(growth_rate(z, om))
            * float(hubble_rate(z, om))
            / (1 + z)
        )
        assert np.isclose(float(vel_norm(z, om)), expected, rtol=1e-5)

    def test_acc_norm_composition(self):
        z, om = 0.5, 0.3
        expected = (
            float(growth_factor(z, om))
            * float(growth_rate(z, om))
            * float(hubble_rate(z, om)) ** 2
            * float(dlogH_dloga(z, om))
            / (1 + z)
        )
        assert np.isclose(float(acc_norm(z, om)), expected, rtol=1e-5)

    @pytest.mark.slow
    def test_vel_norm_positive(self):
        z = jnp.linspace(0.0, 3.0, 16)
        assert np.all(np.asarray(vel_norm(z, 0.3)) > 0)

    @pytest.mark.slow
    def test_batched(self):
        z = jnp.array([0.0, 0.5, 1.0])
        om = jnp.array([0.3, 0.3, 0.3])
        assert vel_norm(z, om).shape == (3,)
        assert acc_norm(z, om).shape == (3,)


class TestTransforms:
    def test_jit_and_grad_through_growth(self):
        g = jax.grad(lambda zz: growth_factor(zz, 0.3).sum())(jnp.array([0.5]))
        assert np.isfinite(float(g[0]))
        # d D / dz < 0
        assert float(g[0]) < 0

    def test_jvp_through_growth(self):
        _, tangent = jax.jvp(
            lambda zz: growth_factor(zz, 0.3), (jnp.array(0.5),), (jnp.array(1.0),)
        )
        fd = (float(growth_factor(0.501, 0.3)) - float(growth_factor(0.499, 0.3))) / 0.002
        assert np.isclose(float(tangent), fd, rtol=1e-3)

    @pytest.mark.slow
    def test_all_finite_over_grid(self):
        z = jnp.linspace(0.0, 10.0, 11)[:, None]
        om = jnp.linspace(0.1, 0.9, 9)[None, :]
        for fn in (growth_factor, hubble_rate, growth_rate, vel_norm, acc_norm):
            out = np.asarray(fn(z, om))
            assert out.shape == (11, 9)
            assert np.all(np.isfinite(out)), fn.__name__


class TestGrowthDApprox:
    """CPT-fit compatibility helper (reference utils.py:86-96)."""

    def test_matches_reference_formula(self):
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_d_approx

        def ref(om0_m, z):
            om0_l = 1.0 - om0_m
            zp1 = 1.0 + z
            e2 = om0_l + om0_m * zp1**3
            om_m = om0_m * zp1**3 / e2
            om_l = om0_l / e2
            return (1.0 / zp1) * (2.5 * om_m) / (
                om_m ** (4.0 / 7.0) - om_l + (1.0 + om_m / 2.0) * (1.0 + om_l / 70.0)
            )

        for om in (0.1, 0.3175, 0.5):
            for z in (0.0, 0.5, 2.0, 127.0):
                np.testing.assert_allclose(
                    float(growth_d_approx(om, z)), ref(om, z), rtol=1e-6
                )

    def test_ratio_close_to_exact_growth(self):
        """The fit's z=127 -> z=0 rescale ratio is within ~0.2% of exact D."""
        from jax_nbody_emulator_with_dj_tpu.cosmology import (
            growth_d_approx,
            growth_factor,
        )

        om = 0.3175
        r_fit = float(growth_d_approx(om, 127.0) / growth_d_approx(om, 0.0))
        r_exact = float(growth_factor(127.0, om) / growth_factor(0.0, om))
        assert abs(r_fit / r_exact - 1.0) < 2e-3

    def test_eds_limit(self):
        """Om -> 1: growth is exactly a = 1/(1+z)."""
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_d_approx

        for z in (0.0, 1.0, 9.0):
            np.testing.assert_allclose(
                float(growth_d_approx(1.0, z)), 1.0 / (1.0 + z), rtol=1e-6
            )
