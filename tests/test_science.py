"""Science-layer tests: P(k) estimator, GRF, LPT, MAS, Minkowski, resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.science import (
    deconvolve_mas,
    deposit,
    downsample_average,
    eisenstein_hu_pk,
    gaussian_random_field,
    minkowski_functionals,
    normalize_sigma8,
    power_spectrum,
    cross_power,
    reduced_bispectrum,
    sigma_r,
    summary_metrics,
    transfer_and_correlation,
    upsample_modes,
    zeldovich_displacement,
    displacement_to_density,
)
from jax_nbody_emulator_with_dj_tpu.science.mas import deposit_displacement

KEY = jax.random.key(7)
N = 64
L = 256.0  # Mpc/h


@pytest.fixture(scope="module")
def pk_table():
    k = jnp.logspace(-3, 1.5, 256)
    return k, eisenstein_hu_pk(k)


@pytest.fixture(scope="module")
def grf(pk_table):
    k, p = pk_table
    return gaussian_random_field(KEY, N, L, k, p)


class TestLinearPk:
    def test_sigma8_normalization(self, pk_table):
        k, p = pk_table
        assert np.isclose(sigma_r(k, p, 8.0), 0.834, rtol=1e-2)

    def test_positive_and_finite(self, pk_table):
        k, p = pk_table
        p = np.asarray(p)
        assert np.all(p > 0) and np.all(np.isfinite(p))

    def test_turnover(self, pk_table):
        # P(k) rises at low k, falls at high k
        k, p = pk_table
        k, p = np.asarray(k), np.asarray(p)
        ipk = np.argmax(p)
        kpk = k[ipk]
        assert 0.005 < kpk < 0.05  # matter-radiation equality scale

    def test_normalize_sigma8_util(self, pk_table):
        k, p = pk_table
        p2 = normalize_sigma8(k, p, 1.0)
        assert np.isclose(sigma_r(k, p2, 8.0), 1.0, rtol=1e-5)

    def test_sigma_decreasing_in_r(self, pk_table):
        k, p = pk_table
        sig = [sigma_r(k, p, r) for r in (2.0, 8.0, 32.0)]
        assert sig[0] > sig[1] > sig[2]


class TestPowerSpectrum:
    def test_grf_recovers_input_pk(self, grf, pk_table):
        k_t, p_t = pk_table
        k, pk, counts = power_spectrum(grf, L)
        k, pk, counts = np.asarray(k), np.asarray(pk), np.asarray(counts)
        p_expected = np.interp(k, np.asarray(k_t), np.asarray(p_t))
        # Compare in well-sampled shells, away from Nyquist.
        sel = (counts > 200) & (k < 0.7 * np.pi * N / L)
        ratio = pk[sel] / p_expected[sel]
        # cosmic-variance-weighted agreement
        assert np.abs(np.mean(ratio) - 1.0) < 0.1
        assert np.all(np.abs(ratio - 1.0) < 0.5)

    def test_parseval(self, grf):
        # sum of P over binned modes == variance of the sphere-filtered field
        # (shells stop at k_nyq; corner modes are excluded by convention)
        k, pk, counts = power_spectrum(grf, L, nbins=N // 2)
        var_pk = float(jnp.sum(jnp.asarray(pk) * jnp.asarray(counts))) / L**3
        kf = 2 * np.pi / L
        kmax = kf / 2 + kf * (N // 2)  # top bin edge
        dk = np.fft.rfftn(np.asarray(grf))
        fx = np.fft.fftfreq(N, 1 / N) * kf
        fz = np.fft.rfftfreq(N, 1 / N) * kf
        km = np.sqrt(fx[:, None, None] ** 2 + fx[None, :, None] ** 2 + fz[None, None, :] ** 2)
        dk[(km < kf / 2) | (km >= kmax)] = 0
        filtered = np.fft.irfftn(dk, s=(N, N, N), axes=(0, 1, 2))
        assert np.isclose(var_pk, filtered.var(), rtol=0.02)

    def test_cross_power_self_is_auto(self, grf):
        k1, p_auto, _ = power_spectrum(grf, L)
        k2, p_cross, _ = cross_power(grf, grf, L)
        np.testing.assert_allclose(np.asarray(p_cross), np.asarray(p_auto), rtol=1e-4)

    def test_transfer_identity(self, grf):
        k, t, c = transfer_and_correlation(grf, grf, L)
        np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(c), 1.0, rtol=1e-4)

    def test_summary_metrics_dict(self, grf):
        m = summary_metrics(grf, grf, L)
        assert m["pearson_r"] > 0.999999
        assert m["rmse"] < 1e-6
        assert abs(m["median_abs_T_minus_1"]) < 1e-4

    def test_uncorrelated_fields(self, pk_table):
        k, p = pk_table
        g1 = gaussian_random_field(jax.random.key(1), 32, L, k, p)
        g2 = gaussian_random_field(jax.random.key(2), 32, L, k, p)
        _, _, c = transfer_and_correlation(g1, g2, L)
        assert np.abs(np.asarray(c)).mean() < 0.2


class TestGRF:
    def test_zero_mean(self, grf):
        assert abs(float(jnp.mean(grf))) < 1e-4 * float(jnp.std(grf))

    def test_deterministic_in_key(self, pk_table):
        k, p = pk_table
        a = gaussian_random_field(jax.random.key(3), 32, L, k, p)
        b = gaussian_random_field(jax.random.key(3), 32, L, k, p)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLPT:
    def test_plane_wave_analytic(self):
        """delta = A cos(k x) -> psi_x = -(A/k) sin(k x) (delta = -div psi)."""
        n, box = 32, 100.0
        kf = 2 * np.pi / box
        m = 3  # mode number
        x = (np.arange(n) + 0.0) * box / n
        amp = 0.01
        delta = amp * np.cos(m * kf * x)[:, None, None] * np.ones((1, n, n))
        psi = np.asarray(zeldovich_displacement(jnp.asarray(delta), box))
        expected = -(amp / (m * kf)) * np.sin(m * kf * x)
        np.testing.assert_allclose(psi[0, :, 0, 0], expected, atol=1e-5)
        assert np.abs(psi[1]).max() < 1e-6
        assert np.abs(psi[2]).max() < 1e-6

    def test_zero_displacement_uniform_density(self):
        psi = jnp.zeros((3, 16, 16, 16))
        delta = np.asarray(displacement_to_density(psi, 100.0, worder=2))
        np.testing.assert_allclose(delta, 0.0, atol=1e-5)

    def test_linear_regime_density_matches_input(self, pk_table):
        """For small displacements, deposit(q+psi) ~ linear delta mode-by-mode
        well below the mesh Nyquist (near-Nyquist modes suffer MAS aliasing)."""
        k, p = pk_table
        delta_lin = gaussian_random_field(jax.random.key(4), 32, 1000.0, k, p)
        delta_lin = delta_lin * (0.05 / float(jnp.std(delta_lin)))
        psi = zeldovich_displacement(delta_lin, 1000.0)
        delta_nl = displacement_to_density(psi, 1000.0, worder=2)
        kk, t, c = transfer_and_correlation(delta_nl, delta_lin, 1000.0)
        kk, t, c = np.asarray(kk), np.asarray(t), np.asarray(c)
        knyq = np.pi * 32 / 1000.0
        sel = kk < 0.5 * knyq
        assert np.all(c[sel] > 0.95)
        assert np.all(np.abs(t[sel] - 1.0) < 0.1)


class TestMAS:
    @pytest.mark.parametrize("worder", [1, 2, 3, 4])
    def test_mass_conservation(self, worder):
        pos = jax.random.uniform(KEY, (1000, 3)) * 16.0
        rho = deposit(pos, 16, worder)
        assert np.isclose(float(jnp.sum(rho)), 16**3, rtol=1e-5)

    @pytest.mark.parametrize("worder", [2, 3, 4])
    def test_uniform_grid_is_flat(self, worder):
        n = 8
        g = (jnp.arange(n) + 0.5)
        x, y, z = jnp.meshgrid(g, g, g, indexing="ij")
        pos = jnp.stack([x.ravel(), y.ravel(), z.ravel()], -1)
        rho = deposit(pos, n, worder)
        np.testing.assert_allclose(np.asarray(rho), 1.0, atol=1e-5)

    def test_cic_two_cell_split(self):
        # particle halfway between cells splits its mass
        pos = jnp.array([[0.5, 0.5, 0.5]])  # base cell 0, frac .5
        rho = deposit(pos, 4, 2)
        r = np.asarray(rho) * (1 / 4**3)  # undo mean normalization
        assert np.isclose(r[0, 0, 0], 0.125, rtol=1e-5)
        assert np.isclose(r[1, 1, 1], 0.125, rtol=1e-5)

    def test_periodic_wrap(self):
        pos = jnp.array([[15.9, 0.1, 0.1]])
        rho = np.asarray(deposit(pos, 16, 2))
        assert rho.sum() > 0
        # weight spills across the 15->0 boundary
        assert rho[0, 0, 0] > 0 and rho[15, 0, 0] > 0

    def test_deconvolve_boosts_high_k(self, grf):
        dec = deconvolve_mas(grf, 2)
        k, p0, _ = power_spectrum(grf, L)
        _, p1, _ = power_spectrum(dec, L)
        p0, p1 = np.asarray(p0), np.asarray(p1)
        assert p1[-2] > p0[-2]  # high-k boosted
        assert np.isclose(p1[1], p0[1], rtol=0.02)  # low-k untouched

    def test_deposit_displacement_shape(self):
        psi = jnp.zeros((3, 8, 8, 8))
        rho = deposit_displacement(psi, 100.0, nmesh=16, worder=2)
        assert rho.shape == (16, 16, 16)


class TestMinkowski:
    def test_volume_fraction(self, grf):
        mf = np.asarray(minkowski_functionals(grf, jnp.array([0.0])))
        frac = float((np.asarray(grf) > 0).mean())
        assert np.isclose(mf[0, 0], frac, atol=1e-6)

    def test_single_cube_euler(self):
        f = np.zeros((8, 8, 8), np.float32)
        f[4, 4, 4] = 1.0
        mf = np.asarray(minkowski_functionals(f, jnp.array([0.5])))
        assert np.isclose(mf[0, 3] * 8**3, 1.0)  # Euler characteristic 1

    def test_two_cubes_euler(self):
        f = np.zeros((8, 8, 8), np.float32)
        f[1, 1, 1] = 1.0
        f[5, 5, 5] = 1.0
        mf = np.asarray(minkowski_functionals(f, jnp.array([0.5])))
        assert np.isclose(mf[0, 3] * 8**3, 2.0)

    def test_full_box(self):
        f = np.ones((8, 8, 8), np.float32)
        mf = np.asarray(minkowski_functionals(f, jnp.array([0.5])))
        assert np.isclose(mf[0, 0], 1.0)  # full volume
        assert np.isclose(mf[0, 1], 0.0, atol=1e-6)  # no surface (periodic)
        assert np.isclose(mf[0, 3] * 8**3, 0.0)  # torus Euler = 0

    def test_monotone_v0(self, grf):
        ts = jnp.array([-2.0, 0.0, 2.0]) * float(jnp.std(grf))
        mf = np.asarray(minkowski_functionals(grf, ts))
        assert mf[0, 0] > mf[1, 0] > mf[2, 0]


class TestResize:
    def test_upsample_preserves_low_k(self, pk_table):
        k, p = pk_table
        coarse = gaussian_random_field(jax.random.key(5), 16, L, k, p)
        fine = upsample_modes(coarse, 32, L, k, p, key=jax.random.key(6))
        assert fine.shape == (32, 32, 32)
        # block-averaging back stays correlated with the coarse field (the
        # injected high-k modes dilute but cannot erase the shared low-k).
        back = downsample_average(fine, 16)
        r = np.corrcoef(np.asarray(back).ravel(), np.asarray(coarse).ravel())[0, 1]
        assert r > 0.5

    def test_upsample_exact_low_modes(self, pk_table):
        k, p = pk_table
        coarse = gaussian_random_field(jax.random.key(5), 16, L, k, p)
        fine = upsample_modes(coarse, 32, L, k, p, key=jax.random.key(6))
        dk_c = np.fft.rfftn(np.asarray(coarse)) * (32 / 16) ** 3
        dk_f = np.fft.rfftn(np.asarray(fine))
        # mode (1,1,1) is inside the coarse Nyquist sphere
        np.testing.assert_allclose(dk_f[1, 1, 1], dk_c[1, 1, 1], rtol=1e-4)
        np.testing.assert_allclose(dk_f[2, 0, 1], dk_c[2, 0, 1], rtol=1e-4)

    def test_upsample_spectrum_continuous(self, pk_table):
        k, p = pk_table
        coarse = gaussian_random_field(jax.random.key(5), 32, L, k, p)
        fine = upsample_modes(coarse, 64, L, k, p, key=jax.random.key(6))
        kk, pk, counts = power_spectrum(fine, L)
        kk, pk = np.asarray(kk), np.asarray(pk)
        p_exp = np.interp(kk, np.asarray(k), np.asarray(p))
        sel = np.asarray(counts) > 300
        assert np.abs(pk[sel] / p_exp[sel] - 1).mean() < 0.2

    def test_downsample_constant(self):
        f = jnp.full((16, 16, 16), 3.5)
        d = downsample_average(f, 8)
        np.testing.assert_allclose(np.asarray(d), 3.5, rtol=1e-6)


class TestBispectrum:
    def test_structure_and_finiteness(self, grf):
        thetas = np.linspace(0.1, np.pi - 0.1, 5)
        out = reduced_bispectrum(grf, L, 0.1, 0.1, thetas)
        assert out["Q"].shape == (5,)
        assert np.all(np.isfinite(out["Q"]))
        assert out["P1"] > 0
        # k3 law of cosines
        np.testing.assert_allclose(
            out["k3"] ** 2, 0.01 + 0.01 + 2 * 0.01 * np.cos(thetas), rtol=1e-6
        )

    def test_nongaussian_signal(self, pk_table):
        """delta^2 - <delta^2> has a strong positive bispectrum."""
        k, p = pk_table
        g = gaussian_random_field(jax.random.key(8), 32, L, k, p)
        ng = g + 0.5 * (g * g - float(jnp.mean(g * g)))
        thetas = np.linspace(0.3, np.pi - 0.3, 3)
        q_g = reduced_bispectrum(g, L, 0.1, 0.1, thetas)["Q"]
        q_ng = reduced_bispectrum(ng, L, 0.1, 0.1, thetas)["Q"]
        assert np.mean(q_ng) > np.mean(q_g)
