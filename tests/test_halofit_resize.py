"""Halofit nonlinear P(k) and Fourier-upsampling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.science import (
    eisenstein_hu_pk,
    gaussian_random_field,
    gaussian_smooth,
    halofit_pk,
    power_spectrum,
    upsample_fourier,
)


@pytest.fixture(scope="module")
def lin():
    k = np.logspace(-3.5, 1.5, 400)
    p = np.asarray(eisenstein_hu_pk(jnp.asarray(k)))
    return k, p


class TestHalofit:
    def test_enhances_small_scales(self, lin):
        k, p = lin
        pnl = halofit_pk(k, p, Om=0.3175, z=0.0)
        sel_hi = k > 1.0
        sel_lo = k < 0.01
        assert np.all(pnl[sel_hi] > 1.5 * p[sel_hi])  # strong 1-halo boost
        np.testing.assert_allclose(pnl[sel_lo], p[sel_lo], rtol=0.05)  # linear at low k

    def test_reasonable_amplitude(self, lin):
        # At k=1 h/Mpc, z=0, nonlinear boost is roughly 2-4x for LCDM
        k, p = lin
        pnl = halofit_pk(k, p, Om=0.3175, z=0.0)
        i = np.argmin(np.abs(k - 1.0))
        assert 1.5 < pnl[i] / p[i] < 8.0

    def test_redshift_weakens_nonlinearity(self, lin):
        k, p = lin
        r0 = halofit_pk(k, p, Om=0.3175, z=0.0)
        r1 = halofit_pk(k, p, Om=0.3175, z=2.0)
        i = np.argmin(np.abs(k - 1.0))
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor

        d = float(growth_factor(2.0, 0.3175))
        boost0 = r0[i] / p[i]
        boost1 = r1[i] / (p[i] * d**2)
        assert boost1 < boost0

    def test_finite_positive(self, lin):
        k, p = lin
        pnl = halofit_pk(k, p, Om=0.3175, z=0.5)
        assert np.all(np.isfinite(pnl)) and np.all(pnl > 0)


class TestFourierUpsample:
    @pytest.mark.slow
    def test_preserves_all_power(self):
        k_t = jnp.logspace(-3, 1.5, 256)
        p_t = eisenstein_hu_pk(k_t)
        coarse = gaussian_random_field(jax.random.key(1), 16, 256.0, k_t, p_t)
        fine = upsample_fourier(coarse, 32)
        assert fine.shape == (32, 32, 32)
        # variance ~preserved (sinc interpolation halves the ambiguous
        # Nyquist-plane power, so the fine field has slightly LESS variance)
        v_f, v_c = float(jnp.var(fine)), float(jnp.var(coarse))
        assert v_f <= v_c * 1.001
        assert np.isclose(v_f, v_c, rtol=0.05)
        # low-k spectrum identical
        k_c, p_c, _ = power_spectrum(coarse, 256.0)
        k_f, p_f, _ = power_spectrum(fine, 256.0, nbins=16)
        np.testing.assert_allclose(np.asarray(p_f[:6]), np.asarray(p_c[:6]), rtol=0.05)

    @pytest.mark.slow
    def test_grid_points_interpolated(self):
        # even-factor zero-pad interpolation passes through original samples
        k_t = jnp.logspace(-3, 1.5, 64)
        p_t = eisenstein_hu_pk(k_t)
        coarse = gaussian_random_field(jax.random.key(2), 8, 100.0, k_t, p_t)
        fine = upsample_fourier(coarse, 16)
        np.testing.assert_allclose(
            np.asarray(fine[::2, ::2, ::2]), np.asarray(coarse), atol=2e-4
        )


class TestGaussianSmooth:
    def test_reduces_variance(self):
        k_t = jnp.logspace(-3, 1.5, 64)
        p_t = eisenstein_hu_pk(k_t)
        f = gaussian_random_field(jax.random.key(3), 32, 256.0, k_t, p_t)
        s = gaussian_smooth(f, 256.0, r_smooth=16.0)
        assert float(jnp.var(s)) < 0.7 * float(jnp.var(f))
        # mean preserved
        assert np.isclose(float(jnp.mean(s)), float(jnp.mean(f)), atol=1e-5)


class TestLinearUpsample:
    def test_grid_points_exact(self):
        """Integer-factor trilinear interpolation passes through samples."""
        from jax_nbody_emulator_with_dj_tpu.science.resize import upsample_linear

        rng = np.random.default_rng(0)
        coarse = rng.normal(size=(8, 8, 8)).astype(np.float32)
        fine = np.asarray(upsample_linear(coarse, 16))
        np.testing.assert_allclose(fine[::2, ::2, ::2], coarse, atol=1e-6)

    def test_midpoints_are_averages(self):
        from jax_nbody_emulator_with_dj_tpu.science.resize import upsample_linear

        rng = np.random.default_rng(1)
        coarse = rng.normal(size=(8, 8, 8)).astype(np.float32)
        fine = np.asarray(upsample_linear(coarse, 16))
        # midpoint along z = average of the two bracketing samples,
        # including the periodic wrap at the high edge
        expect = 0.5 * (coarse + np.roll(coarse, -1, axis=2))
        np.testing.assert_allclose(fine[::2, ::2, 1::2], expect, atol=1e-6)

    def test_linear_plane_reproduced(self):
        """A linear (periodic sawtooth-free) ramp interpolates exactly."""
        from jax_nbody_emulator_with_dj_tpu.science.resize import upsample_linear

        n = 8
        ramp = np.broadcast_to(
            np.sin(2 * np.pi * np.arange(n) / n)[:, None, None], (n, n, n)
        ).astype(np.float32)
        fine = np.asarray(upsample_linear(ramp, 32))
        # exact at original sample planes
        np.testing.assert_allclose(fine[::4, ::4, ::4], ramp, atol=1e-6)
        # monotone interpolation between them on the rising half
        assert np.all(np.diff(fine[:8, 0, 0]) > 0)

    def test_damps_high_k(self):
        """Linear interpolation loses small-scale power vs Fourier mode."""
        k_t = jnp.logspace(-3, 1.5, 64)
        p_t = eisenstein_hu_pk(k_t)
        from jax_nbody_emulator_with_dj_tpu.science.resize import upsample_linear

        coarse = gaussian_random_field(jax.random.key(5), 16, 100.0, k_t, p_t)
        lin = upsample_linear(coarse, 32)
        four = upsample_fourier(coarse, 32)
        assert float(jnp.var(lin)) < float(jnp.var(four))


class TestOddCoarseGrids:
    """Odd n_in has no self-conjugate Nyquist: the frequency map must place
    every coarse mode exactly once (the even-style half-half split would
    write the same fine index twice, nondeterministically)."""

    def test_axis_map_odd_no_duplicate_dst(self):
        from jax_nbody_emulator_with_dj_tpu.science.resize import _axis_map

        for n_in, n_out in ((9, 18), (9, 36), (15, 30)):
            src, dst, wgt = _axis_map(n_in, n_out)
            assert len(np.unique(dst)) == len(dst)
            assert np.all(wgt == 1.0)
            assert len(src) == n_in

    def test_upsample_fourier_odd_passes_through_samples(self):
        """Band-limited interpolation interpolates the coarse samples
        exactly: fine[::r] == coarse."""
        from jax_nbody_emulator_with_dj_tpu.science.resize import (
            upsample_fourier,
        )

        rng = np.random.default_rng(0)
        coarse = rng.normal(size=(9, 9, 9)).astype(np.float32)
        fine = np.asarray(upsample_fourier(coarse, 18))
        np.testing.assert_allclose(
            fine[::2, ::2, ::2], coarse, rtol=1e-4, atol=1e-5
        )

    def test_upsample_fourier_odd_injects_no_power(self):
        """All fine modes outside the coarse band must be exactly zero."""
        from jax_nbody_emulator_with_dj_tpu.science.resize import (
            upsample_fourier,
        )

        rng = np.random.default_rng(1)
        n_in, n_out = 9, 18
        coarse = rng.normal(size=(n_in,) * 3).astype(np.float32)
        fine = np.asarray(upsample_fourier(coarse, n_out))
        fk = np.fft.fftn(fine)
        f = np.fft.fftfreq(n_out, d=1.0 / n_out)
        outside = np.abs(f) > n_in // 2
        mask = (
            outside[:, None, None] | outside[None, :, None] | outside[None, None, :]
        )
        assert np.abs(fk[mask]).max() < 1e-3 * np.abs(fk).max()
