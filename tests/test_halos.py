"""FoF halo finder and mass function tests."""

import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.science.halos import (
    empirical_hmf,
    friends_of_friends,
    particle_mass_msun_h,
    positions_from_displacement,
    tinker08_hmf,
)


class TestPositions:
    def test_zero_displacement_grid(self):
        psi = np.zeros((3, 4, 4, 4), np.float32)
        pos = positions_from_displacement(psi, 100.0)
        assert pos.shape == (64, 3)
        assert pos.min() >= 0 and pos.max() < 100.0
        assert np.isclose(pos[1, 2], 25.0)  # second z grid point

    def test_periodic_wrap(self):
        psi = np.full((3, 2, 2, 2), -10.0, np.float32)
        pos = positions_from_displacement(psi, 100.0)
        assert np.all((pos >= 0) & (pos < 100.0))


class TestFoF:
    def test_two_well_separated_clusters(self):
        rng = np.random.default_rng(0)
        c1 = rng.normal(scale=0.5, size=(50, 3)) + 20.0
        c2 = rng.normal(scale=0.5, size=(80, 3)) + 70.0
        field = rng.uniform(0, 100, size=(30, 3))  # sparse background
        pos = np.concatenate([c1, c2, field]).astype(np.float64) % 100.0
        out = friends_of_friends(pos, 100.0, linking_length=1.0, nmin=20)
        assert out["n_groups"] == 2
        assert sorted(out["lengths"].tolist()) == [50, 80]
        centers = out["centers"][np.argsort(out["lengths"])]
        np.testing.assert_allclose(centers[0], [20, 20, 20], atol=1.0)
        np.testing.assert_allclose(centers[1], [70, 70, 70], atol=1.0)

    def test_periodic_linking_across_boundary(self):
        # cluster straddling the box edge
        rng = np.random.default_rng(1)
        offs = rng.normal(scale=0.4, size=(40, 3))
        pos = np.mod(offs + np.array([0.0, 50.0, 50.0]), 100.0)
        out = friends_of_friends(pos, 100.0, linking_length=1.5, nmin=10)
        assert out["n_groups"] == 1
        # periodic CM near x=0 (or 100)
        cx = out["centers"][0, 0]
        assert cx < 5.0 or cx > 95.0

    def test_nmin_filtering(self):
        rng = np.random.default_rng(2)
        small = rng.normal(scale=0.2, size=(5, 3)) + 10.0
        big = rng.normal(scale=0.2, size=(30, 3)) + 60.0
        pos = np.concatenate([small, big]) % 100.0
        out = friends_of_friends(pos, 100.0, 1.0, nmin=20)
        assert out["n_groups"] == 1
        assert out["lengths"][0] == 30
        # small group unlabeled
        assert np.all(out["labels"][:5] == -1)


class TestHMF:
    def test_particle_mass(self):
        m = particle_mass_msun_h(1000.0, 512, 0.3175)
        # standard Quijote-like particle mass ~6.5e11
        assert 5e11 < m < 8e11

    def test_empirical_histogram_conserves_counts(self):
        lengths = np.array([20, 25, 40, 80, 160, 320])
        centers, dn, err = empirical_hmf(lengths, 1e12, 100.0, fof_correction=False)
        total = np.sum(dn * np.diff(np.log10(centers)).mean() * 100.0**3)
        assert np.isclose(total, len(lengths), rtol=0.2)

    def test_tinker_shape(self):
        import jax.numpy as jnp

        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk

        k = jnp.logspace(-4, 2, 256)
        p = eisenstein_hu_pk(k)
        m = np.logspace(12, 15, 16)
        dn = tinker08_hmf(m, k, p, Om=0.3175)
        assert np.all(dn > 0)
        assert np.all(np.diff(np.log(dn)) < 0)  # monotone decreasing
        # Rough normalization anchor: dn/dlog10M at 1e13 ~ 1e-3..1e-4
        i = np.argmin(np.abs(m - 1e13))
        assert 1e-5 < dn[i] < 1e-2

    def test_tinker_redshift_suppression(self):
        import jax.numpy as jnp

        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk

        k = jnp.logspace(-4, 2, 256)
        p = eisenstein_hu_pk(k)
        m = np.logspace(13, 15, 8)
        dn0 = tinker08_hmf(m, k, p, Om=0.3175, z=0.0)
        dn1 = tinker08_hmf(m, k, p, Om=0.3175, z=1.0)
        assert np.all(dn1 < dn0)  # fewer massive halos at high z
