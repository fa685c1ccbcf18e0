"""On-mesh resize must match the single-device toolkit.

Runs on the 8-virtual-device CPU mesh (conftest).  The mode-injection
comparison feeds the SAME white noise through both paths (the
single-device function draws ``normal(key, (n_out,)^3)`` internally; the
sharded one accepts it via ``white=``), so equality is exact up to fp
reorder, not statistical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.parallel import make_mesh
from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk
from jax_nbody_emulator_with_dj_tpu.science.resize import (
    downsample_average,
    gaussian_smooth,
    upsample_fourier,
    upsample_modes,
)
from jax_nbody_emulator_with_dj_tpu.science.resize_sharded import (
    downsample_average_sharded,
    gaussian_smooth_sharded,
    upsample_fourier_sharded,
    upsample_modes_sharded,
)

BOX = 200.0
N_IN = 16
N_OUT = 32


@pytest.fixture(scope="module")
def pk_table():
    k = np.logspace(-3, 1.5, 256)
    p = eisenstein_hu_pk(k, Om=0.3175, Ob=0.049, h=0.6711, ns=0.9624, sigma8=0.834)
    return k, np.asarray(p)


@pytest.fixture(scope="module")
def coarse():
    return np.asarray(
        jax.random.normal(jax.random.key(2), (N_IN,) * 3, jnp.float32)
    )


class TestUpsampleModes:
    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1)])
    def test_matches_single_device(self, coarse, pk_table, mesh_shape):
        k, p = pk_table
        key = jax.random.key(0)
        white = np.asarray(jax.random.normal(key, (N_OUT,) * 3, jnp.float32))
        ref = np.asarray(upsample_modes(coarse, N_OUT, BOX, k, p, key=key))
        mesh = make_mesh(mesh_shape)
        got = np.asarray(
            upsample_modes_sharded(coarse, N_OUT, mesh, BOX, k, p, white=white)
        )
        scale = ref.std()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4 * scale)

    def test_default_draw_runs(self, coarse, pk_table):
        k, p = pk_table
        mesh = make_mesh((2, 2, 2))
        got = upsample_modes_sharded(
            coarse, N_OUT, mesh, BOX, k, p, key=jax.random.key(5)
        )
        assert got.shape == (N_OUT,) * 3
        assert np.isfinite(np.asarray(got)).all()

    def test_rejects_equal_sizes(self, coarse, pk_table):
        k, p = pk_table
        mesh = make_mesh((2, 2, 2))
        with pytest.raises(ValueError, match="strict multiple"):
            upsample_modes_sharded(coarse, N_IN, mesh, BOX, k, p)


class TestUpsampleFourier:
    def test_matches_single_device(self, coarse):
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(upsample_fourier(coarse, N_OUT))
        got = np.asarray(upsample_fourier_sharded(coarse, N_OUT, mesh))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4 * scale)


class TestDownsampleSmooth:
    def test_downsample_matches(self):
        f = np.asarray(
            jax.random.normal(jax.random.key(4), (N_OUT,) * 3, jnp.float32)
        )
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(downsample_average(f, N_IN))
        got = np.asarray(downsample_average_sharded(f, N_IN, mesh))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_smooth_matches(self):
        f = np.asarray(
            jax.random.normal(jax.random.key(4), (N_OUT,) * 3, jnp.float32)
        )
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(gaussian_smooth(f, BOX, 5.0))
        got = np.asarray(gaussian_smooth_sharded(f, mesh, BOX, 5.0))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestOddCoarse:
    def test_fourier_odd_n_in_matches_single_device(self):
        """Odd coarse grids (no self-conjugate Nyquist) must map every mode
        exactly once in the sharded gather too."""
        coarse = np.asarray(
            jax.random.normal(jax.random.key(8), (9,) * 3, jnp.float32)
        )
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(upsample_fourier(coarse, 36))
        got = np.asarray(upsample_fourier_sharded(coarse, 36, mesh))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4 * scale)

    def test_modes_odd_n_in_matches_single_device(self, pk_table):
        k, p = pk_table
        key = jax.random.key(9)
        coarse = np.asarray(
            jax.random.normal(jax.random.key(10), (9,) * 3, jnp.float32)
        )
        white = np.asarray(jax.random.normal(key, (36,) * 3, jnp.float32))
        ref = np.asarray(upsample_modes(coarse, 36, BOX, k, p, key=key))
        mesh = make_mesh((2, 2, 2))
        got = np.asarray(
            upsample_modes_sharded(coarse, 36, mesh, BOX, k, p, white=white)
        )
        scale = ref.std()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4 * scale)
