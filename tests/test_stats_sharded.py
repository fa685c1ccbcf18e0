"""On-mesh Minkowski / bispectrum must match the single-device estimators.

Runs on the 8-virtual-device CPU mesh (conftest).  With
``test_sharded_powerspec.py`` and ``test_field_sharded.py`` this pins the
complete distributed validation suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.parallel import make_mesh
from jax_nbody_emulator_with_dj_tpu.science.bispectrum import reduced_bispectrum
from jax_nbody_emulator_with_dj_tpu.science.minkowski import minkowski_functionals
from jax_nbody_emulator_with_dj_tpu.science.stats_sharded import (
    minkowski_functionals_sharded,
    reduced_bispectrum_sharded,
)

BOX = 250.0
N = 32


@pytest.fixture(scope="module")
def field():
    key = jax.random.key(11)
    x = jax.random.normal(key, (N, N, N), jnp.float32)
    # mild smoothing for non-trivial excursion-set topology
    k = jnp.fft.rfftn(x)
    kx = jnp.fft.fftfreq(N)[:, None, None]
    ky = jnp.fft.fftfreq(N)[None, :, None]
    kz = jnp.fft.rfftfreq(N)[None, None, :]
    filt = jnp.exp(-((kx**2 + ky**2 + kz**2) / (2 * 0.15**2)))
    return np.asarray(jnp.fft.irfftn(k * filt, s=(N, N, N)), np.float32)


class TestShardedMinkowski:
    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1)])
    def test_matches_single_device(self, field, mesh_shape):
        mesh = make_mesh(mesh_shape)
        thr = np.linspace(-2, 2, 9) * field.std()
        ref = np.asarray(minkowski_functionals(field, thr))
        got = np.asarray(minkowski_functionals_sharded(field, thr, mesh))
        # counts are integers -> exact up to fp32 division
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)

    def test_euler_of_single_cube(self):
        """One active voxel: V3 (Euler density) must be +1/N^3."""
        f = np.zeros((N, N, N), np.float32)
        f[3, 5, 7] = 1.0
        mesh = make_mesh((2, 2, 2))
        got = np.asarray(
            minkowski_functionals_sharded(f, np.asarray([0.5]), mesh)
        )[0]
        assert got[3] == pytest.approx(1.0 / N**3)
        assert got[0] == pytest.approx(1.0 / N**3)

    def test_cube_across_shard_corner(self):
        """A 2^3 cube straddling 8 shards still counts as one component."""
        f = np.zeros((N, N, N), np.float32)
        h = N // 2
        f[h - 1 : h + 1, h - 1 : h + 1, h - 1 : h + 1] = 1.0
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(minkowski_functionals(f, np.asarray([0.5])))
        got = np.asarray(
            minkowski_functionals_sharded(f, np.asarray([0.5]), mesh)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6)
        assert got[0, 3] == pytest.approx(1.0 / N**3)  # Euler = 1 component


class TestShardedBispectrum:
    def test_matches_single_device(self, field):
        mesh = make_mesh((2, 2, 2))
        thetas = np.linspace(0.2, np.pi - 0.2, 5)
        kf = 2 * np.pi / BOX
        ref = reduced_bispectrum(field, BOX, 4 * kf, 6 * kf, thetas)
        got = reduced_bispectrum_sharded(field, mesh, BOX, 4 * kf, 6 * kf, thetas)
        np.testing.assert_allclose(got["B"], ref["B"], rtol=2e-3, atol=1e-8)
        np.testing.assert_allclose(got["Q"], ref["Q"], rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(got["P1"], ref["P1"], rtol=2e-3)
        np.testing.assert_allclose(got["P3"], ref["P3"], rtol=2e-3)


class TestCountCapacityGuard:
    def test_oversized_shard_rejected(self):
        """Per-shard int32 bool-sums wrap above 2^31; the guard must refuse
        shards whose 3x voxel count exceeds int32 instead of silently
        returning garbage V0-V2."""
        from jax_nbody_emulator_with_dj_tpu.science.stats_sharded import (
            _check_count_capacity,
        )

        _check_count_capacity((1024, 1024, 512))  # 3*2^29 fits
        with pytest.raises(ValueError, match="int32"):
            _check_count_capacity((2048, 2048, 512))  # 3*2^31 does not
