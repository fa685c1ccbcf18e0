"""Distributed P(k)/T(k)/C(k) must match the single-device estimators.

Runs on the 8-virtual-device CPU mesh (conftest) — the TPU analog of a
multi-host validation job.  The sharded estimator keeps the field sharded
and psum-reduces shard-local shell sums; equality with the gather-based
estimator is the whole contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.parallel import make_mesh
from jax_nbody_emulator_with_dj_tpu.science.powerspec import (
    cross_power,
    power_spectrum,
    transfer_and_correlation,
)
from jax_nbody_emulator_with_dj_tpu.science.powerspec_sharded import (
    cross_power_sharded,
    power_spectrum_sharded,
    transfer_and_correlation_sharded,
)

BOX = 250.0


@pytest.fixture(scope="module")
def fields():
    key = jax.random.key(3)
    a = jax.random.normal(key, (64, 64, 64), jnp.float32)
    # correlated second field
    b = 0.7 * a + 0.3 * jax.random.normal(jax.random.key(4), a.shape, jnp.float32)
    return np.asarray(a), np.asarray(b)


class TestShardedPowerSpectrum:
    def test_auto_matches_single_device(self, fields):
        a, _ = fields
        mesh = make_mesh((2, 2, 2))
        k_ref, p_ref, n_ref = power_spectrum(a, BOX)
        k, p, n = power_spectrum_sharded(a, mesh, BOX)
        np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=2e-4)

    def test_cross_matches_single_device(self, fields):
        a, b = fields
        mesh = make_mesh((2, 2, 2))
        k_ref, p_ref, _ = cross_power(a, b, BOX)
        k, p, _ = cross_power_sharded(a, b, mesh, BOX)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=2e-4, atol=1e-8)

    def test_transfer_correlation_match(self, fields):
        a, b = fields
        mesh = make_mesh((2, 2, 2))
        k_ref, t_ref, c_ref = transfer_and_correlation(a, b, BOX)
        k, t, c = transfer_and_correlation_sharded(a, b, mesh, BOX)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=2e-4, atol=1e-6)

    def test_anisotropic_mesh(self, fields):
        a, _ = fields
        mesh = make_mesh((4, 2, 1))
        _, p_ref, _ = power_spectrum(a, BOX)
        _, p, _ = power_spectrum_sharded(a, mesh, BOX)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=2e-4)

    def test_single_device_mesh_degenerates(self, fields):
        a, _ = fields
        mesh = make_mesh((1, 1, 1))
        _, p_ref, _ = power_spectrum(a, BOX)
        _, p, _ = power_spectrum_sharded(a, mesh, BOX)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=2e-4)

    def test_stays_sharded(self, fields):
        """The input field must not be gathered — output arrays are small."""
        a, _ = fields
        mesh = make_mesh((2, 2, 2))
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("x", "y", "z"))
        a_sharded = jax.device_put(jnp.asarray(a), sharding)
        k, p, n = power_spectrum_sharded(a_sharded, mesh, BOX)
        assert k.shape == (32,) and p.shape == (32,)

    def test_geometry_validation(self):
        mesh = make_mesh((2, 2, 2))
        bad = np.zeros((10, 10, 10), np.float32)  # N/mx % my != 0
        with pytest.raises(ValueError):
            power_spectrum_sharded(bad, mesh, BOX)

    def test_summary_metrics_match(self, fields):
        """The on-mesh scalar metric dict must match the host version."""
        from jax_nbody_emulator_with_dj_tpu.science.powerspec import (
            summary_metrics,
        )
        from jax_nbody_emulator_with_dj_tpu.science.powerspec_sharded import (
            summary_metrics_sharded,
        )

        a, b = fields
        mesh = make_mesh((2, 2, 2))
        ref = summary_metrics(a, b, BOX, kmax=0.5)
        got = summary_metrics_sharded(a, b, mesh, BOX, kmax=0.5)
        assert set(got) == set(ref)
        for key in ref:
            assert abs(got[key] - ref[key]) <= 2e-3 * max(1.0, abs(ref[key])), (
                key, got[key], ref[key],
            )

    def test_plane_wave_peak(self):
        """A single plane wave must land all power in its |k| shell."""
        n = 32
        mesh = make_mesh((2, 2, 2))
        x = np.arange(n) * (BOX / n)
        kmode = 4 * 2 * np.pi / BOX
        delta = np.cos(kmode * x)[:, None, None] * np.ones((1, n, n), np.float32)
        k, p, cnt = power_spectrum_sharded(delta.astype(np.float32), mesh, BOX)
        k, p = np.asarray(k), np.asarray(p)
        peak = np.argmax(p)
        assert abs(k[peak] - kmode) < 2 * np.pi / BOX
