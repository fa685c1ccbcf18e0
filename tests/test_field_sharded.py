"""On-mesh GRF / Zel'dovich / deposition must match the single-device toolkit.

Runs on the 8-virtual-device CPU mesh (conftest).  Together with
``test_sharded_powerspec.py`` this pins the full no-gather pod pipeline:
IC -> 1LPT -> (emulator) -> density -> P(k), each stage block-sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.parallel import make_mesh
from jax_nbody_emulator_with_dj_tpu.science.field_sharded import (
    deposit_displacement_sharded,
    displacement_to_density_sharded,
    gaussian_random_field_sharded,
    zeldovich_displacement_sharded,
)
from jax_nbody_emulator_with_dj_tpu.science.grf import gaussian_random_field
from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk
from jax_nbody_emulator_with_dj_tpu.science.lpt import (
    displacement_to_density,
    zeldovich_displacement,
)
from jax_nbody_emulator_with_dj_tpu.science.mas import deposit_displacement
from jax_nbody_emulator_with_dj_tpu.science.powerspec import power_spectrum
from jax_nbody_emulator_with_dj_tpu.science.powerspec_sharded import (
    power_spectrum_sharded,
)

BOX = 100.0
N = 32


@pytest.fixture(scope="module")
def pk_table():
    k = np.logspace(-3, 1.5, 256)
    p = eisenstein_hu_pk(k, Om=0.3175, Ob=0.049, h=0.6711, ns=0.9624, sigma8=0.834)
    return k, np.asarray(p)


@pytest.fixture(scope="module")
def delta(pk_table):
    k, p = pk_table
    return np.asarray(gaussian_random_field(jax.random.key(7), N, BOX, k, p))


class TestShardedGRF:
    def test_colored_white_matches_single_device(self, pk_table):
        k, p = pk_table
        white = np.asarray(
            jax.random.normal(jax.random.key(1), (N, N, N), jnp.float32)
        )
        ref = np.asarray(gaussian_random_field(jax.random.key(0), N, BOX, k, p))
        # same white noise through both paths
        from jax_nbody_emulator_with_dj_tpu.science.grf import _interp_pk  # noqa: F401

        ref = np.asarray(
            _color_single(white, BOX, k, p)
        )
        mesh = make_mesh((2, 2, 2))
        got = np.asarray(
            gaussian_random_field_sharded(None, N, mesh, BOX, k, p, white=white)
        )
        scale = ref.std()
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4 * scale)

    def test_default_draw_recovers_spectrum(self, pk_table):
        k, p = pk_table
        mesh = make_mesh((2, 2, 2))
        d = gaussian_random_field_sharded(jax.random.key(3), 64, mesh, BOX, k, p)
        assert d.shape == (64, 64, 64)
        kk, pk, nm = power_spectrum_sharded(d, mesh, BOX)
        kk, pk, nm = np.asarray(kk), np.asarray(pk), np.asarray(nm)
        # mid-k shells have >= hundreds of modes; single-realization scatter
        # is a few percent there
        sel = (nm > 500) & (kk > 0)
        p_true = np.interp(kk[sel], k, p)
        ratio = pk[sel] / p_true
        assert np.all(np.abs(ratio - 1) < 0.35), ratio

    def test_shards_draw_distinct_noise(self, pk_table):
        k, p = pk_table
        mesh = make_mesh((2, 1, 1))
        d = np.asarray(
            gaussian_random_field_sharded(jax.random.key(3), N, mesh, BOX, k, p)
        )
        assert not np.allclose(d[: N // 2], d[N // 2 :])


def _color_single(white, boxsize, k_table, p_table):
    """The single-device coloring of *given* noise (grf.py body, minus the
    draw) — mirrors gaussian_random_field exactly."""
    n = white.shape[0]
    kf = 2 * np.pi / boxsize
    kx = np.fft.fftfreq(n, d=1.0 / n) * kf
    kz = np.fft.rfftfreq(n, d=1.0 / n) * kf
    kmag = np.sqrt(
        kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2
    )
    logp = np.interp(
        np.log(np.maximum(kmag, 1e-30)),
        np.log(np.asarray(k_table)),
        np.log(np.maximum(np.asarray(p_table), 1e-30)),
    )
    pk = np.where(kmag > 0, np.exp(logp), 0.0)
    amp = np.sqrt(pk * float(n) ** 3 / boxsize**3)
    dk = np.fft.rfftn(white) * amp
    dk[0, 0, 0] = 0.0
    return np.fft.irfftn(dk, s=(n, n, n)).astype(np.float32)


class TestShardedZeldovich:
    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1)])
    def test_matches_single_device(self, delta, mesh_shape):
        mesh = make_mesh(mesh_shape)
        ref = np.asarray(zeldovich_displacement(delta, BOX))
        got = np.asarray(zeldovich_displacement_sharded(delta, mesh, BOX))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4 * scale)


class TestShardedDeposit:
    @pytest.mark.parametrize("worder", [2, 3])
    def test_matches_single_device(self, delta, worder):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(deposit_displacement(psi, BOX, worder=worder))
        got = np.asarray(
            deposit_displacement_sharded(psi, mesh, BOX, worder=worder, margin=12)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)

    def test_mass_conservation_anisotropic(self, delta):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        mesh = make_mesh((4, 2, 1))  # exercises the wrapped (unsharded) z axis
        got = np.asarray(deposit_displacement_sharded(psi, mesh, BOX, margin=8))
        assert got.shape == (N, N, N)
        np.testing.assert_allclose(got.mean(), 1.0, rtol=1e-5)

    def test_margin_check_raises(self, delta):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        mesh = make_mesh((2, 2, 2))
        with pytest.raises(ValueError, match="margin"):
            deposit_displacement_sharded(psi, mesh, BOX, margin=1)

    def test_density_with_deconvolve_matches(self, delta):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        mesh = make_mesh((2, 2, 2))
        ref = np.asarray(displacement_to_density(psi, BOX, deconvolve=True))
        got = np.asarray(
            displacement_to_density_sharded(psi, mesh, BOX, margin=8)
        )
        scale = ref.std()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4 * scale)


class TestEndToEndOnMesh:
    def test_ic_to_pk_no_gather(self, pk_table):
        """GRF -> Zel'dovich -> density -> P(k), all stages sharded; the
        chain must equal the single-device chain on the same white noise."""
        k, p = pk_table
        mesh = make_mesh((2, 2, 2))
        white = np.asarray(
            jax.random.normal(jax.random.key(9), (N, N, N), jnp.float32)
        )
        d_s = gaussian_random_field_sharded(None, N, mesh, BOX, k, p, white=white)
        psi_s = zeldovich_displacement_sharded(d_s, mesh, BOX)
        rho_s = displacement_to_density_sharded(psi_s, mesh, BOX, margin=8)
        kk_s, pk_s, _ = power_spectrum_sharded(rho_s, mesh, BOX)

        d = _color_single(white, BOX, k, p)
        psi = zeldovich_displacement(d, BOX)
        rho = displacement_to_density(psi, BOX)
        kk, pk_ref, _ = power_spectrum(np.asarray(rho), BOX)

        np.testing.assert_allclose(
            np.asarray(pk_s), np.asarray(pk_ref), rtol=5e-3
        )


class TestFixedAmplitude:
    def test_matches_single_device(self, pk_table):
        """Fixed-amplitude ("fixed field") ICs from the same white noise
        must equal the single-device implementation."""
        k, p = pk_table
        white = np.asarray(
            jax.random.normal(jax.random.key(6), (N, N, N), jnp.float32)
        )
        key = jax.random.key(6)  # single-device draws this white internally
        ref = np.asarray(
            gaussian_random_field(key, N, BOX, k, p, fixed_amplitude=True)
        )
        mesh = make_mesh((2, 2, 2))
        got = np.asarray(
            gaussian_random_field_sharded(
                None, N, mesh, BOX, k, p, white=white, fixed_amplitude=True
            )
        )
        scale = ref.std()
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4 * scale)


class TestPerAxisMarginCheck:
    """Margin validation must ignore displacement components along
    fully-local (wrapped, margin-0) axes — those axes need no margin."""

    def test_large_displacement_on_wrapped_axis_accepted(self, delta):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        psi = psi.copy()
        psi[2] += 30.0  # huge z displacement, z axis unsharded below
        mesh = make_mesh((4, 2, 1))
        ref = np.asarray(deposit_displacement(psi, BOX, worder=2))
        got = np.asarray(
            deposit_displacement_sharded(psi, mesh, BOX, worder=2, margin=8)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)

    def test_large_displacement_on_sharded_axis_still_raises(self, delta):
        psi = np.asarray(zeldovich_displacement(delta, BOX))
        psi = psi.copy()
        psi[0] += 50.0  # x axis IS sharded: must be rejected
        mesh = make_mesh((4, 2, 1))
        with pytest.raises(ValueError, match="axis-0"):
            deposit_displacement_sharded(psi, mesh, BOX, margin=8)
