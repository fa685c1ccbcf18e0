"""Gaussian random field generation from a target P(k), pure JAX.

Replaces the reference pipeline's DISCO-DJ N-GenIC noise + CLASS P(k) IC
branch (reference ``scripts/core.py:263-302``): real white noise is drawn in
configuration space and colored in Fourier space by sqrt(P(k)) — Hermitian
symmetry is automatic, and the result is exactly Gaussian with the requested
spectrum in the ensemble mean.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def white_noise_field(key, n: int, dtype=jnp.float32):
    """Unit-variance real white noise on an (n, n, n) grid."""
    return jax.random.normal(key, (n, n, n), dtype)


def _interp_pk(kmag, k_table, p_table):
    """Log-log interpolation of P onto |k| (0 at k=0)."""
    logk = jnp.log(jnp.maximum(kmag, 1e-30))
    logp = jnp.interp(
        logk,
        jnp.log(jnp.asarray(k_table)),
        jnp.log(jnp.maximum(jnp.asarray(p_table), 1e-30)),
    )
    return jnp.where(kmag > 0, jnp.exp(logp), 0.0)


@partial(jax.jit, static_argnames=("n", "boxsize", "fixed_amplitude"))
def gaussian_random_field(key, n: int, boxsize: float, k_table, p_table, *, fixed_amplitude: bool = False):
    """Draw delta(x) with power spectrum P(k).

    Args:
        key: PRNG key.
        n: grid size per axis.
        boxsize: box side [Mpc/h].
        k_table, p_table: tabulated spectrum (e.g. from
            :func:`..science.linear_pk.eisenstein_hu_pk`).
        fixed_amplitude: "fixed-field" ICs — unit-modulus modes (variance
            suppressed ensemble trick); phases remain random.

    Returns:
        (n, n, n) float32 density contrast.
    """
    kf = 2 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n, d=1.0 / n) * kf
    kz = jnp.fft.rfftfreq(n, d=1.0 / n) * kf
    kmag = jnp.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2)
    pk = _interp_pk(kmag, k_table, p_table)

    w = jnp.fft.rfftn(white_noise_field(key, n))
    if fixed_amplitude:
        mag = jnp.abs(w)
        w = jnp.where(mag > 0, w / jnp.maximum(mag, 1e-30), 0.0) * jnp.sqrt(float(n) ** 3 / 2.0) * jnp.sqrt(2.0)
    # <|W|^2> = N^3 for rfft of unit white noise; want |delta_k|^2 = P N^6/V.
    amp = jnp.sqrt(pk * float(n) ** 3 / boxsize**3)
    dk = w * amp
    dk = dk.at[0, 0, 0].set(0.0)
    return jnp.fft.irfftn(dk, s=(n, n, n)).astype(jnp.float32)
