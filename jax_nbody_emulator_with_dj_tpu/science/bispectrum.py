"""Reduced bispectrum Q(theta) via the FFT-binned estimator, pure JAX.

Replaces the reference's Pylians bispectrum call (``scripts/utils.py:
1314-1399``), which evaluates Q(theta) for fixed (k1, k2) over an array of
opening angles theta.  Standard Scoccimarro-style estimator: for each k bin
build the band-filtered fields I_i(x) = IFFT[delta_k * mask_i] and the mode
fields N_i(x) = IFFT[mask_i]; then

    B(k1, k2, k3) = sum_x I1 I2 I3 / sum_x N1 N2 N3 * V^2 / N^3(normalization)
    Q = B / (P1 P2 + P2 P3 + P3 P1)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .powerspec import _k_grid


def _band_fields(dk, kmag, k_lo, k_hi, n):
    mask = ((kmag >= k_lo) & (kmag < k_hi)).astype(jnp.complex64)
    i_field = jnp.fft.irfftn(dk * mask, s=(n, n, n))
    n_field = jnp.fft.irfftn(mask, s=(n, n, n))
    return i_field, n_field


def reduced_bispectrum(delta, boxsize: float, k1: float, k2: float, thetas, dk_width: float | None = None):
    """Q(theta) for triangle configurations (k1, k2, theta).

    Args:
        delta: (N, N, N) density contrast.
        boxsize: box side [Mpc/h].
        k1, k2: triangle side magnitudes [h/Mpc].
        thetas: (T,) opening angles [rad].
        dk_width: k-bin half-width (default: one fundamental mode).

    Returns:
        dict with 'theta', 'k3', 'B', 'Q', 'P1', 'P2', 'P3'.
    """
    n = delta.shape[0]
    kf = 2 * np.pi / boxsize
    half = dk_width if dk_width is not None else kf
    delta = jnp.asarray(delta, jnp.float32)
    dk = jnp.fft.rfftn(delta)
    kmag, _ = _k_grid(n, boxsize)
    v = boxsize**3
    n3 = float(n) ** 3

    thetas = np.asarray(thetas, np.float64)
    k3s = np.sqrt(k1**2 + k2**2 + 2 * k1 * k2 * np.cos(thetas))

    def band(kc):
        return _band_fields(dk, kmag, kc - half, kc + half, n)

    i1, n1 = band(k1)
    i2, n2 = band(k2)

    def pk_of_band(i_field, n_field):
        # P = V/N^3 * sum I^2 / sum N^2  (per-bin shell average)
        return v / n3 * jnp.sum(i_field**2) / jnp.maximum(jnp.sum(n_field**2), 1e-30)

    p1 = pk_of_band(i1, n1)
    p2 = pk_of_band(i2, n2)

    Bs, Qs, P3s = [], [], []
    for k3 in k3s:
        i3, nn3 = band(float(k3))
        denom = jnp.maximum(jnp.sum(n1 * n2 * nn3), 1e-30)
        b = (v**2 / n3) * jnp.sum(i1 * i2 * i3) / denom
        p3 = pk_of_band(i3, nn3)
        q = b / jnp.maximum(p1 * p2 + p2 * p3 + p3 * p1, 1e-30)
        Bs.append(b)
        Qs.append(q)
        P3s.append(p3)

    return {
        "theta": thetas,
        "k3": k3s,
        "B": np.asarray(jnp.stack(Bs)),
        "Q": np.asarray(jnp.stack(Qs)),
        "P1": float(p1),
        "P2": float(p2),
        "P3": np.asarray(jnp.stack(P3s)),
    }
