"""FFT power spectra and field-comparison summary statistics, pure JAX.

Replaces the reference scripts' Pylians ``PKL.Pk`` usage (reference
``scripts/utils.py:994-1161``) and the target-vs-model summary block
(``utils.py:1402-1603``): auto/cross P(k) by spherical shell binning of the
3D rFFT, transfer function T(k)=sqrt(P_a/P_b), correlation C(k)=P_x/sqrt(P_a
P_b), and the scalar metric dict used as the de-facto regression record.

Conventions: box side ``boxsize`` in Mpc/h, density contrast delta(x) on an
(N, N, N) grid; P(k) in (Mpc/h)^3 with delta_k = (V/N^3) FFT(delta) and
P = <|delta_k|^2> / V.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _k_grid(n: int, boxsize: float):
    """|k| on the rfftn grid, plus Hermitian mode weights."""
    kf = 2.0 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n, d=1.0 / n) * kf  # (n,)
    kz = jnp.fft.rfftfreq(n, d=1.0 / n) * kf  # (n//2+1,)
    kmag = jnp.sqrt(
        kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2
    )
    # Hermitian double-count weight: rfft stores half the modes; planes
    # kz=0 and kz=Nyquist are self-conjugate (weight 1), the rest weight 2.
    wz = jnp.full((n // 2 + 1,), 2.0)
    wz = wz.at[0].set(1.0)
    if n % 2 == 0:
        wz = wz.at[-1].set(1.0)
    weights = jnp.broadcast_to(wz[None, None, :], kmag.shape)
    return kmag, weights


def _bin_edges(n: int, boxsize: float, nbins: int | None):
    kf = 2.0 * np.pi / boxsize
    knyq = kf * (n // 2)
    if nbins is None:
        nbins = n // 2
    edges = np.linspace(kf / 2, knyq + kf / 2, nbins + 1)
    return jnp.asarray(edges)


@partial(jax.jit, static_argnames=("nbins",))
def _shell_average(kmag, weights, quantity, edges, nbins: int):
    idx = jnp.clip(jnp.searchsorted(edges, kmag.ravel()) - 1, 0, nbins - 1)
    in_range = ((kmag >= edges[0]) & (kmag < edges[-1])).ravel()
    w = weights.ravel() * in_range
    counts = jnp.bincount(idx, weights=w, length=nbins)
    ksum = jnp.bincount(idx, weights=w * kmag.ravel(), length=nbins)
    qsum = jnp.bincount(idx, weights=w * quantity.ravel(), length=nbins)
    counts = jnp.maximum(counts, 1e-30)
    return ksum / counts, qsum / counts, counts


def power_spectrum(delta, boxsize: float, nbins: int | None = None):
    """Auto power spectrum of a periodic density field.

    Args:
        delta: (N, N, N) real field (any float dtype; promoted to f32).
        boxsize: box side length [Mpc/h].
        nbins: number of k shells (default N/2, fundamental-mode spaced).

    Returns:
        (k, Pk, Nmodes): shell-mean |k| [h/Mpc], P(k) [(Mpc/h)^3], mode counts.
    """
    n = delta.shape[0]
    nbins = nbins or n // 2
    delta = jnp.asarray(delta, jnp.float32)
    dk = jnp.fft.rfftn(delta)
    v = boxsize**3
    # P = |delta_k|^2 * V / N^6
    pk3d = (dk.real**2 + dk.imag**2) * (v / float(n) ** 6)
    kmag, weights = _k_grid(n, boxsize)
    edges = _bin_edges(n, boxsize, nbins)
    k, pk, counts = _shell_average(kmag, weights, pk3d, edges, nbins)
    return k, pk, counts


def cross_power(delta_a, delta_b, boxsize: float, nbins: int | None = None):
    """Cross power spectrum Re<delta_a delta_b*> of two fields."""
    n = delta_a.shape[0]
    nbins = nbins or n // 2
    da = jnp.fft.rfftn(jnp.asarray(delta_a, jnp.float32))
    db = jnp.fft.rfftn(jnp.asarray(delta_b, jnp.float32))
    v = boxsize**3
    px3d = (da.real * db.real + da.imag * db.imag) * (v / float(n) ** 6)
    kmag, weights = _k_grid(n, boxsize)
    edges = _bin_edges(n, boxsize, nbins)
    k, px, counts = _shell_average(kmag, weights, px3d, edges, nbins)
    return k, px, counts


def transfer_and_correlation(delta_model, delta_target, boxsize: float, nbins=None):
    """T(k) = sqrt(P_model/P_target), C(k) = P_x / sqrt(P_model P_target).

    Reference: ``scripts/utils.py:1402-1603`` summary block.
    """
    k, p_m, _ = power_spectrum(delta_model, boxsize, nbins)
    _, p_t, _ = power_spectrum(delta_target, boxsize, nbins)
    _, p_x, _ = cross_power(delta_model, delta_target, boxsize, nbins)
    t = jnp.sqrt(jnp.maximum(p_m, 1e-30) / jnp.maximum(p_t, 1e-30))
    c = p_x / jnp.sqrt(jnp.maximum(p_m * p_t, 1e-60))
    return k, t, c


def summary_metrics(delta_model, delta_target, boxsize: float, kmax: float | None = None):
    """Scalar regression metrics comparing two density fields.

    Mirrors the metric dict the reference persists into metadata.json
    (``utils.py:1584-1603``): RMSE, Pearson r, field moments, median |T-1|,
    and mean (1-C) up to ``kmax``.
    """
    a = np.asarray(delta_model, np.float64).ravel()
    b = np.asarray(delta_target, np.float64).ravel()
    k, t, c = transfer_and_correlation(delta_model, delta_target, boxsize)
    k = np.asarray(k)
    t = np.asarray(t)
    c = np.asarray(c)
    sel = np.ones_like(k, bool) if kmax is None else (k <= kmax)
    return {
        "rmse": float(np.sqrt(np.mean((a - b) ** 2))),
        "pearson_r": float(np.corrcoef(a, b)[0, 1]),
        "mean_model": float(a.mean()),
        "mean_target": float(b.mean()),
        "std_model": float(a.std()),
        "std_target": float(b.std()),
        "skew_model": float(((a - a.mean()) ** 3).mean() / a.std() ** 3),
        "skew_target": float(((b - b.mean()) ** 3).mean() / b.std() ** 3),
        "median_abs_T_minus_1": float(np.median(np.abs(t[sel] - 1.0))),
        "max_abs_T_minus_1": float(np.max(np.abs(t[sel] - 1.0))),
        "mean_1_minus_C": float(np.mean(1.0 - c[sel])),
    }
