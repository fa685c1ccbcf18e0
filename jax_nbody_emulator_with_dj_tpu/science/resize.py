"""Field resizing: mode-injection upsampling and block downsampling, pure JAX.

Counterpart of the reference's field-resize toolkit (``scripts/utils.py:
261-649``): conditional GRF refinement embeds the coarse grid's Fourier modes
(rescaled by (Nout/Nin)^3) inside the coarse Nyquist sphere and draws the
missing high-k modes as a Gaussian realization of a target P(k);
downsampling is block averaging (optionally after Gaussian smoothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grf import _interp_pk, white_noise_field


def _axis_map(n_in: int, n_out: int):
    """Frequency index map (src, dst, weight) for one full FFT axis.

    Even n_in: frequencies |f| < n_in/2 map directly; the coarse Nyquist
    f = n_in/2 (self-conjugate in the coarse grid) splits half-half onto
    +-n_in/2 in the fine grid, preserving Hermitian symmetry and total
    power.  Odd n_in has no self-conjugate Nyquist — every mode maps
    directly with weight 1 (the even-style split would write the same fine
    index twice).
    """
    h = n_in // 2
    if n_in % 2:
        src = np.arange(n_in)
        dst = np.concatenate(
            [np.arange(h + 1), np.arange(n_out - h, n_out)]
        )
        return src, dst, np.ones(n_in)
    src = list(range(0, h)) + [h, h] + list(range(h + 1, n_in))
    dst = (
        list(range(0, h))
        + [h, n_out - h]
        + [n_out - (n_in - f) for f in range(h + 1, n_in)]
    )
    wgt = [1.0] * h + [0.5, 0.5] + [1.0] * (n_in - h - 1)
    return np.asarray(src), np.asarray(dst), np.asarray(wgt)


def _embed_coarse_modes(delta_coarse, n_out: int, scale: float):
    """Full-FFT embedding of a coarse field's modes into an n_out grid.

    Returns the fine fftn spectrum (complex, full cube) containing exactly
    the coarse field's information (band-limited interpolation), with proper
    Nyquist-plane splitting on all three axes.
    """
    n_in = delta_coarse.shape[0]
    dk_c = jnp.fft.fftn(jnp.asarray(delta_coarse, jnp.float32)) * scale
    sx, dx_, wx = _axis_map(n_in, n_out)
    dk_out = jnp.zeros((n_out, n_out, n_out), dk_c.dtype)
    src = np.ix_(sx, sx, sx)
    dst = np.ix_(dx_, dx_, dx_)
    w = wx[:, None, None] * wx[None, :, None] * wx[None, None, :]
    return dk_out.at[dst].set(dk_c[src] * w)


def upsample_modes(delta, n_out: int, boxsize: float, k_table, p_table, key=None):
    """Conditional-GRF upsampling: keep coarse modes, inject new high-k power.

    Args:
        delta: (N_in,)^3 field.
        n_out: output grid size (multiple of N_in).
        boxsize: box side [Mpc/h].
        k_table, p_table: target spectrum for the injected modes.
        key: PRNG key for the new small-scale modes (None -> key(0)).

    Returns:
        (N_out,)^3 float32 field whose low-k modes equal the input's exactly
        and whose k > k_nyq(coarse) modes are a fresh Gaussian realization of
        the target spectrum.
    """
    n_in = delta.shape[0]
    if n_out % n_in:
        raise ValueError(f"n_out {n_out} must be a multiple of n_in {n_in}")
    if key is None:
        key = jax.random.key(0)

    scale = (n_out / n_in) ** 3  # FFT normalization between grid sizes
    dk_low = _embed_coarse_modes(delta, n_out, scale)  # full fftn cube

    kf = 2 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n_out, d=1.0 / n_out) * kf
    kmag = jnp.sqrt(
        kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kx[None, None, :] ** 2
    )
    k_nyq_coarse = kf * (n_in // 2)
    low_mask = kmag <= k_nyq_coarse

    pk = _interp_pk(kmag, k_table, p_table)
    # fftn of real white noise is Hermitian with <|W|^2> = N^3; the target is
    # |delta_k|^2 = P N^6 / V.
    w = jnp.fft.fftn(white_noise_field(key, n_out))
    dk_high = w * jnp.sqrt(pk * float(n_out) ** 3 / boxsize**3)

    dk = jnp.where(low_mask, dk_low, dk_high)
    dk = dk.at[0, 0, 0].set(0.0)
    return jnp.real(jnp.fft.ifftn(dk)).astype(jnp.float32)


def upsample_fourier(delta, n_out: int):
    """Band-limited (Fourier zero-padding) upsampling — no new power.

    Counterpart of the reference's DISCO-DJ shifted-interpolation 'fourier'
    mode (``scripts/utils.py:186-234``): exact sinc interpolation of the
    existing modes; k > k_nyq(coarse) stays empty.
    """
    n_in = delta.shape[0]
    if n_out % n_in:
        raise ValueError(f"n_out {n_out} must be a multiple of n_in {n_in}")
    if n_out == n_in:
        return jnp.asarray(delta)
    dk = _embed_coarse_modes(delta, n_out, (n_out / n_in) ** 3)
    return jnp.real(jnp.fft.ifftn(dk)).astype(jnp.float32)


def upsample_linear(delta, n_out: int):
    """Periodic trilinear interpolation upsampling.

    Counterpart of the reference's DISCO-DJ shifted-interpolation
    'linear' mode (``scripts/utils.py:186-234``): output grid point
    ``j * L/n_out`` interpolates the input at ``j * n_in/n_out`` input
    cells with periodic wrap.  Cheaper than :func:`upsample_fourier`
    (no FFT) but damps high-k power — the reference keeps both modes
    for exactly that trade.
    """
    n_in = delta.shape[0]
    if n_out % n_in:
        raise ValueError(f"n_out {n_out} must be a multiple of n_in {n_in}")
    if n_out == n_in:
        return jnp.asarray(delta)
    d = jnp.asarray(delta, jnp.float32)
    x = jnp.arange(n_out, dtype=jnp.float32) * (n_in / n_out)
    i0 = jnp.floor(x).astype(jnp.int32)
    frac = x - jnp.floor(x)
    i1 = jnp.mod(i0 + 1, n_in)
    out = jnp.zeros((n_out, n_out, n_out), jnp.float32)
    for cx, wx in ((i0, 1.0 - frac), (i1, frac)):
        for cy, wy in ((i0, 1.0 - frac), (i1, frac)):
            for cz, wz in ((i0, 1.0 - frac), (i1, frac)):
                out = out + (
                    d[cx][:, cy][:, :, cz]
                    * wx[:, None, None]
                    * wy[None, :, None]
                    * wz[None, None, :]
                )
    return out


def downsample_average(delta, n_out: int):
    """Block-average downsampling (reference utils.py:531-555)."""
    n_in = delta.shape[0]
    if n_in % n_out:
        raise ValueError(f"n_in {n_in} must be a multiple of n_out {n_out}")
    f = n_in // n_out
    d = jnp.asarray(delta)
    return d.reshape(n_out, f, n_out, f, n_out, f).mean(axis=(1, 3, 5))


def gaussian_smooth(delta, boxsize: float, r_smooth: float):
    """Isotropic Gaussian smoothing in Fourier space (Pylians SL analog)."""
    n = delta.shape[0]
    kf = 2 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n, d=1.0 / n) * kf
    kz = jnp.fft.rfftfreq(n, d=1.0 / n) * kf
    k2 = kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2
    dk = jnp.fft.rfftn(jnp.asarray(delta, jnp.float32))
    dk = dk * jnp.exp(-0.5 * k2 * r_smooth**2)
    return jnp.fft.irfftn(dk, s=delta.shape).astype(jnp.float32)


def resize_density_grid(delta, n_out: int, boxsize: float, k_table=None, p_table=None, key=None, r_smooth: float | None = None):
    """Unified resize (reference utils.py:595-649): up via mode injection,
    down via (optionally smoothed) block averaging, identity when equal."""
    n_in = delta.shape[0]
    if n_out == n_in:
        return jnp.asarray(delta)
    if n_out > n_in:
        if k_table is None or p_table is None:
            raise ValueError("upsampling requires a target (k_table, p_table)")
        return upsample_modes(delta, n_out, boxsize, k_table, p_table, key)
    if r_smooth:
        delta = gaussian_smooth(delta, boxsize, r_smooth)
    return downsample_average(delta, n_out)
