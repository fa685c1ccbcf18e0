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


def _embed_coarse_modes(dk_coarse, n_in: int, n_out: int):
    """Place an n_in rfftn spectrum into an n_out rfftn grid (n_out > n_in)."""
    out_shape = (n_out, n_out, n_out // 2 + 1)
    dk_out = jnp.zeros(out_shape, dk_coarse.dtype)
    h = n_in // 2
    # Low-frequency blocks along the two full axes; rfft axis is contiguous.
    for xs_src, xs_dst in (((0, h), (0, h)), ((n_in - h, n_in), (n_out - h, n_out))):
        for ys_src, ys_dst in (((0, h), (0, h)), ((n_in - h, n_in), (n_out - h, n_out))):
            blk = dk_coarse[xs_src[0] : xs_src[1], ys_src[0] : ys_src[1], : h + 1]
            dk_out = dk_out.at[
                xs_dst[0] : xs_dst[1], ys_dst[0] : ys_dst[1], : h + 1
            ].set(blk)
    return dk_out


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
    dk_c = jnp.fft.rfftn(jnp.asarray(delta, jnp.float32)) * scale
    dk_low = _embed_coarse_modes(dk_c, n_in, n_out)

    kf = 2 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n_out, d=1.0 / n_out) * kf
    kz = jnp.fft.rfftfreq(n_out, d=1.0 / n_out) * kf
    kmag = jnp.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2)
    k_nyq_coarse = kf * (n_in // 2)
    low_mask = kmag <= k_nyq_coarse

    pk = _interp_pk(kmag, k_table, p_table)
    w = jnp.fft.rfftn(white_noise_field(key, n_out))
    dk_high = w * jnp.sqrt(pk * float(n_out) ** 3 / boxsize**3)

    dk = jnp.where(low_mask, dk_low, dk_high)
    dk = dk.at[0, 0, 0].set(0.0)
    return jnp.fft.irfftn(dk, s=(n_out,) * 3).astype(jnp.float32)


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
