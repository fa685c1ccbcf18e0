"""Mass-assignment (particle-mesh deposition) schemes, pure JAX.

Replaces Pylians ``MASL``/DISCO-DJ scatter for the validation pipeline
(reference ``scripts/utils.py:136-183``).  Supports NGP/CIC/TSC/PCS
(worder 1..4) with periodic wrapping, implemented as a static set of
per-offset scatter-adds (``.at[].add``) — XLA lowers these to sorted
segment sums on TPU.

Conventions: particles start on the cell centers of an N^3 Lagrangian grid
and are displaced by psi [Mpc/h]; output is rho/rho_bar on an nmesh^3 grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_weights(frac, worder: int):
    """1D MAS weights at integer offsets for one fractional coordinate.

    Args:
        frac: (Np,) distance from the particle to the *base* grid point, in
            cell units, in [0, 1).
        worder: 1=NGP (1 pt), 2=CIC (2 pts), 3=TSC (3 pts), 4=PCS (4 pts).

    Returns:
        list of (offset, weight) pairs; weights shape (Np,).
    """
    if worder == 1:
        return [(0, jnp.ones_like(frac))]
    if worder == 2:
        return [(0, 1.0 - frac), (1, frac)]
    if worder == 3:
        # base = floor(x - 0.5): offsets 0,1,2 around the nearest cell
        d = frac  # in [0,1): distance from base point
        w0 = 0.5 * (1.0 - d) ** 2
        w1 = 0.75 - (d - 0.5) ** 2
        w2 = 0.5 * d**2
        return [(0, w0), (1, w1), (2, w2)]
    if worder == 4:
        d = frac
        w0 = (1.0 - d) ** 3 / 6.0
        w1 = (4.0 - 6.0 * d**2 + 3.0 * d**3) / 6.0
        w2 = (4.0 - 6.0 * (1 - d) ** 2 + 3.0 * (1 - d) ** 3) / 6.0
        w3 = d**3 / 6.0
        return [(0, w0), (1, w1), (2, w2), (3, w3)]
    raise ValueError(f"worder {worder} not supported (1..4)")


def _base_and_frac(x, worder: int):
    """Base grid index and fractional distance for each MAS order."""
    if worder == 1:
        base = jnp.floor(x + 0.5)
        return base.astype(jnp.int32), jnp.zeros_like(x)
    if worder in (2, 4):
        base = jnp.floor(x) if worder == 2 else jnp.floor(x) - 1
        return base.astype(jnp.int32), x - jnp.floor(x)
    # TSC: centered on nearest grid point
    nearest = jnp.floor(x + 0.5)
    base = nearest - 1
    return base.astype(jnp.int32), x - (nearest - 1) - 0.5  # in [0,1)


@partial(jax.jit, static_argnames=("nmesh", "worder"))
def deposit(positions, nmesh: int, worder: int = 2):
    """Deposit unit-mass particles onto a periodic mesh.

    Args:
        positions: (Np, 3) in grid units of the *output* mesh ([0, nmesh)).
        nmesh: output mesh size.
        worder: MAS order (1..4).

    Returns:
        rho/rho_bar: (nmesh, nmesh, nmesh) float32.
    """
    pos = jnp.asarray(positions, jnp.float32)
    n_p = pos.shape[0]
    bases, fracs = [], []
    for d in range(3):
        b, f = _base_and_frac(pos[:, d], worder)
        bases.append(b)
        fracs.append(f)
    wlists = [_kernel_weights(f, worder) for f in fracs]

    mesh = jnp.zeros((nmesh * nmesh * nmesh,), jnp.float32)
    for ox, wx in wlists[0]:
        ix = jnp.mod(bases[0] + ox, nmesh)
        for oy, wy in wlists[1]:
            iy = jnp.mod(bases[1] + oy, nmesh)
            for oz, wz in wlists[2]:
                iz = jnp.mod(bases[2] + oz, nmesh)
                flat = (ix * nmesh + iy) * nmesh + iz
                mesh = mesh.at[flat].add(wx * wy * wz)
    mean = n_p / float(nmesh**3)
    return mesh.reshape(nmesh, nmesh, nmesh) / mean


def deposit_displacement(psi, boxsize: float, nmesh: int | None = None, worder: int = 2):
    """rho/rho_bar of an N^3 Lagrangian grid displaced by psi (3, N, N, N)."""
    n = psi.shape[1]
    nmesh = nmesh or n
    cell_out = boxsize / nmesh
    # Lagrangian positions on the FFT grid (x_i = i * L/N), matching where
    # delta/psi are sampled — MAS weights are defined about grid points.
    q = jnp.arange(n, dtype=jnp.float32) * (boxsize / n)
    qx, qy, qz = jnp.meshgrid(q, q, q, indexing="ij")
    pos = jnp.stack(
        [
            (qx + psi[0]).ravel(),
            (qy + psi[1]).ravel(),
            (qz + psi[2]).ravel(),
        ],
        axis=-1,
    ) / cell_out
    pos = jnp.mod(pos, nmesh)
    return deposit(pos, nmesh, worder)


def mas_window(n: int, worder: int):
    """Fourier-space MAS window W(k) on the rfftn grid (product of sincs)."""
    def sinc(v):
        x = np.pi * v / n
        return jnp.where(jnp.abs(x) > 1e-12, jnp.sin(x) / jnp.where(jnp.abs(x) > 1e-12, x, 1.0), 1.0)

    fx = jnp.fft.fftfreq(n, d=1.0 / n)
    fz = jnp.fft.rfftfreq(n, d=1.0 / n)
    wx = sinc(fx) ** worder
    wz = sinc(fz) ** worder
    return wx[:, None, None] * wx[None, :, None] * wz[None, None, :]


def deconvolve_mas(delta, worder: int):
    """Divide out the MAS window in Fourier space (reference utils.py:136-148)."""
    n = delta.shape[0]
    dk = jnp.fft.rfftn(jnp.asarray(delta, jnp.float32))
    w = mas_window(n, worder)
    dk = dk / jnp.maximum(w, 1e-8)
    return jnp.fft.irfftn(dk, s=delta.shape).astype(jnp.float32)
