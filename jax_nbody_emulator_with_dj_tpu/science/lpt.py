"""First-order Lagrangian perturbation theory (Zel'dovich), pure JAX.

Replaces the reference pipeline's DISCO-DJ usage for 1LPT displacement and
the psi -> density mapping (reference ``scripts/core.py:396-408``):

    psi_k = i k / k^2  delta_k          (Zel'dovich displacement)
    delta_NL(x) = deposit(q + psi) - 1  (PM/MAS density of displaced grid)

The emulator consumes psi normalized at z=0 (growth applied in-model via
Dz), matching the reference's input convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mas import deposit_displacement


@partial(jax.jit, static_argnames=("boxsize",))
def zeldovich_displacement(delta, boxsize: float):
    """1LPT displacement field from a linear density contrast.

    Args:
        delta: (N, N, N) linear density contrast (z=0 normalization).
        boxsize: box side [Mpc/h].

    Returns:
        psi: (3, N, N, N) displacement [Mpc/h], float32.
    """
    n = delta.shape[0]
    kf = 2 * np.pi / boxsize
    kx = jnp.fft.fftfreq(n, d=1.0 / n) * kf
    kz = jnp.fft.rfftfreq(n, d=1.0 / n) * kf
    kvec = (
        kx[:, None, None],
        kx[None, :, None],
        kz[None, None, :],
    )
    k2 = kvec[0] ** 2 + kvec[1] ** 2 + kvec[2] ** 2
    # Odd spectral derivatives at the Nyquist plane are sign-ambiguous (the
    # half-grid conventions of rfftn make the choice depend on which mirror
    # stores the mode); the canonical choice — also the Hermitian-projected
    # full-grid result, so the sharded implementation agrees exactly — is to
    # zero the ik numerator there.  k^2 keeps the Nyquist magnitude.
    nyq = n // 2 * kf
    kd = tuple(jnp.where(jnp.abs(k) == nyq, 0.0, k) for k in kvec)
    dk = jnp.fft.rfftn(jnp.asarray(delta, jnp.float32))
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    psi = []
    for d in range(3):
        psik = (1j * kd[d]) * inv_k2 * dk
        psi.append(jnp.fft.irfftn(psik, s=(n, n, n)).astype(jnp.float32))
    return jnp.stack(psi)


@partial(jax.jit, static_argnames=("boxsize", "nmesh", "worder", "deconvolve"))
def displacement_to_density(
    psi, boxsize: float, nmesh: int | None = None, worder: int = 2, deconvolve: bool = True
):
    """Density contrast of grid particles displaced by psi.

    Args:
        psi: (3, N, N, N) displacement [Mpc/h].
        boxsize: box side [Mpc/h].
        nmesh: output mesh size (default: particle grid size N).
        worder: MAS order (1=NGP, 2=CIC, 3=TSC, 4=PCS).
        deconvolve: divide out the MAS window in Fourier space.
    """
    from .mas import deconvolve_mas

    rho = deposit_displacement(psi, boxsize, nmesh=nmesh, worder=worder)
    delta = rho - 1.0
    if deconvolve:
        delta = deconvolve_mas(delta, worder)
    return delta
