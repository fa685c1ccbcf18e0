"""Distributed (on-mesh) power spectra for spatially sharded fields.

The single-device estimators (``science/powerspec.py``) need the whole field
on one chip; at the 2048^3 pod-scale target a gather is ~100 GB.  This module
computes the same statistics with the field left sharded over the 3D spatial
mesh (``parallel.mesh.SPATIAL_AXES``):

  * **Pencil-decomposed 3D FFT** inside ``shard_map``: for each axis in
    turn, an ``all_to_all`` over that mesh axis makes the axis fully local
    (splitting another axis deeper), a local batched FFT transforms it, and
    the inverse ``all_to_all`` restores the block sharding.  After the three
    cycles each shard holds the contiguous global block
    ``[ix*N/mx :, iy*N/my :, iz*N/mz :]`` of the full complex spectrum.
  * **Shard-local shell binning + psum**: each shard bins |delta_k|^2 over
    its own global k indices (every mode counted once — the full complex
    transform needs no Hermitian weights) and the per-shell sums are
    ``psum``-reduced, so the binned spectra come out replicated and exactly
    equal (up to fp reorder) to the single-device estimator — asserted on a
    CPU mesh in ``tests/test_sharded_powerspec.py``.

Collectives are 6 tiled ``all_to_all``s per FFT — all riding ICI on a pod
slice.  Peak memory is one complex64 copy of the local shard (~8 B/voxel).

Replaces (at scale) the reference's Pylians-based validation
(``/root/reference/scripts/utils.py:994-1053, 1402-1603``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import SPATIAL_AXES
from .powerspec import _bin_edges


def _check_geometry(n: int, mesh_shape):
    mx, my, mz = mesh_shape
    for name, num, den in (
        ("N/mx % mz", n // mx, mz),
        ("N/mx % my", n // mx, my),
        ("N/my % mx", n // my, mx),
        ("N % mx", n, mx),
        ("N % my", n, my),
        ("N % mz", n, mz),
    ):
        if num % den:
            raise ValueError(
                f"sharded FFT needs {name} == 0 (N={n}, mesh={mesh_shape})"
            )


def _fft3_local(x, mesh_shape):
    """Full 3D complex FFT of a block-sharded field, inside shard_map.

    ``x``: local (N/mx, N/my, N/mz) block.  Returns the matching local block
    of the global 3D spectrum.
    """
    mx, my, mz = mesh_shape
    x = x.astype(jnp.complex64)
    # axis 2 (mesh 'z'): make z local by splitting axis 0 deeper
    if mz > 1:
        x = lax.all_to_all(x, "z", split_axis=0, concat_axis=2, tiled=True)
    x = jnp.fft.fft(x, axis=2)
    if mz > 1:
        x = lax.all_to_all(x, "z", split_axis=2, concat_axis=0, tiled=True)
    # axis 1 (mesh 'y')
    if my > 1:
        x = lax.all_to_all(x, "y", split_axis=0, concat_axis=1, tiled=True)
    x = jnp.fft.fft(x, axis=1)
    if my > 1:
        x = lax.all_to_all(x, "y", split_axis=1, concat_axis=0, tiled=True)
    # axis 0 (mesh 'x'): split axis 1 deeper
    if mx > 1:
        x = lax.all_to_all(x, "x", split_axis=1, concat_axis=0, tiled=True)
    x = jnp.fft.fft(x, axis=0)
    if mx > 1:
        x = lax.all_to_all(x, "x", split_axis=0, concat_axis=1, tiled=True)
    return x


def _local_kvec(n: int, boxsize: float, mesh_shape):
    """Per-axis physical wavenumbers (1D) for this shard's global block
    of the full (non-rfft) k grid (fftfreq semantics)."""
    mx, my, mz = mesh_shape
    kf = 2.0 * np.pi / boxsize

    def freq(i):  # fftfreq in mode units from a global index array
        return jnp.where(i < (n + 1) // 2, i, i - n).astype(jnp.float32)

    i0 = lax.axis_index("x") * (n // mx) + jnp.arange(n // mx)
    i1 = lax.axis_index("y") * (n // my) + jnp.arange(n // my)
    i2 = lax.axis_index("z") * (n // mz) + jnp.arange(n // mz)
    return freq(i0) * kf, freq(i1) * kf, freq(i2) * kf


def _local_kmag(n: int, boxsize: float, mesh_shape):
    """|k| for this shard's global block of the full (non-rfft) k grid."""
    kx, ky, kz = _local_kvec(n, boxsize, mesh_shape)
    return jnp.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )


def _bin_local(kmag, quantity, edges, nbins: int):
    """Shard-local shell sums, psum-reduced over the whole mesh."""
    idx = jnp.clip(jnp.searchsorted(edges, kmag.ravel()) - 1, 0, nbins - 1)
    w = ((kmag >= edges[0]) & (kmag < edges[-1])).ravel().astype(jnp.float32)
    counts = jnp.bincount(idx, weights=w, length=nbins)
    ksum = jnp.bincount(idx, weights=w * kmag.ravel(), length=nbins)
    qsum = jnp.bincount(idx, weights=w * quantity.ravel(), length=nbins)
    out = jnp.stack([counts, ksum, qsum])
    out = lax.psum(out, SPATIAL_AXES)
    counts, ksum, qsum = out
    counts_safe = jnp.maximum(counts, 1e-30)
    return ksum / counts_safe, qsum / counts_safe, counts


def _spectrum_program(n, boxsize, nbins, edges, mesh_shape, cross: bool):
    def prog(*fields):
        specs = [_fft3_local(f, mesh_shape) for f in fields]
        v = boxsize**3
        norm = v / float(n) ** 6
        if cross:
            a, b = specs
            q = (a.real * b.real + a.imag * b.imag) * norm
        else:
            (a,) = specs
            q = (a.real**2 + a.imag**2) * norm
        kmag = _local_kmag(n, boxsize, mesh_shape)
        return _bin_local(kmag, q, edges, nbins)

    return prog


def _run(mesh: Mesh, fields, boxsize: float, nbins, cross: bool):
    n = fields[0].shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)
    nbins = nbins or n // 2
    edges = _bin_edges(n, boxsize, nbins)
    sharding = NamedSharding(mesh, P(*SPATIAL_AXES))
    fields = tuple(
        f
        if isinstance(f, jax.Array) and f.sharding == sharding
        else jax.device_put(jnp.asarray(f), sharding)
        for f in fields
    )
    prog = shard_map(
        _spectrum_program(n, boxsize, nbins, edges, mesh_shape, cross),
        mesh=mesh,
        in_specs=(P(*SPATIAL_AXES),) * len(fields),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(prog)(*fields)


def power_spectrum_sharded(delta, mesh: Mesh, boxsize: float, nbins=None):
    """Auto P(k) of a mesh-sharded periodic density field.

    Args:
        delta: (N, N, N) field — an already-sharded ``jax.Array`` (stays
            sharded) or any array (will be sharded over ``mesh``).
        mesh: 3D spatial mesh (axes ``SPATIAL_AXES``).
        boxsize: box side [Mpc/h].
        nbins: number of k shells (default N/2).

    Returns:
        (k, Pk, Nmodes) — replicated small arrays, matching
        ``science.powerspec.power_spectrum`` exactly (up to fp reorder).
    """
    k, pk, counts = _run(mesh, (delta,), boxsize, nbins, cross=False)
    return k, pk, counts


def cross_power_sharded(delta_a, delta_b, mesh: Mesh, boxsize: float, nbins=None):
    """Cross power Re<delta_a delta_b*> of two mesh-sharded fields."""
    k, px, counts = _run(mesh, (delta_a, delta_b), boxsize, nbins, cross=True)
    return k, px, counts


def transfer_and_correlation_sharded(
    delta_model, delta_target, mesh: Mesh, boxsize: float, nbins=None
):
    """Sharded T(k) = sqrt(P_m/P_t) and C(k) = P_x/sqrt(P_m P_t).

    The on-mesh counterpart of ``powerspec.transfer_and_correlation``
    (reference ``scripts/utils.py:1402-1603``).
    """
    k, p_m, _ = power_spectrum_sharded(delta_model, mesh, boxsize, nbins)
    _, p_t, _ = power_spectrum_sharded(delta_target, mesh, boxsize, nbins)
    _, p_x, _ = cross_power_sharded(delta_model, delta_target, mesh, boxsize, nbins)
    t = jnp.sqrt(jnp.maximum(p_m, 1e-30) / jnp.maximum(p_t, 1e-30))
    c = p_x / jnp.sqrt(jnp.maximum(p_m * p_t, 1e-60))
    return k, t, c


@partial(jax.jit, static_argnames=())
def _moments(a, b):
    """Distributed field moments: plain jnp reductions over sharded arrays
    — GSPMD inserts the cross-shard collectives, nothing is gathered."""
    a = a.astype(jnp.float32).ravel()
    b = b.astype(jnp.float32).ravel()
    ma, mb = jnp.mean(a), jnp.mean(b)
    sa = jnp.std(a)
    sb = jnp.std(b)
    cov = jnp.mean((a - ma) * (b - mb))
    return {
        "rmse": jnp.sqrt(jnp.mean((a - b) ** 2)),
        "pearson_r": cov / jnp.maximum(sa * sb, 1e-30),
        "mean_model": ma,
        "mean_target": mb,
        "std_model": sa,
        "std_target": sb,
        "skew_model": jnp.mean((a - ma) ** 3) / jnp.maximum(sa**3, 1e-30),
        "skew_target": jnp.mean((b - mb) ** 3) / jnp.maximum(sb**3, 1e-30),
    }


def summary_metrics_sharded(
    delta_model, delta_target, mesh: Mesh, boxsize: float, kmax: float | None = None
):
    """On-mesh counterpart of ``powerspec.summary_metrics``: the same scalar
    regression dict (``/root/reference/scripts/utils.py:1584-1603``) with
    the fields left sharded — moments via GSPMD-distributed reductions,
    spectra via the pencil FFT estimators."""
    sharding = NamedSharding(mesh, P(*SPATIAL_AXES))
    fields = tuple(
        f
        if isinstance(f, jax.Array) and f.sharding == sharding
        else jax.device_put(jnp.asarray(f), sharding)
        for f in (delta_model, delta_target)
    )
    mom = {k: float(v) for k, v in _moments(*fields).items()}
    k, t, c = transfer_and_correlation_sharded(*fields, mesh, boxsize)
    k, t, c = np.asarray(k), np.asarray(t), np.asarray(c)
    sel = np.ones_like(k, bool) if kmax is None else (k <= kmax)
    mom.update(
        {
            "median_abs_T_minus_1": float(np.median(np.abs(t[sel] - 1.0))),
            "max_abs_T_minus_1": float(np.max(np.abs(t[sel] - 1.0))),
            "mean_1_minus_C": float(np.mean(1.0 - c[sel])),
        }
    )
    return mom
