"""On-mesh field generation: GRF ICs, Zel'dovich LPT, and MAS deposition
for spatially sharded volumes.

Together with ``powerspec_sharded`` this completes the pod-scale pipeline
with no host gather anywhere: IC generation -> 1LPT displacement ->
emulation (``parallel.ShardedHierarchicalProcessor``) -> density
deposition -> P(k)/T(k)/C(k), every stage leaving the volume sharded over
the 3D spatial mesh.  The single-device counterparts (``science/grf.py``,
``science/lpt.py``, ``science/mas.py`` — themselves replacing the
reference's DISCO-DJ/CLASS/Pylians usage, ``scripts/core.py:263-302,
396-408`` there) define the semantics; equality is asserted on the
8-virtual-device CPU mesh in ``tests/test_field_sharded.py``.

Spectral pieces reuse the pencil-decomposed FFT of ``powerspec_sharded``
(6 tiled ``all_to_all`` per transform, riding ICI).  Deposition is the
classic distributed particle-mesh scatter: each shard deposits its own
Lagrangian block's particles onto a ``margin``-padded local grid, then a
**halo reduce** — the reverse of the runtime's halo exchange — ships each
pad slab to the neighbor that owns those cells and adds it into that
neighbor's interior (one ``ppermute`` pair per sharded axis; processing
axes sequentially over the still-padded remaining axes routes corner mass
through two hops automatically).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import SPATIAL_AXES, shard_linear_index
from .grf import _interp_pk
from .mas import _base_and_frac, _kernel_weights
from .powerspec_sharded import (
    _check_geometry,
    _fft3_local,
    _local_kmag,
    _local_kvec,
)


def _ifft3_local(x, mesh_shape):
    """Inverse of ``powerspec_sharded._fft3_local`` (same pencil cycles)."""
    mx, my, mz = mesh_shape
    if mz > 1:
        x = lax.all_to_all(x, "z", split_axis=0, concat_axis=2, tiled=True)
    x = jnp.fft.ifft(x, axis=2)
    if mz > 1:
        x = lax.all_to_all(x, "z", split_axis=2, concat_axis=0, tiled=True)
    if my > 1:
        x = lax.all_to_all(x, "y", split_axis=0, concat_axis=1, tiled=True)
    x = jnp.fft.ifft(x, axis=1)
    if my > 1:
        x = lax.all_to_all(x, "y", split_axis=1, concat_axis=0, tiled=True)
    if mx > 1:
        x = lax.all_to_all(x, "x", split_axis=1, concat_axis=0, tiled=True)
    x = jnp.fft.ifft(x, axis=0)
    if mx > 1:
        x = lax.all_to_all(x, "x", split_axis=0, concat_axis=1, tiled=True)
    return x


def _shard_and_put(mesh: Mesh, *fields, rank=3):
    """Device_put fields under the block sharding unless already there."""
    spec = P(*([None] * (rank - 3) + list(SPATIAL_AXES)))
    sharding = NamedSharding(mesh, spec)
    out = tuple(
        f
        if isinstance(f, jax.Array) and f.sharding == sharding
        else jax.device_put(jnp.asarray(f), sharding)
        for f in fields
    )
    return out if len(out) > 1 else out[0]


def gaussian_random_field_sharded(
    key, n: int, mesh: Mesh, boxsize: float, k_table, p_table, *,
    white=None, fixed_amplitude: bool = False,
):
    """Mesh-sharded delta(x) with power spectrum P(k).

    On-mesh counterpart of ``grf.gaussian_random_field``: real white noise
    is colored in Fourier space by sqrt(P N^3 / V).  By default each shard
    draws its own block from ``fold_in(key, shard_linear_index)`` — a
    different (but equally white) realization than the single-device
    draw; pass ``white`` (an (n, n, n) field) to color given noise, in
    which case the output equals the single-device function on that noise
    exactly (up to fp reorder — asserted in tests).

    Returns a sharded (n, n, n) float32 ``jax.Array``.
    """
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)
    mx, my, mz = mesh_shape
    local = (n // mx, n // my, n // mz)
    kt = jnp.asarray(k_table, jnp.float32)
    pt = jnp.asarray(p_table, jnp.float32)

    def color(w):
        wk = _fft3_local(w, mesh_shape)
        if fixed_amplitude:
            # unit-modulus modes (variance-suppressed "fixed" ICs), same
            # normalization as grf.gaussian_random_field: |W| -> sqrt(N^3)
            mag = jnp.abs(wk)
            wk = jnp.where(mag > 0, wk / jnp.maximum(mag, 1e-30), 0.0) * (
                float(n) ** 1.5
            )
        kmag = _local_kmag(n, boxsize, mesh_shape)
        amp = jnp.sqrt(_interp_pk(kmag, kt, pt) * float(n) ** 3 / boxsize**3)
        # amp is 0 at k=0 (interp_pk zeroes kmag==0), so no DC to clear
        return _ifft3_local(wk * amp, mesh_shape).real.astype(jnp.float32)

    if white is not None:
        prog = shard_map(
            color, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
            out_specs=P(*SPATIAL_AXES), check_vma=False,
        )
        return jax.jit(prog)(_shard_and_put(mesh, white))

    def draw_and_color(k):
        sidx = shard_linear_index(mesh_shape)
        w = jax.random.normal(jax.random.fold_in(k, sidx), local, jnp.float32)
        return color(w)

    prog = shard_map(
        draw_and_color, mesh=mesh, in_specs=(P(),),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(key)


def zeldovich_displacement_sharded(delta, mesh: Mesh, boxsize: float):
    """1LPT displacement of a mesh-sharded linear density contrast.

    On-mesh counterpart of ``lpt.zeldovich_displacement``
    (``psi_k = i k / k^2 delta_k``): one forward and three inverse pencil
    FFTs.  Returns a sharded (3, n, n, n) float32 array.
    """
    n = delta.shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)

    def prog(d):
        dk = _fft3_local(d.astype(jnp.complex64), mesh_shape)
        kx, ky, kz = _local_kvec(n, boxsize, mesh_shape)
        k2 = (
            kx[:, None, None] ** 2
            + ky[None, :, None] ** 2
            + kz[None, None, :] ** 2
        )
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
        # zero the ik numerator at the Nyquist plane (the canonical
        # sign-symmetric derivative; matches lpt.zeldovich_displacement)
        nyq = n // 2 * (2.0 * np.pi / boxsize)
        kx, ky, kz = (
            jnp.where(jnp.abs(k) == nyq, 0.0, k) for k in (kx, ky, kz)
        )
        kvec = (kx[:, None, None], ky[None, :, None], kz[None, None, :])
        psi = [
            _ifft3_local((1j * kvec[d]) * inv_k2 * dk, mesh_shape)
            .real.astype(jnp.float32)
            for d in range(3)
        ]
        return jnp.stack(psi)

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=P(None, *SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(_shard_and_put(mesh, delta))


def _deposit_local(rel, shape, wrap, worder: int):
    """Scatter-add unit particles onto a local (padded) grid.

    Args:
        rel: (Np, 3) positions in local grid coordinates.
        shape: local grid shape.
        wrap: per-axis bool — True wraps periodically (axis fully local),
            False clamps the tap base into the grid (sharded axis: the
            pad must already cover every reachable cell; clamping only
            protects against out-of-margin outliers, keeping their mass
            at the pad edge instead of dropping it).
        worder: MAS order 1..4.
    """
    bases, taps = [], []
    for d in range(3):
        b, f = _base_and_frac(rel[:, d], worder)
        taps.append(_kernel_weights(f, worder))
        bases.append(b)
    mesh_flat = jnp.zeros((int(np.prod(shape)),), jnp.float32)
    for ox, wx in taps[0]:
        ix = bases[0] + ox
        ix = jnp.mod(ix, shape[0]) if wrap[0] else jnp.clip(ix, 0, shape[0] - 1)
        for oy, wy in taps[1]:
            iy = bases[1] + oy
            iy = jnp.mod(iy, shape[1]) if wrap[1] else jnp.clip(iy, 0, shape[1] - 1)
            for oz, wz in taps[2]:
                iz = bases[2] + oz
                iz = jnp.mod(iz, shape[2]) if wrap[2] else jnp.clip(iz, 0, shape[2] - 1)
                flat = (ix * shape[1] + iy) * shape[2] + iz
                mesh_flat = mesh_flat.at[flat].add(wx * wy * wz)
    return mesh_flat.reshape(shape)


def _halo_reduce(grid, axis: int, axis_name: str, msize: int, margin: int):
    """Add this shard's pad slabs into the neighbors that own those cells."""
    if msize == 1 or margin == 0:
        return grid
    size = grid.shape[axis]
    low = lax.slice_in_dim(grid, 0, margin, axis=axis)
    high = lax.slice_in_dim(grid, size - margin, size, axis=axis)
    # my low pad covers my lower neighbor's top interior cells (and vice
    # versa); receive the matching slabs from both neighbors and add them
    from_upper = lax.ppermute(
        low, axis_name, [((i + 1) % msize, i) for i in range(msize)]
    )
    from_lower = lax.ppermute(
        high, axis_name, [((i - 1) % msize, i) for i in range(msize)]
    )
    grid = lax.dynamic_update_index_in_dim(
        grid,
        lax.dynamic_slice_in_dim(grid, size - 2 * margin, margin, axis)
        + from_upper,
        size - 2 * margin,
        axis,
    )
    grid = lax.dynamic_update_index_in_dim(
        grid,
        lax.dynamic_slice_in_dim(grid, margin, margin, axis) + from_lower,
        margin,
        axis,
    )
    return grid


def deposit_displacement_sharded(
    psi,
    mesh: Mesh,
    boxsize: float,
    worder: int = 2,
    margin: int = 32,
    check_margin: bool = True,
):
    """rho/rho_bar of the displaced Lagrangian grid, fully on-mesh.

    On-mesh counterpart of ``mas.deposit_displacement`` (output mesh ==
    particle grid).  Each shard deposits its own block's particles onto a
    ``margin``-padded local grid; pad slabs are then halo-reduced into
    the owning neighbors.

    Args:
        psi: (3, n, n, n) displacement [Mpc/h], sharded or shardable.
        margin: pad depth in cells per sharded-axis side.  Must cover the
            largest displacement: ``margin >= max|psi| / (boxsize/n) +
            worder``.  Zel'dovich at z=0 moves ~10-20 Mpc/h, so the
            default 32 covers production cell sizes >~ 1 Mpc/h.
        check_margin: host-side assert of that bound (one small sync).

    Returns a sharded (n, n, n) float32 density (mean 1).
    """
    n = psi.shape[1]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    for s, m in zip((n, n, n), mesh_shape):
        if s % m:
            raise ValueError(f"grid {n} not divisible by mesh {mesh_shape}")
    cell = boxsize / n
    psi = _shard_and_put(mesh, psi, rank=4)
    if check_margin:
        # Only sharded axes need margin: fully-local axes wrap periodically
        # (margin 0), so their displacement components are unconstrained.
        comp_max = np.asarray(jnp.max(jnp.abs(psi), axis=(1, 2, 3)))
        for d in range(3):
            if mesh_shape[d] == 1:
                continue
            need = float(comp_max[d]) / cell + worder
            if need > margin:
                raise ValueError(
                    f"margin {margin} cells < axis-{d} max displacement "
                    f"{need:.1f} cells; raise margin= (mass would clamp to "
                    f"the pad edge)"
                )
    local = tuple(n // m for m in mesh_shape)
    margins = tuple(margin if m > 1 else 0 for m in mesh_shape)
    for ln, mg, m in zip(local, margins, mesh_shape):
        if m > 1 and ln < mg:
            raise ValueError(
                f"local extent {ln} < margin {mg}: single-hop halo reduce "
                f"needs n/mesh >= margin"
            )
    padded = tuple(ln + 2 * mg for ln, mg in zip(local, margins))
    wrap = tuple(m == 1 for m in mesh_shape)

    def prog(psi_local):
        # Global Lagrangian cell indices of this block's particles
        idx = [
            lax.axis_index(ax) * local[d] + jnp.arange(local[d], dtype=jnp.int32)
            for d, ax in enumerate(SPATIAL_AXES)
        ]
        q = jnp.stack(
            jnp.meshgrid(*[i.astype(jnp.float32) for i in idx], indexing="ij"),
            axis=-1,
        )  # (l0, l1, l2, 3) in cell units
        pos = q + jnp.moveaxis(psi_local, 0, -1).astype(jnp.float32) / cell
        # to local padded coordinates; wrap the fully local axes
        starts = jnp.stack(
            [
                (lax.axis_index(ax) * local[d] - margins[d]).astype(jnp.float32)
                for d, ax in enumerate(SPATIAL_AXES)
            ]
        )
        rel = pos.reshape(-1, 3) - starts
        for d in range(3):
            if wrap[d]:
                rel = rel.at[:, d].set(jnp.mod(rel[:, d], padded[d]))
        grid = _deposit_local(rel, padded, wrap, worder)
        for d, ax in enumerate(SPATIAL_AXES):
            grid = _halo_reduce(grid, d, ax, mesh_shape[d], margins[d])
        return lax.slice(
            grid,
            tuple(margins),
            tuple(mg + ln for mg, ln in zip(margins, local)),
        )

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(None, *SPATIAL_AXES),),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(psi)


def deconvolve_mas_sharded(delta, mesh: Mesh, worder: int):
    """Divide out the MAS window in Fourier space, on-mesh
    (counterpart of ``mas.deconvolve_mas``)."""
    n = delta.shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)

    def prog(d):
        dk = _fft3_local(d.astype(jnp.complex64), mesh_shape)
        kx, ky, kz = _local_kvec(n, 2.0 * np.pi * n, mesh_shape)
        # freq in mode units = k / kf with kf = 2*pi/boxsize; the boxsize
        # chosen above makes kvec the mode number / n directly

        def sinc_pw(f):
            x = np.pi * f
            return jnp.where(
                jnp.abs(x) > 1e-12,
                jnp.sin(x) / jnp.where(jnp.abs(x) > 1e-12, x, 1.0),
                1.0,
            ) ** worder

        w = (
            sinc_pw(kx)[:, None, None]
            * sinc_pw(ky)[None, :, None]
            * sinc_pw(kz)[None, None, :]
        )
        dk = dk / jnp.maximum(w, 1e-8)
        return _ifft3_local(dk, mesh_shape).real.astype(jnp.float32)

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(_shard_and_put(mesh, delta))


def displacement_to_density_sharded(
    psi,
    mesh: Mesh,
    boxsize: float,
    worder: int = 2,
    deconvolve: bool = True,
    margin: int = 32,
    check_margin: bool = True,
):
    """On-mesh counterpart of ``lpt.displacement_to_density`` (nmesh == n):
    deposit the displaced grid, subtract the mean, optionally deconvolve
    the MAS window."""
    rho = deposit_displacement_sharded(
        psi, mesh, boxsize, worder=worder, margin=margin,
        check_margin=check_margin,
    )
    delta = rho - 1.0
    if deconvolve:
        delta = deconvolve_mas_sharded(delta, mesh, worder)
    return delta
