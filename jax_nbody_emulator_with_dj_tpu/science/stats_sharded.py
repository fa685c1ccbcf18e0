"""On-mesh Minkowski functionals and reduced bispectrum.

Completes the distributed validation suite (with ``powerspec_sharded`` and
``field_sharded``): every diagnostic the reference computes through
Pylians/numpy on a gathered box (``scripts/utils.py:652-763`` Minkowski,
``:1314-1399`` bispectrum) runs here with the field left block-sharded
over the 3D spatial mesh.

* **Minkowski V0..V3**: the cubical-complex counts need each cell's
  neighbors at the index-1 side only, so one 1-voxel low-side halo plane
  per axis (``ppermute`` from the previous shard, sequential over axes so
  corner slivers route themselves) makes every count shard-local; the
  four counts are ``psum``-reduced and pushed through the same Crofton
  relations as ``science/minkowski.py``.
* **Reduced bispectrum Q(theta)**: the Scoccimarro FFT-binned estimator
  is a handful of band-filtered inverse FFTs and global sums — pencil
  ``all_to_all`` transforms (``powerspec_sharded``) plus ``psum``s.

Equality with the single-device estimators is asserted on the 8-device
CPU mesh in ``tests/test_stats_sharded.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import SPATIAL_AXES
from .field_sharded import _ifft3_local, _shard_and_put
from .powerspec_sharded import _check_geometry, _fft3_local, _local_kmag


def _extend_low(d, mesh_shape):
    """Prepend each axis's global index-1 neighbor plane (periodic)."""
    ext = d
    for ax, (name, m) in enumerate(zip(SPATIAL_AXES, mesh_shape)):
        last = lax.slice_in_dim(ext, ext.shape[ax] - 1, ext.shape[ax], axis=ax)
        if m > 1:
            # my last plane belongs at the next shard's front
            last = lax.ppermute(
                last, name, [((i - 1) % m, i) for i in range(m)]
            )
        ext = jnp.concatenate([last, ext], axis=ax)
    return ext


def _check_count_capacity(local):
    """The per-shard Minkowski counts are exact int32 bool-sums; n1/n2 sum
    up to 3x the shard's voxel count, so guard the int32 range instead of
    silently wrapping (x64 is disabled, so int64 sums are unavailable)."""
    if 3 * int(np.prod(local)) > np.iinfo(np.int32).max:
        raise ValueError(
            f"local shard {local} exceeds the exact-int32 count capacity "
            f"(3 * prod(local) > 2^31 - 1); shard over more devices"
        )


def minkowski_functionals_sharded(delta, thresholds, mesh: Mesh):
    """V0..V3 of mesh-sharded excursion sets.

    The Euler characteristic (V3) is computed from integer-exact per-shard
    alternating sums at any scale; V0-V2 reduce monotone counts in float32
    (relative rounding ~1e-7 at pod sizes).  Matches
    ``minkowski.minkowski_functionals`` on every test grid.

    Returns a replicated (T, 4) array.
    """
    n = delta.shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    for s, m in zip(delta.shape, mesh_shape):
        if s % m:
            raise ValueError(f"grid {delta.shape} not divisible by {mesh_shape}")
    local = tuple(s // m for s, m in zip(delta.shape, mesh_shape))
    _check_count_capacity(local)
    thresholds = jnp.asarray(thresholds, jnp.float32)
    vol = float(np.prod(delta.shape))

    def prog(d):
        ext = _extend_low(d.astype(jnp.float32), mesh_shape)

        def counts(t):
            b = ext > t

            def block(o):
                return lax.slice(
                    b,
                    tuple(1 - oi for oi in o),
                    tuple(1 - oi + li for oi, li in zip(o, local)),
                )

            b0 = block((0, 0, 0))
            n3 = jnp.sum(b0)
            n2 = 0
            for ax in range(3):
                e = [0, 0, 0]
                e[ax] = 1
                n2 = n2 + jnp.sum(b0 | block(tuple(e)))
            n1 = 0
            for ax in range(3):
                o1, o2 = [dd for dd in range(3) if dd != ax]
                acc = b0
                for c1 in (0, 1):
                    for c2 in (0, 1):
                        if c1 == 0 and c2 == 0:
                            continue
                        o = [0, 0, 0]
                        o[o1], o[o2] = c1, c2
                        acc = acc | block(tuple(o))
                n1 = n1 + jnp.sum(acc)
            acc = b0
            for o in (
                (0, 0, 1), (0, 1, 0), (0, 1, 1),
                (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1),
            ):
                acc = acc | block(o)
            n0 = jnp.sum(acc)
            # Combine per shard in int32 (exact: _check_count_capacity
            # guarantees 3 * prod(local) fits int32), THEN
            # reduce.  The alternating Euler sum chi = n0-n1+n2-n3 is a
            # small topological number per shard, so its int32 psum stays
            # exact at any scale; the monotone combinations are reduced in
            # f32 (relative rounding ~1e-7 — they are only ever used as
            # densities), because their global sums can exceed int32.
            chi = (n0 - n1 + n2 - n3).astype(jnp.int32)
            chi = lax.psum(chi, SPATIAL_AXES)
            c = jnp.stack(
                [n3, n2 - 3 * n3, n1 - 2 * n2 + 3 * n3]
            ).astype(jnp.float32)
            n3s, v1c, v2c = lax.psum(c, SPATIAL_AXES)
            return jnp.stack(
                [
                    n3s / vol,
                    (2.0 / 9.0) * v1c / vol,
                    (2.0 / 9.0) * v2c / vol,
                    chi.astype(jnp.float32) / vol,
                ]
            )

        return lax.map(counts, thresholds)

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=P(), check_vma=False,
    )
    return jax.jit(prog)(_shard_and_put(mesh, delta))


def reduced_bispectrum_sharded(
    delta, mesh: Mesh, boxsize: float, k1: float, k2: float, thetas,
    dk_width: float | None = None,
):
    """Q(theta) for (k1, k2, theta) triangles, fully on-mesh.

    Same estimator and return dict as ``bispectrum.reduced_bispectrum``.
    """
    n = delta.shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)
    kf = 2 * np.pi / boxsize
    half = dk_width if dk_width is not None else kf
    v = boxsize**3
    n3_f = float(n) ** 3
    thetas = np.asarray(thetas, np.float64)
    k3s = np.sqrt(k1**2 + k2**2 + 2 * k1 * k2 * np.cos(thetas))

    def prog(d):
        dk = _fft3_local(d.astype(jnp.complex64), mesh_shape)
        kmag = _local_kmag(n, boxsize, mesh_shape)

        def band(kc):
            mask = ((kmag >= kc - half) & (kmag < kc + half)).astype(
                jnp.complex64
            )
            return (
                _ifft3_local(dk * mask, mesh_shape).real,
                _ifft3_local(mask, mesh_shape).real,
            )

        def gsum(x):
            return lax.psum(jnp.sum(x), SPATIAL_AXES)

        i1, nf1 = band(k1)
        i2, nf2 = band(k2)

        def pk_of_band(i_f, n_f):
            return v / n3_f * gsum(i_f**2) / jnp.maximum(gsum(n_f**2), 1e-30)

        p1 = pk_of_band(i1, nf1)
        p2 = pk_of_band(i2, nf2)
        bs, qs, p3s = [], [], []
        for k3 in k3s:
            i3, nf3 = band(float(k3))
            denom = jnp.maximum(gsum(nf1 * nf2 * nf3), 1e-30)
            b = (v**2 / n3_f) * gsum(i1 * i2 * i3) / denom
            p3 = pk_of_band(i3, nf3)
            q = b / jnp.maximum(p1 * p2 + p2 * p3 + p3 * p1, 1e-30)
            bs.append(b)
            qs.append(q)
            p3s.append(p3)
        return jnp.stack(bs), jnp.stack(qs), jnp.stack(p3s), p1, p2

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False,
    )
    bs, qs, p3s, p1, p2 = jax.jit(prog)(_shard_and_put(mesh, delta))
    return {
        "theta": thetas,
        "k3": k3s,
        "B": np.asarray(bs),
        "Q": np.asarray(qs),
        "P1": float(p1),
        "P2": float(p2),
        "P3": np.asarray(p3s),
    }
