"""Device-side periodic halo exchange for spatially sharded volumes.

Replaces the reference's host-side periodic padding (``subbox.py:81-97``,
``np.arange(start, end) % size``) with ``jax.lax.ppermute`` neighbor shifts
over the ICI mesh: before the conv stack, every shard receives the
``halo``-deep face slabs of its mesh neighbors (periodically), after which
all convs are VALID and the output lands exactly on the shard interior — no
inter-shard communication inside the network.

Must be called inside ``shard_map`` over the mesh whose axis names are given.
A mesh axis of size 1 degenerates to a self-permute, which reproduces the
single-shard periodic wrap, so the same code path covers any mesh shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_size(axis_name: str) -> int:
    return lax.axis_size(axis_name)


def halo_exchange_axis(local, halo: int, *, dim: int, axis_name: str):
    """Pad one spatial dimension with the periodic neighbors' face slabs.

    When the shard extent is smaller than the halo (large meshes at moderate
    box sizes), the halo spans several mesh neighbors; the exchange then runs
    one ``ppermute`` hop per neighbor distance k, taking the last/first
    ``min(size, halo - (k-1)*size)`` voxels from the neighbor at distance k.
    """
    n = _axis_size(axis_name)
    size = local.shape[dim]
    if halo > n * size:
        raise ValueError(
            f"halo {halo} exceeds the global extent {n * size} along dim {dim}"
        )
    hops = -(-halo // size)  # ceil: number of neighbor distances the halo spans
    lo_parts, hi_parts = [], []
    for k in range(1, hops + 1):
        take = min(size, halo - (k - 1) * size)
        lo_face = lax.slice_in_dim(local, size - take, size, axis=dim)
        hi_face = lax.slice_in_dim(local, 0, take, axis=dim)
        if n == 1:
            # Single shard along this axis: periodic wrap onto myself.
            lo_pad, hi_pad = lo_face, hi_face
        else:
            fwd = [(i, (i + k) % n) for i in range(n)]  # send k to the right
            bwd = [(i, (i - k) % n) for i in range(n)]  # send k to the left
            lo_pad = lax.ppermute(lo_face, axis_name, fwd)  # from k left
            hi_pad = lax.ppermute(hi_face, axis_name, bwd)  # from k right
        lo_parts.insert(0, lo_pad)  # farther neighbors sit farther out
        hi_parts.append(hi_pad)
    return jnp.concatenate(lo_parts + [local] + hi_parts, axis=dim)


def halo_exchange(local, halo: int, *, spatial_dims=(1, 2, 3), axis_names=("x", "y", "z")):
    """Periodic halo exchange on all three spatial dims of a (C, X, Y, Z) shard."""
    for dim, name in zip(spatial_dims, axis_names):
        local = halo_exchange_axis(local, halo, dim=dim, axis_name=name)
    return local
