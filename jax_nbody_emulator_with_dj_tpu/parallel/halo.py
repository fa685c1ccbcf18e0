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
    """Pad one spatial dimension with the periodic neighbors' face slabs."""
    n = _axis_size(axis_name)
    size = local.shape[dim]
    if size < halo:
        raise ValueError(
            f"shard extent {size} along dim {dim} smaller than halo {halo}"
        )
    lo_face = lax.slice_in_dim(local, size - halo, size, axis=dim)  # my last slabs
    hi_face = lax.slice_in_dim(local, 0, halo, axis=dim)  # my first slabs
    if n == 1:
        # Single shard along this axis: periodic wrap onto myself.
        lo_pad, hi_pad = lo_face, hi_face
    else:
        fwd = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor
        bwd = [(i, (i - 1) % n) for i in range(n)]  # send to left neighbor
        lo_pad = lax.ppermute(lo_face, axis_name, fwd)  # from left neighbor
        hi_pad = lax.ppermute(hi_face, axis_name, bwd)  # from right neighbor
    return jnp.concatenate([lo_pad, local, hi_pad], axis=dim)


def halo_exchange(local, halo: int, *, spatial_dims=(1, 2, 3), axis_names=("x", "y", "z")):
    """Periodic halo exchange on all three spatial dims of a (C, X, Y, Z) shard."""
    for dim, name in zip(spatial_dims, axis_names):
        local = halo_exchange_axis(local, halo, dim=dim, axis_name=name)
    return local
