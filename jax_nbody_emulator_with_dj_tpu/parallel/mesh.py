"""Device-mesh helpers for spatial (domain) decomposition.

The emulation domain is a 3D periodic volume; we shard its three spatial
axes over a 3D logical mesh ('x', 'y', 'z').  On a real pod slice
``mesh_utils.create_device_mesh`` lays the logical mesh onto the physical ICI
torus so halo exchanges ride nearest-neighbor links.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

SPATIAL_AXES = ("x", "y", "z")


def shard_linear_index(mesh_shape):
    """Row-major linear index of this shard in the spatial mesh.

    Only valid inside ``shard_map`` over ``SPATIAL_AXES``.  The canonical
    shard enumeration for per-shard PRNG streams (``fold_in(key, index)``)
    — one definition so the GRF, LPT, and resize paths can never
    desynchronize.
    """
    from jax import lax

    mx, my, mz = mesh_shape
    del mx  # the leading axis never multiplies into the index
    return (
        lax.axis_index("x") * my + lax.axis_index("y")
    ) * mz + lax.axis_index("z")


def make_mesh(shape=(1, 1, 1), axis_names=SPATIAL_AXES, devices=None) -> Mesh:
    """Create a 3D spatial mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    devices = devices[:n]
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def mesh_for_devices(n_devices: int, axis_names=SPATIAL_AXES) -> Mesh:
    """A reasonable 3D factorization of ``n_devices`` (largest axis first)."""
    shape = _factor3(n_devices)
    return make_mesh(shape, axis_names)


def _factor3(n: int) -> tuple[int, int, int]:
    """Factor n into 3 roughly equal factors, descending."""
    best = (n, 1, 1)
    for a in range(1, int(round(n ** (1 / 3))) + 1):
        if n % a:
            continue
        m = n // a
        for b in range(a, int(m**0.5) + 1):
            if m % b:
                continue
            c = m // b
            cand = tuple(sorted((a, b, c), reverse=True))
            if cand < best:  # lexicographically smaller == more balanced
                best = cand
    return best
