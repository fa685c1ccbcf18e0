"""Voxelized periodic Minkowski functionals V0..V3, pure JAX.

Same estimator family as the reference (``scripts/utils.py:652-763``): for
each density threshold, build the excursion set's cubical complex with
periodic ``roll`` neighbor logic, count its cells (vertices n0, edges n1,
faces n2, cubes n3), and apply the Crofton relations:

    V0 = n3 / N^3                      (volume fraction)
    V1 = (2/9) (n2 - 3 n3) / N^3       (surface density, up to cell units)
    V2 = (2/9) (n1 - 2 n2 + 3 n3)/N^3  (mean curvature density)
    V3 = (n0 - n1 + n2 - n3) / N^3     (Euler characteristic density)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _complex_counts(b):
    """Cell counts (n0, n1, n2, n3) of the union-of-cubes complex of mask b."""
    r = lambda arr, ax: jnp.roll(arr, 1, axis=ax)  # neighbor at index-1 side

    n3 = jnp.sum(b)

    # Faces: per axis, a face at the low side of cell i exists if b[i] or
    # b[i-1]; plus each axis contributes one face per active cell at the top
    # boundary — with periodicity, faces normal to axis a = OR(b, roll(b,1,a)).
    n2 = 0
    for ax in range(3):
        n2 = n2 + jnp.sum(b | r(b, ax))

    # Edges along axis a: shared by up to 4 cubes in the other two axes.
    n1 = 0
    for ax in range(3):
        o1, o2 = [d for d in range(3) if d != ax]
        e = b | r(b, o1) | r(b, o2) | r(r(b, o1), o2)
        n1 = n1 + jnp.sum(e)

    # Vertices: shared by up to 8 cubes.
    v = b
    for ax in range(3):
        v = v | r(v, ax)
    n0 = jnp.sum(v)
    return n0, n1, n2, n3


@partial(jax.jit, static_argnames=())
def _mf_single(delta, threshold):
    b = delta > threshold
    n = delta.shape[0]
    n0, n1, n2, n3 = _complex_counts(b)
    n0, n1, n2, n3 = (x.astype(jnp.float32) for x in (n0, n1, n2, n3))
    vol = float(n) ** 3
    v0 = n3 / vol
    v1 = (2.0 / 9.0) * (n2 - 3 * n3) / vol
    v2 = (2.0 / 9.0) * (n1 - 2 * n2 + 3 * n3) / vol
    v3 = (n0 - n1 + n2 - n3) / vol
    return jnp.stack([v0, v1, v2, v3])


def minkowski_functionals(delta, thresholds):
    """V0..V3 of the excursion sets of ``delta`` over an array of thresholds.

    Args:
        delta: (N, N, N) field (e.g. density contrast, optionally smoothed).
        thresholds: (T,) threshold values.

    Returns:
        (T, 4) array [V0, V1, V2, V3] per threshold.
    """
    delta = jnp.asarray(delta, jnp.float32)
    thresholds = jnp.asarray(thresholds, jnp.float32)
    return jax.lax.map(lambda t: _mf_single(delta, t), thresholds)
