"""Reliable device synchronization for benchmarking.

Some PJRT backends (e.g. tunneled/remote TPU plugins) implement
``block_until_ready`` as a no-op on the client: it returns when the execution
is *enqueued*, not when it finishes.  Reading back any element of a result
buffer is the only portable completion barrier, so all wall-clock timing in
this package goes through :func:`force_sync`.
"""

from __future__ import annotations

import numpy as np
import jax


def force_sync(tree):
    """Block until every array in ``tree`` is actually computed.

    Reads one element of each leaf back to the host (a few bytes per array),
    which is a true completion barrier on every backend.
    """
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            # scalar readback of one element — a true completion barrier
            np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
    return tree
