"""Checkpointing: Orbax-backed save/restore of parameter pytrees.

The reference persists parameters as a single pickled ``.npz``
(``nbody_emulator.py:124-128``); here we add an Orbax checkpoint path for
production use (atomic, sharding-aware, resumable) while keeping the ``.npz``
round-trip (``utils.params``) for interchange with the reference format.
"""

from __future__ import annotations

from pathlib import Path

import jax


def save_checkpoint(path, params: dict) -> None:
    """Save a parameter pytree as an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_checkpoint(path, like: dict | None = None) -> dict:
    """Restore a parameter pytree saved by :func:`save_checkpoint`.

    Args:
        path: checkpoint directory.
        like: optional abstract pytree (e.g. ``model.init(...)``) used to
            restore with matching structure/dtypes/shardings.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)
