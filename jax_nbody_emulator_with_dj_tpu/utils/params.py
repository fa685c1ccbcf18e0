"""Parameter pytree utilities: layout conversion, save/load, casting.

The reference stores conv kernels as ``(Cout, Cin, K, K, K)`` (OIDHW,
``layers.py:41-43``); this framework is channels-last with ``(K, K, K, Cin,
Cout)`` (DHWIO) kernels.  Tree *structure* (block/layer/leaf names) is kept
identical, so conversion is a per-leaf transpose.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_KERNEL_KEYS = ("weight", "dweight")


def _is_param_leaf_dict(d) -> bool:
    return isinstance(d, dict) and "weight" in d


def _convert_layer(layer: dict, to_reference: bool) -> dict:
    out = {}
    for k, v in layer.items():
        v = np.asarray(v) if not isinstance(v, jnp.ndarray) else v
        if k in _KERNEL_KEYS and np.ndim(v) == 5:
            # DHWIO -> OIDHW is (Co, Ci, K, K, K); OIDHW -> DHWIO is (D, H, W, I, O)
            perm = (4, 3, 0, 1, 2) if to_reference else (2, 3, 4, 1, 0)
            v = jnp.transpose(jnp.asarray(v), perm)
        out[k] = jnp.asarray(v)
    return out


def _convert_tree(params: dict, to_reference: bool) -> dict:
    def rec(node):
        if _is_param_leaf_dict(node):
            return _convert_layer(node, to_reference)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return jnp.asarray(node)

    return rec(params)


def convert_reference_params(ref_params: dict) -> dict:
    """Reference (OIDHW) param pytree -> this framework's (DHWIO) pytree."""
    return _convert_tree(ref_params, to_reference=False)


def convert_to_reference_params(params: dict) -> dict:
    """This framework's (DHWIO) param pytree -> reference (OIDHW) layout."""
    return _convert_tree(params, to_reference=True)


def save_params_npz(path, params: dict) -> None:
    """Persist a param pytree to ``.npz`` (host numpy, pickled dict)."""
    host = jax.tree.map(np.asarray, params)
    np.savez(path, params=np.asarray(host.get("params", host), dtype=object))


def load_params_npz(path) -> dict:
    """Load a param pytree saved by :func:`save_params_npz` (or the
    reference's ``nbody_emulator_params.npz`` format, followed by
    :func:`convert_reference_params`)."""
    with np.load(path, allow_pickle=True) as f:
        params = f["params"].item()
    return {"params": params}


def tree_cast(params: dict, dtype) -> dict:
    """Cast all floating leaves of a pytree to ``dtype``."""
    def cast(v):
        v = jnp.asarray(v)
        return v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v

    return jax.tree.map(cast, params)
