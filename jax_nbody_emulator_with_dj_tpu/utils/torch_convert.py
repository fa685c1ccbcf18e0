"""Conversion of PyTorch (map2map-style) checkpoints to this framework.

The pretrained weights originate in the upstream map2map PyTorch project
(reference README.md:5-8); the reference's packaged ``.npz`` is a pickled
Flax tree exported from it.  This module converts either source:

  * a torch ``state_dict`` (``.pt``/``.pth``) with dotted module paths like
    ``conv_l00.conv_0.weight`` (OIDHW conv kernels, (Ci, S) style weights);
  * the reference's ``.npz`` (handled by ``utils.params`` +
    ``emulator.ensure_native_layout``).

Torch naming conventions vary across releases, so a ``key_map`` hook lets
callers adapt: it receives each state-dict key and returns
``(block, layer, leaf)`` or None to skip the entry.
"""

from __future__ import annotations

import re

import numpy as np
import jax.numpy as jnp

_LEAVES = {"weight", "bias", "style_weight", "style_bias", "dweight"}


def default_key_map(key: str):
    """Map ``[module.]<block>.<layer>.<leaf>`` to a tree path.

    Handles the common prefixes torch training wrappers add
    (``module.``, ``model.``) and both dotted and underscore leaf names.
    """
    key = re.sub(r"^(module\.|model\.|net\.)+", "", key)
    parts = key.split(".")
    if len(parts) < 3:
        return None
    leaf = parts[-1]
    layer = parts[-2]
    block = ".".join(parts[:-2])
    if leaf not in _LEAVES:
        return None
    return block, layer, leaf


def convert_torch_state_dict(state_dict, key_map=default_key_map) -> dict:
    """Torch state dict -> this framework's DHWIO param pytree.

    Conv kernels (5-D, torch OIDHW) are transposed to (K, K, K, Ci, Co);
    1-D/2-D leaves pass through.  Tensors are converted via ``.numpy()``
    when available (torch) or ``np.asarray`` otherwise.
    """
    params: dict = {}
    for key, value in state_dict.items():
        mapped = key_map(key)
        if mapped is None:
            continue
        block, layer, leaf = mapped
        arr = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        if leaf in ("weight", "dweight") and arr.ndim == 5:
            arr = np.transpose(arr, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
        params.setdefault(block, {}).setdefault(layer, {})[leaf] = jnp.asarray(arr)
    if not params:
        raise ValueError("no recognizable parameters in state dict; pass a custom key_map")
    return {"params": params}


def load_torch_checkpoint(path, key_map=default_key_map) -> dict:
    """Load a ``.pt``/``.pth`` checkpoint file and convert it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for candidate in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and candidate in obj and isinstance(obj[candidate], dict):
            obj = obj[candidate]
            break
    return convert_torch_state_dict(obj, key_map=key_map)
