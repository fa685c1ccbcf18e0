"""User-facing factory and bundle: create_emulator / NBodyEmulator.

API parity with the reference ``nbody_emulator.py`` (NBodyEmulator :23-112,
load_default_parameters :115-129, modulate_emulator_parameters{,_vel}
:150-187/:221-266, create_emulator :268-384), with two additions:

  * ``create_emulator(params=...)`` accepts an explicit parameter pytree
    (the packaged default-weights file is optional);
  * parameter trees in the reference's OIDHW layout are converted
    automatically on load.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from .cosmology import growth_factor, vel_norm
from .models.cores import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from .ops.style import premodulate_layer, style_vector
from .subbox import SubboxConfig, SubboxProcessor
from .utils.params import convert_reference_params, load_params_npz


@dataclass
class NBodyEmulator:
    """Bundle of model + params + (optional) big-box processor.

    ``processor`` is whichever runtime ``create_emulator`` built from
    ``processor_config``: :class:`~.subbox.SubboxProcessor` (reference
    semantics), :class:`~.hierarchical.HierarchicalProcessor` (the
    overlap-minimal flagship), or
    :class:`~.chunked.ChunkedHierarchicalProcessor` (boxes beyond one
    chip's buffer memory).
    """

    model: object
    params: dict | None
    processor: object | None
    premodulate: bool = False
    compute_vel: bool = True
    dtype: jnp.dtype = jnp.float32

    def apply(self, x, z, Om):
        """Run the model directly on a (padded) input tensor.

        Args:
            x: (B, C, D, H, W) or (C, D, H, W) input displacement.
            z, Om: redshift and matter density (scalars or (B,) arrays).
        """
        if self.params is None:
            raise ValueError("No parameters loaded; pass params= to create_emulator.")
        z = jnp.atleast_1d(z)
        Om = jnp.atleast_1d(Om)
        Dz = growth_factor(z, Om)
        x = x.astype(self.dtype)
        if self.premodulate:
            if self.compute_vel:
                return self.model.apply(self.params, x, Dz, vel_norm(z, Om))
            return self.model.apply(self.params, x, Dz)
        if self.compute_vel:
            return self.model.apply(self.params, x, Om, Dz, vel_norm(z, Om))
        return self.model.apply(self.params, x, Om, Dz)

    def process_box(self, input_box, z, Om, desc="Processing subboxes", show_progress=True, **kw):
        if self.processor is None:
            raise ValueError("No processor created; pass processor_config= to create_emulator.")
        if isinstance(self.processor, SubboxProcessor):
            kw = dict(kw, desc=desc, show_progress=show_progress)
        return self.processor.process_box(input_box, z, Om, **kw)

    def __call__(self, x, z, Om):
        return self.apply(x, z, Om)


def default_parameters_path() -> Path:
    env = os.environ.get("JAX_NBODY_EMULATOR_PARAMS")
    if env:
        return Path(env)
    return Path(__file__).parent / "model_parameters" / "nbody_emulator_params.npz"


def load_default_parameters() -> dict:
    """Load packaged pretrained parameters (converted to DHWIO layout).

    The file may be either this package's save format or the reference's
    OIDHW pickle — layout is detected from the kernel shapes.
    """
    path = default_parameters_path()
    if not path.exists():
        raise FileNotFoundError(
            f"Pretrained parameters not found at {path}. Set "
            "JAX_NBODY_EMULATOR_PARAMS or pass params= / load_params=False."
        )
    params = load_params_npz(path)
    return ensure_native_layout(params)


def ensure_native_layout(params: dict) -> dict:
    """Convert an OIDHW (reference-layout) tree to DHWIO if needed."""
    # Find one 5-D conv kernel and inspect: reference layout has the two
    # channel dims first and equal kernel dims last; ours has kernel dims
    # first.  A (K,K,K,Ci,Co) kernel has shape[0]==shape[1]==shape[2].
    def find_kernel(node):
        if isinstance(node, dict):
            if "weight" in node and np.ndim(node["weight"]) == 5:
                return np.shape(node["weight"])
            for v in node.values():
                got = find_kernel(v)
                if got is not None:
                    return got
        return None

    shp = find_kernel(params)
    if shp is None:
        return params
    if shp[0] == shp[1] == shp[2]:  # already DHWIO (kernel dims lead)
        return params
    return convert_reference_params(params)


def _is_first_layer(block_name: str, layer_name: str) -> bool:
    """Layers whose input is the raw (Dz-linear) network input.

    Reference ``nbody_emulator.py:242-246``: only conv_l00's conv_0 and skip.
    """
    return block_name == "conv_l00" and layer_name in ("conv_0", "skip")


def _modulate_tree(params: dict, s, *, vel: bool, eps: float, factors: bool = False) -> dict:
    out = {"params": {}}
    for block_name, block in params["params"].items():
        out["params"][block_name] = {}
        for layer_name, layer in block.items():
            if "style_weight" in layer:
                out["params"][block_name][layer_name] = premodulate_layer(
                    layer,
                    s,
                    vel=vel,
                    first_layer=vel and _is_first_layer(block_name, layer_name),
                    eps=eps,
                    factors=factors and vel,
                )
            else:
                out["params"][block_name][layer_name] = layer
    return out


def modulate_emulator_parameters(params: dict, z, Om, eps: float = 1e-8) -> dict:
    """Fold style into fixed-cosmology weights (displacement-only models)."""
    Dz = growth_factor(z, Om)
    s = style_vector(Om, Dz)[0]
    return _modulate_tree(params, s, vel=False, eps=eps)


def modulate_emulator_parameters_vel(params: dict, z, Om, eps: float = 1e-8) -> dict:
    """Fold style + analytic d/dDz tangents (displacement+velocity models)."""
    Dz = growth_factor(z, Om)
    s = style_vector(Om, Dz)[0]
    return _modulate_tree(params, s, vel=True, eps=eps)


def _make_processor(model, params, config):
    """Dispatch a processor_config dataclass to its runtime."""
    if isinstance(config, SubboxConfig):
        return SubboxProcessor(model, params, config)
    # Lazy imports: hierarchical/chunked import pieces of this module.
    from .chunked import ChunkedHierarchicalConfig, ChunkedHierarchicalProcessor
    from .hierarchical import HierarchicalConfig, HierarchicalProcessor

    if isinstance(config, HierarchicalConfig):
        return HierarchicalProcessor(model, params, config)
    if isinstance(config, ChunkedHierarchicalConfig):
        return ChunkedHierarchicalProcessor(model, params, config)
    raise TypeError(
        "processor_config must be a SubboxConfig, HierarchicalConfig, or "
        f"ChunkedHierarchicalConfig, got {type(config).__name__}"
    )


def create_emulator(
    premodulate: bool = False,
    compute_vel: bool = True,
    load_params: bool = True,
    params: dict | None = None,
    processor_config=None,
    premodulate_z: float | None = None,
    premodulate_Om: float | None = None,
    dtype: jnp.dtype | None = None,
    **model_kwargs,
) -> NBodyEmulator:
    """Build an emulator bundle (reference ``nbody_emulator.py:268-384``).

    Args:
        premodulate: fold style into weights at creation (fixed cosmology);
            selects the plain model classes.
        compute_vel: model also returns the velocity field.
        load_params: load packaged default parameters (ignored when
            ``params`` is given).
        params: explicit parameter pytree (style-layout; premodulation is
            applied here when requested).
        processor_config: build the matching runtime for ``process_box``:
            ``SubboxConfig`` -> SubboxProcessor (reference semantics),
            ``HierarchicalConfig`` -> HierarchicalProcessor (flagship),
            ``ChunkedHierarchicalConfig`` -> ChunkedHierarchicalProcessor.
            ``geometry.auto_hierarchical_config(size, ...)`` plans a
            measured-fitting config automatically.
        premodulate_z / premodulate_Om: fixed cosmology for the fold.
        dtype: compute dtype; ``processor_config.dtype`` wins if present.
        **model_kwargs: forwarded to the model (in_chan, out_chan, mid_chan,
            eps, levels, data_format).
    """
    if premodulate:
        cls = NBodyEmulatorVelCore if compute_vel else NBodyEmulatorCore
    else:
        cls = StyleNBodyEmulatorVelCore if compute_vel else StyleNBodyEmulatorCore
    model = cls(**model_kwargs)

    if params is None and load_params:
        params = load_default_parameters()
    if params is not None:
        params = ensure_native_layout(params)
        if premodulate:
            # Only fold when the tree still carries style parameters.
            has_style = any(
                "style_weight" in layer
                for block in params["params"].values()
                for layer in block.values()
            )
            if has_style:
                if premodulate_z is None or premodulate_Om is None:
                    raise ValueError(
                        "premodulate_z and premodulate_Om are required when "
                        "premodulate=True"
                    )
                fold = (
                    modulate_emulator_parameters_vel
                    if compute_vel
                    else modulate_emulator_parameters
                )
                params = fold(params, premodulate_z, premodulate_Om)

    processor = None
    if processor_config is not None:
        processor = _make_processor(model, params, processor_config)
        dtype = processor_config.dtype
    elif dtype is None:
        dtype = jnp.float32

    return NBodyEmulator(
        model=model,
        params=params,
        processor=processor,
        premodulate=premodulate,
        compute_vel=compute_vel,
        dtype=dtype,
    )
