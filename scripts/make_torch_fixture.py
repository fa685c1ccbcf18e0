#!/usr/bin/env python
"""Generate the committed torch-checkpoint fixture + golden outputs.

Creates ``tests/fixtures/map2map_style_ckpt.pt`` — a GENUINE
``torch.save``-serialized state dict in the upstream map2map layout (dotted
``<block>.<layer>.<leaf>`` keys, OIDHW conv kernels) with fixed-seed
synthetic weights — plus golden emulator outputs computed from it.  The
fixture pins the only import path that cannot be exercised against the real
release weights in this environment (no network egress): torch byte-stream
-> ``load_torch_checkpoint`` -> ``create_emulator`` -> outputs.

Reference provenance: weights are trained in map2map/PyTorch
(``/root/reference/README.md:5-8``).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import torch

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from jax_nbody_emulator_with_dj_tpu import (
    StyleNBodyEmulatorCore,
    SubboxConfig,
    create_emulator,
)

MID = 4
N = 16
FIXTURES = ROOT / "tests" / "fixtures"


def tree_to_torch_state_dict(params: dict) -> dict:
    """DHWIO jax tree -> map2map-style torch state dict (OIDHW)."""
    sd = {}
    for block, layers in params["params"].items():
        for layer, leaves in layers.items():
            for leaf, arr in leaves.items():
                a = np.asarray(arr, np.float32)
                if leaf in ("weight", "dweight") and a.ndim == 5:
                    a = np.transpose(a, (4, 3, 0, 1, 2))  # DHWIO -> OIDHW
                sd[f"model.{block}.{layer}.{leaf}"] = torch.from_numpy(a.copy())
    return sd


def main():
    FIXTURES.mkdir(parents=True, exist_ok=True)
    params = StyleNBodyEmulatorCore(mid_chan=MID).init(jax.random.key(7))
    sd = tree_to_torch_state_dict(params)
    torch.save({"state_dict": sd}, FIXTURES / "map2map_style_ckpt.pt")

    # Golden outputs straight from the serialized checkpoint.
    from jax_nbody_emulator_with_dj_tpu.utils.torch_convert import (
        load_torch_checkpoint,
    )

    loaded = load_torch_checkpoint(FIXTURES / "map2map_style_ckpt.pt")
    box = np.asarray(
        jax.random.normal(jax.random.key(8), (3, N, N, N), jnp.float32)
    )
    np.save(FIXTURES / "torch_golden_input.npy", box)

    cfg = SubboxConfig(
        size=(N,) * 3, ndiv=(2, 2, 2), padding=((48, 48),) * 3,
        dtype=jnp.float32, output_dtype=np.float32,
    )
    for premod, tag in ((False, "style"), (True, "premod")):
        emu = create_emulator(
            premodulate=premod,
            compute_vel=False,
            params=loaded,
            processor_config=cfg,
            premodulate_z=0.5 if premod else None,
            premodulate_Om=0.3175 if premod else None,
            mid_chan=MID,
        )
        out = emu.process_box(box, z=0.5, Om=0.3175, show_progress=False)
        np.save(FIXTURES / f"torch_golden_{tag}.npy", np.asarray(out))
        print(tag, "golden:", out.shape, float(np.abs(out).max()))

    print("fixture written:", FIXTURES / "map2map_style_ckpt.pt")


if __name__ == "__main__":
    main()
