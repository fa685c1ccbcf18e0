#!/usr/bin/env python
"""Worked examples for the TPU-native N-body emulator.

Counterpart of the reference's ``examples/basic_usage.py``: (1) style
emulator with process_box, (2) premodulated fixed-cosmology reuse, (3) direct
model access with explicit padding arithmetic, (4) cosmology utilities,
plus (5) the multi-chip sharded runtime.

Run with random weights (no pretrained file needed):
    python examples/basic_usage.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()  # honor JAX_PLATFORMS even with pre-registered plugins

import jax.numpy as jnp

from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulator,
    StyleNBodyEmulatorVelCore,
    SubboxConfig,
    create_emulator,
    growth_factor,
    vel_norm,
)

MID = 8  # small width keeps the demo fast; production uses 64


def main():
    key = jax.random.PRNGKey(0)
    params = StyleNBodyEmulatorVelCore(mid_chan=MID).init(key)

    # ---------------------------------------------------------------
    # Example 1: style emulator (runtime cosmology) on a full box
    # ---------------------------------------------------------------
    config = SubboxConfig(size=(128, 128, 128), ndiv=(1, 1, 1))
    emulator = create_emulator(
        premodulate=False, compute_vel=True, params=params,
        processor_config=config, mid_chan=MID,
    )
    box = np.array(jax.random.normal(key, (3, 128, 128, 128)))
    disp, vel = emulator.process_box(box, z=0.5, Om=0.3)
    print(f"[1] style process_box: in {box.shape} -> disp {disp.shape}, vel {vel.shape}")

    # ---------------------------------------------------------------
    # Example 2: premodulated (fixed cosmology) — fastest for batches
    # ---------------------------------------------------------------
    emulator_premod = create_emulator(
        premodulate=True, compute_vel=True, params=params,
        processor_config=config, premodulate_z=0.5, premodulate_Om=0.3,
        mid_chan=MID,
    )
    for i in range(2):
        d, v = emulator_premod.process_box(box, z=0.5, Om=0.3)
        print(f"[2] box {i + 1}: displacement range [{d.min():.3f}, {d.max():.3f}]")

    # ---------------------------------------------------------------
    # Example 3: direct model access (pad = 48/side: in = out + 96)
    # ---------------------------------------------------------------
    model = StyleNBodyEmulatorVelCore(mid_chan=MID)
    x = jax.random.normal(key, (1, 3, 128, 128, 128))
    z, om = 0.5, 0.3
    dz = growth_factor(jnp.array([z]), jnp.array([om]))
    vn = vel_norm(jnp.array([z]), jnp.array([om]))
    d, v = model.apply(params, x, jnp.array([om]), dz, vn)
    print(f"[3] direct apply: {x.shape} -> {d.shape} (margin {model.margin}/side)")

    # ---------------------------------------------------------------
    # Example 4: cosmology utilities (batched sweeps)
    # ---------------------------------------------------------------
    zs = jnp.linspace(0, 2, 5)
    print("[4] D(z) =", np.round(np.asarray(growth_factor(zs, 0.3175)), 4))

    # ---------------------------------------------------------------
    # Example 5: sharded multi-chip runtime (works on 1 device too)
    # ---------------------------------------------------------------
    from jax_nbody_emulator_with_dj_tpu.parallel import (
        ShardedBoxConfig, ShardedBoxProcessor, make_mesh,
    )

    mesh = make_mesh((1, 1, 1))  # use e.g. (4, 2, 2) on a 16-chip slice
    cfg = ShardedBoxConfig(size=(128, 128, 128), dtype=jnp.float32, halo=model.margin)
    proc = ShardedBoxProcessor(model, params, mesh, cfg)
    d, v = proc.process_box(box, z=0.5, Om=0.3)
    print(f"[5] sharded process_box on mesh {dict(mesh.shape)}: disp {d.shape}")

    # ---------------------------------------------------------------
    # Example 6: planner-chosen geometry — the production single-chip path
    # ---------------------------------------------------------------
    from jax_nbody_emulator_with_dj_tpu import auto_hierarchical_config

    acfg = auto_hierarchical_config(512, compute_vel=True)  # fits 16 GB
    print(f"[6] auto geometry for 512^3 vel: slab {acfg.slab}, tile "
          f"{acfg.tile}, tile1 {acfg.tile1} "
          f"(pass as processor_config= to create_emulator)")


if __name__ == "__main__":
    main()
