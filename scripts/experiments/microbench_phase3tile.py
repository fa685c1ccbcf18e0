"""Time the WHOLE fused vel _phase3_tile at candidate tile geometries.

Per-tile wall time x (512^3 / tile voxels) predicts the phase-3 wall;
comparing against the stage-sum exposes composition overhead, and the
tile-size sweep shows what larger tiles (less halo recompute, bigger dots)
buy if memory affords them.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--tiles", type=str, default="128x128x128,128x128x256,128x256x256")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import NBodyEmulatorVelCore, StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.hierarchical import (
        HierarchicalConfig,
        HierarchicalProcessor,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )
    model = NBodyEmulatorVelCore()

    for spec in args.tiles.split(","):
        tile = tuple(int(v) for v in spec.split("x"))
        cfg = HierarchicalConfig(size=(512, 512, 512), tile=tile, slab=32, slab_h=256)
        proc = HierarchicalProcessor(model, params, cfg)
        ep = proc._exec_params
        td, th, tw = tile
        hm = proc.PHASE3_R1_MARGIN_PACKED
        box_tile = jax.random.normal(key, (1, 3, td + 16, th + 16, tw + 16), jnp.bfloat16)
        rs = (1, td // 2 + 2 * hm, th // 2 + 2 * hm, (tw // 2 + 2 * hm) // 2, 128)
        r1 = jax.random.normal(jax.random.key(1), rs, jnp.bfloat16)
        dr1 = jax.random.normal(jax.random.key(2), rs, jnp.bfloat16)
        Dz = jnp.asarray([1.0], jnp.float32)
        vf = jnp.asarray([2.0], jnp.float32)

        def chain(bt, r, dr):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(bt.dtype)
                d_, v_ = proc._phase3_tile(ep, bt + eps, (r + eps, dr + eps), Dz, vf)
                return acc + jnp.sum(d_.astype(jnp.float32)) + jnp.sum(v_.astype(jnp.float32))

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        try:
            force_sync(j(box_tile, r1, dr1))
        except Exception as e:  # OOM at big tiles is informative, not fatal
            print(f"tile {spec}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            force_sync(j(box_tile, r1, dr1))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        ntiles = 512 ** 3 / (td * th * tw)
        print(
            f"tile {spec}: {per * 1e3:8.2f} ms/tile  x{ntiles:.0f} tiles "
            f"-> phase3 ~{per * ntiles:6.2f} s",
            flush=True,
        )
        del box_tile, r1, dr1, j


if __name__ == "__main__":
    main()
