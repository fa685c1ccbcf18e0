"""AOT-compile each hierarchical phase and print XLA's HBM breakdown.

No execution: uses jit(...).lower(...).compile() + memory_analysis() on the
real TPU backend, so geometry candidates can be memory-audited in minutes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tile", type=int, nargs=3, default=(128, 128, 128))
    p.add_argument("--slab", type=int, default=32)
    p.add_argument("--slab-h", type=int, default=256)
    p.add_argument("--tile1", type=int, default=64)
    p.add_argument("--vel", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--buf-dtype", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import (
        NBodyEmulatorCore,
        NBodyEmulatorVelCore,
        StyleNBodyEmulatorVelCore,
    )
    from jax_nbody_emulator_with_dj_tpu.emulator import (
        modulate_emulator_parameters,
        modulate_emulator_parameters_vel,
    )
    from jax_nbody_emulator_with_dj_tpu.hierarchical import (
        HierarchicalConfig,
        HierarchicalProcessor,
    )

    key = jax.random.key(0)
    sp = StyleNBodyEmulatorVelCore().init(key)
    if args.vel:
        params = modulate_emulator_parameters_vel(sp, z=0.0, Om=0.3175)
        model = NBodyEmulatorVelCore()
    else:
        params = modulate_emulator_parameters(sp, z=0.0, Om=0.3175)
        model = NBodyEmulatorCore()

    cfg = HierarchicalConfig(
        size=(args.size,) * 3,
        tile=tuple(args.tile),
        slab=args.slab,
        slab_h=args.slab_h,
        tile1=args.tile1,
        dtype=jnp.dtype(args.dtype),
        buf_dtype=jnp.dtype(args.buf_dtype) if args.buf_dtype else None,
    )
    proc = HierarchicalProcessor(model, params, cfg)
    ep = proc._exec_params
    nbuf = 2 if proc.compute_vel else 1

    def shdt(shape, dtype=jnp.dtype(args.dtype)):
        return jax.ShapeDtypeStruct(shape, dtype)

    bdt = jnp.dtype(cfg.buf_dtype)
    boxp = shdt((1, 3, args.size + 16, args.size + 16, args.size + 16))
    h1 = tuple(shdt(proc._buf_shape(proc._h1_margin()), bdt) for _ in range(nbuf))
    y1 = tuple(shdt(proc._buf_shape(proc._y1_margin()), bdt) for _ in range(nbuf))
    y2 = tuple(
        shdt(proc._buf_shape(proc._y2_margin(), level=2), bdt) for _ in range(nbuf)
    )
    r1 = tuple(shdt(proc._buf_shape(proc._r1_margin()), bdt) for _ in range(nbuf))
    outs = tuple(
        shdt((1, 3, args.size, args.size, args.size), jnp.float16) for _ in range(nbuf)
    )
    sc = shdt((1,), jnp.float32)
    ep_s = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), ep)

    phases = [
        ("phase1", proc._phase1, (ep_s, boxp, h1)),
        ("phase2a", proc._phase2a, (ep_s, h1, y1)),
        ("phase2b", proc._phase2b, (ep_s, y1, y2)),
        ("phase2c", proc._phase2c, (ep_s, y1, y2, r1)),
        ("phase3", proc._phase3, (ep_s, boxp, r1, outs, sc, sc)),
    ]
    for name, fn, av in phases:
        try:
            comp = fn.lower(*av).compile()
            ma = comp.memory_analysis()
            gib = 1 << 30
            print(
                f"{name:8s} temp {ma.temp_size_in_bytes / gib:6.2f} GiB  "
                f"args {ma.argument_size_in_bytes / gib:6.2f}  "
                f"out {ma.output_size_in_bytes / gib:6.2f}  "
                f"alias {ma.alias_size_in_bytes / gib:6.2f}",
                flush=True,
            )
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
