"""Per-phase wall-clock breakdown of the hierarchical runtime on real hardware.

Times phase 1/2/3 separately (force_sync between phases).

Usage: python scripts/profile_phases.py [--size 512] [--vel] [--no-packed]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(t):
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    force_sync(t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--vel", action="store_true")
    p.add_argument("--packed", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--micro", action="store_true", help="run micro-benchmarks too")
    p.add_argument("--tile1", type=int, default=None)
    p.add_argument("--tile", type=int, nargs=3, default=None)
    p.add_argument("--slab", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import (
        NBodyEmulatorCore,
        NBodyEmulatorVelCore,
        StyleNBodyEmulatorVelCore,
        modulate_emulator_parameters,
        modulate_emulator_parameters_vel,
    )
    from jax_nbody_emulator_with_dj_tpu.hierarchical import (
        HierarchicalConfig,
        HierarchicalProcessor,
        _wrap_pad,
    )
    from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

    key = jax.random.key(0)
    style_params = StyleNBodyEmulatorVelCore().init(key)
    if args.vel:
        params = modulate_emulator_parameters_vel(style_params, z=0.0, Om=0.3175)
        model = NBodyEmulatorVelCore()
    else:
        params = modulate_emulator_parameters(style_params, z=0.0, Om=0.3175)
        model = NBodyEmulatorCore()

    size = (args.size,) * 3
    t = min(128, args.size)
    tile = tuple(args.tile) if args.tile else (
        (t, t, t) if args.vel else (t, min(2 * t, args.size), min(2 * t, args.size))
    )
    cfg = HierarchicalConfig(
        size=size,
        slab=args.slab or min(16 if args.vel else 32, args.size),
        tile=tile,
        tile1=args.tile1 or min(64 if args.vel else 128, args.size // 2),
        dtype=jnp.bfloat16,
        output_dtype=np.float16,
        packed=args.packed,
    )
    print("geometry:", dict(slab=cfg.slab, tile=cfg.tile, tile1=cfg.tile1))
    proc = HierarchicalProcessor(model, params, cfg)

    Dz = jnp.atleast_1d(growth_factor(0.0, 0.3175)).astype(jnp.float32)
    vel_fac = (
        jnp.atleast_1d(vel_norm(0.0, 0.3175)).astype(jnp.float32)
        if args.vel
        else jnp.zeros((1,))
    )
    box = jax.device_put(
        jnp.asarray(
            np.random.default_rng(1).normal(size=(3,) + size).astype(np.float32),
            jnp.bfloat16,
        )
    )

    scale = jax.jit(
        lambda b, dz: _wrap_pad(
            b[None] * (dz.astype(cfg.dtype) / jnp.asarray(6.0, cfg.dtype)), 8, axes=(2, 3, 4)
        )
    )
    nbuf = 2 if args.vel else 1

    def run(label, fn, *a, warm=True, reps=2):
        if warm:
            out = fn(*a)
            sync(out)
        times = []
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            times.append(time.perf_counter() - t0)
        print(f"{label:32s} {min(times)*1e3:10.1f} ms   {[round(x*1e3,1) for x in times]}")
        return out

    boxp = run("scale+wrap_pad", scale, box, Dz)

    def phase1():
        h1 = tuple(
            jnp.zeros(proc._buf_shape(proc._h1_margin()), cfg.dtype)
            for _ in range(nbuf)
        )
        return proc._phase1(proc._exec_params, boxp, h1)

    h1 = run("phase1 (encoder, slabs)", phase1)

    def phase2a():
        y1 = tuple(
            jnp.zeros(proc._buf_shape(proc._y1_margin()), cfg.dtype)
            for _ in range(nbuf)
        )
        return proc._phase2a(proc._exec_params, h1, y1)

    y1 = run("phase2a (conv_l1, tiles)", phase2a)

    def phase2b():
        y2 = tuple(
            jnp.zeros(proc._buf_shape(proc._y2_margin(), level=2), cfg.dtype)
            for _ in range(nbuf)
        )
        return proc._phase2b(proc._exec_params, y1, y2)

    y2 = run("phase2b (down_l1+conv_l2, tiles)", phase2b)

    def phase2c():
        r1 = tuple(
            jnp.zeros(proc._buf_shape(proc._r1_margin()), cfg.dtype)
            for _ in range(nbuf)
        )
        return proc._phase2c(proc._exec_params, y1, y2, r1)

    r1 = run("phase2c (mid+conv_r1, tiles)", phase2c)
    if not args.micro:
        del h1, y1, y2  # phase 3 reads boxp + r1 only

    out_dtype = jnp.dtype(np.dtype(cfg.output_dtype))

    def phase3():
        outs = tuple(jnp.zeros((1, cfg.in_chan) + cfg.size, out_dtype) for _ in range(nbuf))
        return proc._phase3(proc._exec_params, boxp, r1, outs, Dz, vel_fac)

    run("phase3 (decode, tiles)", phase3)
    del r1

    def e2e():
        return proc.process_box(box, 0.0, 0.3175, as_numpy=False, profile=True)

    run("process_box end-to-end", e2e)
    for k, v in proc.last_timings.items():
        print(f"  in-context {k:10s} {v*1e3:10.1f} ms")

    if args.micro:
        # Micro: one phase-2 tile slice (pure dynamic_slice on the padded
        # channels-last buffer) and a ghost fill.
        m1 = cfg.tile1
        hm = proc.PHASE2B_MARGIN
        if cfg.packed:
            sizes = (m1 + 2 * hm, m1 + 2 * hm, (m1 + 2 * hm) // 2)
        else:
            sizes = (m1 + 2 * hm,) * 3
        dsl = jax.jit(
            lambda b: jax.lax.dynamic_slice(
                b, (0, 0, 0, 0, 0), (1,) + tuple(sizes) + (b.shape[-1],)
            )
        )
        run("micro: phase2 tile slice", dsl, h1[0], reps=3)
        gf = jax.jit(lambda b: proc._ghost_fill(b, proc._h1_margin()))
        run("micro: ghost fill", gf, h1[0], reps=3)


if __name__ == "__main__":
    main()
