"""Decompose VELOCITY phase-3 tile costs on real hardware (packed).

Stages per output tile (default (128, 128, 128), the production vel tile):
  A  entry conv_l00 vel (NCDHW box tile -> packed, w + dw entry dots)
  B  conv_l01 vel packed
  C  up_r0 vel packed on the r1 slice (+ slack crop)
  D  conv_r00 vel packed cat (implicit concat)
  E  conv_r01 vel packed + 2x unpack_to_ncdhw
  F  epilogue: disp/vel formulas + fp16 cast
  G  whole _phase3_tile fused (sum of parts vs fused-program reality)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--tile", type=int, nargs=3, default=(128, 128, 128))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        apply_resnet_block_vel_packed,
        apply_resnet_block_vel_packed_cat,
        apply_resample_block_vel_packed,
        apply_resnet_entry_vel_packed,
        pack_resnet_entry_params,
        pack_resnet_params,
        pack_resample_params,
    )
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    p00 = pack_resnet_entry_params(params["conv_l00"], "CACA", vel=True)
    p01 = pack_resnet_params(params["conv_l01"], "CACA", vel=True)
    pup = pack_resample_params(params["up_r0"], "UA", vel=True)
    pr00 = pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    pr01 = pack_resnet_params(params["conv_r01"], "CAC", vel=True)

    td, th, tw = args.tile
    # useful FLOPs of one unpacked 64->64 k3 conv per voxel
    U = 27 * 64 * 64 * 2

    def timed(label, fn, inps, flops=None, reps=2):
        def chain(*xs):
            def body(i, acc):
                # every input gets the loop-dependent eps: a conv whose
                # operand is loop-invariant would be HOISTED out of the
                # fori_loop and silently drop out of the measurement
                eps = (jnp.float32(i % 2) * 1e-6).astype(xs[0].dtype)
                ys = fn(*(x + eps for x in xs))
                tot = jnp.float32(0)
                for y in (ys if isinstance(ys, tuple) else (ys,)):
                    tot = tot + jnp.sum(y.astype(jnp.float32))
                return acc + tot

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        force_sync(j(*inps))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(*inps))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        rate = f"  {flops / per / 1e12:6.1f} TF/s useful" if flops else ""
        print(f"{label:46s} {per * 1e3:9.2f} ms/iter{rate}", flush=True)
        return per

    # A: entry vel on the box tile (halo 8/side)
    x = jax.random.normal(key, (1, 3, td + 16, th + 16, tw + 16), jnp.bfloat16)
    voxA = (td + 16) * (th + 16) * (tw + 16)
    flA = voxA * (2 * (27 * 3 * 64 + 3 * 64) + 3 * 27 * 64 * 64) * 2
    timed("A entry conv_l00 vel", lambda t: apply_resnet_entry_vel_packed(p00, t), (x,), flA)
    y0, dy0 = (jax.device_put(v) for v in apply_resnet_entry_vel_packed(p00, x))
    del x

    # B: conv_l01 vel packed
    flB = voxA * (6 * 27 * 64 * 64 + 3 * 64 * 64) * 2
    timed("B conv_l01 vel packed",
          lambda a, b: apply_resnet_block_vel_packed(p01, a, b, "CACA"), (y0, dy0), flB)
    y0b, dy0b = (jax.device_put(v)
                 for v in apply_resnet_block_vel_packed(p01, y0, dy0, "CACA"))
    del y0, dy0

    # C: up_r0 vel on the r1 slice
    hm = 4
    r1 = jax.random.normal(key, (1, td // 2 + 2 * hm, th // 2 + 2 * hm,
                                 (tw // 2 + 2 * hm) // 2, 128), jnp.bfloat16)
    dr1 = jax.random.normal(jax.random.key(1), r1.shape, jnp.bfloat16)
    flC = (td * th * tw) * 3 * 64 * 64 * 2

    def up(a, b):
        u, du = apply_resample_block_vel_packed(pup, a, b, "UA")
        return u[:, 4:-4, 4:-4, 2:-2], du[:, 4:-4, 4:-4, 2:-2]

    timed("C up_r0 vel packed + crop", up, (r1, dr1), flC)
    u, du = (jax.device_put(v) for v in up(r1, dr1))
    del r1, dr1

    # D: conv_r00 vel packed cat
    voxD = y0b.shape[1] * y0b.shape[2] * y0b.shape[3] * 2
    flD = voxD * (3 * (27 * 128 * 64 + 128 * 64) + 3 * 27 * 64 * 64) * 2
    timed("D conv_r00 vel packed cat",
          lambda a, b, c_, d_: apply_resnet_block_vel_packed_cat(
              pr00, (a, c_), (b, d_), "CACA"),
          (y0b, dy0b, u, du), flD)
    h, dh = (jax.device_put(v) for v in
             apply_resnet_block_vel_packed_cat(pr00, (y0b, u), (dy0b, du), "CACA"))
    del y0b, dy0b, u, du

    # E: conv_r01 vel + unpack
    flE = voxD * (3 * 27 * 64 * 64 + 3 * (27 * 64 * 3 + 64 * 3)) * 2

    def tail(a, b):
        hh, dhh = apply_resnet_block_vel_packed(pr01, a, b, "CAC")
        return s2d.unpack_to_ncdhw(hh), s2d.unpack_to_ncdhw(dhh)

    timed("E conv_r01 vel + 2x unpack", tail, (h, dh), flE)
    hn, dhn = (jax.device_put(v) for v in tail(h, dh))
    del h, dh

    # F: epilogue (disp/vel formulas + fp16 cast)
    x0 = jax.random.normal(key, (1, 3, td, th, tw), jnp.bfloat16)
    Dz = jnp.asarray([1.0], jnp.float32)
    vf = jnp.asarray([2.0], jnp.float32)

    def epi(a, b, c_):
        disp = (a + c_) * jnp.asarray(6.0, a.dtype)
        vel = b * (vf.reshape((1,) * 5) * 6.0).astype(a.dtype) + c_ * (
            vf.reshape((1,) * 5) * 6.0 / Dz.reshape((1,) * 5)
        ).astype(a.dtype)
        return disp.astype(jnp.float16), vel.astype(jnp.float16)

    timed("F epilogue + fp16 cast", epi, (hn, dhn, x0), None)
    del hn, dhn, x0

    total_useful = flA + flB + flC + flD + flE
    print(f"sum of useful stage FLOPs: {total_useful / 1e12:.3f} TF/tile", flush=True)


if __name__ == "__main__":
    main()
