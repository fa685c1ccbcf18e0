"""Shootout: mixed F(2,3)xF(4,3) Winograd kernel vs the F(2,3)^2 kernel.

MAC ratios vs the direct conv: 0.444 (F(2,3)^2) vs 0.333 (mixed) — a 25%
cut in issued MXU work, bought with {2,4,5,8}-coefficient VPU transforms
(F(2,3)'s are pure adds).  TF/s below are DIRECT-conv-equivalent, so any
number above the F(2,3)^2 row is a real end-to-end win.

Run at both the wide phase-1 scale (--shape 136 264 132-ish) and the
narrow phase-3 tile scale (--shape 142 142 72).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--shape", type=int, nargs=3, default=(142, 142, 72))
    p.add_argument("--block", type=int, nargs=3, default=None,
                   help="block override for the mixed kernel")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.winograd import (
        transform_packed_w3,
        transform_packed_w3_mixed,
    )
    from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
        conv3d_wino_pallas_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.ops.winograd43_pallas import (
        _pick_block43,
        conv3d_wino43_pallas_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    x = jax.random.normal(key, (1, d, h, u, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 64, 64), jnp.float32) * 0.05
    wp = s2d.pack_w3(w).astype(jnp.bfloat16)
    what = transform_packed_w3(wp)
    what43 = transform_packed_w3_mixed(wp)
    bias = jnp.zeros((64,), jnp.float32)

    flops = d * h * (2 * u) * 27 * 64 * 64 * 2

    def timed(label, fn, reps=3):
        def chain(x0):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(x0.dtype)
                y = fn(x0 + eps)
                return acc + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        try:
            force_sync(j(x))
        except Exception as e:
            print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(x))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:40s} {per * 1e3:9.2f} ms/iter  "
              f"{flops / per / 1e12:7.1f} TF/s (direct-equivalent)",
              flush=True)

    print(f"# auto block43 for this shape: "
          f"{_pick_block43(d - 2, h - 2, u - 1)}", flush=True)
    timed("F(2,3)^2 (auto) + bias + leaky",
          lambda t: conv3d_wino_pallas_packed(t, what, bias, leaky=True))
    timed("mixed F(2,3)xF(4,3) (auto) +b+l",
          lambda t: conv3d_wino43_pallas_packed(t, what43, bias, leaky=True))
    blocks = ([tuple(args.block)] if args.block else
              [(4, 8, 64), (4, 8, 96), (4, 8, 128), (2, 8, 128),
               (2, 16, 64), (4, 16, 64), (2, 8, 64)])
    for blk in blocks:
        timed(
            f"mixed block={blk}",
            lambda t, b=blk: conv3d_wino43_pallas_packed(
                t, what43, bias, leaky=True, block=b
            ),
        )


if __name__ == "__main__":
    main()
