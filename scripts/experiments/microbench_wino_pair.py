"""Fused factored-tangent pair kernel vs two single Winograd launches.

The flagship vel layers cost 2 launches/layer (z = wino(x), zt =
wino(x*g+dx)) + an XLA epilogue (y = z+b, dy = zt - c*z, leaky pair).
The pair kernel runs both convs in one launch with row-stacked (2M, 2C)
dots and the full epilogue fused.  TF/s is direct-conv-equivalent for
the PAIR (2 convs' direct FLOPs), so rows compare 1:1.

Run at the narrow phase-3 tile scale (default) and the wide phase-1
scale (--shape 136 264 132).
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
    p.add_argument("--block", type=int, nargs=3, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.winograd import transform_packed_w3
    from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
        _pick_block_pair,
        conv3d_wino_pallas_packed,
        conv3d_wino_pallas_pair_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    x = jax.random.normal(key, (1, d, h, u, 128), jnp.bfloat16)
    s = jax.random.normal(jax.random.key(7), (1, d, h, u, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 64, 64), jnp.float32) * 0.05
    wp = s2d.pack_w3(w).astype(jnp.bfloat16)
    what = transform_packed_w3(wp)
    bias = jnp.zeros((64,), jnp.float32)
    cvec = (jax.random.normal(jax.random.key(2), (128,)) * 0.3).astype(jnp.float32)

    flops = 2 * d * h * (2 * u) * 27 * 64 * 64 * 2  # the PAIR's direct FLOPs

    def timed(label, fn, reps=3):
        def chain(x0, s0):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(x0.dtype)
                y, dy = fn(x0 + eps, s0 + eps)
                return acc + jnp.sum(y.astype(jnp.float32)) + jnp.sum(
                    dy.astype(jnp.float32)
                )

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        try:
            force_sync(j(x, s))
        except Exception as e:
            print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(x, s))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:44s} {per * 1e3:9.2f} ms/iter  "
              f"{flops / per / 1e12:7.1f} TF/s (direct-equivalent, pair)",
              flush=True)

    def two_singles(x0, s0):
        z = conv3d_wino_pallas_packed(x0, what)
        zt = conv3d_wino_pallas_packed(s0, what)
        y = z + jnp.tile(bias, 2).astype(z.dtype)
        dy = zt - cvec.astype(z.dtype) * z
        dy = jnp.where(y > 0, dy, 0.01 * dy)
        y = jnp.where(y > 0, y, 0.01 * y)
        return y, dy

    def fused(x0, s0):
        return conv3d_wino_pallas_pair_packed(
            x0, s0, what, bias, cvec, leaky=True,
            block=tuple(args.block) if args.block else None,
        )

    print(f"# auto pair block for this shape: "
          f"{_pick_block_pair(d - 2, h - 2, u - 1)}", flush=True)
    timed("2x single kernel + XLA epilogue", two_singles)
    timed("fused pair kernel", fused)
    for blk in ([tuple(args.block)] if args.block else
                [(4, 8, 64), (4, 8, 48), (2, 16, 64), (4, 8, 32), (2, 8, 96)]):
        timed(
            f"fused pair block={blk}",
            lambda a, b2, bb=blk: conv3d_wino_pallas_pair_packed(
                a, b2, what, bias, cvec, leaky=True, block=bb
            ),
        )


if __name__ == "__main__":
    main()
