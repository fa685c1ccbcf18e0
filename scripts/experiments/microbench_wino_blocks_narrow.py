"""Winograd kernel block sweep at NARROW (phase-3 tile) shapes.

Round-4 measurement showed the F(2,3)^2 kernel at 92.7 TF/s
direct-equivalent on wide phase-1 shapes but only ~60 TF/s at the
128^3-tile decode shapes (README "Roofline") — per-block fixed overhead
(DMA wait, transform setup) dominates when MZ = (BD/2)(BH/2)(BWP+8) is
small.  The auto `_pick_block` heuristic caps at (4, 8, full-W), tuned at
wide W.  This sweep asks: at owp ~ 64-72, do TALLER blocks (more rows per
grid step) amortize the fixed cost?

Run: python scripts/experiments/microbench_wino_blocks_narrow.py
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
    p.add_argument("--shape", type=int, nargs=3, default=(142, 142, 72),
                   help="packed input (D, H, WP); phase-3 128^3-tile scale")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.winograd import transform_packed_w3
    from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
        conv3d_wino_pallas_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    x = jax.random.normal(key, (1, d, h, u, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 64, 64), jnp.float32) * 0.05
    wp = s2d.pack_w3(w).astype(jnp.bfloat16)
    what = transform_packed_w3(wp)
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

    owp = u - 1
    full = (owp + 7) // 8 * 8
    timed("auto block", lambda t: conv3d_wino_pallas_packed(t, what, bias, leaky=True))
    for blk in [
        (4, 8, full), (8, 8, full), (4, 16, full), (8, 16, full),
        (16, 8, full), (2, 32, full), (12, 8, full), (4, 32, full),
        (8, 24, full), (16, 16, full),
    ]:
        timed(
            f"block={blk}",
            lambda t, b=blk: conv3d_wino_pallas_packed(
                t, what, bias, leaky=True, block=b
            ),
        )


if __name__ == "__main__":
    main()
