"""Shootout: Pallas F(2,3)^2 Winograd conv vs XLA and the direct Pallas kernel.

Same DCE- and dispatch-floor-safe harness as ``microbench_pallas.py``
(chained iterations, i-dependent epsilon, full sum reduction).  TF/s is
computed from the DIRECT conv's FLOPs for every contender, so any number
above the XLA row is a real end-to-end win regardless of how few MACs the
Winograd form actually issues (its MXU work is ~0.5x the direct form's).

The kernel's own VMEM-resident transforms are the whole experiment: the
pure-XLA Winograd (`ops/winograd.py`, `microbench_wino.py`) is exact but
loses its MAC savings to HBM round-trips between transform stages.
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
    p.add_argument("--shape", type=int, nargs=3, default=(136, 264, 132),
                   help="packed input (D, H, WP); production phase-3 scale")
    p.add_argument("--block", type=int, nargs=3, default=None,
                   help="Winograd block override (BD, BH, BWP)")
    p.add_argument("--leaky", action="store_true",
                   help="bench the fused bias+LeakyReLU epilogues")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.pallas_conv import conv3d_pallas_packed
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

    flops = d * h * (2 * u) * 27 * 64 * 64 * 2  # direct conv FLOPs (pre-VALID)

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
            print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(x))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:44s} {per * 1e3:9.2f} ms/iter  "
              f"{flops / per / 1e12:7.1f} TF/s (direct-equivalent)",
              flush=True)

    if args.leaky:
        bp = s2d.pack_bias(bias)
        timed(
            "XLA conv + bias + leaky",
            lambda t: jax.nn.leaky_relu(
                s2d.conv3_packed(t, wp) + bp.astype(t.dtype), 0.01
            ),
        )
        timed(
            "Pallas direct + bias + leaky",
            lambda t: conv3d_pallas_packed(t, wp, bias, leaky=True),
        )
        timed(
            "Pallas Winograd + bias + leaky",
            lambda t: conv3d_wino_pallas_packed(t, what, bias, leaky=True),
        )
        if args.block:
            blk = tuple(args.block)
            timed(
                f"Pallas Winograd block={blk} +b+l",
                lambda t: conv3d_wino_pallas_packed(
                    t, what, bias, leaky=True, block=blk
                ),
            )
        return

    timed("XLA conv3_packed", lambda t: s2d.conv3_packed(t, wp))
    timed("Pallas direct (auto block)",
          lambda t: conv3d_pallas_packed(t, wp, bias))
    timed("Pallas Winograd (auto block)",
          lambda t: conv3d_wino_pallas_packed(t, what, bias))
    for blk in ([tuple(args.block)] if args.block else
                [(4, 16, 48), (4, 24, 40), (2, 32, 40), (6, 16, 40), (4, 16, 64)]):
        timed(f"Pallas Winograd block={blk}",
              lambda t, b=blk: conv3d_wino_pallas_packed(t, what, bias, block=b))


if __name__ == "__main__":
    main()
