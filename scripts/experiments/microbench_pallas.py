"""Honest XLA vs Pallas packed-conv shootout (sum-reduced, chained).

Earlier comparisons were corrupted twice: once by the tunneled backend's
~30 ms dispatch floor, once by XLA slice-DCE reducing a lone conv whose
output was only sampled at [0].  This harness chains iterations with an
i-dependent input epsilon and fully sum-reduces every output.
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
    p.add_argument("--shape", type=int, nargs=3, default=(136, 264, 132))
    p.add_argument("--block", type=int, nargs=3, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.pallas_conv import conv3d_pallas_packed
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    x = jax.random.normal(key, (1, d, h, u, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 64, 64), jnp.float32) * 0.05
    wp = s2d.pack_w3(w).astype(jnp.bfloat16)
    bias = jnp.zeros((64,), jnp.float32)

    flops = d * h * (2 * u) * 27 * 64 * 64 * 2  # true conv FLOPs (pre-VALID)

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
            print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(x))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:40s} {per * 1e3:9.2f} ms/iter  {flops / per / 1e12:7.1f} TF/s", flush=True)

    timed("XLA conv3_packed", lambda t: s2d.conv3_packed(t, wp))
    timed(
        "Pallas packed (auto block)",
        lambda t: conv3d_pallas_packed(t, wp, bias),
    )
    if args.block:
        blk = tuple(args.block)
        timed(
            f"Pallas packed block={blk}",
            lambda t: conv3d_pallas_packed(t, wp, bias, block=blk),
        )
    # fused epilogue variants (bias + leaky) — what the model actually runs
    timed(
        "XLA conv + bias + leaky",
        lambda t: jax.nn.leaky_relu(
            s2d.conv3_packed(t, wp) + s2d.pack_bias(bias).astype(t.dtype), 0.01
        ),
    )
    timed(
        "Pallas conv + bias + leaky (fused)",
        lambda t: conv3d_pallas_packed(t, wp, bias, leaky=True),
    )


if __name__ == "__main__":
    main()
