"""Compare tangent-conv formulations for the velocity path on real hardware.

Per packed vel conv layer the math is
    y  = conv(x, W) + b
    dy = conv(x, dW) + conv(dx, W)
i.e. three (3,3,2) 128->128 convs.  Candidates:

  split3   (current)  y = c(x,W);  dy = c(x,dW) + c(dx,W)      3x Co=128
  stack2              z = c(x,[W|dW]); dy = z[...,C:] + c(dx,W)  1x Co=256 + 1x Co=128
  — identical FLOPs; stack2 reads x once and gives the MXU a wider rhs.

Also probes the raw conv rate at Co=128 vs Co=256 vs Co=384 (all three
convs share the operand-stacked rhs when dx is concatenated... not pursued;
the 384 row just bounds what wider-N buys).
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
    p.add_argument("--shape", type=int, nargs=4, default=(134, 134, 67, 128),
                   help="packed activation (D, H, WP, C)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops.s2d import conv3_packed
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, wp, c = args.shape
    x = jax.random.normal(key, (1, d, h, wp, c), jnp.bfloat16)
    dx = jax.random.normal(jax.random.key(1), (1, d, h, wp, c), jnp.bfloat16)
    w128 = jax.random.normal(jax.random.key(2), (3, 3, 2, c, c), jnp.bfloat16) * 0.05
    dw128 = jax.random.normal(jax.random.key(3), (3, 3, 2, c, c), jnp.bfloat16) * 0.05
    w256 = jnp.concatenate([w128, dw128], axis=-1)
    w384 = jnp.concatenate([w256, w128], axis=-1)

    vox = (d - 2) * (h - 2) * (wp - 1) * 2  # output voxels (unpacked W)
    unit = vox * 27 * 64 * 64 * 4 * 2  # one 128->128 packed conv's FLOPs

    def timed(label, fn, inps, flops, reps=3):
        def chain(*xs):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(xs[0].dtype)
                ys = fn(xs[0] + eps, *xs[1:])
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
        print(f"{label:40s} {per * 1e3:9.2f} ms/iter  {flops / per / 1e12:7.1f} TF/s",
              flush=True)
        return per

    # raw conv rate vs output width
    timed("conv Co=128", lambda a: conv3_packed(a, w128), (x,), unit)
    timed("conv Co=256", lambda a: conv3_packed(a, w256), (x,), 2 * unit)
    timed("conv Co=384", lambda a: conv3_packed(a, w384), (x,), 3 * unit)

    # full tangent layer formulations (3 conv-units each)
    def split3(a, b):
        y = conv3_packed(a, w128)
        dy = conv3_packed(a, dw128) + conv3_packed(b, w128)
        return y, dy

    def stack2(a, b):
        z = conv3_packed(a, w256)
        y = z[..., :c]
        dy = z[..., c:] + conv3_packed(b, w128)
        return y, dy

    timed("vel layer split3 (current)", split3, (x, dx), 3 * unit)
    timed("vel layer stack2", stack2, (x, dx), 3 * unit)


if __name__ == "__main__":
    main()
