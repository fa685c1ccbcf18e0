"""A/B the stacked-weight variants of the three slow phase-3 stages.

  A  entry vel:   18 tap-dots (w, dw separately)   vs 9 stacked-N dots
  D  cat vel:     6 separate part convs            vs per-part [W|dW] stacks
  E  exit vel:    3 convs at N=6 (64->3 packed)    vs [W|dW] N=12 stack

Each variant computes identical math; only operand shapes differ.
chain=6 to shrink the per-call sync floor to ~7 ms.
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.s2d import (
        conv3_entry_packed,
        conv1_entry_packed,
        conv3_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)

    def timed(label, fn, inps, reps=2):
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
        print(f"{label:46s} {per * 1e3:9.2f} ms/iter", flush=True)
        return per

    # ---------------- A: entry tap-dots ----------------
    x = jax.random.normal(key, (1, 3, 144, 144, 144), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.key(2), (3, 3, 3, 3, 64), jnp.bfloat16) * 0.1
    dw3 = jax.random.normal(jax.random.key(3), (3, 3, 3, 3, 64), jnp.bfloat16) * 0.1
    wf = s2d.pack_w3_entry(w3)
    dwf = s2d.pack_w3_entry(dw3)
    wst = jnp.concatenate([wf, dwf], axis=-1)  # (3,3,3,4,256)

    def entry_split(a):
        return conv3_entry_packed(a, wf), conv3_entry_packed(a, dwf)

    def entry_stack(a):
        z = conv3_entry_packed(a, wst)
        return z[..., :128], z[..., 128:]

    timed("A entry dots split (current)", entry_split, (x,))
    timed("A entry dots stacked N=256", entry_stack, (x,))
    del x

    # ---------------- D: cat-layer convs ----------------
    sh = (1, 136, 136, 68, 128)
    y0 = jax.random.normal(key, sh, jnp.bfloat16)
    dy0 = jax.random.normal(jax.random.key(1), sh, jnp.bfloat16)
    u = jax.random.normal(jax.random.key(2), sh, jnp.bfloat16)
    du = jax.random.normal(jax.random.key(3), sh, jnp.bfloat16)
    wy, wu, dwy, dwu = (
        jax.random.normal(jax.random.key(10 + i), (3, 3, 2, 128, 128), jnp.bfloat16) * 0.05
        for i in range(4)
    )
    wsty = jnp.concatenate([wy, dwy], -1)
    wstu = jnp.concatenate([wu, dwu], -1)

    def cat_split(a, b, c_, d_):
        y = conv3_packed(a, wy) + conv3_packed(c_, wu)
        dy = (
            conv3_packed(a, dwy)
            + conv3_packed(c_, dwu)
            + conv3_packed(b, wy)
            + conv3_packed(d_, wu)
        )
        return y, dy

    def cat_stack(a, b, c_, d_):
        z = conv3_packed(a, wsty) + conv3_packed(c_, wstu)
        dy = z[..., 128:] + conv3_packed(b, wy) + conv3_packed(d_, wu)
        return z[..., :128], dy

    timed("D cat vel split (current)", cat_split, (y0, dy0, u, du))
    timed("D cat vel stacked", cat_stack, (y0, dy0, u, du))
    del y0, dy0, u, du

    # ---------------- E: exit narrow-N convs ----------------
    sh2 = (1, 132, 132, 66, 128)
    h = jax.random.normal(key, sh2, jnp.bfloat16)
    dh = jax.random.normal(jax.random.key(1), sh2, jnp.bfloat16)
    we = jax.random.normal(jax.random.key(20), (3, 3, 2, 128, 6), jnp.bfloat16) * 0.1
    dwe = jax.random.normal(jax.random.key(21), (3, 3, 2, 128, 6), jnp.bfloat16) * 0.1
    wste = jnp.concatenate([we, dwe], -1)  # N=12

    def exit_split(a, b):
        y = conv3_packed(a, we)
        dy = conv3_packed(a, dwe) + conv3_packed(b, we)
        return y, dy

    def exit_stack(a, b):
        z = conv3_packed(a, wste)
        return z[..., :6], z[..., 6:] + conv3_packed(b, we)

    timed("E exit N=6 split (current)", exit_split, (h, dh))
    timed("E exit N=12 stacked", exit_stack, (h, dh))

    # bound: how much does ONE narrow conv cost vs a 128-wide one?
    timed("E single conv N=6", lambda a: conv3_packed(a, we), (h,))
    w128 = jax.random.normal(jax.random.key(22), (3, 3, 2, 128, 128), jnp.bfloat16) * 0.05
    timed("E single conv N=128", lambda a: conv3_packed(a, w128), (h,))


if __name__ == "__main__":
    main()
