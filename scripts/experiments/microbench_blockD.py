"""Incremental decomposition of the conv_r00 vel packed-cat block.

The full block measured ~99 ms/tile while its conv_0 cat-convs alone run
~35 ms; this script adds one piece at a time to find the slop:
  1  conv_0 cat (6 convs)
  2  + leaky pair
  3  + conv_1 vel (3 convs)
  4  + leaky pair
  5  + skip (6 dots) + crop + residual adds + final leaky  (= full block)
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
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models import blocks as B
    from jax_nbody_emulator_with_dj_tpu.ops.conv3d import leaky_relu_with_tangent
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = B.pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)

    sh = (1, 136, 136, 68, 128)
    xs = tuple(jax.random.normal(jax.random.key(i), sh, jnp.bfloat16) for i in range(4))

    def timed(label, fn, reps=2):
        def chain(*ts):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(ts[0].dtype)
                ys = fn(*(t + eps for t in ts))
                tot = jnp.float32(0)
                for y in (ys if isinstance(ys, tuple) else (ys,)):
                    tot = tot + jnp.sum(y.astype(jnp.float32))
                return acc + tot

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        force_sync(j(*xs))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(*xs))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:52s} {per * 1e3:9.2f} ms/iter", flush=True)

    def s1(y0, dy0, u, du):
        return B._apply_packed_vel_cat(pr00["conv_0"], (y0, u), (dy0, du), "conv")

    def s2(y0, dy0, u, du):
        h, dh = s1(y0, dy0, u, du)
        return leaky_relu_with_tangent(h, dh)

    def s3(y0, dy0, u, du):
        h, dh = s2(y0, dy0, u, du)
        return B._apply_packed_vel(pr00["conv_1"], h, dh, "conv")

    def s4(y0, dy0, u, du):
        h, dh = s3(y0, dy0, u, du)
        return leaky_relu_with_tangent(h, dh)

    def s5(y0, dy0, u, du):
        return B.apply_resnet_block_vel_packed_cat(pr00, (y0, u), (dy0, du), "CACA")

    # timed("1 conv_0 cat", s1)  # measured: see /tmp/blockD2.log
    # timed("2 + leaky", s2)  # measured: see /tmp/blockD2.log
    # timed("3 + conv_1 vel", s3)  # measured: see /tmp/blockD2.log
    # timed("4 + leaky", s4)  # measured: see /tmp/blockD2.log
    # timed("5 full block (skip+residual+leaky)", s5)  # measured: see /tmp/blockD2.log

    # f32 packed weights are cast to bf16 inside the program; if XLA fails
    # to hoist/CSE those casts the whole pipeline pays.  A/B with a
    # pre-cast tree (biases stay f32 by design).
    pr00_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a.ndim > 1 else a,
        pr00,
    )

    def s1b(y0, dy0, u, du):
        return B._apply_packed_vel_cat(pr00_bf16["conv_0"], (y0, u), (dy0, du), "conv")

    def s5b(y0, dy0, u, du):
        return B.apply_resnet_block_vel_packed_cat(pr00_bf16, (y0, u), (dy0, du), "CACA")

    # timed("1b conv_0 cat, bf16 weights", s1b)  # measured: see /tmp/blockD2.log
    # timed("5b full block, bf16 weights", s5b)  # measured: see /tmp/blockD2.log

    # Isolate the remaining delta vs the free-weight microbench (42 ms):
    # pre-sliced parts (no runtime slicing of the big wcat), no bias.
    from jax_nbody_emulator_with_dj_tpu.ops.s2d import conv3_packed

    c0 = pr00["conv_0"]
    wparts = [jax.device_put(w) for w in B._cat_weight_parts(c0["w"], "conv", 2)]
    cparts = [jax.device_put(w) for w in B._cat_weight_parts(c0["wcat"], "conv", 4)]
    bias = jax.device_put(c0["b"])

    def s1c(y0, dy0, u, du):
        y = conv3_packed(y0, wparts[0]) + conv3_packed(u, wparts[1])
        dy = (
            conv3_packed(y0, cparts[0])
            + conv3_packed(u, cparts[1])
            + conv3_packed(dy0, cparts[2])
            + conv3_packed(du, cparts[3])
        )
        return y + bias.astype(y.dtype), dy

    timed("1c conv_0 cat, pre-sliced parts", s1c)

    def s1d(y0, dy0, u, du):
        y = conv3_packed(y0, wparts[0]) + conv3_packed(u, wparts[1])
        return y, conv3_packed(dy0, cparts[2]) + conv3_packed(du, cparts[3])

    timed("1d 4 convs only (no x-tangent convs)", s1d)


if __name__ == "__main__":
    main()
