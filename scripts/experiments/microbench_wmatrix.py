"""Decisive matrix: why do real packed weights make convs ~1.7x slower?

Same 6-conv cat computation, three weight sets:
  A  random bf16 (known fast, ~42 ms)
  B  pack_w3-derived, pre-cast bf16, pre-sliced (structure+values of real)
  C  random f32 (runtime-cast path)
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
    from jax_nbody_emulator_with_dj_tpu.ops.s2d import conv3_packed
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    sh = (1, 136, 136, 68, 128)
    xs = tuple(jax.random.normal(jax.random.key(i), sh, jnp.bfloat16) for i in range(4))

    def timed(label, fn, reps=2):
        def chain(*ts):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(ts[0].dtype)
                ys = fn(*(t + eps for t in ts))
                tot = jnp.float32(0)
                for y in ys:
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
        print(f"{label:52s} {min(times) / args.chain * 1e3:9.2f} ms/iter", flush=True)

    def make_fn(ws):
        w0, w1, w2, w3, w4, w5 = ws

        def fn(y0, dy0, u, du):
            y = conv3_packed(y0, w0) + conv3_packed(u, w1)
            dy = (
                conv3_packed(y0, w2)
                + conv3_packed(u, w3)
                + conv3_packed(dy0, w4)
                + conv3_packed(du, w5)
            )
            return y, dy

        return fn

    # A: random bf16
    wsA = [
        jax.random.normal(jax.random.key(10 + i), (3, 3, 2, 128, 128), jnp.bfloat16) * 0.05
        for i in range(6)
    ]
    timed("A random bf16", make_fn(wsA))

    # B: real pack_w3-derived, pre-cast bf16, pre-sliced
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = B.pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    c0 = pr00["conv_0"]
    wsB = [
        jax.device_put(w.astype(jnp.bfloat16))
        for w in (
            B._cat_weight_parts(c0["w"], "conv", 2)
            + B._cat_weight_parts(c0["wcat"], "conv", 4)
        )
    ]
    timed("B real packed bf16 pre-sliced", make_fn(wsB))

    # C: random f32 (runtime cast)
    wsC = [
        jax.random.normal(jax.random.key(30 + i), (3, 3, 2, 128, 128), jnp.float32) * 0.05
        for i in range(6)
    ]
    timed("C random f32", make_fn(wsC))


if __name__ == "__main__":
    main()
