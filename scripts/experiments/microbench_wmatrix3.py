"""Round 3: closure-vs-argument and host-vs-device weight provenance.

  G  real packed values, passed as explicit jit ARGUMENTS
  H  host-generated random dense values, closed over (device_put)
  I  jax.random.normal values copied via host, closed over
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

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

    def run(label, fn, extra=(), reps=2):
        def chain(*ts):
            acts, ws = ts[:4], ts[4:]

            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(acts[0].dtype)
                ys = fn(*(t + eps for t in acts), *ws)
                tot = jnp.float32(0)
                for y in ys:
                    tot = tot + jnp.sum(y.astype(jnp.float32))
                return acc + tot

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        force_sync(j(*xs, *extra))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(*xs, *extra))
            times.append(time.perf_counter() - t0)
        print(f"{label:52s} {min(times) / args.chain * 1e3:9.2f} ms/iter", flush=True)

    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = B.pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    c0 = pr00["conv_0"]
    real = [
        jax.device_put(w.astype(jnp.bfloat16))
        for w in (
            B._cat_weight_parts(c0["w"], "conv", 2)
            + B._cat_weight_parts(c0["wcat"], "conv", 4)
        )
    ]

    def fn_args(y0, dy0, u, du, w0, w1, w2, w3, w4, w5):
        y = conv3_packed(y0, w0) + conv3_packed(u, w1)
        dy = (
            conv3_packed(y0, w2)
            + conv3_packed(u, w3)
            + conv3_packed(dy0, w4)
            + conv3_packed(du, w5)
        )
        return y, dy

    run("G real values as jit arguments", fn_args, tuple(real))

    rng = np.random.default_rng(1)
    host_rand = [
        jax.device_put(
            jnp.asarray((rng.normal(size=(3, 3, 2, 128, 128)) * 0.05).astype(np.float32),
                        dtype=jnp.bfloat16)
        )
        for _ in range(6)
    ]

    def make_closed(ws):
        w0, w1, w2, w3, w4, w5 = ws

        def fn(y0, dy0, u, du):
            return fn_args(y0, dy0, u, du, w0, w1, w2, w3, w4, w5)

        return fn

    run("H host random dense, closed over", make_closed(host_rand))

    dev_rand = [
        jax.random.normal(jax.random.key(40 + i), (3, 3, 2, 128, 128), jnp.bfloat16) * 0.05
        for i in range(6)
    ]
    via_host = [jax.device_put(jnp.asarray(np.asarray(w))) for w in dev_rand]
    run("I device-random values via host, closed over", make_closed(via_host))


if __name__ == "__main__":
    main()
