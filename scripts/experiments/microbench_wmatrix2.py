"""Round 2: layout vs zero-pattern for the slow real-weight convs.

  D  real packed values, round-tripped through host numpy (fresh layout)
  E  random values masked by the real pack_w3 zero pattern (same sparsity)
  F  real packed values + tiny dense noise (kills exact zeros)
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

    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = B.pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    c0 = pr00["conv_0"]
    real = [
        np.asarray(w.astype(jnp.bfloat16))
        for w in (
            B._cat_weight_parts(c0["w"], "conv", 2)
            + B._cat_weight_parts(c0["wcat"], "conv", 4)
        )
    ]

    # D: same values, fresh host->device arrays
    wsD = [jax.device_put(jnp.asarray(w)) for w in real]
    timed("D real values, host round-trip", make_fn(wsD))

    # E: random values with the real zero pattern
    rng = np.random.default_rng(0)
    wsE = [
        jax.device_put(
            jnp.asarray(
                (rng.normal(size=w.shape) * 0.05 * (np.asarray(w, np.float32) != 0)).astype(
                    np.float32
                ),
                dtype=jnp.bfloat16,
            )
        )
        for w in real
    ]
    timed("E random values, real zero pattern", make_fn(wsE))

    # F: real values plus tiny dense noise (no exact zeros anywhere)
    wsF = [
        jax.device_put(jnp.asarray(w + np.float32(1e-3)).astype(jnp.bfloat16))
        for w in real
    ]
    timed("F real values + dense 1e-3 offset", make_fn(wsF))


if __name__ == "__main__":
    main()
