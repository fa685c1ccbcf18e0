"""Binary-search the conv_r00 (stage D) slowdown: time its pieces alone.

The factored cat block runs at ~47 TF/s executed while conv_l01 runs ~74 at
identical operand shapes (``microbench_factored.py``).  This times each
constituent of the cat block separately to locate the loss.
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
    p.add_argument("--tile", type=int, nargs=3, default=(128, 128, 256))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        _cat_weight_parts,
        pack_resnet_params,
    )
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)

    td, th, tw = args.tile
    d, h, w2 = td + 8, th + 8, (tw + 8) // 2
    mk = iter(jax.random.split(key, 16))
    rnd = lambda s: jax.random.normal(next(mk), s, jnp.bfloat16)
    y0, dy0, u, du = (rnd((1, d, h, w2, 128)) for _ in range(4))

    conv = s2d.conv3_packed
    wa, wb = _cat_weight_parts(pr00["conv_0"]["w"], "conv", 2)
    wsa, wsb = _cat_weight_parts(pr00["skip"]["w"], "skip", 2)
    gu = pr00["conv_0"]["g"]
    ga = jnp.tile(gu[:64], 2).astype(jnp.bfloat16)
    gb = jnp.tile(gu[64:], 2).astype(jnp.bfloat16)
    w1 = pr00["conv_1"]["w"]
    g1 = jnp.tile(pr00["conv_1"]["g"], 2).astype(jnp.bfloat16)

    # one executed k3 conv's FLOPs at this operand
    U = (d - 2) * (h - 2) * (w2 - 1) * 2 * 27 * 64 * 64 * 2

    def timed(label, fn, inps, nconv=None, reps=2):
        def chain(*xs):
            def body(i, acc):
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
        rate = f"  {nconv * U / per / 1e12:6.1f} TF/s" if nconv else ""
        print(f"{label:52s} {per * 1e3:9.2f} ms/iter{rate}", flush=True)
        return per

    timed("a  1 conv: conv(y0, wa)", lambda a: conv(a, wa), (y0,), 1)
    timed("b  2-part primal: conv(y0,wa)+conv(u,wb)",
          lambda a, c: conv(a, wa) + conv(c, wb), (y0, u), 2)
    timed("c  1 tangent conv: conv(y0*ga+dy0, wa)",
          lambda a, b: conv(a * ga + b, wa), (y0, dy0), 1)
    timed("d  conv_0 cat vel: 4 convs + adds",
          lambda a, b, c, e: (conv(a, wa) + conv(c, wb),
                              conv(a * ga + b, wa) + conv(c * gb + e, wb)),
          (y0, dy0, u, du), 4)
    timed("e  conv_1 pair: conv(y,w1), conv(y*g1+dy,w1)",
          lambda a, b: (conv(a, w1), conv(a * g1 + b, w1)), (y0, dy0), 2)
    timed("f  skip cat vel: 4 dots",
          lambda a, b, c, e: (s2d.conv1_packed(a, wsa) + s2d.conv1_packed(c, wsb),
                              s2d.conv1_packed(a, wsa) + s2d.conv1_packed(c, wsb)),
          (y0, dy0, u, du))
    timed("g  2 indep convs (no add): conv(y0,wa), conv(u,wb)",
          lambda a, c: (conv(a, wa), conv(c, wb)), (y0, u), 2)
    timed("h  2 chained-ish convs same operand: conv(y0,wa), conv(y0,wb)",
          lambda a: (conv(a, wa), conv(a, wb)), (y0,), 2)


if __name__ == "__main__":
    main()
