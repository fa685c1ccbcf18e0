"""Stage-D (conv_r00 vel cat) formulation shootout at phase-3 tile shapes.

Stage D measured 48 TF/s while the same-shape conv_l01 block (stage B) runs
82.6 — this isolates where the loss is:

  raw1  one conv3_packed at D's operand shape (rate reference)
  raw2  one conv3_packed at B's operand shape (shape sensitivity)
  v0    current production conv_0: 6 split-part convs (2 primal + 4 tangent)
  v1    Cols-stacked: conv(y0,[W1|dW1]) + conv(u,[W2|dW2]) N=256, plus
        conv(dy0,W1) + conv(du,W2) — 4 convs, operands read once
  v2    K-concat tangent: materialize cat4 (512ch) + one Ci=512 conv
  v3    batched primal/tangent: conv(stack_B([y0,dy0]), W1) etc — 2 convs
        with B=2 plus 2 tangent-weight convs
  full0 whole apply_resnet_block_vel_packed_cat (production)
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
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    # D's conv_0 operand shape at tile 128^3 (post conv_l01 / up crop)
    d, h, u = 136, 136, 34
    mkkey = iter(jax.random.split(key, 16))
    y0 = jax.random.normal(next(mkkey), (1, d, h, u, 128), jnp.bfloat16)
    uu = jax.random.normal(next(mkkey), (1, d, h, u, 128), jnp.bfloat16)
    dy0 = jax.random.normal(next(mkkey), (1, d, h, u, 128), jnp.bfloat16)
    du = jax.random.normal(next(mkkey), (1, d, h, u, 128), jnp.bfloat16)

    def w64():
        return (jax.random.normal(next(mkkey), (3, 3, 3, 64, 64)) * 0.02).astype(
            jnp.float32
        )

    W1 = s2d.pack_w3(w64()).astype(jnp.bfloat16)
    W2 = s2d.pack_w3(w64()).astype(jnp.bfloat16)
    dW1 = s2d.pack_w3(w64()).astype(jnp.bfloat16)
    dW2 = s2d.pack_w3(w64()).astype(jnp.bfloat16)
    W1s = jnp.concatenate([W1, dW1], -1)  # (3,3,2,128,256)
    W2s = jnp.concatenate([W2, dW2], -1)
    # K-concat tangent weight: rows [y0, u, dy0, du] -> [dW1; dW2; W1; W2]
    Wkcat = jnp.concatenate([dW1, dW2, W1, W2], -2)  # (3,3,2,512,128)

    conv = s2d.conv3_packed
    # one unpacked-64ch conv's useful FLOPs at this shape
    vox = (d - 2) * (h - 2) * (u - 1) * 2
    U1 = vox * 27 * 64 * 64 * 2

    def timed(label, fn, inps, flops, reps=2):
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
        print(f"{label:44s} {per * 1e3:8.2f} ms  {flops / per / 1e12:6.1f} TF/s useful",
              flush=True)
        return per

    timed("raw1 conv3_packed (136,136,34)", lambda a: conv(a, W1), (y0,), U1)
    xb = jax.random.normal(next(mkkey), (1, 142, 142, 71, 128), jnp.bfloat16)
    Ub = (142 - 2) * (142 - 2) * (71 - 1) * 2 * 27 * 64 * 64 * 2
    timed("raw2 conv3_packed (142,142,71)", lambda a: conv(a, W1), (xb,), Ub)

    def v0(a, b, c, e):
        y = conv(a, W1) + conv(b, W2)
        dy = conv(a, dW1) + conv(b, dW2) + conv(c, W1) + conv(e, W2)
        return y, dy

    timed("v0 split 6 convs (production)", v0, (y0, uu, dy0, du), 6 * U1)

    def v1(a, b, c, e):
        za = conv(a, W1s)
        zb = conv(b, W2s)
        y = za[..., :128] + zb[..., :128]
        dy = za[..., 128:] + zb[..., 128:] + conv(c, W1) + conv(e, W2)
        return y, dy

    timed("v1 cols-stacked 4 convs", v1, (y0, uu, dy0, du), 6 * U1)

    def v2(a, b, c, e):
        y = conv(a, W1) + conv(b, W2)
        cat = jnp.concatenate([a, b, c, e], -1)
        dy = conv(cat, Wkcat)
        return y, dy

    timed("v2 K-concat tangent", v2, (y0, uu, dy0, du), 6 * U1)

    def v3(a, b, c, e):
        p1 = conv(jnp.concatenate([a, c], 0), W1)  # B=2: conv(y0,W1), conv(dy0,W1)
        p2 = conv(jnp.concatenate([b, e], 0), W2)
        y = p1[:1] + p2[:1]
        dy = conv(a, dW1) + conv(b, dW2) + p1[1:] + p2[1:]
        return y, dy

    timed("v3 batch-stacked", v3, (y0, uu, dy0, du), 6 * U1)

    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        apply_resnet_block_vel_packed_cat,
        pack_resnet_params,
    )

    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    pr00 = pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    flD = vox / 2 * (3 * (27 * 128 * 64 + 128 * 64) + 3 * 27 * 64 * 64) * 2

    timed(
        "full0 production r00 block",
        lambda a, b, c, e: apply_resnet_block_vel_packed_cat(pr00, (a, c), (b, e), "CACA"),
        (y0, dy0, uu, du),
        flD,
    )


if __name__ == "__main__":
    main()
