"""Decompose phase-3 tile costs on real hardware (disp, packed).

Stages per output tile (default (128, 256, 256)):
  A  conv_l00 CACA on the NCDHW box tile
  B  conv_l01 packed
  C  up_r0 packed on the r1 slice (+ slack crop)
  D  concat + conv_r00 (groups=2) packed
  E  unpack + conv_r01 CAC -> NCDHW
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--tile", type=int, nargs=3, default=(128, 256, 256))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        apply_resnet_block,
        apply_resnet_block_packed,
        apply_resample_block_packed,
        pack_resnet_params,
        pack_resample_params,
    )
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    p00 = params["conv_l00"]
    p01p = pack_resnet_params(params["conv_l01"], "CACA")
    pupp = pack_resample_params(params["up_r0"], "UA")
    pr00p = pack_resnet_params(params["conv_r00"], "CACA", groups=2)
    pr01 = params["conv_r01"]

    td, th, tw = args.tile

    def timed(label, fn, inp, flops=None, reps=2):
        def chain(x0):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(x0.dtype)
                y = fn(x0 + eps)
                return acc + jnp.sum(y.astype(jnp.float32))  # full reduce: defeats slice-DCE

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        force_sync(j(inp))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(inp))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        rate = f"  {flops / per / 1e12:7.1f} TF/s" if flops else ""
        print(f"{label:44s} {per * 1e3:9.2f} ms/iter{rate}", flush=True)
        return per

    # A: conv_l00 on the box tile
    x = jax.random.normal(key, (1, 3, td + 16, th + 16, tw + 16), jnp.bfloat16)
    vox = (td + 16) * (th + 16) * (tw + 16)
    fl00 = vox * (27 * 3 * 64 + 27 * 64 * 64 + 3 * 64) * 2
    timed("A conv_l00 CACA (NCDHW box tile)", lambda t: apply_resnet_block(p00, t, "CACA", in_fmt="NCDHW"), x, fl00)
    y0 = jax.device_put(s2d.pack(apply_resnet_block(p00, x, "CACA", in_fmt="NCDHW")))
    del x

    # B: conv_l01 packed
    fl01 = vox * (2 * 27 * 64 * 64 + 64 * 64) * 2
    timed("B conv_l01 packed", lambda t: apply_resnet_block_packed(p01p, t, "CACA"), y0, fl01)
    y0b = jax.device_put(apply_resnet_block_packed(p01p, y0, "CACA"))
    del y0

    # C: up_r0 on the r1 slice
    hm = 4
    r1 = jax.random.normal(
        key, (1, td // 2 + 2 * hm, th // 2 + 2 * hm, (tw // 2 + 2 * hm) // 2, 128),
        jnp.bfloat16,
    )
    flup = (td * th * tw) * 64 * 64 * 2

    def up(t):
        u = apply_resample_block_packed(pupp, t, "UA")
        return u[:, 4:-4, 4:-4, 2:-2]

    timed("C up_r0 packed + crop", up, r1, flup)
    u = jax.device_put(up(r1))
    del r1

    # D: concat + conv_r00 groups=2 packed
    cat = jax.device_put(jnp.concatenate([y0b, u], -1))
    vox2 = y0b.shape[1] * y0b.shape[2] * y0b.shape[3] * 2
    del y0b, u
    flr00 = vox2 * (27 * 128 * 64 + 27 * 64 * 64 + 128 * 64) * 2
    timed("D conv_r00 (128->64) packed g2", lambda t: apply_resnet_block_packed(pr00p, t, "CACA"), cat, flr00)
    h = jax.device_put(apply_resnet_block_packed(pr00p, cat, "CACA"))
    del cat

    # E: unpack + conv_r01 CAC -> NCDHW
    flr01 = vox2 * (27 * 64 * 64 + 27 * 64 * 3 + 64 * 3) * 2

    def tail(t):
        return apply_resnet_block(pr01, s2d.unpack(t), "CAC", out_fmt="NCDHW")

    timed("E unpack + conv_r01 CAC -> NCDHW", tail, h, flr01)
    del h

    # D': concat cost alone
    a = jax.random.normal(key, (1, 136, 264, 132, 128), jnp.bfloat16)
    timed("concat only (128+128ch)", lambda t: jnp.concatenate([t, t], -1) * 1.0, a)


if __name__ == "__main__":
    main()
