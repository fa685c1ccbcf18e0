"""Decompose phase-1/phase-3 block costs on real hardware.

Times each stage of the phase-1 slab program (and conv variants) with
fori_loop chaining to amortize the tunneled backend's ~30 ms dispatch floor.
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
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--hw", type=int, default=520, help="slab H/W extent (incl halo)")
    p.add_argument("--sd", type=int, default=40, help="slab D extent (incl halo)")
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
    pdp = pack_resample_params(params["down_l0"], "DA")

    D, HW = args.sd, args.hw
    x = jax.random.normal(key, (1, 3, D, HW, HW), jnp.bfloat16)

    def timed(label, fn, inp, flops=None, reps=2):
        """fn: x -> y; chained with an iteration-dependent input epsilon so
        XLA cannot hoist fn out of the loop as loop-invariant."""

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
        print(f"{label:42s} {per * 1e3:9.2f} ms/iter{rate}", flush=True)
        return per

    vox = D * HW * HW  # input voxels (upper bound; VALID shrinks)
    # conv_l00: conv1 3->64 (27*3*64*2) + conv2 64->64 (27*64*64*2) + skip
    fl00 = vox * (27 * 3 * 64 + 27 * 64 * 64 + 3 * 64) * 2
    fl01 = vox * (2 * 27 * 64 * 64 + 64 * 64) * 2
    fldn = vox * 64 * 64 * 2  # 8 taps / 8x decim

    timed("conv_l00 CACA (NCDHW in, unpacked)", lambda t: apply_resnet_block(p00, t, "CACA", in_fmt="NCDHW"), x, fl00)

    y0 = apply_resnet_block(p00, x, "CACA", in_fmt="NCDHW")
    y0 = jax.device_put(y0)

    timed("pack only", lambda t: s2d.pack(t) * 1.0, y0)
    y0p = s2d.pack(y0)
    timed("conv_l01 CACA packed", lambda t: apply_resnet_block_packed(p01p, t, "CACA"), y0p, fl01)
    y1p = apply_resnet_block_packed(p01p, y0p, "CACA")
    timed("down_l0 DA packed", lambda t: apply_resample_block_packed(pdp, t, "DA"), y1p, fldn)

    # Variants of the level-0 entry block -------------------------------
    from jax_nbody_emulator_with_dj_tpu.models.blocks import _run_conv, _bcast_channels

    w1, b1 = p00["conv_0"]["weight"], p00["conv_0"]["bias"]
    w2, b2 = p00["conv_1"]["weight"], p00["conv_1"]["bias"]
    ws, bs = p00["skip"]["weight"], p00["skip"]["bias"]
    w2p = s2d.pack_w3(w2)
    b2p = s2d.pack_bias(b2)
    wsp = s2d.pack_w1(ws.reshape(3, 64))
    bsp = s2d.pack_bias(bs)

    def l00_packed_after_conv1(t):
        # conv1 mixed NCDHW->NDHWC, pack, then packed conv2 + packed skip
        h = _run_conv(t, w1, "conv", in_fmt="NCDHW") + b1
        h = jnp.where(h > 0, h, 0.01 * h)
        h = s2d.pack(h)
        h = s2d.conv3_packed(h, w2p) + b2p
        xs = t[:, :, 2:-2, 2:-2, 2:-2]
        xs = jnp.moveaxis(xs, 1, -1)
        sk = s2d.conv1_packed(s2d.pack(xs), wsp) + bsp
        h = h + sk
        return jnp.where(h > 0, h, 0.01 * h)

    fl_c1 = vox * 27 * 3 * 64 * 2
    fl_c2 = vox * 27 * 64 * 64 * 2
    timed("l00 variant: pack after conv1", l00_packed_after_conv1, x, fl00)
    timed("  conv1 only (3->64, NCDHW in)", lambda t: _run_conv(t, w1, "conv", in_fmt="NCDHW") + b1, x, fl_c1)
    h64 = jax.device_put(_run_conv(x, w1, "conv", in_fmt="NCDHW") + b1)
    timed("  conv2 unpacked (64ch last)", lambda t: _run_conv(t, w2, "conv") + b2, h64, fl_c2)
    h64p = jax.device_put(s2d.pack(h64))
    del h64
    timed("  conv2 packed", lambda t: s2d.conv3_packed(t, w2p) + b2p, h64p, fl_c2)
    del h64p, y0, y0p, y1p

    # Full phase-1 composition variants
    def phase1_now(t):
        h = apply_resnet_block(p00, t, "CACA", in_fmt="NCDHW")
        h = apply_resnet_block_packed(p01p, s2d.pack(h), "CACA")
        return apply_resample_block_packed(pdp, h, "DA")

    def phase1_packed_entry(t):
        h = l00_packed_after_conv1(t)
        h = apply_resnet_block_packed(p01p, h, "CACA")
        return apply_resample_block_packed(pdp, h, "DA")

    flp1 = fl00 + fl01 + fldn
    timed("phase1 slab (current)", phase1_now, x, flp1)
    timed("phase1 slab (packed entry)", phase1_packed_entry, x, flp1)


if __name__ == "__main__":
    main()
