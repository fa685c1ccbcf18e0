"""Microbenchmark of the conv-path candidates at production shapes.

Chains N ops inside ONE jit so the tunneled backend's per-dispatch latency
(~30 ms) amortizes out; reports achieved useful TF/s (counting the unpacked
conv FLOPs, not the 25% parity-zero padding of packed weights).

Usage: python scripts/experiments/microbench_conv.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CHAIN = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.conv3d import (
        conv3d,
        conv1x1,
        conv_down2,
        conv_up2,
        leaky_relu,
    )
    from jax_nbody_emulator_with_dj_tpu.ops.pallas_conv import conv3d_pallas
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    C = 64
    D = H = 144
    W = 80
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, 3, C, C)) * 0.02).astype(jnp.bfloat16)
    b = jnp.zeros((C,), jnp.float32)

    def timeit(label, fn, *args, flops=None, reps=3):
        f = jax.jit(fn)
        out = f(*args)
        force_sync(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            force_sync(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        tf = (flops / best / 1e12) if flops else float("nan")
        print(f"{label:36s} {best*1e3:9.2f} ms   {tf:7.1f} TF/s")
        return best

    # FLOPs of one VALID 64->64 k3 conv on (D,H,W) input (output shrinks 2).
    def conv_flops(d, h, wdim, n):
        total = 0
        for i in range(n):
            od, oh, ow = d - 2 * (i + 1), h - 2 * (i + 1), wdim - 2 * (i + 1)
            total += od * oh * ow * C * C * 27 * 2
        return total

    flops10 = conv_flops(D, H, W, N_CHAIN)

    # --- XLA unpacked chain ---
    def xla_unpacked(x):
        for _ in range(N_CHAIN):
            x = conv3d(x, w)
        return x

    timeit("xla conv3d unpacked x10", xla_unpacked, x, flops=flops10)

    # --- XLA packed chain ---
    wp = s2d.pack_w3(w)

    def xla_packed(xp):
        for _ in range(N_CHAIN):
            xp = s2d.conv3_packed(xp, wp)
        return xp

    timeit("xla conv3_packed x10", xla_packed, s2d.pack(x), flops=flops10)

    # --- XLA packed + bias + leaky (production epilogue) ---
    bp = s2d.pack_bias(b)

    def xla_packed_ep(xp):
        for _ in range(N_CHAIN):
            xp = leaky_relu(
                (s2d.conv3_packed(xp, wp) + bp.astype(xp.dtype)).astype(xp.dtype)
            )
        return xp

    timeit("xla packed+bias+leaky x10", xla_packed_ep, s2d.pack(x), flops=flops10)

    # --- Pallas chain ---
    def pallas_chain(x):
        for _ in range(N_CHAIN):
            x = conv3d_pallas(x, w, b, leaky=True)
        return x

    try:
        timeit("pallas fused conv x10", pallas_chain, x, flops=flops10)
    except Exception as e:  # pragma: no cover
        print(f"pallas FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- resample + pointwise ops at production shapes ---
    w1 = (jax.random.normal(key, (1, 1, 1, C, C)) * 0.02).astype(jnp.bfloat16)
    wd = (jax.random.normal(key, (2, 2, 2, C, C)) * 0.02).astype(jnp.bfloat16)

    def skip10(x):
        for _ in range(10):
            x = conv1x1(x, w1)
        return x

    timeit("xla conv1x1 (dot) x10", skip10, x, flops=D * H * W * C * C * 2 * 10)

    w1p = s2d.pack_w1(w1)

    def skip10p(xp):
        for _ in range(10):
            xp = s2d.conv1_packed(xp, w1p)
        return xp

    timeit("packed conv1 x10", skip10p, s2d.pack(x), flops=D * H * W * C * C * 2 * 10)

    def down_up(x):
        for _ in range(5):
            x = conv_up2(conv_down2(x, wd), wd)
        return x

    timeit("down2+up2 x5", down_up, x, flops=D * H * W * C * C * 8 * 2 * 2 * 5 // 8 * 2)

    def lrelu20(x):
        for _ in range(20):
            x = leaky_relu(x)
        return x

    t = timeit("leaky_relu x20", lrelu20, x)
    gb = D * H * W * C * 2 * 2 * 20 / 1e9
    print(f"    -> elementwise BW: {gb / t:.0f} GB/s")

    # crop (slice) cost
    def crops(x):
        for _ in range(20):
            x = jnp.pad(x[:, 1:-1, 1:-1, 1:-1, :], ((0, 0),) + ((1, 1),) * 3 + ((0, 0),))
        return x

    t = timeit("crop+pad x20", crops, x)
    print(f"    -> slice/pad BW: {gb / t:.0f} GB/s")


if __name__ == "__main__":
    main()
