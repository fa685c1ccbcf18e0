"""Microbenchmark: Winograd F(m,3)^2 packed conv vs the direct packed conv.

Chains N convs inside one jit (amortizes the tunneled backend's dispatch
floor); reports *useful* TF/s counting the direct conv's FLOPs
(od*oh*ow*C*C*27*2), so any number above the direct path's is a real
end-to-end win.  Also measures the fused vel (primal+tangent) triple and
bf16 worst-case error vs an f32 direct reference.

Usage: python scripts/experiments/microbench_wino.py [--dh 130] [--w 132] [--chain 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dh", type=int, default=130, help="input D=H extent")
    ap.add_argument("--w", type=int, default=132, help="input W extent (unpacked)")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--c", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d, winograd as wg
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    C = args.c
    D = H = args.dh
    W = args.w
    N = args.chain
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, 3, C, C)) * 0.05).astype(jnp.bfloat16)
    dw = (jax.random.normal(jax.random.key(7), (3, 3, 3, C, C)) * 0.05).astype(
        jnp.bfloat16
    )
    wp = s2d.pack_w3(w)
    dwp = s2d.pack_w3(dw)

    def timeit(label, fn, *fargs, flops=None, reps=3):
        f = jax.jit(fn)
        try:
            out = f(*fargs)
            force_sync(out)
        except Exception as e:  # pragma: no cover
            print(f"{label:34s} FAILED: {type(e).__name__}: {str(e)[:140]}")
            return None
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*fargs)
            force_sync(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        tf = (flops / best / 1e12) if flops else float("nan")
        print(f"{label:34s} {best * 1e3:9.2f} ms   {tf:7.1f} TF/s", flush=True)
        return best

    def conv_flops(d, h, wdim, n, mult=1):
        total = 0
        for i in range(n):
            od, oh, ow = d - 2 * (i + 1), h - 2 * (i + 1), wdim - 2 * (i + 1)
            total += od * oh * ow * C * C * 27 * 2 * mult
        return total

    flopsN = conv_flops(D, H, W, N)

    # --- direct packed chain (the current production path) ---
    def direct(xp):
        for _ in range(N):
            xp = s2d.conv3_packed(xp, wp)
        return xp

    timeit(f"direct conv3_packed x{N}", direct, s2d.pack(x), flops=flopsN)

    # --- Winograd chains ---
    for m in (2, 4):
        ok = all((D - 2 * (i + 1)) % m == 0 for i in range(N))
        if not ok:
            print(f"wino m={m}: chain sizes not all % {m}; skipping chain")
            continue
        what = wg.transform_packed_w3(wp, m)

        def wino(xp, _what=what, _m=m):
            for _ in range(N):
                xp = wg.conv3_packed_wino(xp, _what, _m)
            return xp

        timeit(f"wino m={m} x{N}", wino, s2d.pack(x), flops=flopsN)

    # --- vel triple: direct split-parts vs fused Winograd ---
    dx = jax.random.normal(jax.random.key(3), x.shape, jnp.bfloat16)
    flopsNv = conv_flops(D, H, W, N, mult=3)

    def direct_vel(xp, dxp):
        for _ in range(N):
            y = s2d.conv3_packed(xp, wp)
            dy = s2d.conv3_packed(xp, dwp) + s2d.conv3_packed(dxp, wp)
            xp, dxp = y, dy
        return xp, dxp

    timeit(f"direct vel triple x{N}", direct_vel, s2d.pack(x), s2d.pack(dx),
           flops=flopsNv)

    for m in (2, 4):
        ok = all((D - 2 * (i + 1)) % m == 0 for i in range(N))
        if not ok:
            continue
        what = wg.transform_packed_w3(wp, m)
        dwhat = wg.transform_packed_w3(dwp, m)

        def wino_vel(xp, dxp, _w=what, _dw=dwhat, _m=m):
            for _ in range(N):
                xp, dxp = wg.conv3_packed_wino_vel(xp, dxp, _w, _dw, _m)
            return xp, dxp

        timeit(f"wino vel m={m} x{N}", wino_vel, s2d.pack(x), s2d.pack(dx),
               flops=flopsNv)

    # --- bf16 error vs f32 direct (single conv, N(0,1) data) ---
    xp32 = s2d.pack(x).astype(jnp.float32)
    ref = s2d.conv3_packed(xp32, wp.astype(jnp.float32))  # packed f32 reference
    scale = float(jnp.max(jnp.abs(ref)))
    d16 = s2d.conv3_packed(s2d.pack(x), wp)
    print(f"bf16 err direct: {float(jnp.max(jnp.abs(d16.astype(jnp.float32) - ref))) / scale:.2e}")
    for m in (2, 4):
        if (D - 2) % m:
            continue
        what = wg.transform_packed_w3(wp, m)
        y16 = wg.conv3_packed_wino(s2d.pack(x), what, m)
        err = float(jnp.max(jnp.abs(y16.astype(jnp.float32) - ref))) / scale
        print(f"bf16 err wino m={m}: {err:.2e}")


if __name__ == "__main__":
    main()
