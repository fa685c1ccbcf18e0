"""Microbench: packed k3 conv as parity-split K=256 dot_generals.

The interior convs run packed (2C = 128 lanes) through XLA's conv emitter
(``s2d.conv3_packed``), measured ~74 TF/s at N=128-col shapes.  The
microbench_dots probes showed K=256 dot streams run faster than K=128 on a
v5e, and the packed conv admits an EXACT K=256 reformulation with zero
operand copies: an output cell u contracts input cells (u, u+1) — 2x128
contiguous channels — so splitting outputs by cell parity turns each of
the nine (kd, kh) taps into two pure-reshape K=256 dots:

  even outputs u=2v: lhs = xp[:, kd:, kh:].reshape(..., U/2, 256)
  odd  outputs u=2v+1: lhs = xp[:, kd:, kh:, 1:U-1].reshape(..., 256)

with the kernel rows stacked (Wp[kd,kh,0]; Wp[kd,kh,1]).  The price is one
output interleave (pad+stack+reshape) per conv.

Usage: python scripts/experiments/microbench_parity256.py [--d D --h H --w Wvox]

VERDICT (v5e, (144,144,272) bf16, chain of 8): XLA conv3_packed 82.7 TF/s;
parity K=256 dots 7.7; tap-unrolled K=128 dots 17.5.  The nine shifted
(kd, kh) window operands are strided views the dot must materialize — nine
full-tensor relayout copies per conv — while XLA's conv emitter streams
the same taps through VMEM with halo-aware DMA.  The emitter stays the
production path for the 128-lane interior; explicit-dot reformulations
only pay off where the emitter is pathological (the C=3 entry/exit, see
``s2d.conv3_entry_im2col``).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CHAIN = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=144)
    ap.add_argument("--h", type=int, default=144)
    ap.add_argument("--w", type=int, default=272, help="unpacked W extent")
    ap.add_argument("--c", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    C = args.c
    D, H, W = args.d, args.h, args.w
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, D, H, W, C), jnp.bfloat16)
    w = (jax.random.normal(key, (3, 3, 3, C, C)) * 0.05).astype(jnp.bfloat16)
    wp = s2d.pack_w3(w)  # (3, 3, 2, 2C, 2C)
    # K=256 stacked kernel: (3, 3, 2*2C, 2C), rows = cell a=0 then a=1.
    wk = jnp.concatenate([wp[:, :, 0], wp[:, :, 1]], axis=-2)

    def conv_parity(xp, interleave=True):
        """Packed conv via 9 x 2 parity dots, K = 2*2C."""
        b, d, h, u, c2 = xp.shape
        do, ho, uo = d - 2, h - 2, u - 1
        ue, uodd = (uo + 1) // 2, uo // 2  # even/odd output cell counts
        ye = None
        yo = None
        for kd in range(3):
            for kh in range(3):
                win = xp[:, kd:kd + do, kh:kh + ho]
                lhs_e = win[:, :, :, :2 * ue].reshape(b, do, ho, ue, 2 * c2)
                lhs_o = win[:, :, :, 1:1 + 2 * uodd].reshape(b, do, ho, uodd, 2 * c2)
                rhs = wk[kd, kh]
                ze = jax.lax.dot_general(
                    lhs_e, rhs, (((4,), (0,)), ((), ())),
                    preferred_element_type=xp.dtype,
                )
                zo = jax.lax.dot_general(
                    lhs_o, rhs, (((4,), (0,)), ((), ())),
                    preferred_element_type=xp.dtype,
                )
                ye = ze if ye is None else ye + ze
                yo = zo if yo is None else yo + zo
        if not interleave:
            return ye, yo
        # interleave even/odd output cells back into contiguous order
        if uodd < ue:
            yo = jnp.pad(yo, ((0, 0),) * 3 + ((0, ue - uodd), (0, 0)))
        y = jnp.stack([ye, yo], axis=4).reshape(b, do, ho, 2 * ue, c2)
        return y[:, :, :, :uo]

    def conv_taps128(xp):
        """Control: 18 accumulated K=128 dots (tap-unrolled)."""
        b, d, h, u, c2 = xp.shape
        do, ho, uo = d - 2, h - 2, u - 1
        y = None
        for kd in range(3):
            for kh in range(3):
                for a in range(2):
                    lhs = xp[:, kd:kd + do, kh:kh + ho, a:a + uo]
                    z = jax.lax.dot_general(
                        lhs, wp[kd, kh, a], (((4,), (0,)), ((), ())),
                        preferred_element_type=xp.dtype,
                    )
                    y = z if y is None else y + z
        return y

    def timeit(label, fn, *fargs, flops=None, reps=3):
        f = jax.jit(fn)
        out = f(*fargs)
        force_sync(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*fargs)
            force_sync(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        tf = (flops / best / 1e12) if flops else float("nan")
        print(f"{label:34s} {best*1e3:9.2f} ms   {tf:7.1f} TF/s", flush=True)
        return best

    def chain_flops(d, h, wdim, n):
        total = 0
        for i in range(n):
            od, oh, ow = d - 2 * (i + 1), h - 2 * (i + 1), wdim - 2 * (i + 1)
            total += od * oh * ow * C * C * 27 * 2
        return total

    flops = chain_flops(D, H, W, N_CHAIN)
    xp0 = s2d.pack(x)

    def chain(fn):
        def run(xp):
            for _ in range(N_CHAIN):
                xp = fn(xp)
            return xp
        return run

    timeit(f"xla conv3_packed x{N_CHAIN}", chain(lambda t: s2d.conv3_packed(t, wp)),
           xp0, flops=flops)
    timeit(f"parity K=256 dots x{N_CHAIN}", chain(conv_parity), xp0, flops=flops)
    timeit(f"tap K=128 dots x{N_CHAIN}", chain(conv_taps128), xp0, flops=flops)

    # correctness
    ref = s2d.conv3_packed(xp0, wp)
    got = conv_parity(xp0)
    import numpy as np
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"parity-vs-conv max abs err: {err:.3e} (max |ref| {scale:.3e})")
    assert err <= 0.02 * scale + 1e-3, "parity reformulation mismatch"


if __name__ == "__main__":
    main()
