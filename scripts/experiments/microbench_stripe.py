"""Correctness + throughput check of the strip-streamed Pallas conv.

Compares against XLA's packed conv (``s2d.conv3_packed``) numerically, then
times both with the DCE-safe chained-sum harness (see microbench_pallas.py
for the two measurement traps this avoids).
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
    p.add_argument("--shape", type=int, nargs=3, default=(136, 264, 132))
    p.add_argument("--block-h", type=int, default=None)
    p.add_argument("--cin-parts", type=int, default=1)
    p.add_argument("--skip-check", action="store_true")
    p.add_argument("--acc-split", type=int, nargs="*", default=[1, 2, 3])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.stripe_conv import conv3_packed_stripe
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    d, h, u = args.shape
    n_in = args.cin_parts
    keys = jax.random.split(jax.random.key(0), n_in + 1)
    xs = tuple(
        jax.random.normal(keys[i], (1, d, h, u, 128), jnp.bfloat16)
        for i in range(n_in)
    )
    w = (
        jax.random.normal(keys[-1], (3, 3, 3, 64 * n_in, 64), jnp.float32) * 0.05
    )
    wp = s2d.pack_w3(w, groups=n_in).astype(jnp.bfloat16)
    bias = jnp.zeros((64,), jnp.float32)
    bp = s2d.pack_bias(bias)

    if not args.skip_check:
        # correctness on a small shape first
        small = tuple(x[:, :12, :20, :16] for x in xs)
        cat = jnp.concatenate(small, axis=-1) if n_in > 1 else small[0]
        # group-layout: packed concat == concat of packed parts
        ref = s2d.conv3_packed(cat, wp)
        got = conv3_packed_stripe(small, wp, None, block_h=args.block_h)
        err = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        )
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"correctness: shape {got.shape} vs {ref.shape}  max rel err {rel:.2e}")
        assert got.shape == ref.shape
        assert rel < 2e-2, f"mismatch: {rel}"
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.1, atol=0.1,
        )
        print("correctness OK")

    flops = d * h * (2 * u) * 27 * (64 * n_in) * 64 * 2

    def timed(label, fn, reps=3):
        def chain(x0s):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(x0s[0].dtype)
                y = fn(tuple(x + eps for x in x0s))
                return acc + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        try:
            force_sync(j(xs))
        except Exception as e:
            print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(xs))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(
            f"{label:40s} {per * 1e3:9.2f} ms/iter  {flops / per / 1e12:7.1f} TF/s",
            flush=True,
        )

    timed(
        "XLA conv3_packed (concat)",
        lambda ts: s2d.conv3_packed(
            jnp.concatenate(ts, axis=-1) if n_in > 1 else ts[0], wp
        ),
    )

    def conv3_tapdot(xp, w, accum):
        bb, dd, hh, uu, _ = xp.shape
        od_, oh_, ou_ = dd - 2, hh - 2, uu - 1
        y = None
        for kd in range(3):
            for kh in range(3):
                for ka in range(2):
                    lhs = xp[:, kd:kd + od_, kh:kh + oh_, ka:ka + ou_, :]
                    z = jax.lax.dot_general(
                        lhs, w[kd, kh, ka].astype(xp.dtype),
                        (((4,), (0,)), ((), ())),
                        preferred_element_type=accum,
                    )
                    y = z if y is None else y + z
        return y.astype(xp.dtype)

    if n_in == 1:
        timed("XLA tap-stacked dots (f32 acc)",
              lambda ts: conv3_tapdot(ts[0], wp, jnp.float32))
        timed("XLA tap-stacked dots (bf16 acc)",
              lambda ts: conv3_tapdot(ts[0], wp, jnp.bfloat16))
    for split in args.acc_split:
        timed(
            f"stripe acc_split={split}",
            lambda ts, s=split: conv3_packed_stripe(
                ts, wp, bp, leaky=True, acc_split=s, block_h=args.block_h
            ),
        )


if __name__ == "__main__":
    main()
