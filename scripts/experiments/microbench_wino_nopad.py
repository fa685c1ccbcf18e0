"""What do the Winograd wrapper's jnp.pad copies cost?

``conv3d_wino_pallas_packed`` pads its input up to block multiples
(+halo) with a full-array ``jnp.pad`` copy and crops the padded output —
per call that is ~2 extra full-tensor HBM round trips (~10% of a
phase-3-shape conv by bandwidth accounting), and the padded-window
transients are what push wide vel phase-3 tiles past HBM
(geometry.py:39-44).

This experiment measures a PAD-FREE call: the same kernel invoked
through a raw pallas_call on an input whose shape already satisfies the
block alignment (as a padded-chain execution mode would guarantee), with
the output left padded (no crop).  The delta vs the production wrapper
at the same logical work bounds what a padded-chain refactor could win.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--shape", type=int, nargs=3, default=(142, 142, 72),
                   help="packed logical input (D, H, WP)")
    p.add_argument("--block", type=int, nargs=3, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.ops.winograd import transform_packed_w3
    from jax_nbody_emulator_with_dj_tpu.ops.winograd_pallas import (
        _ceil_to,
        _pick_block,
        _wino_kernel,
        conv3d_wino_pallas_packed,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    od, oh, owp = d - 2, h - 2, u - 1
    c2 = 128
    w = jax.random.normal(jax.random.key(1), (3, 3, 3, 64, 64), jnp.float32) * 0.05
    wp = s2d.pack_w3(w).astype(jnp.bfloat16)
    what = transform_packed_w3(wp)
    co = 128
    wk = jnp.concatenate([what[:, :, 0], what[:, :, 1]], axis=2)
    bias = jnp.zeros((co,), jnp.float32)

    BD, BH, BWP = (
        tuple(args.block) if args.block else _pick_block(od, oh, owp, c2, co, 2)
    )
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    # PRE-ALIGNED input: the shape the padded-chain mode would hand the
    # kernel directly (block-multiple + halo on every axis).
    x_big = jax.random.normal(
        key, (pd_ + 2, ph_ + 2, pwp + 8, c2), jnp.bfloat16
    )
    x_log = x_big[: d, : h, : u][None]  # logical view for the wrapper row

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _wino_kernel, leaky=True, c2=c2, co=co, blk=(BD, BH, BWP),
    )
    nopad_call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BD, BH, BWP, co), lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((pd_, ph_, pwp, co), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, NP, RH, RW, c2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=False,
    )

    flops = d * h * (2 * u) * 27 * 64 * 64 * 2

    def timed(label, fn, arg, reps=3):
        def chain(x0):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(x0.dtype)
                y = fn(x0 + eps)
                return acc + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        try:
            force_sync(j(arg))
        except Exception as e:
            print(f"{label:46s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            return
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(arg))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:46s} {per * 1e3:9.2f} ms/iter  "
              f"{flops / per / 1e12:7.1f} TF/s (direct-equivalent)",
              flush=True)

    print(f"# block {(BD, BH, BWP)}, grid {grid}, "
          f"pad copies avoided: in {(pd_ + 2) * (ph_ + 2) * (pwp + 8) * c2 * 2 / 2**20:.0f} MiB"
          f" (logical {d * h * u * c2 * 2 / 2**20:.0f} MiB)", flush=True)
    timed("production wrapper (pads + crops)",
          lambda t: conv3d_wino_pallas_packed(
              t, what, bias, leaky=True, block=(BD, BH, BWP)),
          x_log)
    timed("pre-aligned pallas_call (no pad, no crop)",
          lambda t: nopad_call(t, wk, bias),
          x_big)


if __name__ == "__main__":
    main()
