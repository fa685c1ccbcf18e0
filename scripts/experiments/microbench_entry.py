"""Entry-conv formulations on real hardware (vel: w and dw both needed).

  V1  current: 9+9 accumulated K=12 dots (conv3_entry_packed x2)
  V2  im2col:  one K=108 dot with [w|dw] stacked cols (N=256)
at the phase-3 tile shape and the phase-1 slab shape.
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
    w3 = jax.random.normal(jax.random.key(2), (3, 3, 3, 3, 64), jnp.bfloat16) * 0.1
    dw3 = jax.random.normal(jax.random.key(3), (3, 3, 3, 3, 64), jnp.bfloat16) * 0.1
    wf = s2d.pack_w3_entry(w3)
    dwf = s2d.pack_w3_entry(dw3)
    wst9 = s2d.entry_cols(jnp.concatenate([wf, dwf], axis=-1))  # (3,4,9,256)

    def timed(label, fn, inps, reps=2):
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
        print(f"{label:52s} {min(times) / args.chain * 1e3:9.2f} ms/iter", flush=True)

    for label, shape in (
        ("tile (1,3,144,144,144)", (1, 3, 144, 144, 144)),
        ("slab (1,3,72,136,520)", (1, 3, 72, 136, 520)),
    ):
        x = jax.random.normal(key, shape, jnp.bfloat16)

        def v1(a):
            return s2d.conv3_entry_packed(a, wf), s2d.conv3_entry_packed(a, dwf)

        def v2(a):
            z = s2d.conv3_entry_im2col(a, wst9)
            return z[..., :128], z[..., 128:]

        timed(f"V1 split dots {label}", v1, (x,))
        timed(f"V2 im2col     {label}", v2, (x,))
        del x


if __name__ == "__main__":
    main()
