"""conv_r00 formulation shootout: grouped concat conv vs split accumulate.

The decoder's 128->64 conv consumes concat([y0, u]).  Variants:
  a) concat + one grouped-packed conv (current production path)
  b) two 64->64 packed convs summed (no concat materialization)
  c) atomic 64->64 packed conv (rate reference)
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    d, h, u = args.shape
    a = jax.random.normal(key, (1, d, h, u, 128), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (1, d, h, u, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(2), (3, 3, 3, 128, 64), jnp.float32) * 0.02
    wg2 = s2d.pack_w3(w, groups=2).astype(jnp.bfloat16)
    wa = s2d.pack_w3(w[:, :, :, :64]).astype(jnp.bfloat16)
    wb = s2d.pack_w3(w[:, :, :, 64:]).astype(jnp.bfloat16)
    w64 = s2d.pack_w3(
        jax.random.normal(jax.random.key(3), (3, 3, 3, 64, 64), jnp.float32) * 0.02
    ).astype(jnp.bfloat16)

    true_flops = d * h * (2 * u) * 27 * 128 * 64 * 2  # upper bound (pre-VALID)
    half_flops = true_flops // 2

    def timed(label, fn, inputs, flops, reps=2):
        def chain(*xs):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(xs[0].dtype)
                y = fn(*[x + eps for x in xs])
                return acc + jnp.sum(y.astype(jnp.float32))  # full reduce: defeats slice-DCE

            return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

        j = jax.jit(chain)
        force_sync(j(*inputs))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force_sync(j(*inputs))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.chain
        print(f"{label:40s} {per * 1e3:9.2f} ms/iter  {flops / per / 1e12:7.1f} TF/s", flush=True)

    timed("c) atomic 64->64 packed conv", lambda x: s2d.conv3_packed(x, w64), (a,), half_flops)
    timed(
        "a) concat + grouped conv (current)",
        lambda x, y: s2d.conv3_packed(jnp.concatenate([x, y], -1), wg2),
        (a, b),
        true_flops,
    )
    timed(
        "b) split convs summed",
        lambda x, y: s2d.conv3_packed(x, wa) + s2d.conv3_packed(y, wb),
        (a, b),
        true_flops,
    )


if __name__ == "__main__":
    main()
