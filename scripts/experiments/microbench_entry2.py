"""Entry-conv formulation shootout: im2col layout variants on real hardware.

Stage A (entry conv_l00 vel) measures ~86 ms/tile at (128,128,256) — far above
its ~20 ms conv-rate floor.  The current ``conv3_entry_im2col`` builds its
im2col operand with the contraction dims SCATTERED across the tensor
((B, C, D', H', U, 4, 9): C is a major axis), so the dot needs a relayout of
the ~500 MB operand.  Variant e1 builds the operand with K=C*4*9=108
contiguous-minor ((B, D', H', U, 108)), which is already the dot's native
layout.

  e0  production conv3_entry_im2col (NCDHW input, scattered K)
  e1  channels-minor im2col: one input transpose, K minor-most
  f0  production entry vel block (stage A reference)
  f1  entry vel block on e1
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def entry_cols_kminor(wf):
    """(3, 3, Ci, 4, Cols) entry fold -> (Ci*4*9, Cols) K-minor im2col rhs.

    Row index k = ((a*2 + q)*Ci + c)*9 + (kd*3 + kh), matching the e1 lhs
    built as cells->(q, c) minor merge, (a) pair concat, (kd, kh) tap stack.
    """
    import jax.numpy as jnp

    k1, k2, ci, four, cols = wf.shape
    w6 = wf.reshape(k1, k2, ci, 2, 2, cols)  # [kd, kh, c, a, q, cols]
    return w6.transpose(3, 4, 2, 0, 1, 5).reshape(4 * ci * 9, cols)


def conv3_entry_im2col_kminor(x, rhs, *, accum_dtype=None):
    """VALID 3x3x3 entry conv as one K-minor (M, 108) x (108, Cols) dot."""
    import jax
    import jax.numpy as jnp

    b, c, d, h, w_ = x.shape
    xt = x.transpose(0, 2, 3, 4, 1)  # (B, D, H, W, C)
    xc = xt.reshape(b, d, h, w_ // 2, 2 * c)  # cell-minor (q, c)
    xp = jnp.concatenate([xc[..., :-1, :], xc[..., 1:, :]], -1)  # (.., U, 4C)
    dd, hh = d - 2, h - 2
    lhs = jnp.stack(
        [xp[:, kd:kd + dd, kh:kh + hh] for kd in range(3) for kh in range(3)],
        axis=-1,
    )  # (B, D', H', U, 4C, 9)
    lhs = lhs.reshape(b, dd, hh, lhs.shape[3], 4 * c * 9)
    return jax.lax.dot_general(
        lhs, rhs.astype(x.dtype), (((4,), (0,)), ((), ())),
        preferred_element_type=accum_dtype or x.dtype,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--tile", type=int, nargs=3, default=(128, 128, 256))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        _apply_packed_vel,
        apply_resnet_entry_vel_packed,
        pack_resnet_entry_params,
    )
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    p00 = pack_resnet_entry_params(params["conv_l00"], "CACA", vel=True)

    td, th, tw = args.tile
    x = jax.random.normal(key, (1, 3, td + 16, th + 16, tw + 16), jnp.bfloat16)

    # rebuild the K-minor rhs from the tap-major fold
    # (pack_resnet_entry_params stores w9 = entry_cols(w0): (ci, 4, 9, cols))
    w9 = p00["conv_0"]["w9"]  # (ci, 4, 9, cols)
    ci, four, nine, cols = w9.shape
    wf = w9.transpose(2, 0, 1, 3).reshape(3, 3, ci, four, cols)
    rhs = entry_cols_kminor(wf)

    def timed(label, fn, inps, reps=2):
        def chain(*xs):
            def body(i, acc):
                eps = (jnp.float32(i % 2) * 1e-6).astype(xs[0].dtype)
                ys = fn(*(t + eps for t in xs))
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
        print(f"{label:46s} {per * 1e3:9.2f} ms/iter", flush=True)
        return per

    # correctness: e1 == e0
    small = x[:, :, :20, :20, :20].astype(jnp.float32)
    ref = s2d.conv3_entry_im2col(small, w9)
    got = conv3_entry_im2col_kminor(small, rhs)
    import numpy as np
    err = float(jnp.max(jnp.abs(ref - got)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    assert err / scale < 1e-5, (err, scale)
    print("e1 == e0 (f32)", flush=True)

    timed("e0 production entry im2col", lambda t: s2d.conv3_entry_im2col(t, w9), (x,))
    timed("e1 K-minor entry im2col", lambda t: conv3_entry_im2col_kminor(t, rhs), (x,))

    def f1(t):
        b0 = p00["conv_0"]["b"].astype(t.dtype)
        c2 = b0.shape[0]
        z = conv3_entry_im2col_kminor(t, rhs)
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            leaky_relu_with_tangent,
        )
        h, dh = leaky_relu_with_tangent(z[..., :c2] + b0, z[..., c2:])
        h, dh = _apply_packed_vel(p00["conv_1"], h, dh, "conv")
        xs = t[:, :, 2:-2, 2:-2, 2:-2]
        zs = s2d.conv1_entry_packed(xs, p00["skip"]["w"])
        h = h + zs[..., :c2] + p00["skip"]["b"].astype(t.dtype)
        dh = dh + zs[..., c2:]
        return leaky_relu_with_tangent(h, dh)

    reff = apply_resnet_entry_vel_packed(p00, small)
    gotf = f1(small)
    for r, g_ in zip(reff, gotf):
        err = float(jnp.max(jnp.abs(r - g_)))
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        assert err / scale < 2e-4, (err, scale)  # K-order rounding through conv_1
    print("f1 == f0 (f32)", flush=True)

    timed("f0 production entry vel block",
          lambda t: apply_resnet_entry_vel_packed(p00, t), (x,))
    timed("f1 entry vel block on e1", f1, (x,))


if __name__ == "__main__":
    main()
