"""Factored-tangent execution-variant shootout at phase-3 stage shapes.

With the factored tangent (``dy = op(x*g + dx, W) - c*op(x, W)``) every
velocity layer runs 2 convs sharing one kernel.  The stage profile
(``microbench_phase3vel.py``) shows the decoder cat block (stage D) executing
~30% below conv_l01's rate; this isolates where, comparing per-variant:

  d0  production: per part zi = op(xi, Wi), zti = op(xi*gi + dxi, Wi)
      (4 k3-convs + 4 skip dots for conv_0, then conv_1)
  d1  materialized cat: X = cat(parts), XT = cat(factored operands),
      2 convs at Ci=256 rows (grouped weight) per layer
  d2  B=2 batch on the cat: one conv on stack([X, XT]) per layer
      (primal and tangent share every weight, so the whole block runs
      batch-2: z = out[0], zt = out[1], elementwise mixing between)
  d3  per-part B=2: conv(stack([xi, xi*gi+dxi]), Wi) per part — no cat
      materialization, half the conv dispatches of d0

  l0  conv_l01 production (reference rate)
  l2  conv_l01 as B=2 (the d2 transform on a plain vel block)

All variants compute the SAME function (asserted at tolerance before
timing); ms/iter and true executed TF/s are printed.
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
    p.add_argument("--tile", type=int, nargs=3, default=(128, 128, 256))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
    from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
    from jax_nbody_emulator_with_dj_tpu.models.blocks import (
        _cat_weight_parts,
        apply_resnet_block_vel_packed,
        apply_resnet_block_vel_packed_cat,
        pack_resnet_params,
    )
    from jax_nbody_emulator_with_dj_tpu.ops import s2d
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    key = jax.random.key(0)
    params = modulate_emulator_parameters_vel(
        StyleNBodyEmulatorVelCore().init(key), z=0.0, Om=0.3175
    )["params"]
    p01 = pack_resnet_params(params["conv_l01"], "CACA", vel=True)
    pr00 = pack_resnet_params(params["conv_r00"], "CACA", groups=2, vel=True)
    assert "g" in pr00["conv_0"], "expected factored params"

    td, th, tw = args.tile
    # stage-D operand geometry (after entry + l01 on a halo-8 box tile)
    d, h, w2 = td + 8, th + 8, (tw + 8) // 2
    mk = iter(jax.random.split(key, 16))

    def rnd(shape):
        return jax.random.normal(next(mk), shape, jnp.bfloat16)

    y0, dy0, u, du = (rnd((1, d, h, w2, 128)) for _ in range(4))

    # true executed FLOPs (factored: 2 convs/layer)
    voxD = d * h * w2 * 2
    exD = voxD * (2 * (27 * 128 * 64 + 128 * 64) + 2 * 27 * 64 * 64) * 2
    voxB = voxD
    exB = voxB * (2 * (27 * 64 * 64 + 64 * 64) + 2 * 27 * 64 * 64) * 2

    def timed(label, fn, inps, flops=None, reps=2):
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
        per = min(times) / args.chain
        rate = f"  {flops / per / 1e12:6.1f} TF/s executed" if flops else ""
        print(f"{label:44s} {per * 1e3:9.2f} ms/iter{rate}", flush=True)
        return per

    # ---- helpers shared by the variants --------------------------------
    conv = s2d.conv3_packed
    leaky = lambda t: jnp.where(t > 0, t, jnp.asarray(0.01, t.dtype) * t)
    dleaky = lambda t, dt: jnp.where(t > 0, dt, jnp.asarray(0.01, t.dtype) * dt)

    def layer_gc(pp, dt, parts: int = 1):
        # packed rows are parity-major WITHIN each part: part i's scale is
        # tile(g_i, 2); the materialized cat's scale is their concat.
        # g is cast to the OPERAND dtype (production semantics).
        gu = pp["g"]
        n = gu.shape[0] // parts
        gparts = [
            jnp.tile(gu[i * n : (i + 1) * n], 2).astype(dt)
            for i in range(parts)
        ]
        g = jnp.concatenate(gparts, 0) if parts > 1 else gparts[0]
        c = pp["c"].astype(jnp.float32)
        b = pp["b"].astype(jnp.float32)
        return g, c, b

    def d0(a, b_, c_, e_):
        return apply_resnet_block_vel_packed_cat(pr00, (a, c_), (b_, e_), "CACA")

    # d1: materialized channel concat (group-major row order == concat order)
    def d1(a, b_, c_, e_):
        g0, c0, bb0 = layer_gc(pr00["conv_0"], a.dtype, parts=2)
        gs, cs, bbs = layer_gc(pr00["skip"], a.dtype, parts=2)
        X = jnp.concatenate([a, c_], -1)
        XT = jnp.concatenate([a * g0[:128] + b_, c_ * g0[128:] + e_], -1)
        z = conv(X, pr00["conv_0"]["w"])
        zt = conv(XT, pr00["conv_0"]["w"])
        y = leaky(z + bb0.astype(z.dtype))
        dy = dleaky(z + bb0.astype(z.dtype), zt - c0.astype(z.dtype) * z)
        # conv_1 (+ skip on the cat, using the same XT trick per weight)
        g1, c1, bb1 = layer_gc(pr00["conv_1"], a.dtype)
        z1 = conv(y, pr00["conv_1"]["w"])
        zt1 = conv(y * g1 + dy, pr00["conv_1"]["w"])
        # skip path: 1x1 on X with its own factors; XT differs (gs != g0) —
        # rebuild the skip tangent operand
        XTs = jnp.concatenate([a * gs[:128] + b_, c_ * gs[128:] + e_], -1)
        zs = s2d.conv1_packed(X, pr00["skip"]["w"])
        zts = s2d.conv1_packed(XTs, pr00["skip"]["w"])
        cropped = lambda t: t[:, 2:-2, 2:-2, 1:-1]
        ys = cropped(zs) + bbs.astype(zs.dtype)
        dys = cropped(zts - cs.astype(zs.dtype) * zs)
        out = leaky(z1 + bb1.astype(z1.dtype) + ys)
        dout = dleaky(z1 + bb1.astype(z1.dtype) + ys,
                      zt1 - c1.astype(z1.dtype) * z1 + dys)
        return out, dout

    # d2: B=2 batched cat (one conv per layer, batch carries primal+tangent)
    def d2(a, b_, c_, e_):
        g0, c0, bb0 = layer_gc(pr00["conv_0"], a.dtype, parts=2)
        gs, cs, bbs = layer_gc(pr00["skip"], a.dtype, parts=2)
        X = jnp.concatenate([a, c_], -1)
        XT = jnp.concatenate([a * g0[:128] + b_, c_ * g0[128:] + e_], -1)
        z2 = conv(jnp.concatenate([X, XT], 0), pr00["conv_0"]["w"])
        z, zt = z2[:1], z2[1:]
        pre = z + bb0.astype(z.dtype)
        y = leaky(pre)
        dy = dleaky(pre, zt - c0.astype(z.dtype) * z)
        g1, c1, bb1 = layer_gc(pr00["conv_1"], a.dtype)
        o2 = jnp.concatenate([y, y * g1 + dy], 0)
        z2b = conv(o2, pr00["conv_1"]["w"])
        z1, zt1 = z2b[:1], z2b[1:]
        XTs = jnp.concatenate([a * gs[:128] + b_, c_ * gs[128:] + e_], -1)
        zs2 = s2d.conv1_packed(jnp.concatenate([X, XTs], 0), pr00["skip"]["w"])
        zs, zts = zs2[:1], zs2[1:]
        cropped = lambda t: t[:, 2:-2, 2:-2, 1:-1]
        ys = cropped(zs) + bbs.astype(zs.dtype)
        dys = cropped(zts - cs.astype(zs.dtype) * zs)
        out = leaky(z1 + bb1.astype(z1.dtype) + ys)
        dout = dleaky(z1 + bb1.astype(z1.dtype) + ys,
                      zt1 - c1.astype(z1.dtype) * z1 + dys)
        return out, dout

    # d3: per-part B=2 (no cat materialization)
    def d3(a, b_, c_, e_):
        g0, c0, bb0 = layer_gc(pr00["conv_0"], a.dtype, parts=2)
        gs, cs, bbs = layer_gc(pr00["skip"], a.dtype, parts=2)
        w0a, w0b = _cat_weight_parts(pr00["conv_0"]["w"], "conv", 2)
        wsa, wsb = _cat_weight_parts(pr00["skip"]["w"], "skip", 2)
        pa = conv(jnp.concatenate([a, a * g0[:128] + b_], 0), w0a)
        pb = conv(jnp.concatenate([c_, c_ * g0[128:] + e_], 0), w0b)
        z, zt = pa[:1] + pb[:1], pa[1:] + pb[1:]
        pre = z + bb0.astype(z.dtype)
        y = leaky(pre)
        dy = dleaky(pre, zt - c0.astype(z.dtype) * z)
        g1, c1, bb1 = layer_gc(pr00["conv_1"], a.dtype)
        z2b = conv(jnp.concatenate([y, y * g1 + dy], 0), pr00["conv_1"]["w"])
        z1, zt1 = z2b[:1], z2b[1:]
        sa = s2d.conv1_packed(
            jnp.concatenate([a, a * gs[:128] + b_], 0), wsa)
        sb = s2d.conv1_packed(
            jnp.concatenate([c_, c_ * gs[128:] + e_], 0), wsb)
        zs, zts = sa[:1] + sb[:1], sa[1:] + sb[1:]
        cropped = lambda t: t[:, 2:-2, 2:-2, 1:-1]
        ys = cropped(zs) + bbs.astype(zs.dtype)
        dys = cropped(zts - cs.astype(zs.dtype) * zs)
        out = leaky(z1 + bb1.astype(z1.dtype) + ys)
        dout = dleaky(z1 + bb1.astype(z1.dtype) + ys,
                      zt1 - c1.astype(z1.dtype) * z1 + dys)
        return out, dout

    # ---- correctness gate (f32: random-init style factors can be large,
    # amplifying benign bf16 rounding differences between algebraically
    # identical orderings; trained weights keep g O(1)) ------------------
    f32 = [t.astype(jnp.float32)[:, :18, :18, :10] for t in (y0, dy0, u, du)]
    ref = d0(*f32)
    for name, fn in (("d1", d1), ("d2", d2), ("d3", d3)):
        got = fn(*f32)
        for r, g_ in zip(ref, got):
            err = float(jnp.max(jnp.abs(r - g_)))
            scale = float(jnp.max(jnp.abs(r))) + 1e-30
            assert err / scale < 1e-4, (name, err, scale)
    print("variants agree (f32)", flush=True)

    timed("d0 production per-part factored", d0, (y0, dy0, u, du), exD)
    timed("d1 materialized cat", d1, (y0, dy0, u, du), exD)
    timed("d2 B=2 batched cat", d2, (y0, dy0, u, du), exD)
    timed("d3 per-part B=2", d3, (y0, dy0, u, du), exD)

    # conv_l01: production vs B=2
    x1, dx1 = rnd((1, d, h, w2, 128)), rnd((1, d, h, w2, 128))
    timed("l0 conv_l01 production",
          lambda a, b_: apply_resnet_block_vel_packed(p01, a, b_, "CACA"),
          (x1, dx1), exB)

    def l2(a, b_):
        g0, c0, bb0 = layer_gc(p01["conv_0"], a.dtype)
        gs, cs, bbs = layer_gc(p01["skip"], a.dtype)
        z2 = conv(jnp.concatenate([a, a * g0 + b_], 0), p01["conv_0"]["w"])
        z, zt = z2[:1], z2[1:]
        pre = z + bb0.astype(z.dtype)
        y = leaky(pre)
        dy = dleaky(pre, zt - c0.astype(z.dtype) * z)
        g1, c1, bb1 = layer_gc(p01["conv_1"], a.dtype)
        z2b = conv(jnp.concatenate([y, y * g1 + dy], 0), p01["conv_1"]["w"])
        z1, zt1 = z2b[:1], z2b[1:]
        zs2 = s2d.conv1_packed(
            jnp.concatenate([a, a * gs + b_], 0), p01["skip"]["w"])
        zs, zts = zs2[:1], zs2[1:]
        cropped = lambda t: t[:, 2:-2, 2:-2, 1:-1]
        ys = cropped(zs) + bbs.astype(zs.dtype)
        dys = cropped(zts - cs.astype(zs.dtype) * zs)
        out = leaky(z1 + bb1.astype(z1.dtype) + ys)
        dout = dleaky(z1 + bb1.astype(z1.dtype) + ys,
                      zt1 - c1.astype(z1.dtype) * z1 + dys)
        return out, dout

    xf, dxf = (t.astype(jnp.float32)[:, :18, :18, :10] for t in (x1, dx1))
    refl = apply_resnet_block_vel_packed(p01, xf, dxf, "CACA")
    gotl = l2(xf, dxf)
    for r, g_ in zip(refl, gotl):
        err = float(jnp.max(jnp.abs(r - g_)))
        scale = float(jnp.max(jnp.abs(r))) + 1e-30
        assert err / scale < 1e-4, ("l2", err, scale)
    timed("l2 conv_l01 B=2", l2, (x1, dx1), exB)


if __name__ == "__main__":
    main()
