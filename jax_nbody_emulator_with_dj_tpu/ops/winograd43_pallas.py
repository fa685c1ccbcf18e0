"""Pallas TPU kernel: mixed F(2,3)xF(4,3) Winograd packed conv (+bias+leaky).

The round-4 F(2,3)^2 kernel (``ops/winograd_pallas.py``) issues 16 point
dots per (2, 2) output tile — MAC ratio 4/9 vs the direct conv.  This
kernel moves the H axis to F(4,3): 24 point dots per (2, 4) tile — ratio
3/9 — a further 25% MAC cut on the conv stack that is ~60-90% of the
whole program (VERDICT r4 #4; the declared remaining roofline lever,
README "Roofline").  The D axis stays F(2,3), keeping the free parity-2
reshape decomposition; H gains stride-4 group reshapes whose BT/AT
coefficients are small integers ({1,2,4,5,8} — VPU multiplies, not just
adds).  Numerics: BT rows reach |.|~5 and AT rows ~8, so bf16 transform
error is ~2x the F(2,3)^2 kernel's (quantified against the physics gate
in ``scripts/compare_f32_buffers.py``-style T(k) analysis; the gate has
~50x margin).

Everything else — DMA-double-buffered input windows, wide-K two-tap
packed-W dots, factored AT accumulation, fused bias+LeakyReLU — follows
``winograd_pallas.py`` (see its module doc for the measurement chain).

H-window fetch note: a (BD, BH, BWP) output block needs BH+2 input rows,
but the stride-4 group decomposition is a reshape that wants RH % 4 == 0,
so windows fetch RH = BH+4 rows (2 garbage rows, never read: they land in
group slots g2[TH], g3[TH] which the BT combinations exclude).

Reference semantics: /root/reference/src/jax_nbody_emulator/layers.py:52-60
(VALID conv3) + :127-133 (LeakyReLU 0.01), as for the F(2,3)^2 kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import transform_packed_w3_mixed  # G2 w G4^T, f32


def _ceil_to(v, m):
    return (v + m - 1) // m * m


# AT rows of F(2,3) over the D axis: D-parity p folds points u with these.
_AT2_ROWS = ((1, 1, 1, 0), (0, 1, -1, -1))


def _wino43_kernel(
    x_hbm, w_ref, b_ref, y_ref, xblk, sem,
    *, leaky: bool, c2: int, co: int, blk,
):
    BD, BH, BWP = blk
    NP, RH, RW = BD + 2, BH + 4, BWP + 8
    TD, TH = BD // 2, BH // 4
    MZ = TD * TH * RW  # rows per Winograd point

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nj, nk = pl.num_programs(1), pl.num_programs(2)

    # Double-buffered input windows (same scheme as winograd_pallas.py).
    step = (i * nj + j) * nk + k
    slot = jax.lax.rem(step, 2)
    nstep = step + 1
    ni = nstep // (nj * nk)
    njj = jax.lax.rem(nstep // nk, nj)
    nkk = jax.lax.rem(nstep, nk)
    last = ni >= pl.num_programs(0)
    ni = jnp.where(last, 0, ni)

    def win_dma(bi, bj, bk, s):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(bi * BD, NP),
                pl.ds(bj * BH, RH),
                pl.ds(bk * BWP, RW),
                slice(None),
            ],
            xblk.at[s],
            sem.at[s],
        )

    @pl.when(step == 0)
    def _():
        win_dma(i, j, k, slot).start()

    @pl.when(jnp.logical_not(last))
    def _():
        win_dma(ni, njj, nkk, 1 - slot).start()

    win_dma(i, j, k, slot).wait()

    # ---- D transform: F(2,3) parity-2 reshapes (pure adds) --------------
    X = xblk[slot]
    Xr = X.reshape(NP // 2, 2, RH, RW, c2)
    E, O = Xr[:, 0], Xr[:, 1]                  # (TD+1, RH, RW, c2)
    E0, E1 = E[:TD], E[1:]
    O0, O1 = O[:TD], O[1:]
    a = (E0 - E1, O0 + E1, E1 - O0, O0 - O1)   # BT2 rows 0..3 along D

    prec = (
        jax.lax.Precision.HIGHEST
        if X.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # 8 output accumulators: D-parity p (2) x H-slot q (4), f32.
    acc = [None] * 8

    def fold(pq, t):
        acc[pq] = t if acc[pq] is None else acc[pq] + t

    two = jnp.asarray(2, X.dtype)
    four = jnp.asarray(4, X.dtype)
    five = jnp.asarray(5, X.dtype)

    for u in range(4):
        # ---- H transform: F(4,3) over stride-4 groups --------------------
        r = a[u].reshape(TD, RH // 4, 4, RW, c2)   # groups of TH+1 entries
        G0, G1, G2_, G3 = r[:, :, 0], r[:, :, 1], r[:, :, 2], r[:, :, 3]
        g0 = G0[:, :TH]
        g1 = G1[:, :TH]
        g2 = G2_[:, :TH]
        g3 = G3[:, :TH]
        g0n = G0[:, 1:]    # rows 4(t+1): valid up to BH    (TH entries)
        g1n = G1[:, 1:]    # rows 4(t+1)+1: valid up to BH+1
        # BT4 rows over window rows [g0 g1 g2 g3 g0n g1n], CSE'd:
        s12p = g1 + g2
        s12m = g1 - g2
        s13m2 = two * (g1 - g3)
        t02 = g0n - g2
        zs = (
            four * g0 - five * g2 + g0n,       # v=0: [4 0 -5 0 1 0]
            (g0n + g3) - four * s12p,          # v=1: [0 -4 -4 1 1 0]
            (g0n - g3) + four * s12m,          # v=2: [0 4 -4 -1 1 0]
            t02 - s13m2,                       # v=3: [0 -2 -1 2 1 0]
            t02 + s13m2,                       # v=4: [0 2 -1 -2 1 0]
            four * g1 - five * g3 + g1n,       # v=5: [0 4 0 -5 0 1]
        )
        s_uv = []
        for v in range(6):
            zf = zs[v].reshape(MZ, c2)
            # Wide-K operand: [z | z shifted +1 row] — the a=1 packed-W
            # tap; wrap garbage lands only in dropped halo columns.
            zn = jnp.concatenate([zf[1:], zf[:1]], axis=0)
            zw = jnp.concatenate([zf, zn], axis=1)
            s_uv.append(
                jnp.dot(
                    zw, w_ref[u, v],
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            )
        # ---- AT4 over v (f32), CSE'd --------------------------------------
        e = s_uv[1] + s_uv[2]
        o = s_uv[1] - s_uv[2]
        e34 = s_uv[3] + s_uv[4]
        o34 = s_uv[3] - s_uv[4]
        h = (
            s_uv[0] + e + e34,                 # q=0: [1 1 1 1 1 0]
            o + 2.0 * o34,                     # q=1: [0 1 -1 2 -2 0]
            e + 4.0 * e34,                     # q=2: [0 1 1 4 4 0]
            o + 8.0 * o34 + s_uv[5],           # q=3: [0 1 -1 8 -8 1]
        )
        # ---- AT2 over u: fold into the 8 (p, q) accumulators --------------
        cu0, cu1 = _AT2_ROWS[0][u], _AT2_ROWS[1][u]
        for q in range(4):
            if cu0:
                fold(0 * 4 + q, h[q] if cu0 == 1 else -h[q])
            if cu1:
                fold(1 * 4 + q, h[q] if cu1 == 1 else -h[q])

    bias = b_ref[:].astype(jnp.float32)

    # ---- epilogue + de-interleave of the (p, q) output slots -------------
    yt = []
    for pq in range(8):
        o = acc[pq] + bias
        if leaky:
            o = jnp.where(o > 0, o, 0.01 * o)
        yt.append(o.astype(y_ref.dtype).reshape(TD, TH, RW, co))
    rows_p = [
        jnp.stack([yt[p * 4 + q] for q in range(4)], axis=2)  # (TD, TH, 4, RW, co)
        for p in range(2)
    ]
    Y = jnp.stack(rows_p, axis=1)              # (TD, 2, TH, 4, RW, co)
    y_ref[...] = Y.reshape(BD, BH, RW, co)[:, :, :BWP, :]


def _vmem_bytes43(bd, bh, bwp, c2, co, ob=2):
    """Live-VMEM model of the mixed kernel (same role as
    ``winograd_pallas._vmem_bytes``): double-buffered input windows,
    8 f32 accumulators + ~6 live s_uv/h f32 temporaries, bf16 transform
    temps, double-buffered output block, 24 wide-K weight points."""
    NP, RH, RW = bd + 2, bh + 4, bwp + 8
    mz = (bd // 2) * (bh // 4) * RW
    return (
        2 * NP * RH * RW * c2 * 2       # double-buffered input windows
        + 16 * mz * co * 4              # f32 accumulators + s_uv/h temps
        + 6 * mz * c2 * 2               # transform temps (zs/zf/zn/zw)
        + 2 * bd * bh * bwp * co * ob   # double-buffered output block
        + 24 * 2 * c2 * co * 2          # wide-K transformed weights
    )


def _pick_block43(
    od: int, oh: int, owp: int, c2: int = 128, co: int = 128, ob: int = 2
):
    """Output block (BD even, BH % 4 == 0, BWP 8-aligned) under ~13 MB.

    Mirrors ``winograd_pallas._pick_block``: prefer covering W in one
    block; fall back to splitting W minimizing pad x halo waste.  The
    24-point weight buffer and taller H windows make full-W blocks
    heavier than the F(2,3)^2 kernel's, so splits kick in earlier.
    """
    budget = 13 * 1024 * 1024
    shapes = ((4, 8), (2, 8), (2, 16), (2, 4))
    full = max(_ceil_to(owp, 8), 8)
    for bd, bh in shapes:
        if _vmem_bytes43(bd, bh, full, c2, co, ob) <= budget:
            return bd, bh, full
    best = None
    for bwp in range(full - 8, 0, -8):
        for bd, bh in shapes:
            if _vmem_bytes43(bd, bh, bwp, c2, co, ob) <= budget:
                waste = _ceil_to(owp, bwp) * (bwp + 8) // bwp
                if best is None or waste < best[0]:
                    best = (waste, bd, bh, bwp)
                break
    if best is None:
        return 2, 4, 8
    return best[1], best[2], best[3]


@functools.partial(
    jax.jit, static_argnames=("leaky", "interpret", "block", "out_dtype")
)
def conv3d_wino43_pallas_packed(
    xp, what, bias_unpacked=None, *, leaky: bool = False,
    interpret: bool = False, block=None, out_dtype=None,
):
    """Packed-domain mixed-Winograd conv: xp (B, D, H, WP, 2Ci) ->
    (B, D-2, H-2, WP-1, 2Co).

    Args:
        xp: packed input (``ops.s2d.pack``), 2Ci a multiple of 128.
        what: transformed kernel ``transform_packed_w3_mixed(pack_w3(w))``
            — (4, 6, 2, 2Ci, 2Co).
        bias_unpacked: (Co,) fp32 bias, (2Co,) packed fp32 bias, or None.
        leaky: fuse LeakyReLU(0.01).
        block: optional (BD, BH, BWP) override (BD even, BH % 4 == 0,
            BWP 8-aligned).
        out_dtype: output dtype (default xp's); see the F(2,3)^2 wrapper.
    """
    b, d, h, wp_dim, c2 = xp.shape
    assert what.shape[:3] == (4, 6, 2) and what.shape[-2] == c2
    co = what.shape[-1]
    # Wide-K weight layout: both packed-W taps stack along K.
    wk = jnp.concatenate([what[:, :, 0], what[:, :, 1]], axis=2)

    if bias_unpacked is None:
        bp = jnp.zeros((co,), jnp.float32)
    elif bias_unpacked.shape[0] == co:
        bp = bias_unpacked.astype(jnp.float32)
    else:
        bp = jnp.tile(bias_unpacked.astype(jnp.float32), 2)

    od, oh, owp = d - 2, h - 2, wp_dim - 1
    ob = jnp.dtype(out_dtype or xp.dtype).itemsize
    BD, BH, BWP = (
        block if block is not None else _pick_block43(od, oh, owp, c2, co, ob)
    )
    assert BD % 2 == 0 and BH % 4 == 0 and BWP % 8 == 0
    NP, RH, RW = BD + 2, BH + 4, BWP + 8

    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    xp = jnp.pad(
        xp,
        ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 4 - h), (0, pwp + 8 - wp_dim), (0, 0)),
    )

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _wino43_kernel, leaky=leaky, c2=c2, co=co, blk=(BD, BH, BWP),
    )

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x windows DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),  # transformed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed bias
        ],
        out_specs=pl.BlockSpec(
            (BD, BH, BWP, co),
            lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (pd_, ph_, pwp, co), out_dtype or xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NP, RH, RW, c2), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            # count the direct conv's useful FLOPs so TF/s compare 1:1
            flops=18 * 2 * BD * (BH + 2) * RW * c2 * co
            * grid[0] * grid[1] * grid[2],
            bytes_accessed=xp.size * 2 + pd_ * ph_ * pwp * co * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    ys = [call(xp[n], wk, bp)[None] for n in range(b)]
    yp = jnp.concatenate(ys, axis=0) if b > 1 else ys[0]
    return yp[:, :od, :oh, :owp, :]


@functools.partial(jax.jit, static_argnames=("leaky", "interpret", "block"))
def conv3d_wino43_pallas(
    x, w, bias=None, *, leaky: bool = False, interpret: bool = False,
    block=None,
):
    """Unpacked convenience wrapper: x (B, D, H, W, C), w (3, 3, 3, C, C)."""
    from . import s2d

    xp = s2d.pack(x)
    what = transform_packed_w3_mixed(s2d.pack_w3(w.astype(x.dtype)))
    yp = conv3d_wino43_pallas_packed(
        xp, what, None if bias is None else bias,
        leaky=leaky, interpret=interpret, block=block,
    )
    return s2d.unpack(yp)
