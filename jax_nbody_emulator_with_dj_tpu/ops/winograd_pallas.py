"""Pallas TPU kernel: F(2,3)^2 Winograd packed conv (+bias +LeakyReLU).

Why this kernel exists.  Round-2/3 measurement (`scripts/experiments/microbench_dots.py`,
README "A note on measuring") pinned the packed 3x3x2 conv against this
chip's K=128 dot-stream cap: XLA's emitter runs ~67 TF/s true, the
strip-streamed hand kernel (`ops/stripe_conv.py`) ~57, and chained
(M,128)x(128,128) dots top out ~80 raw — the *formulation* is
compute-bound, not bandwidth-bound.  The only way past a dot-stream cap is
to issue FEWER dots for the same outputs.  Winograd F(2,3) minimal
filtering does exactly that; the pure-XLA form (`ops/winograd.py`) is
algebraically exact but loses its MAC savings to HBM round-trips between
the transform stages.  This kernel keeps every stage of one block in VMEM:

    DMA window -> input transform (VPU adds via parity reshapes)
               -> 32 point-matmuls (16 Winograd points x 2 packed-W taps)
               -> inverse transform fused with the +-1 output combination,
                  bias and LeakyReLU -> block write-back.

MAC accounting per output block (BD, BH, BWP), window rows RW = BWP + 8:
direct packed conv issues 18 taps over BD*(BH+2)*RW rows; this kernel
issues 32 points over (BD/2)*(BH/2)*RW rows — a 2.0-2.2x cut in MXU work
for identical outputs.  At the measured ~57-80 TF/s raw dot throughput the
*effective* ceiling moves to ~110-160 TF/s, above XLA's 67.

Transforms in-kernel (the part the XLA form could not keep on-chip):

  * Input BT x B over (D, H): with BD, BH even, the stride-2 tile windows
    decompose into even/odd plane groups — pure *reshapes* of the loaded
    window (D and H are major axes of the row-linearized layout), so each
    of the 16 z-point tensors is a +-1 combination of four shifted group
    slices (BT entries for F(2,3) are {0, +-1}: adds only, no multiplies).
  * The packed W axis keeps its exact 2-tap accumulation (as in
    `ops/pallas_conv.py`): tap a=1 is the +1-row-shifted copy of the
    z-row buffer; garbage rows land only in dropped halo columns.
  * Inverse AT y A (entries {0, +-1}) is folded into the accumulation:
    each point product s_uv adds/subtracts into the <=4 output-parity
    fp32 accumulators, so no (4,4) intermediate is ever materialized.

Weights use `ops.winograd.transform_packed_w3` (G applied once, f32) —
the same transform the tested XLA form uses, so numerics match it exactly
kernel-for-kernel; bf16 error vs a direct f32 conv is the same order as
the direct bf16 conv's (measured in tests/test_pallas_conv.py for the
XLA form; asserted for this kernel in interpret mode).

Reference semantics: `/root/reference/src/jax_nbody_emulator/layers.py:52-60`
(VALID conv3) + `:127-133` (LeakyReLU 0.01).  The reference relies on
cuDNN picking Winograd/FFT conv algorithms on the GPU; XLA:TPU has no such
rewrite, so it is hand-built here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .winograd import transform_packed_w3  # G W G^T, f32, shared with XLA form


def _ceil_to(v, m):
    return (v + m - 1) // m * m


# AT rows of F(2,3): output parity p combines points u with these +-1 signs.
_AT_ROWS = ((1, 1, 1, 0), (0, 1, -1, -1))


def _wino_kernel(
    x_hbm, w_ref, b_ref, y_ref, xblk, sem,
    *, leaky: bool, c2: int, co: int, blk,
):
    BD, BH, BWP = blk
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    TD, TH = BD // 2, BH // 2
    MZ = TD * TH * RW  # rows per Winograd point

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nj, nk = pl.num_programs(1), pl.num_programs(2)

    # Double-buffered input windows: each grid step waits on the DMA the
    # previous step started for it, then immediately starts the NEXT
    # step's fetch into the other slot — the ~3-4 us window fetch hides
    # behind this block's transforms and dots.  (The TPU grid is a
    # sequential loop on the core, so scratch and in-flight DMAs persist
    # across steps.)
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

    # ---- fused transform -> point dot -> inverse accumulation -----------
    # Pure dataflow: no staging buffers between the stages.  Each Winograd
    # point's BT-transformed operand is an SSA value feeding its dot
    # directly, and the AT inverse is folded into +-1 accumulations onto
    # four parity accumulators — Mosaic is free to interleave the VPU
    # transform/accumulate work of one point with the MXU dot of another
    # (a VMEM-staged version of this kernel serialized the phases and ran
    # at less than half the MXU's dot-stream rate).
    #
    # Parity reshapes are free relabelings (D, H are major axes); each
    # BT row for F(2,3) is a +-1 pair, so every z tensor is adds of two
    # group slices.  E/O = even/odd planes; suffix 1 = next-tile shift.
    X = xblk[slot]
    Xr = X.reshape(NP // 2, 2, RH, RW, c2)
    E, O = Xr[:, 0], Xr[:, 1]                  # (TD+1, RH, RW, c2)
    E0, E1 = E[:TD], E[1:]
    O0, O1 = O[:TD], O[1:]
    a = (E0 - E1, O0 + E1, E1 - O0, O0 - O1)   # BT rows 0..3 along D

    # AT is applied factored — first over v (4 adds per u), then each u's
    # pair folds straight into the parity accumulators (28 (M, co) f32
    # adds vs 36 for a per-point scatter) — folding per u keeps at most
    # 4 accumulators + one u's temporaries live, which is what lets the
    # larger blocks fit VMEM.
    acc = [None] * 4

    def fold(pq, t):
        acc[pq] = t if acc[pq] is None else acc[pq] + t

    for u in range(4):
        r = a[u].reshape(TD, RH // 2, 2, RW, c2)
        Eh, Oh = r[:, :, 0], r[:, :, 1]        # (TD, TH+1, RW, c2)
        Eh0, Eh1 = Eh[:, :TH], Eh[:, 1:]
        Oh0, Oh1 = Oh[:, :TH], Oh[:, 1:]
        zs = (Eh0 - Eh1, Oh0 + Eh1, Eh1 - Oh0, Oh0 - Oh1)
        s_uv = []
        for v in range(4):
            zf = zs[v].reshape(MZ, c2)
            # Wide-K operand: [z | z shifted +1 row] — the a=1 packed-W
            # tap — so both taps collapse into ONE K=2*c2 dot per point.
            # The shift wraps the last row circularly; that garbage lands
            # only in dropped halo columns (rw = RW-1 >= BWP).
            zn = jnp.concatenate([zf[1:], zf[:1]], axis=0)
            zw = jnp.concatenate([zf, zn], axis=1)
            # precision pinned by operand dtype: for bf16 operands the
            # kernel's contract is bf16 dots with f32 accumulation — a
            # global jax_default_matmul_precision=highest would otherwise
            # ask Mosaic for an fp32-precision bf16 matmul it cannot
            # lower.  f32 operands (interpret-mode tests) must instead
            # pin HIGHEST: DEFAULT would let the backend run the f32
            # dot at bf16 precision, failing the f32-reference checks.
            s_uv.append(
                jnp.dot(
                    zw, w_ref[u, v],
                    preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.HIGHEST
                        if zw.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT
                    ),
                )
            )
        tu0 = (s_uv[0] + s_uv[1]) + s_uv[2]    # AT row 0 over v
        tu1 = (s_uv[1] - s_uv[2]) - s_uv[3]    # AT row 1 over v
        cu0, cu1 = _AT_ROWS[0][u], _AT_ROWS[1][u]
        if cu0:
            fold(0, tu0 if cu0 == 1 else -tu0)
            fold(1, tu1 if cu0 == 1 else -tu1)
        if cu1:
            fold(2, tu0 if cu1 == 1 else -tu0)
            fold(3, tu1 if cu1 == 1 else -tu1)

    bias = b_ref[:].astype(jnp.float32)

    # ---- epilogue + de-interleave of the output parities ----------------
    yt = []
    for pq in range(4):
        o = acc[pq] + bias
        if leaky:
            o = jnp.where(o > 0, o, 0.01 * o)
        yt.append(o.astype(y_ref.dtype).reshape(TD, TH, RW, co))
    yd = [
        jnp.stack([yt[0 + q], yt[2 + q]], axis=1)   # (TD, 2(p), TH, RW, co)
        for q in range(2)
    ]
    Y = jnp.stack(yd, axis=3)                        # (TD, 2, TH, 2, RW, co)
    y_ref[...] = Y.reshape(BD, BH, RW, co)[:, :, :BWP, :]


def _vmem_bytes(bd, bh, bwp, c2, co, ob=2):
    """Rough live-VMEM model of the dataflow kernel, matched to measured
    compile successes/failures on v5e (double-buffered input windows,
    8 live f32 tq accumulators + 4 acc + transform temps + weights)."""
    NP, RH, RW = bd + 2, bh + 2, bwp + 8
    mz = (bd // 2) * (bh // 2) * RW
    return (
        2 * NP * RH * RW * c2 * 2       # double-buffered input windows
        + 8 * mz * co * 4               # f32 parity accumulators + u-temps
        + 4 * mz * c2 * 2               # transform temps (zf/zn/zw)
        + 2 * bd * bh * bwp * co * ob   # double-buffered output block
        + 16 * 2 * c2 * co * 2          # wide-K transformed weights
    )


def _pick_block(
    od: int, oh: int, owp: int, c2: int = 128, co: int = 128, ob: int = 2
):
    """Output block (BD even, BH even, BWP 8-aligned) under ~13 MB VMEM.

    Measured on v5e (production phase-3 widths): covering W in ONE block
    dominates — both the halo-column waste (RW/BWP) and the W pad shrink
    with BWP, and (4, 8, full-W) ran 92.7 TF/s direct-equivalent vs 87 for
    the best split-W block.  Falls back to splitting W (minimizing
    pad x halo waste) only when the full-W block cannot fit VMEM.
    """
    budget = 13 * 1024 * 1024
    shapes = ((4, 8), (2, 16), (2, 8), (2, 4))
    full = max(_ceil_to(owp, 8), 8)
    for bd, bh in shapes:
        if _vmem_bytes(bd, bh, full, c2, co, ob) <= budget:
            return bd, bh, full
    best = None
    for bwp in range(full - 8, 0, -8):
        for bd, bh in shapes:
            if _vmem_bytes(bd, bh, bwp, c2, co, ob) <= budget:
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
def conv3d_wino_pallas_packed(
    xp, what, bias_unpacked=None, *, leaky: bool = False,
    interpret: bool = False, block=None, out_dtype=None,
):
    """Packed-domain Winograd conv: xp (B, D, H, WP, 2Ci) -> (B, D-2, H-2, WP-1, 2Co).

    Args:
        xp: packed input (`ops.s2d.pack`), 2Ci a multiple of 128.
        what: transformed kernel `transform_packed_w3(pack_w3(w))` —
            (4, 4, 2, 2Ci, 2Co); rectangular channel counts supported.
        bias_unpacked: (Co,) fp32 bias, (2Co,) packed fp32 bias, or None.
        leaky: fuse LeakyReLU(0.01).
        block: optional (BD, BH, BWP) override (BD, BH even, BWP 8-aligned).
        out_dtype: output dtype (default: xp's).  Passing float32 with bf16
            operands reproduces XLA's f32-conv-on-TPU semantics (bf16
            operands at default matmul precision, f32 accumulation and
            output) — the f32-compute runtime mode uses this.
    """
    b, d, h, wp_dim, c2 = xp.shape
    assert what.shape[:3] == (4, 4, 2) and what.shape[-2] == c2
    co = what.shape[-1]
    # Wide-K weight layout: the two packed-W taps stack along K so each
    # Winograd point is ONE (M, 2*c2) x (2*c2, co) dot (see kernel note).
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
        block if block is not None else _pick_block(od, oh, owp, c2, co, ob)
    )
    assert BD % 2 == 0 and BH % 2 == 0 and BWP % 8 == 0
    NP, RH, RW = BD + 2, BH + 2, BWP + 8

    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    xp = jnp.pad(
        xp,
        ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 2 - h), (0, pwp + 8 - wp_dim), (0, 0)),
    )

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _wino_kernel, leaky=leaky, c2=c2, co=co, blk=(BD, BH, BWP),
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
def conv3d_wino_pallas(
    x, w, bias=None, *, leaky: bool = False, interpret: bool = False,
    block=None,
):
    """Unpacked convenience wrapper: x (B, D, H, W, C), w (3, 3, 3, C, C)."""
    from . import s2d

    xp = s2d.pack(x)
    what = transform_packed_w3(s2d.pack_w3(w.astype(x.dtype)))
    yp = conv3d_wino_pallas_packed(
        xp, what, None if bias is None else bias,
        leaky=leaky, interpret=interpret, block=block,
    )
    return s2d.unpack(yp)


# ---------------------------------------------------------------------------
# Fused primal+factored-tangent pair kernel (round 5)
# ---------------------------------------------------------------------------
#
# The flagship velocity layers run the factored tangent (style-derived
# dweight; models/blocks.py::_apply_packed_vel "g" path):
#
#     z  = conv(x, W)            y  = z + b
#     zt = conv(x*g + dx, W)     dy = zt - c (.) z
#
# i.e. TWO kernel launches per layer over the SAME weights.  Measured
# round 5 (scripts/experiments/microbench_wino_blocks_narrow.py + block
# scaling): at the narrow phase-3 tile shapes each launch is ~45-75%
# per-block fixed overhead (DMA waits, transform setup, M=640 dot fills).
# This kernel runs both convs in ONE launch: both windows are DMA'd
# (double-buffered each), both transforms feed a SINGLE row-stacked
# (2M, 2C) x (2C, Co) dot per Winograd point — doubling the dot M that
# the fixed cost amortizes over — and the epilogue applies the bias,
# the c-fold, and (optionally) the LeakyReLU *pair* (dy *= 1 or 0.01 by
# y's sign) before writing both outputs.  HBM traffic is unchanged; the
# launch count, DMA waits, and per-dot fill overhead halve.


def _wino_pair_kernel(
    x_hbm, s_hbm, w_ref, b_ref, c_ref, y_ref, dy_ref, xblk, sblk, sem,
    *, leaky: bool, c2: int, co: int, blk,
):
    BD, BH, BWP = blk
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    TD, TH = BD // 2, BH // 2
    MZ = TD * TH * RW

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nj, nk = pl.num_programs(1), pl.num_programs(2)

    step = (i * nj + j) * nk + k
    slot = jax.lax.rem(step, 2)
    nstep = step + 1
    ni = nstep // (nj * nk)
    njj = jax.lax.rem(nstep // nk, nj)
    nkk = jax.lax.rem(nstep, nk)
    last = ni >= pl.num_programs(0)
    ni = jnp.where(last, 0, ni)

    def win_dma(src, dst, bi, bj, bk, s, t):
        return pltpu.make_async_copy(
            src.at[
                pl.ds(bi * BD, NP),
                pl.ds(bj * BH, RH),
                pl.ds(bk * BWP, RW),
                slice(None),
            ],
            dst.at[s],
            sem.at[t, s],
        )

    @pl.when(step == 0)
    def _():
        win_dma(x_hbm, xblk, i, j, k, slot, 0).start()
        win_dma(s_hbm, sblk, i, j, k, slot, 1).start()

    @pl.when(jnp.logical_not(last))
    def _():
        win_dma(x_hbm, xblk, ni, njj, nkk, 1 - slot, 0).start()
        win_dma(s_hbm, sblk, ni, njj, nkk, 1 - slot, 1).start()

    win_dma(x_hbm, xblk, i, j, k, slot, 0).wait()
    win_dma(s_hbm, sblk, i, j, k, slot, 1).wait()

    def bt_d(X):
        """F(2,3) BT along D via the parity-2 reshapes (pure adds)."""
        Xr = X.reshape(NP // 2, 2, RH, RW, c2)
        E, O = Xr[:, 0], Xr[:, 1]
        E0, E1 = E[:TD], E[1:]
        O0, O1 = O[:TD], O[1:]
        return (E0 - E1, O0 + E1, E1 - O0, O0 - O1)

    ax = bt_d(xblk[slot])
    as_ = bt_d(sblk[slot])

    prec = (
        jax.lax.Precision.HIGHEST
        if ax[0].dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    accx = [None] * 4
    accs = [None] * 4

    def fold(acc, pq, t):
        acc[pq] = t if acc[pq] is None else acc[pq] + t

    def bt_h(au):
        """F(2,3) BT along H + the wide-K two-tap row layout, per point."""
        r = au.reshape(TD, RH // 2, 2, RW, c2)
        Eh, Oh = r[:, :, 0], r[:, :, 1]
        Eh0, Eh1 = Eh[:, :TH], Eh[:, 1:]
        Oh0, Oh1 = Oh[:, :TH], Oh[:, 1:]
        zs = (Eh0 - Eh1, Oh0 + Eh1, Eh1 - Oh0, Oh0 - Oh1)
        out = []
        for v in range(4):
            zf = zs[v].reshape(MZ, c2)
            zn = jnp.concatenate([zf[1:], zf[:1]], axis=0)
            out.append(jnp.concatenate([zf, zn], axis=1))
        return out

    for u in range(4):
        zx = bt_h(ax[u])
        zs_ = bt_h(as_[u])
        sx_uv, ss_uv = [], []
        for v in range(4):
            # Row-stacked pair dot: one (2M, 2C) x (2C, Co) dot serves
            # both convs — double the rows per launch-fixed cost.
            zcat = jnp.concatenate([zx[v], zs_[v]], axis=0)
            s = jnp.dot(
                zcat, w_ref[u, v],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            sx_uv.append(s[:MZ])
            ss_uv.append(s[MZ:])
        for acc, s_uv in ((accx, sx_uv), (accs, ss_uv)):
            tu0 = (s_uv[0] + s_uv[1]) + s_uv[2]
            tu1 = (s_uv[1] - s_uv[2]) - s_uv[3]
            cu0, cu1 = _AT_ROWS[0][u], _AT_ROWS[1][u]
            if cu0:
                fold(acc, 0, tu0 if cu0 == 1 else -tu0)
                fold(acc, 1, tu1 if cu0 == 1 else -tu1)
            if cu1:
                fold(acc, 2, tu0 if cu1 == 1 else -tu0)
                fold(acc, 3, tu1 if cu1 == 1 else -tu1)

    bias = b_ref[:].astype(jnp.float32)
    cvec = c_ref[:].astype(jnp.float32)

    yt, dyt = [], []
    for pq in range(4):
        y = accx[pq] + bias
        dy = accs[pq] - cvec * accx[pq]
        if leaky:
            dy = jnp.where(y > 0, dy, 0.01 * dy)
            y = jnp.where(y > 0, y, 0.01 * y)
        yt.append(y.astype(y_ref.dtype).reshape(TD, TH, RW, co))
        dyt.append(dy.astype(dy_ref.dtype).reshape(TD, TH, RW, co))

    for ts, ref in ((yt, y_ref), (dyt, dy_ref)):
        yd = [jnp.stack([ts[0 + q], ts[2 + q]], axis=1) for q in range(2)]
        Y = jnp.stack(yd, axis=3)
        ref[...] = Y.reshape(BD, BH, RW, co)[:, :, :BWP, :]


def _vmem_bytes_pair(bd, bh, bwp, c2, co, ob=2):
    """Live-VMEM model of the pair kernel: two double-buffered window
    sets, 8 f32 accumulators (y + dy), stacked-row dot temps, two
    double-buffered output blocks, the shared wide-K weights."""
    NP, RH, RW = bd + 2, bh + 2, bwp + 8
    mz = (bd // 2) * (bh // 2) * RW
    return (
        4 * NP * RH * RW * c2 * 2       # 2 tensors x double-buffered windows
        + 16 * mz * co * 4              # 8 f32 accumulators + u-temps
        + 8 * mz * c2 * 2               # zx/zs/zcat transform temps
        + 4 * bd * bh * bwp * co * ob   # 2 double-buffered output blocks
        + 16 * 2 * c2 * co * 2          # wide-K transformed weights
    )


def _pick_block_pair(
    od: int, oh: int, owp: int, c2: int = 128, co: int = 128, ob: int = 2
):
    """Block for the pair kernel (same policy as ``_pick_block``; the
    doubled working set forces W splits at shapes the single kernel
    covers in one block)."""
    budget = 13 * 1024 * 1024
    shapes = ((4, 8), (2, 16), (2, 8), (2, 4))
    full = max(_ceil_to(owp, 8), 8)
    for bd, bh in shapes:
        if _vmem_bytes_pair(bd, bh, full, c2, co, ob) <= budget:
            return bd, bh, full
    best = None
    for bwp in range(full - 8, 0, -8):
        for bd, bh in shapes:
            if _vmem_bytes_pair(bd, bh, bwp, c2, co, ob) <= budget:
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
def conv3d_wino_pallas_pair_packed(
    xp, sp, what, bias_unpacked, c_packed, *, leaky: bool = False,
    interpret: bool = False, block=None, out_dtype=None,
):
    """Fused factored-tangent pair conv (see the pair-kernel note above).

    Computes, in one launch over shared weights::

        y  = conv(xp, W) + b                      (+ LeakyReLU if leaky)
        dy = conv(sp, W) - c (.) conv(xp, W)      (dy *= leaky'(y))

    Args:
        xp, sp: packed inputs (``ops.s2d.pack``), same shape; ``sp`` is
            the tangent operand (x*g + dx in the factored-tangent layer).
        what: transformed kernel — (4, 4, 2, 2Ci, 2Co).
        bias_unpacked: (Co,) or packed (2Co,) fp32 bias.
        c_packed: (2Co,) packed fp32 fold vector (or (Co,), tiled).
    Returns (y, dy), each (B, D-2, H-2, WP-1, 2Co).
    """
    b, d, h, wp_dim, c2 = xp.shape
    assert sp.shape == xp.shape and sp.dtype == xp.dtype
    assert what.shape[:3] == (4, 4, 2) and what.shape[-2] == c2
    co = what.shape[-1]
    wk = jnp.concatenate([what[:, :, 0], what[:, :, 1]], axis=2)

    def vec(v):
        if v is None:
            return jnp.zeros((co,), jnp.float32)
        v = v.reshape(-1)
        return (
            v.astype(jnp.float32)
            if v.shape[0] == co
            else jnp.tile(v.astype(jnp.float32), 2)
        )

    bp, cp = vec(bias_unpacked), vec(c_packed)

    od, oh, owp = d - 2, h - 2, wp_dim - 1
    ob = jnp.dtype(out_dtype or xp.dtype).itemsize
    BD, BH, BWP = (
        block if block is not None else _pick_block_pair(od, oh, owp, c2, co, ob)
    )
    assert BD % 2 == 0 and BH % 2 == 0 and BWP % 8 == 0
    NP, RH, RW = BD + 2, BH + 2, BWP + 8

    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    pads = ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 2 - h), (0, pwp + 8 - wp_dim), (0, 0))
    xp = jnp.pad(xp, pads)
    sp = jnp.pad(sp, pads)

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _wino_pair_kernel, leaky=leaky, c2=c2, co=co, blk=(BD, BH, BWP),
    )

    out_sds = jax.ShapeDtypeStruct((pd_, ph_, pwp, co), out_dtype or xp.dtype)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x windows (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),      # s windows (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # transformed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed c fold vector
        ],
        out_specs=[
            pl.BlockSpec(
                (BD, BH, BWP, co), lambda i, j, k: (i, j, k, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BD, BH, BWP, co), lambda i, j, k: (i, j, k, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[out_sds, out_sds],
        scratch_shapes=[
            pltpu.VMEM((2, NP, RH, RW, c2), xp.dtype),
            pltpu.VMEM((2, NP, RH, RW, c2), xp.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * 2 * BD * (BH + 2) * RW * c2 * co
            * grid[0] * grid[1] * grid[2],
            bytes_accessed=2 * (xp.size * 2 + pd_ * ph_ * pwp * co * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )

    ys, dys = [], []
    for n in range(b):
        y, dy = call(xp[n], sp[n], wk, bp, cp)
        ys.append(y[None])
        dys.append(dy[None])
    yp = jnp.concatenate(ys, axis=0) if b > 1 else ys[0]
    dyp = jnp.concatenate(dys, axis=0) if b > 1 else dys[0]
    return yp[:, :od, :oh, :owp, :], dyp[:, :od, :oh, :owp, :]
