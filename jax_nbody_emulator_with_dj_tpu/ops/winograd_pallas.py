"""Pallas TPU kernel: F(2,3)^2 Winograd packed conv (+bias +LeakyReLU).

Why this kernel exists.  Round-2/3 measurement (`scripts/microbench_dots.py`,
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


_CHUNK = 256  # rows per accumulation chunk of the point-matmul pass

# AT rows of F(2,3): output parity p combines points u with these +-1 signs.
_AT_ROWS = ((1, 1, 1, 0), (0, 1, -1, -1))


def _wino_kernel(
    x_hbm, w_ref, b_ref, y_ref, xblk, z2d, z2d_rot, ys0, ys1, ys2, ys3, sem,
    *, leaky: bool, c2: int, blk, mz: int, z_alloc: int,
):
    ys = (ys0, ys1, ys2, ys3)
    BD, BH, BWP = blk
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    TD, TH = BD // 2, BH // 2
    MZ = TD * TH * RW  # rows per Winograd point
    assert mz == MZ

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[
            pl.ds(i * BD, NP),
            pl.ds(j * BH, RH),
            pl.ds(k * BWP, RW),
            slice(None),
        ],
        xblk,
        sem,
    )
    dma.start()
    dma.wait()

    # ---- input transform: z[u,v] = BT X BT^T over (D, H) ----------------
    # Parity reshapes are free relabelings (D, H are major axes); each
    # BT row for F(2,3) is a +-1 pair, so every z tensor is adds of two
    # group slices.  E/O = even/odd planes; suffix 1 = next-tile shift.
    X = xblk[...]
    Xr = X.reshape(NP // 2, 2, RH, RW, c2)
    E, O = Xr[:, 0], Xr[:, 1]                  # (TD+1, RH, RW, c2)
    E0, E1 = E[:TD], E[1:]
    O0, O1 = O[:TD], O[1:]
    a = (E0 - E1, O0 + E1, E1 - O0, O0 - O1)   # BT rows 0..3 along D

    for u in range(4):
        r = a[u].reshape(TD, RH // 2, 2, RW, c2)
        Eh, Oh = r[:, :, 0], r[:, :, 1]        # (TD, TH+1, RW, c2)
        Eh0, Eh1 = Eh[:, :TH], Eh[:, 1:]
        Oh0, Oh1 = Oh[:, :TH], Oh[:, 1:]
        zs = (Eh0 - Eh1, Oh0 + Eh1, Eh1 - Oh0, Oh0 - Oh1)
        for v in range(4):
            base = (4 * u + v) * MZ
            z2d[pl.ds(base, MZ), :] = zs[v].reshape(MZ, c2)

    # One +1-row shift realigns all a=1 packed-W taps (garbage crosses
    # only into dropped halo columns / the next point's dropped rows).
    z2d_rot[0 : z_alloc - 1, :] = z2d[1:z_alloc, :]

    bias = b_ref[:].astype(jnp.float32)

    # ---- point matmuls + fused inverse transform ------------------------
    def chunk_body(ci, _):
        m0 = pl.multiple_of(ci * _CHUNK, _CHUNK)
        acc = [jnp.zeros((_CHUNK, c2), jnp.float32) for _ in range(4)]
        for u in range(4):
            cu = (_AT_ROWS[0][u], _AT_ROWS[1][u])
            for v in range(4):
                cv = (_AT_ROWS[0][v], _AT_ROWS[1][v])
                base = (4 * u + v) * MZ
                s = jnp.dot(
                    z2d[pl.ds(base + m0, _CHUNK), :],
                    w_ref[u, v, 0],
                    preferred_element_type=jnp.float32,
                ) + jnp.dot(
                    z2d_rot[pl.ds(base + m0, _CHUNK), :],
                    w_ref[u, v, 1],
                    preferred_element_type=jnp.float32,
                )
                for p in range(2):
                    for q in range(2):
                        cpq = cu[p] * cv[q]
                        if cpq == 1:
                            acc[2 * p + q] = acc[2 * p + q] + s
                        elif cpq == -1:
                            acc[2 * p + q] = acc[2 * p + q] - s
        for pq in range(4):
            o = acc[pq] + bias
            if leaky:
                o = jnp.where(o > 0, o, 0.01 * o)
            ys[pq][pl.ds(m0, _CHUNK), :] = o.astype(ys[pq].dtype)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(MZ, _CHUNK), chunk_body, 0)

    # ---- de-interleave the output parities ------------------------------
    yt = [ys[pq][0:MZ, :].reshape(TD, TH, RW, c2) for pq in range(4)]
    yd = [
        jnp.stack([yt[0 + q], yt[2 + q]], axis=1)   # (TD, 2(p), TH, RW, c2)
        for q in range(2)
    ]
    Y = jnp.stack(yd, axis=3)                        # (TD, 2, TH, 2, RW, c2)
    y_ref[...] = Y.reshape(BD, BH, RW, c2)[:, :, :BWP, :]


def _pick_block(od: int, oh: int, owp: int) -> tuple[int, int, int]:
    """Output block (BD even, BH even, BWP 8-aligned) under ~13.5 MB VMEM."""
    bwp = min(
        (b for b in (64, 56, 48, 40, 32, 24, 16, 8) if b <= _ceil_to(owp, 8)),
        key=lambda b: (_ceil_to(owp, b) - owp, -b),
    )
    for bh in (32, 24, 16, 8):
        for bd in (6, 4, 2):
            if bh > oh + 8 or bd > od + 2:
                continue
            NP, RH, RW = bd + 2, bh + 2, bwp + 8
            if NP % 2 or RH % 2:
                continue
            mz = (bd // 2) * (bh // 2) * RW
            z_alloc = 16 * mz + _ceil_to(_CHUNK, 8)
            ya = _ceil_to(mz, _CHUNK) + _CHUNK
            vmem = (
                NP * RH * RW * c2b                    # xblk
                + 2 * z_alloc * c2b                   # z2d + rot
                + 4 * ya * c2b                        # parity staging
                + 2 * bd * bh * bwp * c2b             # double-buffered out
                + 32 * 128 * 128 * 2                  # transformed weights
            )
            if vmem <= 13.5 * 1024 * 1024:
                return bd, bh, bwp
    return 2, 8, bwp


c2b = 128 * 2  # bytes per row at the canonical packed width (bf16)


@functools.partial(jax.jit, static_argnames=("leaky", "interpret", "block"))
def conv3d_wino_pallas_packed(
    xp, what, bias_unpacked=None, *, leaky: bool = False,
    interpret: bool = False, block=None,
):
    """Packed-domain Winograd conv: xp (B, D, H, WP, 2C) -> (B, D-2, H-2, WP-1, 2C).

    Args:
        xp: packed input (`ops.s2d.pack`), canonical 2C = 128.
        what: transformed kernel `transform_packed_w3(pack_w3(w))` —
            (4, 4, 2, 2C, 2C).
        bias_unpacked: (C,) fp32 bias or None.
        leaky: fuse LeakyReLU(0.01).
        block: optional (BD, BH, BWP) override (BD, BH even, BWP 8-aligned).
    """
    b, d, h, wp_dim, c2 = xp.shape
    assert what.shape[:3] == (4, 4, 2) and what.shape[-1] == c2

    bp = (
        jnp.zeros((c2,), jnp.float32)
        if bias_unpacked is None
        else jnp.tile(bias_unpacked.astype(jnp.float32), 2)
    )

    od, oh, owp = d - 2, h - 2, wp_dim - 1
    BD, BH, BWP = block if block is not None else _pick_block(od, oh, owp)
    assert BD % 2 == 0 and BH % 2 == 0 and BWP % 8 == 0
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    MZ = (BD // 2) * (BH // 2) * RW
    z_alloc = 16 * MZ + _ceil_to(_CHUNK, 8)
    ya = _ceil_to(MZ, _CHUNK) + _CHUNK

    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    xp = jnp.pad(
        xp,
        ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 2 - h), (0, pwp + 8 - wp_dim), (0, 0)),
    )

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _wino_kernel, leaky=leaky, c2=c2, blk=(BD, BH, BWP), mz=MZ,
        z_alloc=z_alloc,
    )

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x windows DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),  # transformed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed bias
        ],
        out_specs=pl.BlockSpec(
            (BD, BH, BWP, c2),
            lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((pd_, ph_, pwp, c2), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((NP, RH, RW, c2), xp.dtype),
            pltpu.VMEM((z_alloc, c2), xp.dtype),
            pltpu.VMEM((z_alloc, c2), xp.dtype),
            pltpu.VMEM((ya, c2), xp.dtype),
            pltpu.VMEM((ya, c2), xp.dtype),
            pltpu.VMEM((ya, c2), xp.dtype),
            pltpu.VMEM((ya, c2), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            # count the direct conv's useful FLOPs so TF/s compare 1:1
            flops=18 * 2 * BD * (BH + 2) * RW * c2 * c2
            * grid[0] * grid[1] * grid[2],
            bytes_accessed=xp.size * 2 + pd_ * ph_ * pwp * c2 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    ys = [call(xp[n], what, bp)[None] for n in range(b)]
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
