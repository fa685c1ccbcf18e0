"""Pallas TPU kernel: fused 3x3x3 VALID convolution (+bias +LeakyReLU).

XLA's conv emitter reaches ~40 TF/s on this network's 64-channel bf16 convs
(v5e bf16 peak 197) and ~53 TF/s on the space-to-depth packed form — both
re-stream the input from HBM per kernel tap, so they sit at the HBM bound of
that formulation.  This kernel holds one input window in VMEM and computes
all 18 packed taps from it.

Packed (space-to-depth) domain:

    pack:   x(D, H, W, C)            -> x'(D, H, W/2, 2C)        [pure reshape]
    weights W(3,3,3,Ci,Co)           -> W'(3,3,2,2Ci,2Co)        [static fold]
    conv3x3x3(x, W)                  == conv3x3x2(x', W')        [exact]
    unpack: y'(D', H', W', 2Co)      -> y(D', H', 2W', Co)       [pure reshape]

With C=64 the packed channels are exactly 128 on both MXU operands.

Kernel structure (the whole point is zero per-tap relayouts):

  * The input window (output block + halo 2 in D/H, 1 packed cell in W) is
    DMA'd to VMEM and linearized ONCE into a 2D row buffer
    ``x2d[(d*RH + h)*RW + w] = window[d, h, w]`` (RW is 8-aligned so the
    reshape is a free relabeling).
  * A 3D tap shift (kd, kh, ka) is then a CONSTANT ROW OFFSET
    ``off = kd*RH*RW + kh*RW + ka``: each tap is one big
    ``x2d[off : off+M] @ W'[kd,kh,ka]`` matmul over contiguous, 8-aligned
    rows.  Rows whose (h, w) fall in the halo region compute garbage that
    lands only in garbage output rows (row-aligned accumulation), which the
    final block extraction drops.
  * The ka=1 taps would need off+1 (sublane-misaligned): a single pre-shifted
    copy ``x2d_rot[r] = x2d[r+1]`` (one relayout) realigns all 9 of them.
  * Epilogue fuses bias + LeakyReLU into the fp32 accumulator before the
    bf16 write-back.

Reference semantics: ``/root/reference/src/jax_nbody_emulator/layers.py:52-60``
(VALID conv3) + ``:127-133`` (LeakyReLU 0.01).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def s2d_pack(x):
    """(B, D, H, W, C) -> (B, D, H, W/2, 2C) — pure reshape."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d, h, w // 2, 2 * c)


def s2d_unpack(y):
    """(B, D, H, WP, 2C) -> (B, D, H, 2*WP, C) — pure reshape."""
    b, d, h, wp, c2 = y.shape
    return y.reshape(b, d, h, wp * 2, c2 // 2)


def s2d_weights(w):
    """(3, 3, 3, Ci, Co) -> packed (3, 3, 2, 2Ci, 2Co).

    W'[a, q*Ci+ci, p*Co+co] = W[2a + q - p, ci, co] when 0 <= 2a+q-p <= 2,
    else 0 (the parity decomposition of the sliding window).
    """
    k1, k2, k3, ci, co = w.shape
    assert (k1, k2, k3) == (3, 3, 3)
    wp = jnp.zeros((3, 3, 2, 2 * ci, 2 * co), w.dtype)
    for a in range(2):
        for q in range(2):
            for p in range(2):
                kw = 2 * a + q - p
                if 0 <= kw <= 2:
                    wp = wp.at[
                        :, :, a, q * ci : (q + 1) * ci, p * co : (p + 1) * co
                    ].set(w[:, :, kw])
    return wp


def _ceil_to(v, m):
    return (v + m - 1) // m * m


_MCHUNK = 256  # rows per accumulation chunk (fp32 acc stays in vregs)


def _conv_kernel(
    x_hbm, w_ref, b_ref, y_ref, xblk, x2d, x2d_rot, y2d, sem,
    *, leaky: bool, c2: int, blk, r_alloc: int,
):
    BD, BH, BWP = blk
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    PLANE = RH * RW
    M = BD * PLANE
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    # DMA the overlapping input window: halo 2 in D/H, 1 packed cell in W
    # (RW = BWP+8 keeps the sublane extent 8-aligned; the input is padded).
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

    # Linearize to rows (free relabel: RW % 8 == 0, full extents) and build
    # the one-row-shifted copy that realigns the ka=1 taps.
    #
    # INVARIANT: rows >= NP*PLANE of x2d/x2d_rot are never initialized (up
    # to ~2*RW+pad rows of arbitrary VMEM).  Tap reads at the highest
    # offsets do address them, but their products accumulate only into
    # output rows whose (h, w) fall in the halo region, which the final
    # ``[:, :BH, :BWP]`` block extraction drops.  If the row layout or the
    # block extraction changes, zero-fill x2d/x2d_rot up to r_alloc first.
    x2d[0 : NP * PLANE, :] = xblk[...].reshape(NP * PLANE, c2)
    x2d_rot[0 : r_alloc - 1, :] = x2d[1:r_alloc, :]

    bias = b_ref[:].astype(jnp.float32)

    # Chunk the row range so each chunk's fp32 accumulator lives in vregs
    # across all 18 taps (a single (M, c2) VMEM accumulator would RMW
    # 36*M*c2*4 bytes per block — measured to dominate the matmuls).
    def chunk_body(ci, _):
        m0 = pl.multiple_of(ci * _MCHUNK, _MCHUNK)
        acc = jnp.zeros((_MCHUNK, c2), jnp.float32)
        for kd in range(3):
            for kh in range(3):
                off = kd * PLANE + kh * RW
                for ka in range(2):
                    src = x2d if ka == 0 else x2d_rot
                    acc = acc + jnp.dot(
                        src[pl.ds(off + m0, _MCHUNK), :],
                        w_ref[kd, kh, ka],
                        preferred_element_type=jnp.float32,
                    )
        acc = acc + bias
        if leaky:
            acc = jnp.where(acc > 0, acc, 0.01 * acc)
        y2d[pl.ds(m0, _MCHUNK), :] = acc.astype(y2d.dtype)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(M, _MCHUNK), chunk_body, 0)
    y_ref[...] = y2d[0:M, :].reshape(BD, RH, RW, c2)[:, :BH, :BWP, :]


def _pick_block(od: int, oh: int, owp: int) -> tuple[int, int, int]:
    """Output block (BD, BH, BWP): fits ~14 MB VMEM, minimal halo+pad waste."""
    # BWP must be 8-aligned; prefer minimal padding of the real W extent.
    bwp = min(
        (b for b in (64, 56, 48, 40, 32, 24, 16, 8) if b <= _ceil_to(owp, 8)),
        key=lambda b: (_ceil_to(owp, b) - owp, -b),
    )
    # Halo waste ~ (BH+2)(BWP+8)/(BH*BWP): grow BH while VMEM allows.
    for bh in (46, 38, 30, 22, 14, 6):
        bd = 3
        if bh > oh + 8:
            continue
        NP, RH, RW = bd + 2, bh + 2, bwp + 8
        plane = RH * RW
        m = _ceil_to(bd * plane, _MCHUNK)
        r_alloc = _ceil_to(2 * plane + 2 * RW + m, 8)
        vmem = (
            NP * plane * 256          # xblk (bf16, 128 lanes * 2B)
            + 2 * r_alloc * 256       # x2d + x2d_rot
            + m * 256                 # y2d staging (bf16)
            + 2 * bd * bh * bwp * 256 # double-buffered out blocks
            + 18 * 128 * 128 * 2      # packed weights
        )
        if vmem <= 14 * 1024 * 1024:
            return bd, bh, bwp
    return 3, 6, bwp


@functools.partial(jax.jit, static_argnames=("leaky", "interpret", "block"))
def conv3d_pallas(
    x, w, bias=None, *, leaky: bool = False, interpret: bool = False, block=None
):
    """Fused VALID conv3x3x3 (+bias +LeakyReLU), batch-shared weights.

    Args:
        x: (B, D, H, W, C), W even; canonical width C = Co = 64.
        w: (3, 3, 3, C, Co) with Co == C.
        bias: (Co,) or None.
        leaky: fuse LeakyReLU(0.01).
        block: optional (BD, BH, BWP) output block override.

    Returns:
        (B, D-2, H-2, W-2, Co) in x.dtype.
    """
    xp = s2d_pack(x)
    wp = s2d_weights(w.astype(x.dtype))
    bias = None if bias is None else bias.astype(jnp.float32)
    yp = conv3d_pallas_packed(
        xp, wp, bias, leaky=leaky, interpret=interpret, block=block
    )
    return s2d_unpack(yp)


@functools.partial(jax.jit, static_argnames=("leaky", "interpret", "block"))
def conv3d_pallas_packed(
    xp, wp, bias_unpacked=None, *, leaky: bool = False, interpret: bool = False, block=None
):
    """Packed-domain fused conv: xp (B, D, H, WP, 2C) -> (B, D-2, H-2, WP-1, 2C).

    ``wp`` is the (3, 3, 2, 2C, 2C) packed kernel (``s2d_weights`` /
    ``ops.s2d.pack_w3``); ``bias_unpacked`` is the (C,) fp32 bias or None.
    """
    b, d, h, wp_dim, c2 = xp.shape
    assert wp.shape[-2] == wp.shape[-1] == c2, "packed kernel must be square"

    bp = (
        jnp.zeros((c2,), jnp.float32)
        if bias_unpacked is None
        else jnp.tile(bias_unpacked.astype(jnp.float32), 2)
    )

    od, oh, owp = d - 2, h - 2, wp_dim - 1
    BD, BH, BWP = block if block is not None else _pick_block(od, oh, owp)
    NP, RH, RW = BD + 2, BH + 2, BWP + 8
    PLANE = RH * RW
    M = BD * PLANE
    m_alloc = _ceil_to(M, _MCHUNK)
    r_alloc = _ceil_to(2 * PLANE + 2 * RW + m_alloc, 8)

    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    # +8 on W so every DMA window (RW sublanes) stays in bounds.
    xp = jnp.pad(
        xp,
        ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 2 - h), (0, pwp + 8 - wp_dim), (0, 0)),
    )

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(
        _conv_kernel, leaky=leaky, c2=c2, blk=(BD, BH, BWP), r_alloc=r_alloc
    )

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x windows DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights
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
            pltpu.VMEM((r_alloc, c2), xp.dtype),
            pltpu.VMEM((r_alloc, c2), xp.dtype),
            pltpu.VMEM((m_alloc, c2), xp.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=18 * 2 * M * c2 * c2 * grid[0] * grid[1] * grid[2],
            bytes_accessed=xp.size * 2 + pd_ * ph_ * pwp * c2 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    ys = [call(xp[n], wp, bp)[None] for n in range(b)]
    yp = jnp.concatenate(ys, axis=0) if b > 1 else ys[0]
    return yp[:, :od, :oh, :owp, :]
