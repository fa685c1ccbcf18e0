"""Space-to-depth (W-parity) packed execution for the 64-channel interior.

The U-Net's interior convs are 64-channel bf16; both MXU operands then sit at
half the 128-lane width and XLA's conv emitter measures ~55 TF/s on a v5e.
Packing the minor spatial axis W pairwise into channels:

    x(B, D, H, W, C)  ->  x'(B, D, H, W/2, 2C)        [pure reshape]

makes every conv operand 128 channels wide; a 3x3x3 conv becomes an exact
3x3x2 conv on packed tensors (the parity decomposition of the sliding
window), measured at ~80 TF/s — a 1.45x end-to-end conv speedup.  The
pack/unpack reshapes are relayouts (~the cost of one elementwise op), so
activations must STAY packed across the network; this module provides the
packed forms of every interior op:

  * ``conv3_packed``  — 3x3x3 conv == (3,3,2) conv on packed tensors with
    ``pack_w3`` weights: W'[a, qCi+ci, pCo+co] = W[2a+q-p] for 0<=2a+q-p<=2.
  * ``conv1_packed``  — 1x1x1 conv == parity-block-diagonal channel matmul.
  * ``down_packed``   — k2s2 conv: output cell u parity p consumes input
    cell 2u+p (both parities), i.e. space-to-depth + matmul with
    W2[(r,s,a,qCi+ci),(pCo+co)] = delta_ap * W[r,s,q,ci,co].
  * ``up_packed``     — lhs-dilated k2 upsample: y[2i+r,2j+s,2k+t] =
    W[1-r,1-s,1-t] . x[i,j,k]; output cell 2v+a parity p comes from input
    cell v parity a: one matmul to (r,s,a,p,Co) then depth-to-space.

All packed weights support ``groups``: when the packed input is a channel
concatenation of g packed tensors, the input-channel rows are laid out as
``[t0q0, t0q1, t1q0, t1q1, ...]`` and the weight packers place each group's
rows accordingly (the unpacked weight's Ci axis is split into g equal
groups).

Everything here is linear and exact (identical math, different operand
shapes); only bf16 summation order differs from the unpacked path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CONV_DN = ("NDHWC", "DHWIO", "NDHWC")


def pack(x):
    """(B, D, H, W, C) -> (B, D, H, W/2, 2C); W must be even."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d, h, w // 2, 2 * c)


def unpack(xp):
    """(B, D, H, WP, 2C) -> (B, D, H, 2*WP, C)."""
    b, d, h, wp, c2 = xp.shape
    return xp.reshape(b, d, h, 2 * wp, c2 // 2)


def _group_rows(ci: int, groups: int):
    """Packed input-channel row index for (group, parity, ci_in_group)."""
    g = ci // groups
    rows = np.zeros((2, ci), np.int64)  # [parity, unpacked ci] -> packed row
    for grp in range(groups):
        for q in range(2):
            rows[q, grp * g:(grp + 1) * g] = np.arange(g) + grp * 2 * g + q * g
    return rows


def pack_w3(w, groups: int = 1):
    """(3,3,3,Ci,Co) -> (3,3,2,2Ci,2Co) parity-decomposed kernel."""
    k1, k2, k3, ci, co = w.shape
    assert (k1, k2, k3) == (3, 3, 3)
    rows = _group_rows(ci, groups)
    wp = jnp.zeros((3, 3, 2, 2 * ci, 2 * co), w.dtype)
    for a in range(2):
        for q in range(2):
            for p in range(2):
                kw = 2 * a + q - p
                if 0 <= kw <= 2:
                    wp = wp.at[:, :, a, rows[q], p * co:(p + 1) * co].set(w[:, :, kw])
    return wp


def pack_w1(w, groups: int = 1):
    """(1,1,1,Ci,Co) (or (Ci,Co)) -> (2Ci, 2Co) parity-block-diagonal matmul."""
    w = w.reshape(w.shape[-2], w.shape[-1])
    ci, co = w.shape
    rows = _group_rows(ci, groups)
    wp = jnp.zeros((2 * ci, 2 * co), w.dtype)
    for p in range(2):
        wp = wp.at[rows[p], p * co:(p + 1) * co].set(w)
    return wp


def pack_w_down(w, groups: int = 1):
    """(2,2,2,Ci,Co) k2s2 kernel -> (8*2Ci, 2Co) space-to-depth matmul.

    Row layout matches ``down_packed``'s reshape: (r, s, a, packed-channel).
    """
    ci, co = w.shape[-2], w.shape[-1]
    rows = _group_rows(ci, groups)
    wp = jnp.zeros((2, 2, 2, 2 * ci, 2 * co), w.dtype)
    for p in range(2):  # output parity == which input cell (a) it consumes
        for q in range(2):  # input parity == kernel W tap
            wp = wp.at[:, :, p, rows[q], p * co:(p + 1) * co].set(w[:, :, q])
    return wp.reshape(8 * 2 * ci, 2 * co)


def pack_w_up(w, groups: int = 1):
    """(2,2,2,Ci,Co) upsample kernel -> (2Ci, 16*Co) matmul.

    Column layout matches ``up_packed``'s reshuffle: (r, s, a, p, Co); the
    value at (a*Ci+ci, (r,s,a,p,co)) is w[1-r, 1-s, 1-p, ci, co].
    """
    ci, co = w.shape[-2], w.shape[-1]
    rows = _group_rows(ci, groups)
    wp = jnp.zeros((2 * ci, 2, 2, 2, 2, co), w.dtype)
    for r in range(2):
        for s in range(2):
            for a in range(2):
                for p in range(2):
                    wp = wp.at[rows[a], r, s, a, p].set(w[1 - r, 1 - s, 1 - p])
    return wp.reshape(2 * ci, 16 * co)


def pack_bias(b):
    """(Co,) -> (2Co,) parity-duplicated bias."""
    return jnp.tile(b, 2)


# ---------------------------------------------------------------------------
# Entry convs: NCDHW small-C input -> packed channels-last output.
#
# XLA's conv emitter is pathological on C=3 inputs in either layout
# (channels-last pads 3 -> 128 lanes, 42x; the mixed NCDHW form measured
# ~2.6 TF/s / 42 ms per 512^2x40 slab on a v5e — dominating the level-0
# entry block).  These forms express the first conv as one dot_general over
# stacked kernel taps, writing the packed layout directly, so the level-0
# entry block never materializes an unpacked C=64 (or padded C=3) tensor.
#
# Derivation: output position w = 2u+p reads input 2u+p+kw; in cell pairs
# (cell u, cell u+1, 2 parities each) the source index is t = p+kw in 0..3.
# ---------------------------------------------------------------------------


def pack_w3_entry(w):
    """(3,3,3,Ci,Co) -> (3,3,Ci,4,2Co) fold for ``conv3_entry_packed``."""
    k1, k2, k3, ci, co = w.shape
    assert (k1, k2, k3) == (3, 3, 3)
    wf = jnp.zeros((3, 3, ci, 4, 2 * co), w.dtype)
    for kw in range(3):
        for p in range(2):
            wf = wf.at[:, :, :, p + kw, p * co:(p + 1) * co].set(w[:, :, kw])
    return wf


def conv3_entry_packed(x, wf, *, accum_dtype=None):
    """VALID 3x3x3 conv: (B, C, D, H, W) NCDHW -> (B, D-2, H-2, (W-2)/2, 2Co).

    One accumulated dot_general per (kd, kh) tap pair — stacking all nine
    taps into one operand costs a window-sized x9 transient (~2 GB per
    512^2 slab), which crowded the velocity path's HBM for no speed gain
    (this conv is ~0.3% of the network FLOPs; it exists to bypass XLA's
    pathological C=3 conv, not to feed the MXU).
    """
    b, c, d, h, w_ = x.shape
    xc = x.reshape(b, c, d, h, w_ // 2, 2)
    # cell pairs: (B, C, D, H, U, 4) with U = W/2 - 1
    xp = jnp.concatenate([xc[..., :-1, :], xc[..., 1:, :]], -1)
    out = accum_dtype or x.dtype
    y = None
    for kd in range(3):
        for kh in range(3):
            lhs = xp[:, :, kd:kd + d - 2, kh:kh + h - 2]  # (B,C,D',H',U,4)
            rhs = wf[kd, kh].astype(x.dtype)  # (Ci, 4, 2Co)
            z = jax.lax.dot_general(
                lhs, rhs, (((1, 5), (0, 1)), ((), ())),
                preferred_element_type=out,
            )
            y = z if y is None else y + z
    return y  # (B, D-2, H-2, U, 2Co)


def entry_cols(wf):
    """(3, 3, Ci, 4, Cols) tap-major entry fold -> (4*Ci*9, Cols) im2col rhs.

    K-minor row order k = ((a*2 + q)*Ci + c)*9 + (kd*3 + kh), matching
    ``conv3_entry_im2col``'s lhs build: channels-last cell merge (q, c),
    cell-pair concat (a), then tap stack (kd, kh) minor-most.  Cols may be
    2Co (primal) or 4Co (primal|tangent stacked).
    """
    k1, k2, ci, four, cols = wf.shape
    w6 = wf.reshape(k1, k2, ci, 2, 2, cols)  # [kd, kh, c, a, q, cols]
    return w6.transpose(3, 4, 2, 0, 1, 5).reshape(four * ci * k1 * k2, cols)


def conv3_entry_im2col(x, wf9, *, accum_dtype=None):
    """VALID 3x3x3 entry conv as ONE K=4*Ci*9 dot (im2col over cell pairs).

    (B, C, D, H, W) NCDHW -> (B, D-2, H-2, (W-2)/2, Cols).  The stacked
    nine-tap operand costs a window-sized x9 transient (~300 MB at 144^3
    tiles, ~550 MB at H-split 512-wide slabs) but replaces nine accumulated
    K=12 dots with one K=108 dot; in vel mode the primal and tangent
    kernels stack along Cols so the operand is built once for both.  The
    contraction axis is built CONTIGUOUS-MINOR ((B, D', H', U, 108) after
    one input transpose), which is the dot's native operand layout —
    measured 2.2x over the scattered-K form ((B, C, D', H', U, 4, 9),
    whose relayout dominated the entry stage) and 6.3x over per-tap
    accumulated K=12 dots, on a v5e at (144, 144, 272) tiles.
    """
    b, c, d, h, w_ = x.shape
    xt = x.transpose(0, 2, 3, 4, 1)  # (B, D, H, W, C)
    xc = xt.reshape(b, d, h, w_ // 2, 2 * c)  # cell merge, (q, c) minor
    xp = jnp.concatenate([xc[..., :-1, :], xc[..., 1:, :]], -1)  # (.., U, 4C)
    dd, hh = d - 2, h - 2
    lhs = jnp.stack(
        [xp[:, kd:kd + dd, kh:kh + hh] for kd in range(3) for kh in range(3)],
        axis=-1,
    )  # (B, D', H', U, 4C, 9)
    lhs = lhs.reshape(b, dd, hh, lhs.shape[3], 4 * c * 9)
    return jax.lax.dot_general(
        lhs, wf9.astype(x.dtype), (((4,), (0,)), ((), ())),
        preferred_element_type=accum_dtype or x.dtype,
    )


def unpack_to_ncdhw(yp):
    """(B, D, H, U, 2C) packed -> (B, C, D, H, 2U) NCDHW.

    Exit relayout for small-C outputs (the model's C=3 tail): the packed
    conv emits (parity, channel) in the minor dim; NCDHW puts W minor (lane
    dim 2U, no padding) — one transpose instead of XLA's pathological
    C=3-output mixed conv.
    """
    b, d, h, u, c2 = yp.shape
    c = c2 // 2
    y = yp.reshape(b, d, h, u, 2, c)
    return y.transpose(0, 5, 1, 2, 3, 4).reshape(b, c, d, h, 2 * u)


def pack_w1_entry(w):
    """(1,1,1,Ci,Co) (or (Ci,Co)) -> (Ci,2,2Co) fold for ``conv1_entry_packed``."""
    w = w.reshape(w.shape[-2], w.shape[-1])
    ci, co = w.shape
    wf = jnp.zeros((ci, 2, 2 * co), w.dtype)
    for p in range(2):
        wf = wf.at[:, p, p * co:(p + 1) * co].set(w)
    return wf


def conv1_entry_packed(x, wf, *, accum_dtype=None):
    """1x1x1 conv: (B, C, D, H, W) NCDHW -> (B, D, H, W/2, 2Co) packed."""
    b, c, d, h, w_ = x.shape
    xc = x.reshape(b, c, d, h, w_ // 2, 2)
    return jax.lax.dot_general(
        xc, wf.astype(x.dtype), (((1, 5), (0, 1)), ((), ())),
        preferred_element_type=accum_dtype or x.dtype,
    )


def _dot(x, w2, out_dtype):
    return jax.lax.dot_general(
        x, w2.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def conv3_packed(xp, wp, *, accum_dtype=None):
    """VALID 3x3x3 conv on packed tensors (wp from ``pack_w3``).

    Narrow-output note (the model's 64->3 tail): a tap-stacked-N
    reformulation — one unshifted (M, K) x (K, 18*Cols) dot plus 18
    shifted Cols-wide adds — measured SLOWER on a v5e (20.8 vs 17.9 ms at
    the vel tile, 36.1 vs 30.4 at the disp tile): the narrow adds have a
    6-lane minor dim, so each pads to the 128-lane vreg width and the 18
    passes cost more than the MXU N-padding they remove.  XLA's emitter
    already handles small-N convs acceptably; keep the plain conv.
    """
    out = accum_dtype or xp.dtype
    return jax.lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1, 1, 1), "VALID",
        dimension_numbers=CONV_DN, preferred_element_type=out,
    )


def conv1_packed(xp, w1p, *, accum_dtype=None):
    """1x1x1 conv on packed tensors (w1p from ``pack_w1``)."""
    return _dot(xp, w1p, accum_dtype or xp.dtype)


def down_packed(xp, wdp, *, accum_dtype=None):
    """Stride-2 kernel-2 conv on packed tensors (wdp from ``pack_w_down``)."""
    b, d, h, wp_, c2 = xp.shape
    xr = xp.reshape(b, d // 2, 2, h // 2, 2, wp_ // 2, 2, c2)
    xr = xr.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, wp_ // 2, 8 * c2
    )
    return _dot(xr, wdp, accum_dtype or xp.dtype)


def up_packed(xp, wup, *, accum_dtype=None):
    """2x lhs-dilated kernel-2 upsample on packed tensors (``pack_w_up``)."""
    b, d, h, wp_, c2 = xp.shape
    co = wup.shape[1] // 16
    y = _dot(xp, wup, accum_dtype or xp.dtype)  # (B,D,H,WP, r,s,a,p,Co)
    y = y.reshape(b, d, h, wp_, 2, 2, 2, 2 * co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, D,r, H,s, WP,a, 2Co)
    return y.reshape(b, 2 * d, 2 * h, 2 * wp_, 2 * co)
