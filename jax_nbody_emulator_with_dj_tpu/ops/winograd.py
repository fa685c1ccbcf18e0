"""2D Winograd transform over (D, H) for the packed 3x3x2 interior conv.

The interior convs run space-to-depth packed (``ops/s2d.py``): a 3x3x3 conv
is an exact (3, 3, 2)-tap conv on (B, D, H, W/2, 2C) tensors.  The measured
per-chip ceiling for such K=128 conv/dot streams is ~67 TF/s (XLA emitter)
/ ~80 TF/s raw (``scripts/experiments/microbench_dots.py``) — well under the v5e's
197 TF/s big-GEMM peak — so past round 2 the only way to make the conv
stack faster is to make it *do fewer MACs*.

Winograd F(m, 3) minimal filtering does exactly that on the two unpacked
spatial axes (D, H): an m x m output tile costs (m+2)^2 pointwise products
instead of 9 m^2 tap-MACs — a 2.25x MAC cut for F(2,3)^2, 4x for F(4,3)^2
— while the packed W axis keeps its exact 2-tap accumulation:

    y[., a] = sum_a  AT (G wp[., a] G^T) (.) (BT x[., u+a] B) A

Each of the (m+2)^2 Winograd points is then a (rows, 2C) x (2C, 2C)
matmul — still a full 128-lane MXU contraction, batched over points —
and the input/inverse transforms are integer-coefficient adds on the VPU
(BT/AT of F(2,3) are {0, +-1}; F(4,3) adds small-int multiples; G halves
and sixths live in the *weight* transform, applied once in f32 at pack
time).

Numerics: everything is algebraically exact; in bf16 the transforms
reassociate sums, measured comparable to the packed-vs-unpacked spread
(max ~1e-2 relative on N(0,1) data, same order as direct bf16 vs f32).
F(4,3) amplifies intermediate magnitudes by up to ~5x (BT rows with
{4, -5, 1}); its bf16 error is ~2x F(2,3)'s.

Sizes: F(m,3) requires the conv's OUTPUT (D, H) extents to be multiples
of m.  Callers pick m per conv (the block layer falls back to the direct
packed conv when the tile geometry doesn't divide).

Reference mapping: this accelerates the same math as the reference's
``layers.py:52-60`` conv call; there is no Winograd (or any such
rewrite) in the reference — this is the TPU-side answer to its cuDNN
backend picking Winograd/FFT algorithms on the GPU automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# F(2,3): 4-point transforms.  BT/AT entries in {0, +-1} (pure adds).
_BT = {
    2: np.array(
        [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
    ),
    4: np.array(
        [
            [4, 0, -5, 0, 1, 0],
            [0, -4, -4, 1, 1, 0],
            [0, 4, -4, -1, 1, 0],
            [0, -2, -1, 2, 1, 0],
            [0, 2, -1, -2, 1, 0],
            [0, 4, 0, -5, 0, 1],
        ],
        np.float32,
    ),
}
_G = {
    2: np.array(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
    ),
    4: np.array(
        [
            [1 / 4, 0, 0],
            [-1 / 6, -1 / 6, -1 / 6],
            [-1 / 6, 1 / 6, -1 / 6],
            [1 / 24, 1 / 12, 1 / 6],
            [1 / 24, -1 / 12, 1 / 6],
            [0, 0, 1],
        ],
        np.float32,
    ),
}
_AT = {
    2: np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32),
    4: np.array(
        [
            [1, 1, 1, 1, 1, 0],
            [0, 1, -1, 2, -2, 0],
            [0, 1, 1, 4, 4, 0],
            [0, 1, -1, 8, -8, 1],
        ],
        np.float32,
    ),
}


def transform_packed_w3(wp, m: int = 2):
    """Packed (3, 3, 2, 2Ci, 2Co) kernel -> Winograd (T, T, 2, 2Ci, 2Co).

    What[a, b, t] = sum_{kd, kh} G[a, kd] G[b, kh] wp[kd, kh, t]; computed
    in f32 (G has exact halves for m=2, sixths for m=4) and cast back.
    """
    g = _G[m]
    w32 = jnp.asarray(wp, jnp.float32)
    out = jnp.einsum("ak,bl,kltcf->abtcf", g, g, w32)
    return out.astype(wp.dtype)


def transform_packed_w3_mixed(wp, md: int = 2, mh: int = 4):
    """Mixed-tile weight transform: F(md,3) along D x F(mh,3) along H.

    Packed (3, 3, 2, 2Ci, 2Co) kernel -> (md+2, mh+2, 2, 2Ci, 2Co).
    The F(2,3)xF(4,3) form trades 24 point-dots for 8 outputs per
    (2, 4) tile — MAC ratio 3/9 = 0.333 vs 4/9 for F(2,3)^2 — while
    keeping the cheap D parity-2 decomposition (see
    ``ops/winograd43_pallas.py``).
    """
    w32 = jnp.asarray(wp, jnp.float32)
    out = jnp.einsum("ak,bl,kltcf->abtcf", _G[md], _G[mh], w32)
    return out.astype(wp.dtype)


def _tile_gather(x, axis: int, m: int, n_tiles: int):
    """Stride-m windows of length m+2: stack slices x[k + m*i], k in 0..m+1.

    Returns a new leading-of-`axis` dimension of size T = m+2; the tile
    index axis keeps length n_tiles.
    """
    T = m + 2
    parts = [
        jax.lax.slice_in_dim(x, k, k + (n_tiles - 1) * m + 1, m, axis=axis)
        for k in range(T)
    ]
    return jnp.stack(parts, axis=axis)


def conv3_packed_wino(xp, what, m: int = 2, *, accum_dtype=None):
    """VALID (3,3,2)-tap packed conv via 2D Winograd F(m,3) over (D, H).

    Args:
        xp: (B, D+2, H+2, U+1, C2) packed input window.
        what: transformed kernel from ``transform_packed_w3`` —
            (T, T, 2, C2, F2).
    Returns (B, D, H, U, F2); D and H (output extents) must divide by m.
    """
    out_dtype = accum_dtype or xp.dtype
    B, Dp, Hp, Up, C2 = xp.shape
    D, H, U = Dp - 2, Hp - 2, Up - 1
    if D % m or H % m:
        raise ValueError(f"Winograd F({m},3) needs output D,H % {m} == 0, got {D},{H}")
    nd, nh = D // m, H // m
    T = m + 2
    bt = jnp.asarray(_BT[m], xp.dtype)
    at = jnp.asarray(_AT[m], xp.dtype)

    # Gather D tiles -> (B, T, nd, Hp, Up, C2), transform along the T axis.
    xd = _tile_gather(xp, 1, m, nd)
    xd = jnp.einsum("ak,bkdhuc->badhuc", bt, xd)
    # Gather H tiles -> (B, Ta, nd, T, nh, Up, C2), transform.
    xh = _tile_gather(xd, 3, m, nh)
    xhat = jnp.einsum("bk,qavkhuc->qabvhuc", bt, xh)
    # xhat: (B, Ta, Tb, nd, nh, Up, C2) -> points leading for the batched dot.
    xhat = xhat.transpose(1, 2, 0, 3, 4, 5, 6)  # (Ta, Tb, B, nd, nh, Up, C2)

    wa = what.astype(xp.dtype)
    # Pointwise (per Winograd point) channel matmuls; the packed W axis
    # contributes its two taps as two accumulated batched dots.
    yhat = jnp.einsum(
        "abBdhuc,abcf->abBdhuf", xhat[:, :, :, :, :, :U], wa[:, :, 0],
        preferred_element_type=out_dtype,
    )
    yhat = yhat + jnp.einsum(
        "abBdhuc,abcf->abBdhuf", xhat[:, :, :, :, :, 1:], wa[:, :, 1],
        preferred_element_type=out_dtype,
    )
    yhat = yhat.astype(xp.dtype)

    # Inverse transform: contract the two point axes down to (m, m).
    y = jnp.einsum("pa,abBdhuf->pbBdhuf", at, yhat)
    y = jnp.einsum("qb,pbBdhuf->pqBdhuf", at, y)
    # (m, m, B, nd, nh, U, F2): D index = d*m + p, H index = h*m + q.
    F2 = y.shape[-1]
    y = y.transpose(2, 3, 0, 4, 1, 5, 6).reshape(B, D, H, U, F2)
    return y.astype(out_dtype)


def conv3_packed_wino_vel(xp, dxp, what, dwhat, m: int = 2):
    """Fused primal+tangent Winograd conv: shares both input transforms.

    Computes (in packed space, all VALID):
        y  = conv(x, W)
        dy = conv(x, dW) + conv(dx, W)
    The Winograd x-hat is built ONCE and contracted against [What | dWhat]
    stacked along the output columns (one batched K=128, N=256 dot), the
    dx-hat once against What; the two tangent contributions are summed in
    point space so only one inverse transform runs for dy.

    Returns (y, dy).
    """
    out_dtype = xp.dtype
    B, Dp, Hp, Up, C2 = xp.shape
    D, H, U = Dp - 2, Hp - 2, Up - 1
    if D % m or H % m:
        raise ValueError(f"Winograd F({m},3) needs output D,H % {m} == 0, got {D},{H}")
    nd, nh = D // m, H // m
    bt = jnp.asarray(_BT[m], xp.dtype)
    at = jnp.asarray(_AT[m], xp.dtype)

    def xform(t):
        td = _tile_gather(t, 1, m, nd)
        td = jnp.einsum("ak,bkdhuc->badhuc", bt, td)
        th = _tile_gather(td, 3, m, nh)
        th = jnp.einsum("bk,qavkhuc->qabvhuc", bt, th)
        return th.transpose(1, 2, 0, 3, 4, 5, 6)  # (Ta, Tb, B, nd, nh, Up, C2)

    xhat = xform(xp)
    dxhat = xform(dxp)
    wa = what.astype(xp.dtype)
    dwa = dwhat.astype(xp.dtype)
    F2 = wa.shape[-1]
    wcat = jnp.concatenate([wa, dwa], -1)  # (T, T, 2, C2, 2*F2)

    def pdot(t, w):
        r = jnp.einsum(
            "abBdhuc,abcf->abBdhuf", t[:, :, :, :, :, :U], w[:, :, 0],
            preferred_element_type=out_dtype,
        )
        return r + jnp.einsum(
            "abBdhuc,abcf->abBdhuf", t[:, :, :, :, :, 1:], w[:, :, 1],
            preferred_element_type=out_dtype,
        )

    ycat = pdot(xhat, wcat)  # (..., 2*F2): [y-hat | x(.)dW-hat]
    yhat = ycat[..., :F2]
    dyhat = ycat[..., F2:] + pdot(dxhat, wa)

    def inv(t):
        r = jnp.einsum("pa,abBdhuf->pbBdhuf", at, t.astype(xp.dtype))
        r = jnp.einsum("qb,pbBdhuf->pqBdhuf", at, r)
        return (
            r.transpose(2, 3, 0, 4, 1, 5, 6)
            .reshape(B, D, H, U, F2)
            .astype(out_dtype)
        )

    return inv(yhat), inv(dyhat)
