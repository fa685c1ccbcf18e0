"""Pallas TPU kernel: fused 3x3x3 VALID convolution (+bias +LeakyReLU).

XLA's conv emitter reaches ~30-35 TF/s on this network's 64-channel bf16
convs (v5e peak 197): with Cin=Cout=64 both MXU operands sit at half the
128-lane width.  This kernel restores full lane utilization with a
space-to-depth transform along W:

    pack:   x(D, H, W, C)            -> x'(D, H, W/2, 2C)        [pure reshape]
    weights W(3,3,3,Ci,Co)           -> W'(3,3,2,2Ci,2Co)        [static fold]
    conv3x3x3(x, W)                  == conv3x3x2(x', W')        [exact]
    unpack: y'(D', H', W', 2Co)      -> y(D', H', 2W', Co)       [pure reshape]

With C=64 the packed channels are exactly 128 on both operands, so each of
the 18 taps is a (M, 128) @ (128, 128) MXU matmul.  W' carries 2 zero
parity-blocks out of 8 (25% padded FLOPs) — the net win is ~2x lane
utilization for 1.33x FLOPs.

The kernel processes one output block per grid step: the input window
(overlapping halo) is DMA'd from HBM to VMEM manually, the 18 taps are
statically unrolled as MXU matmuls accumulating in fp32 VMEM, and the
epilogue fuses bias add and LeakyReLU before writing back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output block shape in packed space: (BD, BH, BWP, 2C).
BD, BH, BWP = 8, 8, 64


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


def _conv_kernel(x_hbm, w_ref, b_ref, y_ref, xblk, acc_ref, sem, *, leaky: bool, c2: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    # DMA the overlapping input window (halo 2 in D/H, 1 in packed W).
    dma = pltpu.make_async_copy(
        x_hbm.at[
            pl.ds(i * BD, BD + 2),
            pl.ds(j * BH, BH + 2),
            pl.ds(k * BWP, BWP + 1),
            slice(None),
        ],
        xblk,
        sem,
    )
    dma.start()
    dma.wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for kd in range(3):
        for kh in range(3):
            for ka in range(2):
                lhs = xblk[kd : kd + BD, kh : kh + BH, ka : ka + BWP, :]
                acc_ref[...] += jnp.dot(
                    lhs.reshape(BD * BH * BWP, c2),
                    w_ref[kd, kh, ka],
                    preferred_element_type=jnp.float32,
                )
    acc = acc_ref[...] + b_ref[:].astype(jnp.float32)
    if leaky:
        acc = jnp.where(acc > 0, acc, 0.01 * acc)
    y_ref[...] = acc.reshape(BD, BH, BWP, c2).astype(y_ref.dtype)


def _ceil_to(v, m):
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("leaky", "interpret"))
def conv3d_pallas(x, w, bias=None, *, leaky: bool = False, interpret: bool = False):
    """Fused VALID conv3x3x3 (+bias +LeakyReLU), batch-shared weights.

    Args:
        x: (B, D, H, W, C), W even; canonical width C = Co = 64.
        w: (3, 3, 3, C, Co) with Co == C.
        bias: (Co,) or None.
        leaky: fuse LeakyReLU(0.01).

    Returns:
        (B, D-2, H-2, W-2, Co) in x.dtype.
    """
    b, d, h, wdim, c = x.shape
    co = w.shape[-1]
    assert c == co, "pallas path requires Ci == Co (use the XLA conv otherwise)"
    c2 = 2 * c

    wp = s2d_weights(w.astype(x.dtype))
    bias = jnp.zeros((co,), jnp.float32) if bias is None else bias
    bp = jnp.tile(bias.astype(jnp.float32), 2)  # (2Co,) parity-duplicated

    xp = s2d_pack(x)  # (B, D, H, WP, 2C)
    wp_dim = xp.shape[3]

    # Packed output dims, padded so blocks divide exactly.
    od, oh, owp = d - 2, h - 2, wp_dim - 1
    pd_, ph_, pwp = _ceil_to(od, BD), _ceil_to(oh, BH), _ceil_to(owp, BWP)
    xp = jnp.pad(
        xp,
        ((0, 0), (0, pd_ + 2 - d), (0, ph_ + 2 - h), (0, pwp + 1 - wp_dim), (0, 0)),
    )

    grid = (pd_ // BD, ph_ // BH, pwp // BWP)
    kern = functools.partial(_conv_kernel, leaky=leaky, c2=c2)

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed bias
        ],
        out_specs=pl.BlockSpec(
            (BD, BH, BWP, c2),
            lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((pd_, ph_, pwp, c2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BD + 2, BH + 2, BWP + 1, c2), x.dtype),
            pltpu.VMEM((BD * BH * BWP, c2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    ys = [call(xp[n], wp, bp)[None] for n in range(b)]
    yp = jnp.concatenate(ys, axis=0) if b > 1 else ys[0]
    yp = yp[:, :od, :oh, :owp, :]
    return s2d_unpack(yp)
