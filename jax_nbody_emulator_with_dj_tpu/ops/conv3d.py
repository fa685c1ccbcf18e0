"""Channels-last 3D convolution primitives for TPU.

TPU-first design choices (vs reference ``layers.py:52-60``, which uses NCDHW /
OIDHW and a per-sample vmap):

* layout is ``(B, D, H, W, C)`` with ``(K, K, K, Cin, Cout)`` kernels, so the
  channel dimension maps onto the 128-wide vector lanes and the MXU sees
  ``(spatial*batch, Cin) x (Cin, Cout)`` contractions;
* weights are shared across the batch, so one ``lax.conv_general_dilated``
  call covers the whole batch (style modulation is folded into input/output
  channel scalings instead of per-sample kernels — see ``ops/style.py``);
* the MXU always accumulates in fp32 internally; the *output buffer* dtype
  defaults to the activation dtype (bf16 end-to-end halves HBM traffic and
  peak memory vs fp32 conv outputs).  Pass ``accum_dtype=jnp.float32`` to
  materialize fp32 outputs when a high-precision epilogue is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NDHWC activations, DHWIO kernels.
CONV_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def _accum(x, accum_dtype):
    """Resolve the conv output dtype (never narrower than the input)."""
    if accum_dtype is None:
        return x.dtype
    return jnp.promote_types(x.dtype, accum_dtype)


def conv3d(x, w, *, stride: int = 1, accum_dtype=None, in_fmt: str = "NDHWC", out_fmt: str = "NDHWC"):
    """VALID 3D convolution; channels-last internally, mixed boundary formats.

    TPU memory layouts pad the minor (lane) dimension to 128, so a
    channels-last tensor with C=3 occupies ~42x its logical size in HBM.
    The few-channel boundary tensors (the displacement inputs/outputs)
    therefore stay NCDHW and the conv consumes/produces them directly via
    mixed ``dimension_numbers`` — no materialized relayout.

    Args:
        x: activations in ``in_fmt`` ('NDHWC' or 'NCDHW').
        w: ``(K, K, K, Cin, Cout)`` kernel; cast to ``x.dtype`` for the MXU.
        stride: isotropic spatial stride.
        accum_dtype: output buffer dtype (default: ``x.dtype``).
        in_fmt / out_fmt: activation formats at the conv boundary.
    """
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,) * 3,
        padding="VALID",
        dimension_numbers=(in_fmt, "DHWIO", out_fmt),
        preferred_element_type=_accum(x, accum_dtype),
    )


def conv3d_up(x, w, *, accum_dtype=None, in_fmt: str = "NDHWC", out_fmt: str = "NDHWC"):
    """2x upsampling convolution via input (lhs) dilation.

    Matches the reference semantics (``layers.py:107-117``): kernel size 2,
    ``lhs_dilation=(2,2,2)``, padding ``(1,1)`` per axis — output is exactly
    twice the input size per axis, with no checkerboard artifacts.
    """
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=((1, 1),) * 3,
        lhs_dilation=(2, 2, 2),
        dimension_numbers=(in_fmt, "DHWIO", out_fmt),
        preferred_element_type=_accum(x, accum_dtype),
    )


def conv1x1(x, w, *, accum_dtype=None, in_fmt: str = "NDHWC", out_fmt: str = "NDHWC"):
    """1x1x1 convolution as a channel matmul.

    XLA's TPU conv emitter handles K=1 convolutions ~12x slower than the
    bandwidth bound (measured 2.2 TF/s vs 35 for conv3); a plain
    ``dot_general`` over the channel axis hits the expected speed.  Exact
    same math as ``conv3d(x, w)`` with a (1,1,1,Ci,Co) kernel.
    """
    out_dtype = _accum(x, accum_dtype)
    w2 = w.reshape(w.shape[-2], w.shape[-1]).astype(x.dtype)  # (Ci, Co)
    cx = 1 if in_fmt == "NCDHW" else 4
    y = jax.lax.dot_general(
        x, w2, (((cx,), (0,)), ((), ())), preferred_element_type=out_dtype
    )  # channel axis moves to the end
    if out_fmt == "NCDHW":
        return jnp.moveaxis(y, -1, 1)
    return y


def conv_down2(x, w, *, accum_dtype=None):
    """Stride-2 kernel-2 downsampling conv as space-to-depth + matmul.

    y[d,h,w] = sum_{r,s,t} W[r,s,t] . x[2d+r, 2h+s, 2w+t] — each output
    voxel consumes a disjoint 2x2x2 input cell, so grouping the cell into
    channels turns the conv into one (M, 8*Ci) x (8*Ci, Co) matmul
    (measured ~7x faster than the XLA k2s2 conv).  Channels-last only.
    """
    b, d, h, wd, c = x.shape
    out_dtype = _accum(x, accum_dtype)
    xr = x.reshape(b, d // 2, 2, h // 2, 2, wd // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2, wd // 2, 8 * c)
    w2 = w.reshape(8 * c, w.shape[-1]).astype(x.dtype)  # (r,s,t,Ci) -> rows
    return jax.lax.dot_general(
        xr, w2, (((4,), (0,)), ((), ())), preferred_element_type=out_dtype
    )


def conv_up2(x, w, *, accum_dtype=None):
    """2x upsampling (lhs-dilated kernel-2) conv as matmul + depth-to-space.

    With ``lhs_dilation=2``, kernel 2, padding (1,1), every output voxel
    ``y[2i+r, 2j+s, 2k+t]`` sees exactly one input voxel:
    ``y = W[1-r,1-s,1-t] . x[i,j,k]`` — i.e. one (M, Ci) x (Ci, 8*Co)
    matmul followed by a reshuffle.  Exactly equal to ``conv3d_up``.
    """
    b, d, h, wd, c = x.shape
    co = w.shape[-1]
    out_dtype = _accum(x, accum_dtype)
    # (2,2,2,Ci,Co) -> (Ci, r,s,t, Co) with the 1-r flip baked in.
    w2 = w[::-1, ::-1, ::-1].transpose(3, 0, 1, 2, 4).reshape(c, 8 * co).astype(x.dtype)
    y = jax.lax.dot_general(
        x, w2, (((4,), (0,)), ((), ())), preferred_element_type=out_dtype
    )  # (B, D, H, W, 8*Co)
    y = y.reshape(b, d, h, wd, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, D,2, H,2, W,2, Co)
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def leaky_relu(x, negative_slope: float = 0.01):
    """LeakyReLU with the reference's 0.01 slope (``layers.py:127-133``)."""
    return jax.nn.leaky_relu(x, negative_slope=jnp.asarray(negative_slope, x.dtype))


def leaky_relu_with_tangent(x, dx, negative_slope: float = 0.01):
    """LeakyReLU on a (primal, tangent) pair: dy = dx where x>0 else slope*dx.

    Reference: ``layers_vel.py:178-186``.
    """
    slope = jnp.asarray(negative_slope, x.dtype)
    y = jax.nn.leaky_relu(x, negative_slope=slope)
    dy = jnp.where(x > 0, dx, slope.astype(dx.dtype) * dx)
    return y, dy
