"""Sequence-string-driven ResNet / Resample blocks, functional (param-pytree) form.

Block semantics match the reference (``blocks.py:26-153`` and the style/vel
variants): a ResNet block ``'CACA'`` runs a 1x1 "skip" conv whose output is
cropped by ``num_conv`` voxels per side to match the VALID-conv shrinkage of
the main path (conv3 -> act -> conv3 -> [residual add] -> act); a Resample
block is ``'DA'`` (stride-2 down conv) or ``'UA'`` (2x dilated up conv).

The implementation is functional: parameters are plain nested dicts
(``{'skip': {...}, 'conv_0': {...}, 'conv_1': {...}}``) and every apply
function is a pure jittable function, channels-last.

Three conv-layer flavors share one param schema:
  * plain:   ``{weight, bias}``
  * style:   ``{weight, bias, style_weight, style_bias}`` (modulation applied
             via input/output channel scales — see ``ops/style.py``)
  * premod-vel: ``{weight, dweight, bias}`` — manual forward-mode tangent
             ``dy = conv(x, dW) + conv(dx, W)`` (reference ``layers_vel.py:82-94``),
             fused here into a single conv over channel-concatenated inputs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv3d import (
    conv1x1,
    conv3d,
    conv3d_up,
    conv_down2,
    conv_up2,
    leaky_relu,
    leaky_relu_with_tangent,
)
from ..ops.style import style_modulation
from ..ops import s2d

# ---------------------------------------------------------------------------
# Layer kinds
# ---------------------------------------------------------------------------

_KIND = {
    "conv": dict(kernel=3, stride=1, up=False),  # 'C'
    "skip": dict(kernel=1, stride=1, up=False),
    "down": dict(kernel=2, stride=2, up=False),  # 'D'
    "up": dict(kernel=2, stride=1, up=True),  # 'U'
}


def _run_conv(x, w, kind, in_fmt="NDHWC", out_fmt="NDHWC"):
    # The k=1 / k=2-resample convs are pure matmuls; XLA's TPU conv emitter
    # runs them an order of magnitude below the bandwidth bound, so they use
    # the dot_general forms (ops/conv3d.py).  Only the k=3 convs (and mixed
    # boundary formats) go through lax.conv_general_dilated.
    k = _KIND[kind]
    if k["up"]:
        if in_fmt == out_fmt == "NDHWC":
            return conv_up2(x, w)
        return conv3d_up(x, w, in_fmt=in_fmt, out_fmt=out_fmt)
    if kind == "skip":
        return conv1x1(x, w, in_fmt=in_fmt, out_fmt=out_fmt)
    if kind == "down" and in_fmt == out_fmt == "NDHWC":
        return conv_down2(x, w)
    return conv3d(x, w, stride=k["stride"], in_fmt=in_fmt, out_fmt=out_fmt)


def _chan_axis(fmt: str) -> int:
    return 1 if fmt == "NCDHW" else 4


def _bcast_channels(v, fmt: str):
    """(B?, C) or (C,) vector -> broadcastable against a 5-D tensor."""
    if fmt == "NCDHW":
        if v.ndim == 1:
            return v[None, :, None, None, None]
        return v[:, :, None, None, None]
    if v.ndim == 1:
        return v[None, None, None, None, :]
    return v[:, None, None, None, :]


# ---------------------------------------------------------------------------
# Layer init
# ---------------------------------------------------------------------------


def init_conv_layer(key, cin, cout, kind, *, style: bool, vel: bool, style_size: int = 2, dtype=jnp.float32):
    """Random init of one conv layer's params (lecun-normal weights)."""
    ksz = _KIND[kind]["kernel"]
    k_w, k_dw, k_sw = jax.random.split(key, 3)
    fan_in = cin * ksz**3
    shape = (ksz, ksz, ksz, cin, cout)
    std = math.sqrt(1.0 / fan_in)
    p = {
        "weight": (jax.random.normal(k_w, shape) * std).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }
    if style:
        p["style_weight"] = (
            jax.random.normal(k_sw, (cin, style_size)) * math.sqrt(1.0 / style_size)
        ).astype(dtype)
        p["style_bias"] = jnp.ones((cin,), dtype)
    if vel and not style:
        p["dweight"] = (jax.random.normal(k_dw, shape) * std).astype(dtype)
    return p


# ---------------------------------------------------------------------------
# Layer apply
# ---------------------------------------------------------------------------


def apply_conv_layer(p, x, kind, *, s=None, eps: float = 1e-8, in_fmt="NDHWC", out_fmt="NDHWC"):
    """One conv layer, primal only.  Styled iff ``s`` is given.

    x: 5-D activations in ``in_fmt``, compute dtype; returns ``out_fmt``.
    """
    out_dtype = x.dtype
    bias = p["bias"].astype(jnp.float32)
    if s is not None:
        m, norm = style_modulation(p, s, eps)  # (B,Ci), (B,Co) fp32
        u = x * _bcast_channels(m, in_fmt).astype(x.dtype)
        z = _run_conv(u, p["weight"], kind, in_fmt, out_fmt)
        z = z / _bcast_channels(norm, out_fmt) + _bcast_channels(bias, out_fmt)
    else:
        z = _run_conv(x, p["weight"], kind, in_fmt, out_fmt) + _bcast_channels(bias, out_fmt)
    return z.astype(out_dtype)


def apply_conv_layer_vel(p, x, dx, kind, *, in_fmt="NDHWC", out_fmt="NDHWC"):
    """Premodulated-vel conv layer: (y, dy) with baked ``weight``/``dweight``.

    y  = conv(x, W) + b
    dy = conv(x, dW) + conv(dx, W)
       = conv(concat([x, dx], ch), concat([dW, W], in-ch))   (one fused conv)
    First-layer rule: when ``dx`` is None the folded dW already contains the
    w/Dz term (see ``ops.style.premodulate_layer``), so dy = conv(x, dW).
    """
    out_dtype = x.dtype
    bias = _bcast_channels(p["bias"].astype(jnp.float32), out_fmt)
    w, dw = p["weight"], p["dweight"]
    y = _run_conv(x, w, kind, in_fmt, out_fmt) + bias
    if dx is None:
        dy = _run_conv(x, dw, kind, in_fmt, out_fmt)
    else:
        xx = jnp.concatenate([x, dx], axis=_chan_axis(in_fmt))
        ww = jnp.concatenate([dw, w], axis=3)
        dy = _run_conv(xx, ww, kind, in_fmt, out_fmt)
    return y.astype(out_dtype), dy.astype(out_dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _resnet_channel_plan(seq, cin, cout):
    """Per-conv (cin, cout) plan for a ResNet main path (reference blocks.py:115-123)."""
    main_seq = seq[:-1] if seq.endswith("A") else seq
    num_conv = main_seq.count("C")
    mid = max(cin, cout)
    plan = []
    for i in range(num_conv):
        ci = cin if i == 0 else mid
        co = cout if i == num_conv - 1 else mid
        plan.append((ci, co))
    return main_seq, num_conv, plan


def init_resnet_block(key, seq, cin, cout, *, style: bool, vel: bool, style_size: int = 2):
    main_seq, num_conv, plan = _resnet_channel_plan(seq, cin, cout)
    keys = jax.random.split(key, num_conv + 1)
    params = {
        "skip": init_conv_layer(keys[0], cin, cout, "skip", style=style, vel=vel, style_size=style_size)
    }
    for i, (ci, co) in enumerate(plan):
        params[f"conv_{i}"] = init_conv_layer(
            keys[i + 1], ci, co, "conv", style=style, vel=vel, style_size=style_size
        )
    return params


def init_resample_block(key, seq, cin, cout, *, style: bool, vel: bool, style_size: int = 2):
    kind = "down" if "D" in seq else "up"
    return {
        "conv_0": init_conv_layer(key, cin, cout, kind, style=style, vel=vel, style_size=style_size)
    }


def _spatial_axes(fmt: str):
    return (2, 3, 4) if fmt == "NCDHW" else (1, 2, 3)


def _center_crop(t, spatial, fmt: str = "NDHWC"):
    """Symmetric center crop of the spatial dims to the given size."""
    axes = _spatial_axes(fmt)
    slices = [slice(None)] * 5
    for ax, target in zip(axes, spatial):
        dim = t.shape[ax]
        c = dim - target
        if c < 0 or c % 2:
            raise ValueError(f"cannot center-crop {t.shape} to {spatial}")
        if c:
            slices[ax] = slice(c // 2, dim - c // 2)
    return t[tuple(slices)]


def apply_resnet_block(p, x, seq, *, s=None, eps: float = 1e-8, in_fmt="NDHWC", out_fmt="NDHWC"):
    """Primal ResNet block (plain or styled).

    ``in_fmt``/``out_fmt`` control the boundary activation formats: the first
    conv (and skip) consume ``in_fmt``, the last conv (and skip) produce
    ``out_fmt``; interior activations stay channels-last.  Few-channel
    boundary tensors (C=3 I/O) should be NCDHW to avoid 128-lane padding.
    """
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y = apply_conv_layer(p["skip"], x, "skip", s=s, eps=eps, in_fmt=in_fmt, out_fmt=out_fmt)
    if num_conv > 0:
        sp = _spatial_axes(out_fmt)
        target = tuple(y.shape[ax] - 2 * num_conv for ax in sp)
        y = _center_crop(y, target, out_fmt)
    conv_idx = 0
    for op in main_seq:
        if op == "C":
            fi = in_fmt if conv_idx == 0 else "NDHWC"
            fo = out_fmt if conv_idx == num_conv - 1 else "NDHWC"
            x = apply_conv_layer(
                p[f"conv_{conv_idx}"], x, "conv", s=s, eps=eps, in_fmt=fi, out_fmt=fo
            )
            conv_idx += 1
        elif op == "A":
            x = leaky_relu(x)
        else:
            raise ValueError(f"layer type {op!r} not supported (use C or A)")
    x = x + y
    if last_act:
        x = leaky_relu(x)
    return x


def apply_resnet_block_vel(p, x, dx, seq, *, in_fmt="NDHWC", out_fmt="NDHWC"):
    """Premod-vel ResNet block threading (x, dx).  ``dx=None`` marks the
    model's first block (first-layer tangent rule baked into dweight)."""
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y, dy = apply_conv_layer_vel(p["skip"], x, dx, "skip", in_fmt=in_fmt, out_fmt=out_fmt)
    if num_conv > 0:
        sp = _spatial_axes(out_fmt)
        target = tuple(y.shape[ax] - 2 * num_conv for ax in sp)
        y = _center_crop(y, target, out_fmt)
        dy = _center_crop(dy, target, out_fmt)
    conv_idx = 0
    for op in main_seq:
        if op == "C":
            fi = in_fmt if conv_idx == 0 else "NDHWC"
            fo = out_fmt if conv_idx == num_conv - 1 else "NDHWC"
            x, dx = apply_conv_layer_vel(
                p[f"conv_{conv_idx}"], x, dx, "conv", in_fmt=fi, out_fmt=fo
            )
            conv_idx += 1
        elif op == "A":
            x, dx = leaky_relu_with_tangent(x, dx)
        else:
            raise ValueError(f"layer type {op!r} not supported (use C or A)")
    x = x + y
    dx = dx + dy
    if last_act:
        x, dx = leaky_relu_with_tangent(x, dx)
    return x, dx


def apply_resample_block(p, x, seq, *, s=None, eps: float = 1e-8):
    """Primal resample block: 'DA' (down) or 'UA' (up); channels-last."""
    conv_idx = 0
    for op in seq:
        if op in ("D", "U"):
            kind = "down" if op == "D" else "up"
            x = apply_conv_layer(p[f"conv_{conv_idx}"], x, kind, s=s, eps=eps)
            conv_idx += 1
        elif op == "A":
            x = leaky_relu(x)
        else:
            raise ValueError(f"layer type {op!r} not supported")
    return x


def apply_resample_block_vel(p, x, dx, seq):
    conv_idx = 0
    for op in seq:
        if op in ("D", "U"):
            kind = "down" if op == "D" else "up"
            x, dx = apply_conv_layer_vel(p[f"conv_{conv_idx}"], x, dx, kind)
            conv_idx += 1
        elif op == "A":
            x, dx = leaky_relu_with_tangent(x, dx)
        else:
            raise ValueError(f"layer type {op!r} not supported")
    return x, dx


# ---------------------------------------------------------------------------
# Space-to-depth packed execution (premodulated models' 64-channel interior)
#
# Activations stay W-packed ((B, D, H, W/2, 2C), see ops/s2d.py) across whole
# phases; weights are pre-packed ONCE per processor build via
# ``pack_resnet_params`` / ``pack_resample_params`` so the hot loop contains
# no packing work.  Exact same math as the unpacked blocks (bf16 summation
# order differs).  W crops happen in packed cells: every supported crop is an
# even number of voxels.
# ---------------------------------------------------------------------------

_PACKERS = {
    "conv": s2d.pack_w3,
    "skip": s2d.pack_w1,
    "down": s2d.pack_w_down,
    "up": s2d.pack_w_up,
}

_PACKED_OPS = {
    "conv": s2d.conv3_packed,
    "skip": s2d.conv1_packed,
    "down": s2d.down_packed,
    "up": s2d.up_packed,
}


def _wino_eligible(kind: str, wp) -> bool:
    """3x3x3 conv sites whose packed operands fill the MXU's 128 lanes:
    the Winograd Pallas kernel (``ops/winograd_pallas.py``) covers these.
    Narrow outputs (the model's 64->3 tail) keep the direct conv — the
    kernel's N-padding would waste more than Winograd's MAC cut saves."""
    return kind == "conv" and wp.shape[-1] >= 128 and wp.shape[-2] >= 128


def pack_conv_layer_params(
    p, kind, *, groups: int = 1, vel: bool = False, wino: bool = False
):
    """Pre-pack one premodulated conv layer's params for packed execution.

    Velocity layers prefer the FACTORED tangent: when ``dweight`` has the
    style-derived rank structure ``dW = W⊙g_in − W⊙c_out`` (exact factors
    provided by the style fold, or recovered numerically from a concrete
    premodulated tree), the tangent runs as ONE conv sharing the primal
    kernel — ``dy = op(x⊙g + dx, W) − c⊙op(x, W)`` — instead of the two
    convs ``op(x, dW) + op(dx, W)``: a 3→2 conv cut on every velocity
    layer.  Trees with a genuinely learned ``dweight`` (no rank structure;
    map2map plain-vel training) keep the materialized-tangent path.

    With ``wino=True``, eligible 3x3x3 convs additionally carry the
    F(2,3)^2 Winograd-transformed kernel (``"wh"``); the packed apply
    functions then run the fused Pallas Winograd conv on TPU (the ~1.4x
    measured MAC-cut win), falling back to the direct conv elsewhere.
    """
    packer = _PACKERS[kind]
    out = {
        "w": packer(p["weight"], groups),
        "b": s2d.pack_bias(p["bias"].astype(jnp.float32)),
    }
    if wino and _wino_eligible(kind, out["w"]):
        from ..ops.winograd import transform_packed_w3

        out["wh"] = transform_packed_w3(out["w"])
    if not vel:
        return out
    fac = None
    if "dfac_in" in p:
        fac = (p["dfac_in"], p["dfac_out"])
    elif not isinstance(p["weight"], jax.core.Tracer):
        from ..ops.style import recover_dweight_factors

        g, c, ok = recover_dweight_factors(p["weight"], p["dweight"])
        if ok:
            fac = (jnp.asarray(g, jnp.float32), jnp.asarray(c, jnp.float32))
    if fac is not None:
        out["g"] = jnp.asarray(fac[0], jnp.float32)  # unpacked (Ci,)
        out["c"] = s2d.pack_bias(jnp.asarray(fac[1], jnp.float32))  # (2Co,)
        return out
    # dy = op(concat([x, dx]), concat([dW, W])): the packed input is the
    # channel-concat of two packed tensors, so the concat weight packs
    # with twice the groups.
    wcat = jnp.concatenate([p["dweight"], p["weight"]], axis=-2)
    out["wcat"] = packer(wcat, 2 * groups)
    if "wh" in out:
        from ..ops.winograd import transform_packed_w3

        # The tap transform commutes with input-channel row splits, so the
        # split-parts tangent convs slice this the same way they slice wcat.
        out["whcat"] = transform_packed_w3(out["wcat"])
    if kind != "up" and out["w"].shape[-1] < 128:
        # Narrow outputs (the model's 64->3 tail) pad the MXU's 128-wide
        # N for EVERY conv; stacking the primal and x-tangent kernels
        # along Cols halves that waste: one conv yields y and the
        # conv(x, dW) tangent part together.  ('up' is excluded: its
        # packed Cols encode the (r,s,a,p) reshuffle and cannot be
        # concatenated.)  At Cols >= 128 the split form measures equal
        # or better, so stacking is narrow-only.
        out["wst"] = jnp.concatenate([out["w"], packer(p["dweight"], groups)], -1)
    return out


def pack_resnet_params(p, seq, *, groups: int = 1, vel: bool = False, wino: bool = False):
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    out = {"skip": pack_conv_layer_params(p["skip"], "skip", groups=groups, vel=vel)}
    for i in range(num_conv):
        g = groups if i == 0 else 1
        out[f"conv_{i}"] = pack_conv_layer_params(
            p[f"conv_{i}"], "conv", groups=g, vel=vel, wino=wino
        )
    return out


def pack_resample_params(p, seq, *, groups: int = 1, vel: bool = False, wino: bool = False):
    kind = "down" if "D" in seq else "up"
    return {"conv_0": pack_conv_layer_params(p["conv_0"], kind, groups=groups, vel=vel)}


def _wino_on() -> bool:
    """Run the Pallas Winograd conv only where it can compile (TPU)."""
    return jax.default_backend() == "tpu"


def _wino_conv(xp, wh, bias=None, leaky=False):
    from ..ops.winograd_pallas import conv3d_wino_pallas_packed

    out_dtype = None
    cast_back = None
    if xp.dtype == jnp.float32:
        # Match XLA's f32-conv-on-TPU semantics: bf16 operands (the
        # default matmul precision rounding), f32 accumulation + output.
        out_dtype = jnp.float32
        xp = xp.astype(jnp.bfloat16)
    elif xp.dtype != jnp.bfloat16:
        # f16 (or other) inputs: Mosaic has no mixed f16xbf16 dot
        # lowering, and the kernel's operand contract is bf16 — cast in,
        # run the kernel at its native bf16-out, cast back outside (an
        # in-kernel f16 store is an untested Mosaic path).
        cast_back = xp.dtype
        xp = xp.astype(jnp.bfloat16)
    y = conv3d_wino_pallas_packed(
        xp, wh.astype(jnp.bfloat16), bias, leaky=leaky, out_dtype=out_dtype
    )
    return y.astype(cast_back) if cast_back is not None else y


def _apply_packed(pp, xp, kind, act: bool = False):
    """One packed conv layer (+bias); ``act=True`` fuses the LeakyReLU that
    follows it in the block sequence (the Winograd kernel fuses
    conv+bias+act on-chip; the XLA path applies it here, which XLA fuses
    into the conv epilogue anyway)."""
    out_dtype = xp.dtype
    if "wh" in pp and _wino_on():
        return _wino_conv(xp, pp["wh"], pp["b"], leaky=act)
    op = _PACKED_OPS[kind]
    z = op(xp, pp["w"]) + pp["b"].astype(xp.dtype)
    if act:
        z = leaky_relu(z)
    return z.astype(out_dtype)


def _cat_weight_parts(w, kind, n):
    """Split a groups=n packed weight into the per-part conv operands.

    The group packers lay input-channel rows group-major, so part i's
    operand is the i-th row block — except 'down' weights, whose row dim
    folds the 8 spatial taps OUTSIDE the channel rows
    (``pack_w_down``'s (r, s, a, channel) reshape): the split must go
    through a (8, channels, Co) view or it would cut across taps.
    """
    if kind == "down":
        co = w.shape[-1]
        w3 = w.reshape(8, -1, co)
        rows = w3.shape[1] // n
        return [
            w3[:, i * rows : (i + 1) * rows].reshape(-1, co) for i in range(n)
        ]
    rows = w.shape[-2] // n
    return [w[..., i * rows : (i + 1) * rows, :] for i in range(n)]


# Packed-W output width (owp) above which the factored-tangent pair runs
# as two single-kernel launches instead of the fused pair kernel: the
# pair's doubled VMEM working set forces W-split blocks at wide shapes
# (measured round 5: pair 86 vs singles 67 TF/s at owp=71 — the phase-3
# tile scale — but 105 vs 108 at owp=131, where the single kernel still
# covers W in one block).
_PAIR_W_MAX = 96


def _wino_conv_pair(xp, sp, wh, bias, cvec, act):
    """Fused factored-tangent pair: y = conv(xp, W) + b,
    dy = conv(sp, W) - c (.) conv(xp, W), LeakyReLU *pair* when ``act``.

    Narrow (launch-overhead-bound) shapes run the Pallas pair kernel —
    ONE launch with row-stacked (2M, 2C) dots; wide shapes keep two
    single-kernel launches + the XLA epilogue (see ``_PAIR_W_MAX``)."""
    if xp.shape[3] - 1 > _PAIR_W_MAX:
        z = _wino_conv(xp, wh)
        zt = _wino_conv(sp, wh)
        y = z if bias is None else z + bias.astype(z.dtype)
        dy = zt if cvec is None else zt - cvec.astype(z.dtype) * z
        if act:
            y, dy = leaky_relu_with_tangent(y, dy)
        return y, dy

    from ..ops.winograd_pallas import conv3d_wino_pallas_pair_packed

    out_dtype = None
    cast_back = None
    if xp.dtype == jnp.float32:
        out_dtype = jnp.float32
        xp, sp = xp.astype(jnp.bfloat16), sp.astype(jnp.bfloat16)
    elif xp.dtype != jnp.bfloat16:
        cast_back = xp.dtype
        xp, sp = xp.astype(jnp.bfloat16), sp.astype(jnp.bfloat16)
    y, dy = conv3d_wino_pallas_pair_packed(
        xp, sp, wh.astype(jnp.bfloat16), bias, cvec,
        leaky=act, out_dtype=out_dtype,
    )
    if cast_back is not None:
        y, dy = y.astype(cast_back), dy.astype(cast_back)
    return y, dy


def _apply_packed_vel(pp, xp, dxp, kind, act: bool = False):
    """One packed vel conv layer; ``act=True`` fuses the LeakyReLU pair
    that follows it (in-kernel on the Winograd pair path, inline
    elementwise — which XLA fuses anyway — elsewhere)."""
    op = _PACKED_OPS[kind]
    out_dtype = xp.dtype
    wino = "wh" in pp and _wino_on()

    def fin(y, dy):
        if act:
            y, dy = leaky_relu_with_tangent(y, dy)
        return y.astype(out_dtype), dy.astype(out_dtype)

    if "g" in pp:
        # Factored tangent (style-derived dweight): ONE tangent conv sharing
        # the primal kernel — dy = op(x⊙g + dx, W) − c⊙op(x, W).
        g = jnp.tile(pp["g"], 2).astype(xp.dtype)  # packed rows [q0|q1]
        if wino:
            y, dy = _wino_conv_pair(
                xp, xp * g + dxp, pp["wh"], pp["b"], pp["c"], act
            )
            return y.astype(out_dtype), dy.astype(out_dtype)
        z = op(xp, pp["w"])
        zt = op(xp * g + dxp, pp["w"])
        y = z + pp["b"].astype(xp.dtype)
        dy = zt - pp["c"].astype(z.dtype) * z
        return fin(y, dy)
    if "wst" in pp:
        # Narrow-output layers run the primal and x-tangent convs as one
        # Cols-stacked conv (see ``pack_conv_layer_params``).
        _, ww = _cat_weight_parts(pp["wcat"], kind, 2)
        c = pp["w"].shape[-1]
        z = op(xp, pp["wst"])
        y = z[..., :c] + pp["b"].astype(xp.dtype)
        dy = z[..., c:] + op(dxp, ww)
        return fin(y, dy)
    # Tangent conv as a split-parts sum: dy = conv(x, dW) + conv(dx, W).
    # Mathematically identical to conv(cat(x, dx), wcat) but skips the
    # 256-channel concat materialization — measured 1.41x faster on a v5e
    # (96.9 vs 68.6 effective TF/s at phase-1 slab shapes).
    if wino:
        whdw, whw = _cat_weight_parts(pp["whcat"], kind, 2)
        y = _wino_conv(xp, pp["wh"], pp["b"])
        dy = _wino_conv(xp, whdw) + _wino_conv(dxp, whw)
        return fin(y, dy)
    wdw, ww = _cat_weight_parts(pp["wcat"], kind, 2)
    y = op(xp, pp["w"]) + pp["b"].astype(xp.dtype)
    dy = op(xp, wdw) + op(dxp, ww)
    return fin(y, dy)


def _apply_packed_cat(pp, xs, kind, act: bool = False):
    """Packed conv layer on an IMPLICIT channel concat of packed parts.

    The groups=len(xs) packed weight's input rows are group-major, so the
    concat conv splits exactly into one conv per part, summed — the wide
    concat tensor (256 or, in vel mode, 512 channels) is never
    materialized, and each operand stays at the native 128-channel shape
    (measured ~12% faster than the grouped concat conv on a v5e).
    """
    out_dtype = xs[0].dtype
    if "wh" in pp and _wino_on():
        parts_wh = _cat_weight_parts(pp["wh"], kind, len(xs))
        z = _wino_conv(xs[0], parts_wh[0], pp["b"])  # bias rides part 0
        for x, wi in zip(xs[1:], parts_wh[1:]):
            z = z + _wino_conv(x, wi)
    else:
        op = _PACKED_OPS[kind]
        parts_w = _cat_weight_parts(pp["w"], kind, len(xs))
        z = op(xs[0], parts_w[0])
        for x, wi in zip(xs[1:], parts_w[1:]):
            z = z + op(x, wi)
        z = z + pp["b"].astype(z.dtype)
    if act:
        z = leaky_relu(z)
    return z.astype(out_dtype)


def _apply_packed_vel_cat(pp, xs, dxs, kind, act: bool = False):
    """Vel form of ``_apply_packed_cat``: per input part either one factored
    tangent conv (style-derived dweight, primal kernel shared) or the
    split-parts tangent pair (materialized ``dW``; wcat has 2x the groups).
    ``act=True`` appends the LeakyReLU pair (elementwise; XLA fuses it
    into the epilogue)."""
    op = _PACKED_OPS[kind]
    out_dtype = xs[0].dtype
    wino = "wh" in pp and _wino_on()

    def fin(y, dy):
        if act:
            y, dy = leaky_relu_with_tangent(y, dy)
        return y.astype(out_dtype), dy.astype(out_dtype)

    if "g" in pp:
        parts_w = _cat_weight_parts(pp["wh" if wino else "w"], kind, len(xs))
        cg = pp["g"].shape[0] // len(xs)
        z = zt = None
        for i, (x, dx, wi) in enumerate(zip(xs, dxs, parts_w)):
            gi = jnp.tile(pp["g"][i * cg : (i + 1) * cg], 2).astype(x.dtype)
            if wino:
                # Raw pair per part (no bias/fold/act: the epilogue runs
                # once on the part SUM below) — still one launch per part
                # instead of two.
                zi, zti = _wino_conv_pair(x, x * gi + dx, wi, None, None, False)
            else:
                zi = op(x, wi)
                zti = op(x * gi + dx, wi)
            z = zi if z is None else z + zi
            zt = zti if zt is None else zt + zti
        y = z + pp["b"].astype(z.dtype)
        dy = zt - pp["c"].astype(z.dtype) * z
        return fin(y, dy)
    y = _apply_packed_cat(pp, xs, kind)
    parts = list(xs) + list(dxs)
    if wino:
        parts_wh = _cat_weight_parts(pp["whcat"], kind, len(parts))
        dy = _wino_conv(parts[0], parts_wh[0])
        for x, wi in zip(parts[1:], parts_wh[1:]):
            dy = dy + _wino_conv(x, wi)
        return fin(y, dy.astype(out_dtype))
    parts_w = _cat_weight_parts(pp["wcat"], kind, len(parts))
    dy = op(parts[0], parts_w[0])
    for x, wi in zip(parts[1:], parts_w[1:]):
        dy = dy + op(x, wi)
    return fin(y, dy.astype(out_dtype))


def apply_resnet_block_packed_cat(pp, xs, seq):
    """``apply_resnet_block_packed`` whose input is an implicit concat of
    packed parts (the decoder's cat(skip, upsampled)); pp must be packed
    with groups=len(xs)."""
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y = _apply_packed_cat(pp["skip"], xs, "skip")
    y = _crop_packed(y, num_conv)
    xp = None
    conv_idx = 0
    i = 0
    while i < len(main_seq):
        if main_seq[i] == "C":
            # Fuse a directly-following activation into the conv call.
            fuse = i + 1 < len(main_seq) and main_seq[i + 1] == "A"
            if conv_idx == 0:
                xp = _apply_packed_cat(pp["conv_0"], xs, "conv", act=fuse)
            else:
                xp = _apply_packed(pp[f"conv_{conv_idx}"], xp, "conv", act=fuse)
            conv_idx += 1
            i += 2 if fuse else 1
        else:  # 'A'
            xp = leaky_relu(xp)
            i += 1
    xp = xp + y
    if last_act:
        xp = leaky_relu(xp)
    return xp


def apply_resnet_block_vel_packed_cat(pp, xs, dxs, seq):
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y, dy = _apply_packed_vel_cat(pp["skip"], xs, dxs, "skip")
    y = _crop_packed(y, num_conv)
    dy = _crop_packed(dy, num_conv)
    xp = dxp = None
    conv_idx = 0
    i = 0
    while i < len(main_seq):
        if main_seq[i] == "C":
            fuse = i + 1 < len(main_seq) and main_seq[i + 1] == "A"
            if conv_idx == 0:
                xp, dxp = _apply_packed_vel_cat(
                    pp["conv_0"], xs, dxs, "conv", act=fuse
                )
            else:
                xp, dxp = _apply_packed_vel(
                    pp[f"conv_{conv_idx}"], xp, dxp, "conv", act=fuse
                )
            conv_idx += 1
            i += 2 if fuse else 1
        else:  # 'A'
            xp, dxp = leaky_relu_with_tangent(xp, dxp)
            i += 1
    xp = xp + y
    dxp = dxp + dy
    if last_act:
        xp, dxp = leaky_relu_with_tangent(xp, dxp)
    return xp, dxp


def _crop_packed(t, dhw_crop: int):
    """Center crop by ``dhw_crop`` voxels/side in D, H and W (W in cells)."""
    if dhw_crop == 0:
        return t
    c = dhw_crop
    assert c % 2 == 0, "packed crops must be even in W"
    return t[:, c:-c, c:-c, c // 2 : -(c // 2), :]


def apply_resnet_block_packed(pp, xp, seq):
    """Packed premodulated ResNet block ('CACA'/'CAC')."""
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y = _apply_packed(pp["skip"], xp, "skip")
    y = _crop_packed(y, num_conv)
    conv_idx = 0
    i = 0
    while i < len(main_seq):
        if main_seq[i] == "C":
            # Fuse a directly-following activation into the conv call.
            fuse = i + 1 < len(main_seq) and main_seq[i + 1] == "A"
            xp = _apply_packed(pp[f"conv_{conv_idx}"], xp, "conv", act=fuse)
            conv_idx += 1
            i += 2 if fuse else 1
        else:  # 'A'
            xp = leaky_relu(xp)
            i += 1
    xp = xp + y
    if last_act:
        xp = leaky_relu(xp)
    return xp


def apply_resnet_block_vel_packed(pp, xp, dxp, seq):
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    last_act = seq.endswith("A") and main_seq != seq
    y, dy = _apply_packed_vel(pp["skip"], xp, dxp, "skip")
    y = _crop_packed(y, num_conv)
    dy = _crop_packed(dy, num_conv)
    conv_idx = 0
    i = 0
    while i < len(main_seq):
        if main_seq[i] == "C":
            # Fuse a directly-following activation pair into the conv call
            # (in-kernel on the Winograd pair path).
            fuse = i + 1 < len(main_seq) and main_seq[i + 1] == "A"
            xp, dxp = _apply_packed_vel(
                pp[f"conv_{conv_idx}"], xp, dxp, "conv", act=fuse
            )
            conv_idx += 1
            i += 2 if fuse else 1
        else:  # 'A'
            xp, dxp = leaky_relu_with_tangent(xp, dxp)
            i += 1
    xp = xp + y
    dxp = dxp + dy
    if last_act:
        xp, dxp = leaky_relu_with_tangent(xp, dxp)
    return xp, dxp


def apply_resample_block_packed(pp, xp, seq):
    xp = _apply_packed(pp["conv_0"], xp, "down" if "D" in seq else "up")
    if seq.endswith("A"):
        xp = leaky_relu(xp)
    return xp


def apply_resample_block_vel_packed(pp, xp, dxp, seq):
    xp, dxp = _apply_packed_vel(pp["conv_0"], xp, dxp, "down" if "D" in seq else "up")
    if seq.endswith("A"):
        xp, dxp = leaky_relu_with_tangent(xp, dxp)
    return xp, dxp


# ---------------------------------------------------------------------------
# Entry block: the model's first 'CACA' block consumes the NCDHW C=3 input.
# XLA's conv emitter is pathological on 3-channel inputs (~2.6 TF/s on a
# v5e); the entry forms (ops/s2d.py: conv3_entry_packed) express the first
# conv and skip as dot_generals over stacked taps, emitting the packed
# channels-last layout directly.
# ---------------------------------------------------------------------------


def pack_resnet_entry_params(p, seq, *, vel: bool = False, wino: bool = False):
    """Fold a 'CACA' entry block's params for packed NCDHW-input execution.

    The first conv's nine taps fold into ONE im2col dot operand
    (``s2d.entry_cols``); in vel mode the primal and tangent kernels stack
    along Cols so the window operand is built once for both (measured
    1.25-1.35x over per-tap accumulated dots on a v5e).
    """
    main_seq, num_conv, _ = _resnet_channel_plan(seq, 0, 0)
    assert num_conv == 2, "entry block is the model's first 'CACA' block"
    w0 = s2d.pack_w3_entry(p["conv_0"]["weight"])
    wsk = s2d.pack_w1_entry(p["skip"]["weight"])
    out = {
        "conv_0": {"b": s2d.pack_bias(p["conv_0"]["bias"].astype(jnp.float32))},
        "conv_1": pack_conv_layer_params(p["conv_1"], "conv", vel=vel, wino=wino),
        "skip": {"b": s2d.pack_bias(p["skip"]["bias"].astype(jnp.float32))},
    }
    if vel:
        # First-layer rule: dx is None, so dy = conv(x, dW) — same entry form.
        dw0 = s2d.pack_w3_entry(p["conv_0"]["dweight"])
        out["conv_0"]["w9"] = s2d.entry_cols(jnp.concatenate([w0, dw0], -1))
        out["skip"]["w"] = jnp.concatenate(
            [wsk, s2d.pack_w1_entry(p["skip"]["dweight"])], -1
        )
    else:
        out["conv_0"]["w9"] = s2d.entry_cols(w0)
        out["skip"]["w"] = wsk
    return out


def apply_resnet_entry_packed(pp, x, seq="CACA"):
    """Entry 'CACA' block: (B, C, D, H, W) NCDHW -> packed channels-last.

    Output: (B, D-4, H-4, (W-4)/2, 2*mid).
    """
    h = s2d.conv3_entry_im2col(x, pp["conv_0"]["w9"]) + pp["conv_0"]["b"].astype(x.dtype)
    h = leaky_relu(h)
    h = _apply_packed(pp["conv_1"], h, "conv")
    xs = x[:, :, 2:-2, 2:-2, 2:-2]
    h = h + s2d.conv1_entry_packed(xs, pp["skip"]["w"]) + pp["skip"]["b"].astype(x.dtype)
    return leaky_relu(h)


def apply_resnet_entry_vel_packed(pp, x, seq="CACA"):
    """Entry vel 'CACA' block (first-layer rule: tangent seeded from dW)."""
    b0 = pp["conv_0"]["b"].astype(x.dtype)
    c2 = b0.shape[0]
    z = s2d.conv3_entry_im2col(x, pp["conv_0"]["w9"])
    h, dh = leaky_relu_with_tangent(z[..., :c2] + b0, z[..., c2:])
    h, dh = _apply_packed_vel(pp["conv_1"], h, dh, "conv")
    xs = x[:, :, 2:-2, 2:-2, 2:-2]
    zs = s2d.conv1_entry_packed(xs, pp["skip"]["w"])
    h = h + zs[..., :c2] + pp["skip"]["b"].astype(x.dtype)
    dh = dh + zs[..., c2:]
    return leaky_relu_with_tangent(h, dh)
