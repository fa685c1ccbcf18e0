"""Generic valid-conv 3D U-Net: shape algebra, init, and forward passes.

Topology (levels=3 reproduces the reference architecture exactly,
``style_nbody_emulator_core.py:45-99``):

    conv_l00 (CACA, in->mid) -> conv_l01 (CACA) -> down_l0 (DA)
    [conv_l{i} (CACA) -> down_l{i} (DA)]  for i in 1..levels-1
    conv_c (CACA)
    [up_r{i} (UA) -> concat(skip_i) -> conv_r{i} (CACA, 2mid->mid)]  i=levels-1..1
    up_r0 (UA) -> concat(skip_0) -> conv_r00 (CACA, 2mid->mid) -> conv_r01 (CAC, mid->out)

All convs VALID, so the output lands on the interior of the input: for the
canonical 3-level net the receptive margin is 48 voxels per side
(``input_margin(3) == 48``; 128^3 in -> 32^3 out).  Skip crops are derived
from traced shapes instead of the reference's hard-coded 40/16/4, so any
valid input size works.

Parameters are nested dicts ``{'params': {block_name: {layer_name: {...}}}}``
with block/layer names identical to the reference param tree, which makes the
premodulation fold and reference-weight conversion mechanical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blocks import (
    _center_crop,
    apply_resample_block,
    apply_resample_block_vel,
    apply_resnet_block,
    apply_resnet_block_vel,
    init_resample_block,
    init_resnet_block,
)

# ---------------------------------------------------------------------------
# Shape algebra
# ---------------------------------------------------------------------------


def _encoder_sizes(n: int, levels: int):
    """Spatial sizes along the encoder; raises on invalid sizes."""
    sizes = []
    h = n - 8  # conv_l00 + conv_l01 (CACA each: -4)
    if h <= 0:
        raise ValueError(f"input size {n} too small")
    sizes.append(h)  # skip 0
    for i in range(levels):
        if h % 2:
            raise ValueError(f"input size {n}: size {h} not divisible by 2 at down_l{i}")
        h //= 2
        if i < levels - 1:
            h -= 4  # conv_l{i+1}
            if h <= 0:
                raise ValueError(f"input size {n} too small at level {i + 1}")
            sizes.append(h)
    return sizes, h


def output_size(n: int, levels: int = 3) -> int:
    """Output spatial size for input size ``n`` (raises if ``n`` is invalid)."""
    skips, h = _encoder_sizes(n, levels)
    h -= 4  # bottleneck
    if h <= 0:
        raise ValueError(f"input size {n} too small at bottleneck")
    for i in range(levels - 1, 0, -1):
        h = 2 * h  # up
        if h > skips[i]:
            raise ValueError(f"input size {n}: skip {i} smaller than upsampled path")
        h -= 4  # conv_r{i}
    h = 2 * h
    if h > skips[0]:
        raise ValueError(f"input size {n}: skip 0 smaller than upsampled path")
    h -= 8  # conv_r00 + conv_r01
    if h <= 0:
        raise ValueError(f"input size {n} too small at head")
    return h


def input_margin(levels: int = 3) -> int:
    """Receptive-field margin per side: output = input - 2*margin.

    12 * 2^(levels-1): 12, 24, 48 for levels 1, 2, 3.
    """
    return 12 * 2 ** (levels - 1)


def valid_input_size(n: int, levels: int = 3) -> bool:
    try:
        return output_size(n, levels) > 0
    except ValueError:
        return False


def min_input_size(levels: int = 3) -> int:
    """Smallest valid input size (per axis)."""
    n = 2 * input_margin(levels) + 8
    while not valid_input_size(n, levels):
        n += 8
    return n


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def unet_block_plan(levels: int = 3, in_chan: int = 3, out_chan: int = 3, mid_chan: int = 64):
    """Ordered (name, block_type, seq, cin, cout) plan."""
    mid2 = 2 * mid_chan
    plan = [
        ("conv_l00", "resnet", "CACA", in_chan, mid_chan),
        ("conv_l01", "resnet", "CACA", mid_chan, mid_chan),
        ("down_l0", "resample", "DA", mid_chan, mid_chan),
    ]
    for i in range(1, levels):
        plan.append((f"conv_l{i}", "resnet", "CACA", mid_chan, mid_chan))
        plan.append((f"down_l{i}", "resample", "DA", mid_chan, mid_chan))
    plan.append(("conv_c", "resnet", "CACA", mid_chan, mid_chan))
    for i in range(levels - 1, 0, -1):
        plan.append((f"up_r{i}", "resample", "UA", mid_chan, mid_chan))
        plan.append((f"conv_r{i}", "resnet", "CACA", mid2, mid_chan))
    plan.append(("up_r0", "resample", "UA", mid_chan, mid_chan))
    plan.append(("conv_r00", "resnet", "CACA", mid2, mid_chan))
    plan.append(("conv_r01", "resnet", "CAC", mid_chan, out_chan))
    return plan


def init_unet(key, *, levels=3, in_chan=3, out_chan=3, mid_chan=64, style: bool, vel: bool, style_size: int = 2):
    plan = unet_block_plan(levels, in_chan, out_chan, mid_chan)
    keys = jax.random.split(key, len(plan))
    params = {}
    for k, (name, btype, seq, cin, cout) in zip(keys, plan):
        if btype == "resnet":
            params[name] = init_resnet_block(k, seq, cin, cout, style=style, vel=vel, style_size=style_size)
        else:
            params[name] = init_resample_block(k, seq, cin, cout, style=style, vel=vel, style_size=style_size)
    return {"params": params}


# ---------------------------------------------------------------------------
# Forward passes (channels-last, batched)
# ---------------------------------------------------------------------------


def unet_forward(params, x, *, s=None, levels: int = 3, eps: float = 1e-8, io_fmt: str = "NCDHW"):
    """Primal U-Net forward.  Styled iff ``s (B, style_size)`` is given.

    Args:
        x: 5-D input in ``io_fmt`` (default NCDHW — few-channel boundary
            tensors must be channel-first on TPU to avoid lane padding),
            compute dtype, already input-scaled.
    Returns:
        network output (pre-residual-head) in ``io_fmt``.
    """
    p = params["params"]
    kw = dict(s=s, eps=eps)
    h = apply_resnet_block(p["conv_l00"], x, "CACA", in_fmt=io_fmt, **kw)
    h = apply_resnet_block(p["conv_l01"], h, "CACA", **kw)
    skips = [h]
    h = apply_resample_block(p["down_l0"], h, "DA", **kw)
    for i in range(1, levels):
        y = apply_resnet_block(p[f"conv_l{i}"], h, "CACA", **kw)
        skips.append(y)
        h = apply_resample_block(p[f"down_l{i}"], y, "DA", **kw)
    h = apply_resnet_block(p["conv_c"], h, "CACA", **kw)
    for i in range(levels - 1, 0, -1):
        h = apply_resample_block(p[f"up_r{i}"], h, "UA", **kw)
        y = _center_crop(skips[i], h.shape[1:4])
        h = jnp.concatenate([y, h], axis=-1)
        h = apply_resnet_block(p[f"conv_r{i}"], h, "CACA", **kw)
    h = apply_resample_block(p["up_r0"], h, "UA", **kw)
    y = _center_crop(skips[0], h.shape[1:4])
    h = jnp.concatenate([y, h], axis=-1)
    h = apply_resnet_block(p["conv_r00"], h, "CACA", **kw)
    h = apply_resnet_block(p["conv_r01"], h, "CAC", out_fmt=io_fmt, **kw)
    return h


def unet_forward_vel(params, x, *, levels: int = 3, io_fmt: str = "NCDHW"):
    """Premodulated-vel U-Net forward: threads (x, dx) with baked dweights.

    The model-level tangent seed is ``dx=None`` into the first block
    (conv_l00), whose folded dweight carries the first-layer w/Dz rule.
    Returns ``(h, dh)`` in ``io_fmt``.
    """
    p = params["params"]
    h, dh = apply_resnet_block_vel(p["conv_l00"], x, None, "CACA", in_fmt=io_fmt)
    h, dh = apply_resnet_block_vel(p["conv_l01"], h, dh, "CACA")
    skips = [(h, dh)]
    h, dh = apply_resample_block_vel(p["down_l0"], h, dh, "DA")
    for i in range(1, levels):
        y, dy = apply_resnet_block_vel(p[f"conv_l{i}"], h, dh, "CACA")
        skips.append((y, dy))
        h, dh = apply_resample_block_vel(p[f"down_l{i}"], y, dy, "DA")
    h, dh = apply_resnet_block_vel(p["conv_c"], h, dh, "CACA")
    for i in range(levels - 1, 0, -1):
        h, dh = apply_resample_block_vel(p[f"up_r{i}"], h, dh, "UA")
        y, dy = skips[i]
        y = _center_crop(y, h.shape[1:4])
        dy = _center_crop(dy, h.shape[1:4])
        h = jnp.concatenate([y, h], axis=-1)
        dh = jnp.concatenate([dy, dh], axis=-1)
        h, dh = apply_resnet_block_vel(p[f"conv_r{i}"], h, dh, "CACA")
    h, dh = apply_resample_block_vel(p["up_r0"], h, dh, "UA")
    y, dy = skips[0]
    y = _center_crop(y, h.shape[1:4])
    dy = _center_crop(dy, h.shape[1:4])
    h = jnp.concatenate([y, h], axis=-1)
    dh = jnp.concatenate([dy, dh], axis=-1)
    h, dh = apply_resnet_block_vel(p["conv_r00"], h, dh, "CACA")
    h, dh = apply_resnet_block_vel(p["conv_r01"], h, dh, "CAC", out_fmt=io_fmt)
    return h, dh
