"""StyleGAN-style weight modulation-demodulation, TPU-native formulation.

The reference (``style_layers.py:52-99``) materializes a per-sample 6-D weight
tensor ``w[b] = W * s_mod[b]`` and runs one conv per sample under ``vmap``.
That kills MXU utilization (batch-dependent weights) and blows up HBM traffic.

This module uses the exact algebraic identity

    conv(x_b, (W ⊙ m_b) / n_b)  ==  conv(x_b ⊙ m_b, W) / n_b

where ``m_b[i] = (s_b @ style_weight.T + style_bias)[i]`` scales input
channels and the demodulation norm

    n_b[o] = sqrt( Σ_i m_b[i]^2 · R[i,o] + eps ),   R[i,o] = Σ_kkk W[...,i,o]^2

scales output channels.  So a styled conv becomes: a cheap per-input-channel
VPU scale, ONE batched conv with batch-shared weights (MXU-friendly), and a
per-output-channel VPU scale — mathematically identical to the reference, with
no per-sample weight materialization.

The premodulation fold (reference ``nbody_emulator.py:131-148`` and
``:189-219``) is reproduced here bit-for-bit in fp32, including the
velocity-path analytic tangent ``dweight`` and the first-layer ``w/Dz`` rule.
"""

from __future__ import annotations

import jax.numpy as jnp


def style_vector(Om, Dz):
    """Style vector s = [(Om - 0.3) * 5, Dz - 1], float32, shape (B, 2).

    Reference: ``style_nbody_emulator_core.py:118-121``.
    """
    Om = jnp.atleast_1d(jnp.asarray(Om))
    Dz = jnp.atleast_1d(jnp.asarray(Dz))
    s0 = (Om - 0.3) * 5.0
    s1 = Dz - 1.0
    # Style math runs in fp32 (or wider, if the caller is in fp64).
    dt = jnp.promote_types(jnp.float32, jnp.promote_types(Om.dtype, Dz.dtype))
    return jnp.stack(jnp.broadcast_arrays(s0, s1), axis=-1).astype(dt)


def style_modulation(layer_params, s, eps: float = 1e-8):
    """Per-channel modulation scales for a styled conv layer.

    Args:
        layer_params: dict with ``style_weight (Cin, S)``, ``style_bias (Cin,)``,
            ``weight (K, K, K, Cin, Cout)``.
        s: style vectors ``(B, S)`` float32.
        eps: demodulation epsilon.

    Returns:
        ``(m, norm)``: input-channel scales ``(B, Cin)`` and demodulation
        norms ``(B, Cout)``, both float32.
    """
    dt = jnp.promote_types(jnp.float32, s.dtype)
    sw = layer_params["style_weight"].astype(dt)  # (Cin, S)
    sb = layer_params["style_bias"].astype(dt)  # (Cin,)
    w = layer_params["weight"].astype(dt)  # (K,K,K,Cin,Cout)
    # These matmuls are tiny but feed demodulation norms — keep them exact
    # regardless of the global matmul-precision setting.
    m = jnp.dot(s, sw.T, precision="highest") + sb  # (B, Cin)
    r = jnp.sum(w * w, axis=(0, 1, 2))  # (Cin, Cout)
    norm = jnp.sqrt(jnp.dot(m * m, r, precision="highest") + eps)  # (B, Cout)
    return m, norm


def modulated_style_weight(layer_params, s, eps: float = 1e-8):
    """Explicitly materialized demodulated weight ``(B, K, K, K, Cin, Cout)``.

    Only used by the premodulation fold and by golden tests — the runtime
    path never materializes per-sample weights.
    """
    m, norm = style_modulation(layer_params, s, eps)
    w = layer_params["weight"].astype(jnp.float32)
    w_mod = w[None] * m[:, None, None, None, :, None]
    return w_mod / norm[:, None, None, None, None, :]


def premodulate_layer(layer_params, s, *, vel: bool = False, first_layer: bool = False, eps: float = 1e-8):
    """Fold style into a fixed-cosmology weight (and tangent) for one layer.

    Produces the premodulated parameter dict for one conv layer at fixed
    style ``s`` (shape ``(2,)`` or ``(1, 2)``):

    * ``weight``: demodulated ``W ⊙ m / n``;
    * ``dweight`` (vel only): analytic d/dDz of the demodulated weight,
      ``dW = W ⊙ dm / n + (W ⊙ m) * dn``, with
      ``dn[o] = -Σ_i m_i dm_i R[i,o] / n[o]^3`` and ``dm = style_weight[:, 1]``
      (style slot 1 carries Dz - 1, so ds = e1);
    * first-layer rule (vel only): the network input was pre-scaled by
      ``Dz/6`` so layers that see the raw input add ``weight/Dz`` to the
      tangent kernel (reference ``nbody_emulator.py:212-215``).

    All math in float32.  Reference: ``nbody_emulator.py:131-148, 189-219``.
    """
    s = jnp.atleast_2d(jnp.asarray(s, dtype=jnp.float32))  # (1, 2)
    w = layer_params["weight"].astype(jnp.float32)  # (K,K,K,Ci,Co)
    sw = layer_params["style_weight"].astype(jnp.float32)
    sb = layer_params["style_bias"].astype(jnp.float32)

    m = (jnp.dot(s, sw.T, precision="highest") + sb)[0]  # (Ci,)
    r = jnp.sum(w * w, axis=(0, 1, 2))  # (Ci, Co)
    norm = jnp.sqrt(jnp.dot(m * m, r, precision="highest") + eps)  # (Co,)

    w_mod = w * m[:, None]  # (K,K,K,Ci,Co)
    w_norm = w_mod / norm

    out = {"weight": w_norm, "bias": layer_params["bias"]}
    if not vel:
        return out

    dm = sw[:, 1]  # (Ci,)  d(s_mod)/dDz
    dnorm = -jnp.dot(m * dm, r, precision="highest") / norm**3  # (Co,)
    # dW = dw_style / n + (W ⊙ m) * dn   (product rule through demodulation)
    dw = (w * dm[:, None]) / norm + w_mod * dnorm
    if first_layer:
        Dz = s[0, 1] + 1.0
        dw = dw + w_norm / Dz
    out["dweight"] = dw
    return out
