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

import numpy as np

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


def premodulate_layer(
    layer_params,
    s,
    *,
    vel: bool = False,
    first_layer: bool = False,
    eps: float = 1e-8,
    factors: bool = False,
):
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
    if factors:
        # Rank structure of the analytic tangent kernel:
        #     dW = W_norm ⊙ g_in − W_norm ⊙ c_out,
        # with g = dm/m (+ 1/Dz for first layers) and c = −norm·dnorm.
        # The tangent conv then collapses into the PRIMAL kernel:
        #     conv(x, dW) + conv(dx, W_norm)
        #       == conv(x ⊙ g + dx, W_norm) − c ⊙ conv(x, W_norm)
        # — one conv instead of two, sharing the primal conv's output.
        # ``m`` is kept away from 0 with a smooth Tikhonov guard (the true
        # per-channel tangent term w·dm/n is finite as m→0, but its factored
        # form g·ŵ is 0·∞ there; |m| is O(0.1..3) for any physical style, so
        # the guard never bites in practice).
        m_safe = m * m + jnp.asarray(1e-16, m.dtype)
        g = dm * m / m_safe
        if first_layer:
            g = g + 1.0 / (s[0, 1] + 1.0)
        c = norm * (-dnorm)
        # Gauge fixing: (g, c) -> (g - t, c - t) leaves dW invariant (the
        # shift contributes t·conv(x, W) to both terms of the factored
        # tangent).  Centering c at 0 minimizes the c⊙z term, which
        # otherwise amplifies low-precision rounding through the
        # zt − c⊙z cancellation at extreme cosmologies (|c| reaches ~16
        # at z=2, Om=0.2 uncentered; ≤0.6 centered).
        t = jnp.mean(c)
        out["dfac_in"] = g - t
        out["dfac_out"] = c - t
    return out


def recover_dweight_factors(weight, dweight, *, rel_tol: float = 1e-4):
    """Recover the rank structure ``dW = W⊙g_in − W⊙c_out`` from arrays.

    Premodulated velocity trees carry a materialized ``dweight``; when it was
    derived from a style checkpoint (the reference's own premodulation,
    ``/root/reference/src/jax_nbody_emulator/nbody_emulator.py:221-266``, and
    this package's fold) it has exact rank structure in (g, c).  This solves
    the weighted least-squares problem

        min Σ_{k,i,o} ( W[k,i,o]·(g_i − c_o) − dW[k,i,o] )²

    (normal equations over the (Ci+Co)-dim gauge-degenerate system, least-norm
    solution) and accepts iff the residual is at rounding level.  A genuinely
    *learned* ``dweight`` (map2map plain-vel training) has no such structure:
    the residual check fails and callers keep the materialized-tangent path.

    Returns ``(g, c, ok)`` with float64 numpy ``g (Ci,)``, ``c (Co,)``.
    """
    w = np.asarray(weight, np.float64)
    dw = np.asarray(dweight, np.float64)
    ci, co = w.shape[-2], w.shape[-1]
    wk = w.reshape(-1, ci, co)
    dwk = dw.reshape(-1, ci, co)
    p = (wk * wk).sum(0)  # (Ci, Co)
    q = (wk * dwk).sum(0)  # (Ci, Co)
    mat = np.zeros((ci + co, ci + co))
    mat[:ci, :ci] = np.diag(p.sum(1))
    mat[:ci, ci:] = -p
    mat[ci:, :ci] = p.T
    mat[ci:, ci:] = -np.diag(p.sum(0))
    rhs = np.concatenate([q.sum(1), q.sum(0)])
    sol, *_ = np.linalg.lstsq(mat, rhs, rcond=None)
    g, c = sol[:ci], sol[ci:]
    # Gauge: center c at 0 (see ``premodulate_layer``) — minimizes the
    # c⊙z term's low-precision cancellation in the factored tangent.
    t = c.mean()
    g, c = g - t, c - t
    resid = wk * (g[None, :, None] - c[None, None, :]) - dwk
    ok = bool(
        np.abs(resid).max() <= rel_tol * (np.abs(dwk).max() + 1e-300)
    )
    return g, c, ok
