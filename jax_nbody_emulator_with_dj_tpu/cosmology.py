"""Flat-LambdaCDM background cosmology, pure JAX.

Every function here is jit-compatible, elementwise over its array inputs,
differentiable (forward and reverse mode), and vmappable, so batched
``(z, Om)`` cosmology sweeps trace into a single XLA program.

Functional parity target: ``/root/reference/src/jax_nbody_emulator/cosmology.py``
(growth_factor :33-40, hubble_rate :42-46, growth_rate :100-113,
dlogH_dloga :115-127, vel_norm :129-141, acc_norm :143-155).  The
implementation is independent: derivatives are taken with ``jax.jvp``
directly on the elementwise primitives (no per-scalar vmap needed), and the
Gauss hypergeometric evaluation is guarded onto the Pfaff-transformed branch
for the physical ``x <= 0`` domain so no NaN gradients leak through
``jnp.where``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import hyp2f1

__all__ = [
    "growth_factor",
    "growth_d_approx",
    "hubble_rate",
    "growth_rate",
    "dlogD_dz",
    "dlogH_dz",
    "dlogH_dloga",
    "vel_norm",
    "acc_norm",
]

# hyp2f1(a, b; c; x) parameters for the LCDM growth integral:
#   D(a) \propto a * 2F1(1, 1/3; 11/6; -OL a^3 / Om)
_A, _B, _C = 1.0, 1.0 / 3.0, 11.0 / 6.0


def _growth_hyp(x):
    """hyp2f1(1, 1/3; 11/6; x) valid on x in (-inf, 1).

    For x < 0 the series does not converge, so apply the Pfaff transform
      2F1(a, b; c; x) = (1-x)^{-a} 2F1(a, c-b; c; x/(x-1))
    which maps x in (-inf, 0) to z in (0, 1).  Both branches are evaluated on
    a domain-safe argument (``where`` guards) so that JVPs through the
    untaken branch stay finite.
    """
    x = jnp.asarray(x)
    neg = x < 0
    # Safe arguments: untaken branch sees a benign value.
    x_neg = jnp.where(neg, x, -0.5)
    x_pos = jnp.where(neg, 0.0, x)
    z = x_neg / (x_neg - 1.0)
    f_neg = (1.0 - x_neg) ** (-_A) * hyp2f1(_A, _C - _B, _C, z)
    f_pos = hyp2f1(_A, _B, _C, x_pos)
    return jnp.where(neg, f_neg, f_pos)


@jax.jit
def growth_factor(z, Om):
    """Linear growth factor D(z), normalized so D(0) = 1.

    Flat LCDM:  D(a) = a * 2F1(1, 1/3; 11/6; -(1-Om) a^3 / Om), normalized at a=1.
    Elementwise over broadcastable ``z`` and ``Om``.
    """
    z = jnp.asarray(z, dtype=jnp.float32)
    Om = jnp.asarray(Om, dtype=jnp.float32)
    a = 1.0 / (1.0 + z)
    ratio = -(1.0 - Om) / Om
    return a * _growth_hyp(ratio * a**3) / _growth_hyp(ratio)


@jax.jit
def hubble_rate(z, Om):
    """Hubble rate H(z) in h km/s/Mpc for flat LCDM."""
    z = jnp.asarray(z, dtype=jnp.float32)
    Om = jnp.asarray(Om, dtype=jnp.float32)
    return 100.0 * jnp.sqrt(Om * (1.0 + z) ** 3 + (1.0 - Om))


def _elementwise_ddz(fn, z, Om):
    """d/dz of an elementwise function via one forward-mode JVP.

    ``fn`` maps (z, Om) -> same-shape array elementwise, so a JVP with an
    all-ones tangent yields the per-element derivative; no vmap required.
    """
    z = jnp.asarray(z, dtype=jnp.float32)
    Om = jnp.asarray(Om, dtype=jnp.float32)
    z_b, Om_b = jnp.broadcast_arrays(z, Om)
    _, dfdz = jax.jvp(lambda zz: fn(zz, Om_b), (z_b,), (jnp.ones_like(z_b),))
    return dfdz


@jax.jit
def dlogD_dz(z, Om):
    """d log D / dz (elementwise, shape-preserving)."""
    return _elementwise_ddz(lambda zz, om: jnp.log(growth_factor(zz, om)), z, Om)


@jax.jit
def dlogH_dz(z, Om):
    """d log H / dz (elementwise, shape-preserving)."""
    return _elementwise_ddz(lambda zz, om: jnp.log(hubble_rate(zz, om)), z, Om)


@jax.jit
def growth_rate(z, Om):
    """Linear growth rate f = d log D / d log a = -(1+z) d log D / dz."""
    z = jnp.asarray(z, dtype=jnp.float32)
    return -dlogD_dz(z, Om) * (1.0 + z)


@jax.jit
def dlogH_dloga(z, Om):
    """d log H / d log a = -(1+z) d log H / dz."""
    z = jnp.asarray(z, dtype=jnp.float32)
    return -dlogH_dz(z, Om) * (1.0 + z)


@jax.jit
def vel_norm(z, Om):
    """Velocity normalization D(z) f(z) H(z) / (1+z)  [km/s]."""
    z = jnp.asarray(z, dtype=jnp.float32)
    return growth_factor(z, Om) * growth_rate(z, Om) * hubble_rate(z, Om) / (1.0 + z)


@jax.jit
def acc_norm(z, Om):
    """Acceleration normalization D f H^2 dlogH/dloga / (1+z)  [km/s^2]."""
    z = jnp.asarray(z, dtype=jnp.float32)
    return (
        growth_factor(z, Om)
        * growth_rate(z, Om)
        * hubble_rate(z, Om) ** 2
        * dlogH_dloga(z, Om)
        / (1.0 + z)
    )


def growth_d_approx(Om, z):
    """Carroll-Press-Turner (1992) closed-form growth-factor fit.

    Compatibility port of the reference's ``growth_D_approx``
    (``/root/reference/scripts/utils.py:86-96``), which Quijote-comparison
    workflows use to rescale z=127 ICs to z=0.  Returns the *unnormalized*
    growth (a * g(a) with the CPT fitting function), matching the reference:
    only ratios growth_d_approx(Om, z1)/growth_d_approx(Om, z2) are
    meaningful.

    The package's own pipelines rescale with the exact hypergeometric
    :func:`growth_factor` ratio instead (accurate to float precision where
    the CPT fit is ~1e-3); this helper exists to reproduce reference
    numbers bit-comparably when cross-validating against its outputs.
    """
    Om = jnp.asarray(Om, dtype=jnp.float32)
    zp1 = 1.0 + jnp.asarray(z, dtype=jnp.float32)
    ol0 = 1.0 - Om
    e2 = ol0 + Om * zp1**3  # H^2/H0^2 (flat LCDM, matter + Lambda)
    om_z = Om * zp1**3 / e2
    ol_z = ol0 / e2
    g = 2.5 * om_z / (
        om_z ** (4.0 / 7.0) - ol_z + (1.0 + 0.5 * om_z) * (1.0 + ol_z / 70.0)
    )
    return g / zp1
