"""The four emulator model variants, API-compatible with the reference.

  * ``StyleNBodyEmulatorCore``     — flexible cosmology, displacement only
    (reference ``style_nbody_emulator_core.py:20-175``)
  * ``StyleNBodyEmulatorVelCore``  — flexible cosmology, displacement+velocity
    (reference ``style_nbody_emulator_vel_core.py:24-195``)
  * ``NBodyEmulatorCore``          — premodulated, displacement only
    (reference ``nbody_emulator_core.py:20-166``)
  * ``NBodyEmulatorVelCore``       — premodulated, displacement+velocity
    (reference ``nbody_emulator_vel_core.py:24-183``)

Each is a frozen dataclass with ``.init(key, *example_args)`` and
``.apply(params, ...)`` (and ``__call__`` aliasing apply), mirroring the Flax
module surface the reference exposes, but implemented functionally over plain
param pytrees.

TPU-native deltas from the reference:

  * I/O tensors stay NCDHW end-to-end: TPU layouts pad the minor (lane)
    dimension to 128, so a channels-last C=3 tensor would occupy ~42x its
    logical HBM size.  The boundary convolutions consume/produce NCDHW via
    mixed ``dimension_numbers``; all interior (64/128-channel) activations
    are channels-last so convs hit the MXU with batch-shared weights.
  * Style modulation is applied as input/output channel scalings around ONE
    batch-shared conv (exact identity — see ``ops/style.py``); no per-sample
    weight materialization.
  * The velocity path of the *style* model is computed with ``jax.jvp`` of
    the primal displacement model w.r.t. Dz — mathematically identical to
    the reference's hand-threaded tangents (style tangent ds = e1, the
    modulation-demodulation product rule, the first-layer w/Dz rule, and the
    velocity head ``vel = vel_fac * d(disp)/dDz`` all fall out of the chain
    rule) at 2 convolutions per layer instead of 3.
  * The *premodulated* velocity model keeps manual tangent threading (its
    ``dweight`` is an independent baked parameter) with the two tangent
    convs fused into one over channel-concatenated inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.style import style_vector
from .unet import init_unet, input_margin, unet_forward, unet_forward_vel


def _bcast(v, ndim: int = 5):
    """(B,) -> (B, 1, 1, 1, 1) for broadcasting against 5-D activations."""
    v = jnp.atleast_1d(jnp.asarray(v))
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


@dataclass(frozen=True)
class _CoreBase:
    style_size: int = 2
    in_chan: int = 3
    out_chan: int = 3
    mid_chan: int = 64
    eps: float = 1e-8
    levels: int = 3
    data_format: str = "NCDHW"

    # subclass flags
    _style: bool = field(default=False, repr=False)
    _vel: bool = field(default=False, repr=False)

    @property
    def margin(self) -> int:
        return input_margin(self.levels)

    def init(self, key, *example_args, **kw):
        """Random parameter pytree (matches reference tree structure)."""
        del example_args, kw  # shapes are static; example inputs unused
        return init_unet(
            key,
            levels=self.levels,
            in_chan=self.in_chan,
            out_chan=self.out_chan,
            mid_chan=self.mid_chan,
            style=self._style,
            vel=self._vel and not self._style,
            style_size=self.style_size,
        )

    def _prep(self, x):
        unbatched = x.ndim == 4
        if unbatched:
            x = x[None]
        return x, (lambda y: y[0] if unbatched else y)

    def _margin_crop(self, x):
        m = self.margin
        if self.data_format == "NCDHW":
            return x[:, :, m:-m, m:-m, m:-m]
        return x[:, m:-m, m:-m, m:-m, :]

    def __call__(self, params, *args, **kw):
        return self.apply(params, *args, **kw)

    # --- shared forward pieces -------------------------------------------

    def _disp_forward(self, params, x, Dz, s):
        """Displacement forward: scale -> U-Net -> residual head.

        Reference head: x0 = (x*Dz/6)[margin crop]; disp = (net(x) + x0) * 6.
        """
        in_norm = _bcast(Dz).astype(x.dtype) / jnp.asarray(6.0, x.dtype)
        x = x * in_norm
        x0 = self._margin_crop(x)
        h = unet_forward(
            params, x, s=s, levels=self.levels, eps=self.eps, io_fmt=self.data_format
        )
        return (h + x0) * jnp.asarray(6.0, h.dtype)


@dataclass(frozen=True)
class StyleNBodyEmulatorCore(_CoreBase):
    """Styled U-Net, displacement only: apply(params, x, Om, Dz)."""

    _style: bool = field(default=True, repr=False)
    _vel: bool = field(default=False, repr=False)

    def apply(self, params, x, Om, Dz):
        Om = jnp.atleast_1d(Om)
        Dz = jnp.atleast_1d(Dz)
        x, restore = self._prep(x)
        s = style_vector(Om, Dz)
        return restore(self._disp_forward(params, x, Dz, s))


@dataclass(frozen=True)
class StyleNBodyEmulatorVelCore(_CoreBase):
    """Styled U-Net, displacement + velocity: apply(params, x, Om, Dz, vel_fac).

    velocity = vel_fac * d(displacement)/dDz, computed by forward-mode AD
    through the whole styled network (exact JVP through the growth factor's
    entry points: input scaling, style slot 1, and the residual head).
    """

    _style: bool = field(default=True, repr=False)
    _vel: bool = field(default=True, repr=False)

    def apply(self, params, x, Om, Dz, vel_fac):
        Om = jnp.atleast_1d(Om)
        Dz = jnp.atleast_1d(jnp.asarray(Dz))
        if not jnp.issubdtype(Dz.dtype, jnp.floating):
            Dz = Dz.astype(jnp.float32)
        vel_fac = jnp.atleast_1d(vel_fac)
        x, restore = self._prep(x)

        def disp_of(Dz_):
            s = style_vector(Om, Dz_)
            return self._disp_forward(params, x, Dz_, s)

        disp, ddisp = jax.jvp(disp_of, (Dz,), (jnp.ones_like(Dz),))
        vel = ddisp * _bcast(vel_fac).astype(ddisp.dtype)
        return restore(disp), restore(vel)


@dataclass(frozen=True)
class NBodyEmulatorCore(_CoreBase):
    """Premodulated U-Net, displacement only: apply(params, x, Dz)."""

    _style: bool = field(default=False, repr=False)
    _vel: bool = field(default=False, repr=False)

    def apply(self, params, x, Dz):
        Dz = jnp.atleast_1d(Dz)
        x, restore = self._prep(x)
        return restore(self._disp_forward(params, x, Dz, None))


@dataclass(frozen=True)
class NBodyEmulatorVelCore(_CoreBase):
    """Premodulated U-Net, displacement + velocity: apply(params, x, Dz, vel_fac).

    Tangents are threaded manually because ``dweight`` is an independent baked
    parameter.  Head (reference ``nbody_emulator_vel_core.py:173-181``):
        disp = (h + x0) * 6
        vel  = dh * (vel_fac * 6) + x0 * (vel_fac * 6 / Dz)
    """

    _style: bool = field(default=False, repr=False)
    _vel: bool = field(default=True, repr=False)

    def apply(self, params, x, Dz, vel_fac):
        Dz = jnp.atleast_1d(Dz)
        vel_fac = jnp.atleast_1d(vel_fac)
        x, restore = self._prep(x)

        in_norm = _bcast(Dz).astype(x.dtype) / jnp.asarray(6.0, x.dtype)
        x = x * in_norm
        x0 = self._margin_crop(x)
        h, dh = unet_forward_vel(params, x, levels=self.levels, io_fmt=self.data_format)

        disp = (h + x0) * jnp.asarray(6.0, h.dtype)
        dx_norm = (_bcast(vel_fac) * 6.0).astype(h.dtype)
        x0_norm = (_bcast(vel_fac) * 6.0 / _bcast(Dz)).astype(h.dtype)
        vel = dh * dx_norm + x0 * x0_norm
        return restore(disp), restore(vel)
