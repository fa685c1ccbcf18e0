"""On-mesh field resizing: mode-injection upsampling, Fourier upsampling,
Gaussian smoothing, block downsampling.

Counterpart of ``science/resize.py`` (itself replacing the reference's
field-resize toolkit, ``scripts/utils.py:261-649``) for volumes sharded
over the 3D spatial mesh — the pod-scale IC path: refine a coarse IC to
the production grid without ever gathering the fine volume.

The *coarse* field is replicated (it is coarse by definition — a 512^3
complex spectrum is 1 GB); only the fine volume stays sharded.  Each
shard builds its local block of the fine spectrum by gathering from the
replicated coarse spectrum through the same per-axis frequency map as
the single-device ``_axis_map`` (coarse-Nyquist half-half split
included), and the injected high-k modes come from per-shard white noise
pushed through the pencil ``all_to_all`` FFT — globally Hermitian
because the noise is real in configuration space.

Equality with the single-device implementations is asserted on the
8-device CPU mesh in ``tests/test_resize_sharded.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import SPATIAL_AXES, shard_linear_index
from .field_sharded import _ifft3_local, _shard_and_put
from .grf import _interp_pk
from .powerspec_sharded import (
    _check_geometry,
    _fft3_local,
    _local_kmag,
    _local_kvec,
)


def _axis_src_w(dglob, n_in: int, n_out: int):
    """Inverse of ``resize._axis_map``: coarse source index and weight for
    each fine (full-FFT) frequency index; weight 0 marks injected modes."""
    h = n_in // 2
    if n_in % 2:
        # odd n_in: no self-conjugate Nyquist, every mode maps directly
        lo = dglob <= h
        hi = dglob >= n_out - h
        src = jnp.where(
            lo, dglob, jnp.where(hi, dglob - (n_out - n_in), 0)
        )
        return src, (lo | hi).astype(jnp.float32)
    src = jnp.zeros_like(dglob)
    w = jnp.zeros(dglob.shape, jnp.float32)
    lo = dglob < h
    src = jnp.where(lo, dglob, src)
    w = jnp.where(lo, 1.0, w)
    for d_nyq in (h, n_out - h):
        ny = dglob == d_nyq
        src = jnp.where(ny, h, src)
        w = jnp.where(ny, 0.5, w)
    hi = dglob >= n_out - h + 1
    src = jnp.where(hi, dglob - (n_out - n_in), src)
    w = jnp.where(hi, 1.0, w)
    return src, w


def upsample_modes_sharded(
    delta_coarse,
    n_out: int,
    mesh: Mesh,
    boxsize: float,
    k_table=None,
    p_table=None,
    key=None,
    white=None,
):
    """Conditional-GRF upsampling with the fine volume sharded.

    On-mesh counterpart of ``resize.upsample_modes``: the output's modes
    inside the coarse Nyquist sphere equal the (replicated) input's
    exactly; modes outside are a fresh Gaussian realization of the target
    spectrum.  With ``k_table is None`` this is pure band-limited Fourier
    upsampling (``resize.upsample_fourier``).

    Args:
        delta_coarse: (n_in,)^3 field — replicated/host (must fit a chip).
        n_out: fine grid size (multiple of n_in), sharded over ``mesh``.
        white: optional (n_out,)^3 white noise to color deterministically
            (exact-match testing); default draws per-shard noise from
            ``fold_in(key, shard_index)``.

    Returns a sharded (n_out,)^3 float32 field.
    """
    n_in = delta_coarse.shape[0]
    if n_out % n_in or n_out <= n_in:
        raise ValueError(
            f"n_out {n_out} must be a strict multiple of n_in {n_in}"
        )
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n_out, mesh_shape)
    mx, my, mz = mesh_shape
    local = (n_out // mx, n_out // my, n_out // mz)
    inject = k_table is not None
    if inject and p_table is None:
        raise ValueError("k_table given without p_table")
    if key is None:
        key = jax.random.key(0)

    scale = (n_out / n_in) ** 3
    dk_c = jnp.fft.fftn(jnp.asarray(delta_coarse, jnp.float32)) * scale
    kf = 2 * np.pi / boxsize
    k_nyq_coarse = kf * (n_in // 2)
    kt = jnp.asarray(k_table, jnp.float32) if inject else None
    pt = jnp.asarray(p_table, jnp.float32) if inject else None

    def prog(dk_coarse, k):
        idx = [
            lax.axis_index(ax) * local[d] + jnp.arange(local[d], dtype=jnp.int32)
            for d, ax in enumerate(SPATIAL_AXES)
        ]
        sw = [_axis_src_w(i, n_in, n_out) for i in idx]
        low = dk_coarse[sw[0][0]][:, sw[1][0]][:, :, sw[2][0]]
        w3 = (
            sw[0][1][:, None, None]
            * sw[1][1][None, :, None]
            * sw[2][1][None, None, :]
        )
        dk = low * w3
        if inject:
            sidx = shard_linear_index(mesh_shape)
            if white is None:
                noise = jax.random.normal(
                    jax.random.fold_in(k, sidx), local, jnp.float32
                )
            else:
                noise = k  # the sharded white-noise block rides the arg slot
            wk = _fft3_local(noise, mesh_shape)
            kmag = _local_kmag(n_out, boxsize, mesh_shape)
            amp = jnp.sqrt(
                _interp_pk(kmag, kt, pt) * float(n_out) ** 3 / boxsize**3
            )
            dk = jnp.where(kmag <= k_nyq_coarse, dk, wk * amp)
            # single-device upsample_modes zeroes the DC (mean) mode
            dc = (
                (idx[0] == 0)[:, None, None]
                & (idx[1] == 0)[None, :, None]
                & (idx[2] == 0)[None, None, :]
            )
            dk = jnp.where(dc, 0.0, dk)
        return _ifft3_local(dk, mesh_shape).real.astype(jnp.float32)

    second = (
        _shard_and_put(mesh, jnp.asarray(white, jnp.float32))
        if (inject and white is not None)
        else key
    )
    second_spec = P(*SPATIAL_AXES) if (inject and white is not None) else P()
    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(), second_spec),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(dk_c, second)


def upsample_fourier_sharded(delta_coarse, n_out: int, mesh: Mesh):
    """Band-limited (sinc) upsampling on-mesh — no new power
    (counterpart of ``resize.upsample_fourier``)."""
    if n_out == delta_coarse.shape[0]:
        return _shard_and_put(mesh, delta_coarse)
    return upsample_modes_sharded(delta_coarse, n_out, mesh, boxsize=1.0)


def downsample_average_sharded(delta, n_out: int, mesh: Mesh):
    """Block-average downsampling of a sharded field (stays sharded)."""
    n_in = delta.shape[0]
    if n_in % n_out:
        raise ValueError(f"n_in {n_in} must be a multiple of n_out {n_out}")
    f = n_in // n_out
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    for m in mesh_shape:
        if n_in % m or (n_in // m) % f or n_out % m:
            raise ValueError(
                f"block factor {f} must divide the local extent "
                f"{n_in}/{mesh_shape}"
            )

    def prog(d):
        l0, l1, l2 = d.shape
        return d.reshape(l0 // f, f, l1 // f, f, l2 // f, f).mean(
            axis=(1, 3, 5)
        )

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(_shard_and_put(mesh, delta))


def gaussian_smooth_sharded(delta, mesh: Mesh, boxsize: float, r_smooth: float):
    """Isotropic Gaussian smoothing in Fourier space, on-mesh
    (counterpart of ``resize.gaussian_smooth``)."""
    n = delta.shape[0]
    mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
    _check_geometry(n, mesh_shape)

    def prog(d):
        dk = _fft3_local(d.astype(jnp.complex64), mesh_shape)
        kx, ky, kz = _local_kvec(n, boxsize, mesh_shape)
        k2 = (
            kx[:, None, None] ** 2
            + ky[None, :, None] ** 2
            + kz[None, None, :] ** 2
        )
        dk = dk * jnp.exp(-0.5 * k2 * r_smooth**2)
        return _ifft3_local(dk, mesh_shape).real.astype(jnp.float32)

    prog = shard_map(
        prog, mesh=mesh, in_specs=(P(*SPATIAL_AXES),),
        out_specs=P(*SPATIAL_AXES), check_vma=False,
    )
    return jax.jit(prog)(_shard_and_put(mesh, delta))
