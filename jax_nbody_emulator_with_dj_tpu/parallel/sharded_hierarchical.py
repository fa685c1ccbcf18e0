"""Sharded hierarchical runtime: overlap-minimal phases composed with SPMD.

``ShardedBoxProcessor`` scales the *subbox* scheme across a mesh: one
48-voxel halo exchange up front, then full-network recompute tiles — a
~5.4x FLOP overhead per shard.  This module instead shards the
*hierarchical* runtime (``hierarchical.py``): each phase runs on the local
shard, and the padded level-1 buffers' halo margins are filled by
``ppermute`` exchanges from mesh neighbors (8 input voxels up front, then
2 level-1 voxels after phase 1, 4 after phase 2a, 8 level-2 voxels after
phase 2b, 4 level-1 after phase 2c) instead of periodic self-wrap.
Total overlap overhead stays ~1.3x while the box scales across the ICI mesh.

This is the intended production path for 1024^3/2048^3 boxes on pod slices
(the reference's only scale mechanism is a sequential host-side loop,
``/root/reference/src/jax_nbody_emulator/subbox.py:195-215``).

The composition is exact: a mesh axis of size 1 degenerates every exchange
to the single-device ghost fill, and the phases themselves are shared code —
equivalence with the single-device runtime (and hence with the subbox
decomposition) is asserted on an 8-device CPU mesh in
``tests/test_sharded.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..cosmology import growth_factor, vel_norm
from ..hierarchical import HierarchicalConfig, HierarchicalProcessor
from .halo import halo_exchange
from .mesh import SPATIAL_AXES


def fill_margins_exchange(buf, margins, axis_names=SPATIAL_AXES):
    """Fill a padded local buffer's margins from mesh neighbors.

    ``buf`` is (1, D, H, W, C) with ``margins`` baked into axes 1..3.  Must
    run inside ``shard_map``.  Axis-sequential like the single-device ghost
    fill, so corner ghosts compose from two straight exchanges (the strips
    sent along axis k span the already-filled margins of axes < k).  When a
    margin exceeds the local interior, the exchange runs one ``ppermute``
    hop per neighbor distance; a mesh axis of size 1 degenerates to the
    periodic self-wrap.
    """
    for ax, m, name in zip((1, 2, 3), margins, axis_names):
        if m == 0:
            continue
        n = buf.shape[ax] - 2 * m
        nm = lax.axis_size(name)
        interior = lax.slice_in_dim(buf, m, m + n, axis=ax)
        hops = -(-m // n)
        for k in range(1, hops + 1):
            take = min(n, m - (k - 1) * n)
            lo = lax.slice_in_dim(interior, n - take, n, axis=ax)
            hi = lax.slice_in_dim(interior, 0, take, axis=ax)
            # Neighbor distance k taken mod the ring size: a margin wider
            # than the global extent wraps the torus more than once, which
            # is exactly periodic tiling (shift 0 = my own interior).
            shift = k % nm
            if shift:
                fwd = [(i, (i + shift) % nm) for i in range(nm)]
                bwd = [(i, (i - shift) % nm) for i in range(nm)]
                lo = lax.ppermute(lo, name, fwd)  # from the k-left neighbor
                hi = lax.ppermute(hi, name, bwd)  # from the k-right neighbor
            buf = lax.dynamic_update_slice_in_dim(
                buf, lo, m - (k - 1) * n - take, axis=ax
            )
            buf = lax.dynamic_update_slice_in_dim(
                buf, hi, m + n + (k - 1) * n, axis=ax
            )
    return buf


class _LocalHierarchical(HierarchicalProcessor):
    """Per-shard hierarchical phases; margins come from neighbor exchange."""

    def __init__(self, model, params, config, axis_names):
        self._axis_names = tuple(axis_names)
        super().__init__(model, params, config)

    def _fill_margins(self, buf, margins):
        return fill_margins_exchange(buf, margins, self._axis_names)


class ShardedHierarchicalProcessor:
    """Overlap-minimal big-box runtime sharded over a device mesh.

    Args:
        model: any of the four emulator cores (style models fold their
            style vector into premodulated weights per call — see
            ``HierarchicalProcessor``).
        params: its parameters.
        mesh: 3D spatial device mesh (axes ``SPATIAL_AXES``).
        config: hierarchical geometry with **global** ``size``; ``slab``,
            ``tile`` and ``tile1`` apply to the local shard (``tile1=None``
            auto-picks from the local extent).
    """

    def __init__(self, model, params, mesh: Mesh, config: HierarchicalConfig):
        self.mesh = mesh
        self.global_size = tuple(config.size)
        mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
        local_size = []
        for s, m in zip(self.global_size, mesh_shape):
            if s % m:
                raise ValueError(f"size {config.size} not divisible by mesh {mesh_shape}")
            local_size.append(s // m)
        kw = dict(
            size=tuple(local_size),
            slab=min(config.slab, local_size[0]),
            slab_h=(
                config.slab_h
                if config.slab_h and local_size[1] % config.slab_h == 0
                else None
            ),
            tile=tuple(min(t, s) for t, s in zip(config.tile, local_size)),
            dtype=config.dtype,
            output_dtype=config.output_dtype,
            in_chan=config.in_chan,
            packed=config.packed,
            buf_dtype=config.buf_dtype,
        )
        try:
            local_cfg = HierarchicalConfig(
                tile1=min(config.tile1, min(local_size) // 2), **kw
            )
        except ValueError:
            local_cfg = HierarchicalConfig(**kw)  # auto-pick a local tile1
        self.local = _LocalHierarchical(model, params, local_cfg, SPATIAL_AXES)
        self.config = local_cfg
        self.compute_vel = self.local.compute_vel
        self.styled = self.local.styled

        self.in_spec = P(None, *SPATIAL_AXES)
        self._sharding = NamedSharding(mesh, self.in_spec)
        nbuf = 2 if self.compute_vel else 1
        io_spec = P(None, None, *SPATIAL_AXES)  # (1, C, D, H, W)
        buf_spec = P(None, *SPATIAL_AXES, None)  # (1, D', H', W', C)
        bufs = (buf_spec,) * nbuf

        # The pipeline is split into one jitted program per phase — the
        # same structure as the single-device runtime — so each phase's
        # consumed source buffer is DONATED and its HBM is reusable for
        # that phase's intermediates/output.  The monolithic one-jit
        # alternative kept h1/y1/r1 and the outputs live simultaneously,
        # a real OOM risk at production per-shard geometry.
        def sm(fn, in_specs, out_specs):
            return shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )

        self._jit_scale = jax.jit(
            sm(self._local_scale, (io_spec, P()), io_spec)
        )
        self._jit_phase1 = jax.jit(
            sm(self._local_phase1, (P(), io_spec), bufs)
        )
        self._jit_phase2a = jax.jit(
            sm(self._local_phase2a, (P(), bufs), bufs), donate_argnums=(1,)
        )
        # 2b consumes y1 but must NOT donate it — phase 2c still reads the
        # conv_r1 skip slices from it; 2c then donates both y1 and y2.
        self._jit_phase2b = jax.jit(
            sm(self._local_phase2b, (P(), bufs), bufs)
        )
        self._jit_phase2c = jax.jit(
            sm(self._local_phase2c, (P(), bufs, bufs), bufs),
            donate_argnums=(1, 2),
        )
        self._jit_phase3 = jax.jit(
            sm(
                self._local_phase3,
                (P(), io_spec, bufs, P(), P()),
                (io_spec,) * nbuf,
            ),
            donate_argnums=(1, 2),
        )

    # ---- per-shard phase programs (each runs inside shard_map) -----------

    def _local_scale(self, box, Dz):
        loc = self.local
        cfg = loc.config
        # Scale by Dz/6 (reference input convention) and pull the 8-voxel
        # input halo (phase-1 needs 4, phase-3 needs 8) from neighbors.
        boxp = box * (Dz.astype(cfg.dtype) / jnp.asarray(6.0, cfg.dtype)).reshape(
            (1,) * box.ndim
        )
        return halo_exchange(
            boxp, 8, spatial_dims=(2, 3, 4), axis_names=SPATIAL_AXES
        )

    def _local_phase1(self, params, boxp):
        loc = self.local
        nbuf = 2 if self.compute_vel else 1
        h1 = tuple(
            jnp.zeros(loc._buf_shape(loc._h1_margin()), loc.config.buf_dtype)
            for _ in range(nbuf)
        )
        return loc._phase1_all(params, boxp, h1)

    def _local_phase2a(self, params, h1):
        loc = self.local
        y1 = tuple(
            jnp.zeros(loc._buf_shape(loc._y1_margin()), loc.config.buf_dtype)
            for _ in h1
        )
        return loc._phase2a_all(params, h1, y1)

    def _local_phase2b(self, params, y1):
        loc = self.local
        y2 = tuple(
            jnp.zeros(
                loc._buf_shape(loc._y2_margin(), level=2), loc.config.buf_dtype
            )
            for _ in y1
        )
        return loc._phase2b_all(params, y1, y2)

    def _local_phase2c(self, params, y1, y2):
        loc = self.local
        r1 = tuple(
            jnp.zeros(loc._buf_shape(loc._r1_margin()), loc.config.buf_dtype)
            for _ in y1
        )
        return loc._phase2c_all(params, y1, y2, r1)

    def _local_phase3(self, params, boxp, r1, Dz, vel_fac):
        loc = self.local
        cfg = loc.config
        out_dtype = jnp.dtype(np.dtype(cfg.output_dtype))
        outs = tuple(
            jnp.zeros((1, cfg.in_chan) + cfg.size, out_dtype) for _ in r1
        )
        return loc._phase3_all(params, boxp, r1, outs, Dz, vel_fac)

    # ---- ahead-of-time inspection -----------------------------------------

    def abstract_inputs(self):
        """Global ShapeDtypeStructs for every phase boundary (AOT tooling)."""
        cfg = self.config
        loc = self.local
        mesh_shape = tuple(self.mesh.shape[a] for a in SPATIAL_AXES)
        dt = jnp.dtype(cfg.dtype)
        bdt = jnp.dtype(cfg.buf_dtype)
        nbuf = 2 if self.compute_vel else 1

        def g(shape, spatial_at, dtype=dt):
            s = list(shape)
            for i, m in zip(spatial_at, mesh_shape):
                s[i] *= m
            return jax.ShapeDtypeStruct(tuple(s), dtype)

        ld, lh, lw = cfg.size
        return {
            "box": g((1, cfg.in_chan, ld, lh, lw), (2, 3, 4)),
            "boxp": g((1, cfg.in_chan, ld + 16, lh + 16, lw + 16), (2, 3, 4)),
            "h1": tuple(
                g(loc._buf_shape(loc._h1_margin()), (1, 2, 3), bdt)
                for _ in range(nbuf)
            ),
            "y1": tuple(
                g(loc._buf_shape(loc._y1_margin()), (1, 2, 3), bdt)
                for _ in range(nbuf)
            ),
            "y2": tuple(
                g(loc._buf_shape(loc._y2_margin(), level=2), (1, 2, 3), bdt)
                for _ in range(nbuf)
            ),
            "r1": tuple(
                g(loc._buf_shape(loc._r1_margin()), (1, 2, 3), bdt)
                for _ in range(nbuf)
            ),
            "scalar": jax.ShapeDtypeStruct((1,), jnp.float32),
        }

    def lower_phases(self):
        """Lower every phase jit abstractly (no device execution).

        Returns a dict of ``jax.stages.Lowered``; ``.compile()`` each to run
        XLA buffer assignment and read ``memory_analysis()`` — the per-phase
        HBM budget audit used by ``tests/test_sharded.py``.
        """
        if self.styled:
            raise NotImplementedError(
                "lower_phases inspects the premodulated execution path; "
                "fold style first."
            )
        a = self.abstract_inputs()
        p = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            self.local._exec_params,
        )
        s = a["scalar"]
        return {
            "scale": self._jit_scale.lower(a["box"], s),
            "phase1": self._jit_phase1.lower(p, a["boxp"]),
            "phase2a": self._jit_phase2a.lower(p, a["h1"]),
            "phase2b": self._jit_phase2b.lower(p, a["y1"]),
            "phase2c": self._jit_phase2c.lower(p, a["y1"], a["y2"]),
            "phase3": self._jit_phase3.lower(p, a["boxp"], a["r1"], s, s),
        }

    # ---- public API -------------------------------------------------------

    def shard_input(self, box):
        """Place a (C, D, H, W) array onto the mesh with the spatial sharding."""
        return jax.device_put(jnp.asarray(box, self.config.dtype), self._sharding)

    def process_box(self, box, z: float, Om: float, as_numpy: bool = False):
        """Emulate a full periodic box sharded over the mesh.

        Args:
            box: (C, D, H, W) global input — numpy/jax array (will be
                sharded) or an already-sharded ``jax.Array``.
            z, Om: output redshift and matter density.
            as_numpy: gather the result to host (debug/validation only).
        """
        cfg = self.config
        expect = (cfg.in_chan,) + self.global_size
        if tuple(box.shape) != expect:
            raise ValueError(f"box shape {box.shape} != {expect}")
        Dz = jnp.atleast_1d(growth_factor(z, Om)).astype(jnp.float32)
        vel_fac = (
            jnp.atleast_1d(vel_norm(z, Om)).astype(jnp.float32)
            if self.compute_vel
            else jnp.zeros((1,))
        )
        if not (isinstance(box, jax.Array) and box.sharding == self._sharding):
            box = self.shard_input(box)
        exec_params = self.local._exec_params_for(z, Om)
        boxp = self._jit_scale(box[None], Dz)
        h1 = self._jit_phase1(exec_params, boxp)
        y1 = self._jit_phase2a(exec_params, h1)
        del h1
        y2 = self._jit_phase2b(exec_params, y1)
        r1 = self._jit_phase2c(exec_params, y1, y2)
        del y1, y2
        outs = self._jit_phase3(exec_params, boxp, r1, Dz, vel_fac)
        del boxp, r1
        if as_numpy:
            outs = tuple(np.asarray(o[0]) for o in outs)
        else:
            outs = tuple(o[0] for o in outs)
        return outs if self.compute_vel else outs[0]
