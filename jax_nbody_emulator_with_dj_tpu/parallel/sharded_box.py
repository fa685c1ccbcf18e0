"""Multi-chip big-box runtime: shard_map spatial decomposition + halo exchange.

This is the TPU-native replacement for scaling beyond one chip (the reference
has no distributed runtime at all; its scale mechanism is a sequential host
loop, ``subbox.py:195-215``).  The full periodic volume lives sharded in HBM
over a 3D device mesh; one jitted program per box does:

    1. ``ppermute`` halo exchange of the model's receptive margin (48 voxels
       for the canonical net) across mesh neighbors — periodic by
       construction;
    2. per shard, a fori_loop over local tiles (dynamic_slice -> model
       forward -> dynamic_update_slice), bounding activation memory;
    3. outputs assemble in place as the sharded result array.

No host round-trips, no gather of the global volume, collectives ride ICI.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..cosmology import growth_factor, vel_norm
from ..models.cores import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from ..models.unet import valid_input_size
from .halo import halo_exchange
from .mesh import SPATIAL_AXES


@dataclass
class ShardedBoxConfig:
    """Geometry of the sharded decomposition.

    Attributes:
        size: global box spatial size (D, H, W).
        tiles_per_shard: local subbox subdivision inside each shard (controls
            peak activation memory; (1,1,1) = one model call per shard).
        dtype: device compute dtype.
        output_dtype: dtype of the assembled (still sharded) output.
        in_chan: input channels.
        halo: receptive margin exchanged between shards (model.margin).
    """

    size: tuple[int, int, int]
    tiles_per_shard: tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    output_dtype: np.dtype = np.float32
    in_chan: int = 3
    halo: int = 48


class ShardedBoxProcessor:
    """Runs a model over a periodic volume sharded across a device mesh."""

    def __init__(self, model, params, mesh: Mesh, config: ShardedBoxConfig):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.config = config
        self.premodulate = isinstance(model, (NBodyEmulatorCore, NBodyEmulatorVelCore))
        self.compute_vel = isinstance(
            model, (NBodyEmulatorVelCore, StyleNBodyEmulatorVelCore)
        )

        margin = getattr(model, "margin", None)
        if margin is not None and margin != config.halo:
            raise ValueError(f"config.halo {config.halo} != model margin {margin}")

        mesh_shape = tuple(mesh.shape[a] for a in SPATIAL_AXES)
        self.shard_size = tuple(
            s // m for s, m in zip(config.size, mesh_shape)
        )
        for s, m, local in zip(config.size, mesh_shape, self.shard_size):
            if s % m:
                raise ValueError(f"size {config.size} not divisible by mesh {mesh_shape}")
            # shard extent < halo is fine (multi-hop exchange); the halo can
            # never exceed the global periodic extent, though.
            if config.halo > s:
                raise ValueError(f"halo {config.halo} > global extent {s}")
        self.tile_size = tuple(
            s // t for s, t in zip(self.shard_size, config.tiles_per_shard)
        )
        for s, t, tile in zip(self.shard_size, config.tiles_per_shard, self.tile_size):
            if s % t:
                raise ValueError(
                    f"shard size {self.shard_size} not divisible by tiles {config.tiles_per_shard}"
                )
            n = tile + 2 * config.halo
            if not valid_input_size(n, getattr(model, "levels", 3)):
                raise ValueError(
                    f"tile input size {n} invalid for the model; adjust tiles_per_shard"
                )

        self.in_spec = P(None, *SPATIAL_AXES)
        self._sharding = NamedSharding(mesh, self.in_spec)

        sharded = shard_map(
            self._local_forward,
            mesh=mesh,
            in_specs=(P(), self.in_spec, P(), P(), P()),
            out_specs=(
                (self.in_spec, self.in_spec) if self.compute_vel else self.in_spec
            ),
            check_vma=False,
        )
        self._jit = jax.jit(sharded)

    # ---- per-shard program (runs inside shard_map) -----------------------

    def _local_forward(self, params, local, Om, Dz, vel_fac):
        cfg = self.config
        local = halo_exchange(local, cfg.halo)  # (C, sx+2h, sy+2h, sz+2h)

        out_dtype = jnp.dtype(np.dtype(cfg.output_dtype))
        out_shape = (cfg.in_chan,) + self.shard_size
        dis0 = jnp.zeros(out_shape, out_dtype)
        vel0 = jnp.zeros(out_shape, out_dtype) if self.compute_vel else jnp.zeros((), out_dtype)

        tiles = cfg.tiles_per_shard
        n_tiles = int(np.prod(tiles))
        grid = np.stack(
            np.meshgrid(*[np.arange(t) for t in tiles], indexing="ij"), axis=-1
        ).reshape(-1, 3)
        anchors = jnp.asarray(grid * np.array(self.tile_size), jnp.int32)

        crop_extent = tuple(t + 2 * cfg.halo for t in self.tile_size)

        def apply_model(x):
            if self.premodulate:
                if self.compute_vel:
                    return self.model.apply(params, x, Dz, vel_fac)
                return (self.model.apply(params, x, Dz),)
            if self.compute_vel:
                return self.model.apply(params, x, Om, Dz, vel_fac)
            return (self.model.apply(params, x, Om, Dz),)

        def body(i, carry):
            dis, vel = carry
            a = anchors[i]
            start = (jnp.int32(0), a[0], a[1], a[2])
            crop = jax.lax.dynamic_slice(local, start, (cfg.in_chan,) + crop_extent)
            result = apply_model(crop[None].astype(cfg.dtype))
            dis = jax.lax.dynamic_update_slice(dis, result[0][0].astype(out_dtype), start)
            if self.compute_vel:
                vel = jax.lax.dynamic_update_slice(
                    vel, result[1][0].astype(out_dtype), start
                )
            return dis, vel

        dis, vel = jax.lax.fori_loop(0, n_tiles, body, (dis0, vel0))
        if self.compute_vel:
            return dis, vel
        return dis

    # ---- public API -------------------------------------------------------

    def shard_input(self, box):
        """Place a (C, D, H, W) array onto the mesh with the spatial sharding."""
        return jax.device_put(jnp.asarray(box, self.config.dtype), self._sharding)

    def process_box(self, box, z: float, Om: float, as_numpy: bool = False):
        """Emulate a full periodic box sharded over the mesh.

        Args:
            box: (C, D, H, W) global input — numpy/jax array (will be
                sharded) or an already-sharded jax.Array.
            z, Om: output redshift and matter density.
            as_numpy: gather the result to host numpy (debug/validation only;
                leave False in production to keep outputs sharded in HBM).
        """
        cfg = self.config
        if tuple(box.shape) != (cfg.in_chan,) + tuple(cfg.size):
            raise ValueError(f"box shape {box.shape} != {(cfg.in_chan,) + tuple(cfg.size)}")
        Dz = jnp.atleast_1d(growth_factor(z, Om))
        vel_fac = jnp.atleast_1d(vel_norm(z, Om)) if self.compute_vel else jnp.zeros((1,))
        Om_arr = jnp.atleast_1d(jnp.asarray(Om, jnp.float32))
        if not (isinstance(box, jax.Array) and box.sharding == self._sharding):
            box = self.shard_input(box)
        result = self._jit(self.params, box, Om_arr, Dz, vel_fac)
        if as_numpy:
            result = jax.tree.map(lambda t: np.asarray(t), result)
        return result
