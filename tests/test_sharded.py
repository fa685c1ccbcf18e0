"""Multi-device sharded runtime tests on a virtual 8-device CPU mesh.

The TPU analog of multi-node testing: shard_map + ppermute halo exchange must
reproduce the single-device subbox runtime bit-for-tolerance on any mesh
shape (this is the reference's "exact full coverage" contract lifted to the
distributed setting).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from jax_nbody_emulator_with_dj_tpu.models import (
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from jax_nbody_emulator_with_dj_tpu.parallel import (
    ShardedBoxConfig,
    ShardedBoxProcessor,
    halo_exchange,
    initialize,
    make_mesh,
    make_sharded_box,
)
from jax_nbody_emulator_with_dj_tpu.parallel.mesh import _factor3, mesh_for_devices
from jax_nbody_emulator_with_dj_tpu.subbox import SubboxConfig, SubboxProcessor

KEY = jax.random.key(5)
CFG = dict(levels=1, mid_chan=4)  # margin 12
HALO = 12

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorCore(**CFG).init(KEY)


@pytest.fixture(scope="module")
def box():
    return np.asarray(jax.random.normal(KEY, (3, 64, 32, 32), jnp.float32))


@pytest.fixture(scope="module")
def reference_output(style_params, box):
    """Single-device subbox result to compare all mesh shapes against."""
    model = StyleNBodyEmulatorCore(**CFG)
    cfg = SubboxConfig(
        size=(64, 32, 32), ndiv=(2, 1, 1), padding=((HALO, HALO),) * 3
    )
    return SubboxProcessor(model, style_params, cfg).process_box(box, 0.5, 0.3)


class TestMeshUtils:
    def test_factor3(self):
        assert _factor3(8) == (2, 2, 2)
        assert _factor3(16) == (4, 2, 2)
        assert _factor3(1) == (1, 1, 1)
        assert _factor3(12) == (3, 2, 2)

    def test_make_mesh(self):
        mesh = make_mesh((2, 2, 2))
        assert mesh.shape == {"x": 2, "y": 2, "z": 2}

    def test_mesh_for_devices(self):
        mesh = mesh_for_devices(8)
        assert np.prod(list(mesh.shape.values())) == 8


class TestHaloExchange:
    def test_matches_periodic_pad(self):
        """halo_exchange over any mesh == jnp.pad(mode='wrap') globally."""
        mesh = make_mesh((2, 2, 2))
        spec = P(None, "x", "y", "z")
        vol = jax.random.normal(jax.random.key(9), (3, 16, 16, 16))

        f = jax.jit(
            jax.shard_map(
                lambda v: halo_exchange(v, 4),
                mesh=mesh,
                in_specs=spec,
                out_specs=spec,
                check_vma=False,
            )
        )
        got = f(vol)
        # shard_map concatenation of padded shards is NOT the padded global
        # volume; instead check each shard against the wrap-padded global.
        expected_global = jnp.pad(vol, ((0, 0),) + ((4, 4),) * 3, mode="wrap")
        # Reconstruct each shard's padded block from the global array.
        got_np = np.asarray(got)
        exp_np = np.asarray(expected_global)
        # shard (i,j,k) interior starts at (8i, 8j, 8k); padded block is
        # global wrap-padded slice [8i:8i+16, ...] of the 4-padded array.
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    blk = exp_np[:, 8 * i : 8 * i + 16, 8 * j : 8 * j + 16, 8 * k : 8 * k + 16]
                    # but global wrap != local wrap at interior boundaries:
                    # the padded slice must use periodic *global* indexing
                    idx = lambda a, n: (np.arange(a - 4, a + 8 + 4) % n)
                    gi = idx(8 * i, 16)
                    gj = idx(8 * j, 16)
                    gk = idx(8 * k, 16)
                    blk = np.asarray(vol)[:, gi[:, None, None], gj[None, :, None], gk[None, None, :]]
                    got_blk = got_np[
                        :, 16 * i : 16 * (i + 1), 16 * j : 16 * (j + 1), 16 * k : 16 * (k + 1)
                    ]
                    np.testing.assert_allclose(got_blk, blk, rtol=1e-6)

    @pytest.mark.parametrize("mesh_shape,halo", [((4, 1, 1), 6), ((8, 1, 1), 5), ((4, 2, 1), 9)])
    def test_multihop_matches_periodic_pad(self, mesh_shape, halo):
        """Halo deeper than the shard extent spans several ppermute hops."""
        n = (16, 16, 16)
        mesh = make_mesh(mesh_shape)
        spec = P(None, "x", "y", "z")
        vol = jax.random.normal(jax.random.key(11), (3,) + n)

        f = jax.jit(
            jax.shard_map(
                lambda v: halo_exchange(v, halo),
                mesh=mesh,
                in_specs=spec,
                out_specs=spec,
                check_vma=False,
            )
        )
        got_np = np.asarray(f(vol))
        vol_np = np.asarray(vol)
        shard = tuple(s // m for s, m in zip(n, mesh_shape))
        padded = tuple(s + 2 * halo for s in shard)
        for ijk in np.ndindex(*mesh_shape):
            sel = [slice(None)]
            blk_idx = []
            for ax, (i, s, g) in enumerate(zip(ijk, shard, n)):
                sel.append(slice(padded[ax] * i, padded[ax] * (i + 1)))
                blk_idx.append(np.arange(s * i - halo, s * (i + 1) + halo) % g)
            blk = vol_np[:, blk_idx[0][:, None, None], blk_idx[1][None, :, None], blk_idx[2][None, None, :]]
            np.testing.assert_allclose(got_np[tuple(sel)], blk, rtol=1e-6)


class TestDistributed:
    def test_initialize_single_process_noop(self):
        initialize()  # must not raise or spawn anything single-process
        assert jax.process_count() == 1

    def test_make_sharded_box_assembles_global(self):
        """Per-shard callbacks reproduce the global array, sharded."""
        mesh = make_mesh((2, 2, 2))
        size = (8, 8, 8)
        rng = np.random.default_rng(7)
        global_box = rng.normal(size=(3,) + size).astype(np.float32)
        calls = []

        def block(idx):
            calls.append(idx)
            return global_box[idx]

        arr = make_sharded_box(mesh, size, block)
        assert len(arr.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(arr), global_box)
        # one block per shard, each a local (3, 4, 4, 4) slice
        assert all(global_box[i].shape == (3, 4, 4, 4) for i in calls)

    def test_make_sharded_box_feeds_processor(self, style_params):
        mesh = make_mesh((2, 1, 1))
        size = (32, 16, 16)
        rng = np.random.default_rng(8)
        box = rng.normal(size=(3,) + size).astype(np.float32)
        cfg = ShardedBoxConfig(size=size, dtype=jnp.float32, halo=HALO)
        proc = ShardedBoxProcessor(StyleNBodyEmulatorCore(**CFG), style_params, mesh, cfg)
        arr = make_sharded_box(mesh, size, lambda idx: box[idx], dtype=np.float32)
        out_cb = proc.process_box(jax.device_put(arr, proc._sharding), 0.5, 0.3, as_numpy=True)
        out_np = proc.process_box(box, 0.5, 0.3, as_numpy=True)
        np.testing.assert_allclose(out_cb, out_np, rtol=1e-6)


class TestShardedProcessor:
    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1), (4, 1, 1), (1, 1, 1)])
    def test_matches_single_device(self, style_params, box, reference_output, mesh_shape):
        model = StyleNBodyEmulatorCore(**CFG)
        mesh = make_mesh(mesh_shape)
        cfg = ShardedBoxConfig(
            size=(64, 32, 32), dtype=jnp.float32, halo=HALO,
        )
        proc = ShardedBoxProcessor(model, style_params, mesh, cfg)
        out = proc.process_box(box, 0.5, 0.3, as_numpy=True)
        np.testing.assert_allclose(out, reference_output, rtol=2e-4, atol=2e-5)

    def test_tiled_shards_match(self, style_params, box, reference_output):
        model = StyleNBodyEmulatorCore(**CFG)
        mesh = make_mesh((2, 1, 1))
        cfg = ShardedBoxConfig(
            size=(64, 32, 32), tiles_per_shard=(2, 2, 1), dtype=jnp.float32, halo=HALO
        )
        proc = ShardedBoxProcessor(model, style_params, mesh, cfg)
        out = proc.process_box(box, 0.5, 0.3, as_numpy=True)
        np.testing.assert_allclose(out, reference_output, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_velocity_sharded(self, style_params, box):
        model = StyleNBodyEmulatorVelCore(**CFG)
        mesh = make_mesh((2, 2, 2))
        cfg = ShardedBoxConfig(size=(64, 32, 32), dtype=jnp.float32, halo=HALO)
        proc = ShardedBoxProcessor(model, style_params, mesh, cfg)
        d, v = proc.process_box(box, 0.5, 0.3, as_numpy=True)
        assert d.shape == v.shape == (3, 64, 32, 32)
        # vs single-device vel
        scfg = SubboxConfig(size=(64, 32, 32), ndiv=(2, 1, 1), padding=((HALO, HALO),) * 3)
        d1, v1 = SubboxProcessor(model, style_params, scfg).process_box(box, 0.5, 0.3)
        np.testing.assert_allclose(d, d1, rtol=2e-4, atol=2e-5)
        scale = np.abs(v1).max()
        np.testing.assert_allclose(v / scale, v1 / scale, rtol=2e-4, atol=2e-4)

    def test_shard_extent_below_halo(self, style_params):
        """Multi-hop exchange: 8-voxel shards under a 12-voxel halo."""
        model = StyleNBodyEmulatorCore(**CFG)
        size = (32, 16, 16)
        rng = np.random.default_rng(3)
        small_box = rng.normal(size=(3,) + size).astype(np.float32)
        scfg = SubboxConfig(size=size, ndiv=(1, 1, 1), padding=((HALO, HALO),) * 3)
        expected = SubboxProcessor(model, style_params, scfg).process_box(
            small_box, 0.5, 0.3
        )
        mesh = make_mesh((4, 1, 1))  # 8-voxel shard extent along x < halo 12
        cfg = ShardedBoxConfig(size=size, dtype=jnp.float32, halo=HALO)
        proc = ShardedBoxProcessor(model, style_params, mesh, cfg)
        out = proc.process_box(small_box, 0.5, 0.3, as_numpy=True)
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)

    def test_output_stays_sharded(self, style_params, box):
        model = StyleNBodyEmulatorCore(**CFG)
        mesh = make_mesh((2, 2, 2))
        cfg = ShardedBoxConfig(size=(64, 32, 32), dtype=jnp.float32, halo=HALO)
        proc = ShardedBoxProcessor(model, style_params, mesh, cfg)
        out = proc.process_box(box, 0.5, 0.3)
        assert isinstance(out, jax.Array)
        assert len(out.sharding.device_set) == 8

    def test_invalid_geometry_raises(self, style_params):
        model = StyleNBodyEmulatorCore(**CFG)
        mesh = make_mesh((2, 2, 2))
        with pytest.raises(ValueError):
            # 8/2=4 per shard < halo 12
            ShardedBoxProcessor(
                model, style_params, mesh,
                ShardedBoxConfig(size=(8, 8, 8), halo=HALO),
            )


class TestShardedHierarchical:
    """Sharded hierarchical (per-phase neighbor exchange) == single-device
    hierarchical (itself pinned to the subbox decomposition) at the
    production levels=3 topology."""

    @pytest.fixture(scope="class")
    def params3(self):
        return StyleNBodyEmulatorVelCore(mid_chan=4).init(KEY)

    @pytest.fixture(scope="class")
    def box64(self):
        rng = np.random.default_rng(11)
        return rng.normal(size=(3, 64, 64, 64)).astype(np.float32)

    @pytest.mark.slow
    @pytest.mark.parametrize("packed", [True, False])
    def test_matches_single_device(self, params3, box64, packed):
        from jax_nbody_emulator_with_dj_tpu.emulator import (
            modulate_emulator_parameters,
        )
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalConfig,
            HierarchicalProcessor,
        )
        from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorCore
        from jax_nbody_emulator_with_dj_tpu.parallel import (
            ShardedHierarchicalProcessor,
        )

        params = modulate_emulator_parameters(params3, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=4)
        cfg = HierarchicalConfig(
            size=(64, 64, 64), slab=16, tile=(32, 32, 32),
            dtype=jnp.float32, output_dtype=np.float32, packed=packed,
        )
        ref = HierarchicalProcessor(model, params, cfg).process_box(
            box64, 0.5, 0.3175
        )
        # local shards 32^3 -> level-1 extent 16 < margin 22: multi-hop
        mesh = make_mesh((2, 2, 2))
        proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
        out = proc.process_box(box64, 0.5, 0.3175, as_numpy=True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_velocity_matches_single_device(self, params3, box64):
        from jax_nbody_emulator_with_dj_tpu.emulator import (
            modulate_emulator_parameters_vel,
        )
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalConfig,
            HierarchicalProcessor,
        )
        from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorVelCore
        from jax_nbody_emulator_with_dj_tpu.parallel import (
            ShardedHierarchicalProcessor,
        )

        params = modulate_emulator_parameters_vel(params3, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=4)
        cfg = HierarchicalConfig(
            size=(64, 64, 64), slab=16, tile=(32, 32, 32),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        d_ref, v_ref = HierarchicalProcessor(model, params, cfg).process_box(
            box64, 0.5, 0.3175
        )
        mesh = make_mesh((2, 4, 1))  # anisotropic: level-1 extents 16 and 8
        proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
        d, v = proc.process_box(box64, 0.5, 0.3175, as_numpy=True)
        np.testing.assert_allclose(d, d_ref, rtol=2e-4, atol=2e-5)
        scale = np.abs(v_ref).max()
        np.testing.assert_allclose(v / scale, v_ref / scale, rtol=2e-4, atol=2e-4)

    @pytest.mark.slow  # multi-wrap regime; heavy on 1-core CPU
    def test_output_stays_sharded(self, params3):
        from jax_nbody_emulator_with_dj_tpu.emulator import (
            modulate_emulator_parameters,
        )
        from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig
        from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorCore
        from jax_nbody_emulator_with_dj_tpu.parallel import (
            ShardedHierarchicalProcessor,
        )

        params = modulate_emulator_parameters(params3, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=4)
        cfg = HierarchicalConfig(
            size=(32, 32, 32), slab=8, tile=(16, 16, 16),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        mesh = make_mesh((2, 1, 1))
        proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
        box = np.random.default_rng(0).normal(size=(3, 32, 32, 32)).astype(np.float32)
        out = proc.process_box(box, 0.0, 0.3175)
        assert isinstance(out, jax.Array)
        assert len(out.sharding.device_set) == 2
        # Multi-wrap regime: local level-1 extent 8, global 16 < margin 22 —
        # the exchanged ghosts must tile the torus periodically.
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalProcessor,
        )
        ref = HierarchicalProcessor(model, params, cfg).process_box(
            box, 0.0, 0.3175
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


class TestPodScaleGeometry:
    """BASELINE config 4: 1024^3+ boxes sharded over a mesh. Full execution
    needs a pod slice; this validates the geometry end of the contract —
    construction, local-config derivation, and abstract tracing of the
    whole sharded pipeline at the production shapes."""

    @pytest.mark.slow
    def test_1024_geometry_traces(self):
        from jax_nbody_emulator_with_dj_tpu.emulator import (
            modulate_emulator_parameters_vel,
        )
        params3 = StyleNBodyEmulatorVelCore(mid_chan=4).init(KEY)
        from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig
        from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorVelCore
        from jax_nbody_emulator_with_dj_tpu.parallel import (
            ShardedHierarchicalProcessor,
        )

        params = modulate_emulator_parameters_vel(params3, 0.0, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=4)
        mesh = make_mesh((2, 2, 2))
        cfg = HierarchicalConfig(
            size=(1024, 1024, 1024), slab=16, tile=(128, 128, 128),
            dtype=jnp.bfloat16, output_dtype=np.float16,
        )
        proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
        # local shards 512^3: the production single-chip geometry
        assert proc.config.size == (512, 512, 512)
        assert proc.config.tile1 in (64, 128)
        # abstract-trace every phase of the sharded pipeline (no execution)
        lowered = proc.lower_phases()
        assert set(lowered) == {"scale", "phase1", "phase2a", "phase2b", "phase2c", "phase3"}
        assert all(v is not None for v in lowered.values())

    @pytest.mark.slow
    def test_1024_vel_memory_budget(self):
        """Compile (not just trace) the 1024^3 / 8-shard velocity geometry
        and assert XLA's buffer assignment fits a 16 GB chip per phase.

        Runs on the CPU mesh: buffer sizes are dtype/shape-driven, so the
        CPU numbers track the TPU HBM footprint closely (TPU layout padding
        differs at the margin).  Guards against regressions like phase
        buffers being kept alive across the whole pipeline.
        """
        from jax_nbody_emulator_with_dj_tpu.emulator import (
            modulate_emulator_parameters_vel,
        )
        from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig
        from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorVelCore
        from jax_nbody_emulator_with_dj_tpu.parallel import (
            ShardedHierarchicalProcessor,
        )

        params3 = StyleNBodyEmulatorVelCore(mid_chan=64).init(KEY)
        params = modulate_emulator_parameters_vel(params3, 0.0, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=64)
        mesh = make_mesh((2, 2, 2))
        cfg = HierarchicalConfig(
            size=(1024, 1024, 1024), slab=32, slab_h=256,
            tile=(128, 128, 128), tile1=64,
            dtype=jnp.bfloat16, output_dtype=np.float16,
        )
        proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
        budget = 16 * 1024**3
        n_dev = 8
        for name, low in proc.lower_phases().items():
            mem = low.compile().memory_analysis()
            if mem is None:
                pytest.skip("backend reports no memory analysis")
            total = (
                mem.temp_size_in_bytes
                + mem.argument_size_in_bytes
                + mem.output_size_in_bytes
                - mem.alias_size_in_bytes
            )
            per_dev = total / n_dev
            assert per_dev < budget, (
                f"{name}: {per_dev/2**30:.2f} GiB/device exceeds 16 GiB"
            )

    @pytest.mark.slow
    def test_2048_geometry_v5e16(self):
        """The north-star config: 2048^3 disp+vel over a v5e-16 (4, 2, 2)
        mesh.  Needs 16 devices, so the local-config derivation + abstract
        trace run in a 16-virtual-device subprocess."""
        import subprocess
        import sys

        code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
import sys
sys.path.insert(0, os.environ["NBODY_REPO_ROOT"])
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms", "cpu")
from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
from jax_nbody_emulator_with_dj_tpu.emulator import modulate_emulator_parameters_vel
from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig
from jax_nbody_emulator_with_dj_tpu.models import NBodyEmulatorVelCore
from jax_nbody_emulator_with_dj_tpu.parallel import (
    ShardedHierarchicalProcessor, make_mesh,
)

params3 = StyleNBodyEmulatorVelCore(mid_chan=4).init(jax.random.key(0))
params = modulate_emulator_parameters_vel(params3, 0.0, 0.3175)
model = NBodyEmulatorVelCore(mid_chan=4)
mesh = make_mesh((4, 2, 2))
cfg = HierarchicalConfig(
    size=(2048, 2048, 2048), slab=32, slab_h=256,
    tile=(128, 128, 128), tile1=64,
    dtype=jnp.bfloat16, output_dtype=np.float16,
)
proc = ShardedHierarchicalProcessor(model, params, mesh, cfg)
assert proc.config.size == (512, 1024, 1024), proc.config.size
lowered = proc.lower_phases()
assert set(lowered) == {"scale", "phase1", "phase2a", "phase2b", "phase2c", "phase3"}
print("2048-v5e16-OK")
"""
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["NBODY_REPO_ROOT"] = ROOT
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, env=env,
        )
        assert "2048-v5e16-OK" in out.stdout, out.stderr[-2000:]
