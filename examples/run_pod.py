#!/usr/bin/env python
"""Pod-slice (multi-host) emulation driver — run the SAME script on every host.

TPU-native analog of the reference's cluster launchers
(``examples/run_jax_emulator.slurm``, ``my_py_gpu_job.sh``): instead of a
SLURM batch script around a single-GPU loop, every host of a v5e/v5p slice
runs this file (multi-controller SPMD), ``parallel.initialize()`` joins them
into one runtime, and the box lives sharded over the whole slice.

    gcloud compute tpus tpu-vm ssh $TPU --worker=all \
      --command="python examples/run_pod.py --size 2048 --vel --input psi.npy"

Single-host (or CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) runs work unchanged — initialize() is then a no-op.

See docs/RUNBOOK_v5e16.md for the full 2048^3 north-star recipe.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=2048)
    p.add_argument("--z", type=float, default=0.0)
    p.add_argument("--Om", type=float, default=0.3175)
    p.add_argument("--vel", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--input", type=str, default=None,
                   help=".npy 1LPT displacement (3, N, N, N); memory-mapped, "
                        "each host reads only its own shards. Default: "
                        "synthetic per-shard Gaussian field (benchmark mode)")
    p.add_argument("--ic-seed", type=int, default=None,
                   help="generate physical ICs ON-MESH instead of reading "
                        "--input: EH98 linear P(k) -> sharded GRF -> "
                        "Zel'dovich 1LPT, no host I/O at any stage")
    p.add_argument("--boxsize", type=float, default=1000.0,
                   help="box side [Mpc/h] for --ic-seed / --validate")
    p.add_argument("--validate", action="store_true",
                   help="deposit the emulated displacement to a density "
                        "ON-MESH and print its P(k) (pencil-FFT estimator)")
    p.add_argument("--margin", type=int, default=32,
                   help="--validate deposition halo-reduce margin [cells]")
    p.add_argument("--params", type=str, default=None)
    p.add_argument("--mesh", type=int, nargs=3, default=None,
                   help="3D mesh shape (default: auto-factor all devices)")
    p.add_argument("--tiles", type=int, nargs=3, default=None,
                   help="tiles per shard (default: tile extents near 128)")
    p.add_argument("--halo", type=int, default=48)
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port for non-TPU clusters (SLURM etc.)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--out-dir", type=str, default=None,
                   help="flush per-shard outputs here (one file per shard)")
    p.add_argument("--mid-chan", type=int, default=64)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from jax_nbody_emulator_with_dj_tpu import (
        NBodyEmulatorCore,
        NBodyEmulatorVelCore,
        StyleNBodyEmulatorVelCore,
        modulate_emulator_parameters,
        modulate_emulator_parameters_vel,
    )
    from jax_nbody_emulator_with_dj_tpu.parallel import (
        ShardedBoxConfig,
        ShardedBoxProcessor,
        initialize,
        make_mesh,
        make_sharded_box,
    )
    from jax_nbody_emulator_with_dj_tpu.parallel.mesh import _factor3
    from jax_nbody_emulator_with_dj_tpu.utils.params import load_params_npz
    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    initialize(args.coordinator, args.num_processes, args.process_id)
    n_dev = len(jax.devices())
    pid = jax.process_index()
    if pid == 0:
        print(f"pod: {jax.process_count()} hosts, {n_dev} devices", flush=True)

    mesh_shape = tuple(args.mesh) if args.mesh else _factor3(n_dev)
    mesh = make_mesh(mesh_shape)
    size = (args.size,) * 3
    shard = tuple(s // m for s, m in zip(size, mesh_shape))
    tiles = tuple(args.tiles) if args.tiles else tuple(max(1, s // 128) for s in shard)

    fold = modulate_emulator_parameters_vel if args.vel else modulate_emulator_parameters
    if args.params:
        # Same normalization as create_emulator: reference-layout (OIDHW)
        # kernels are converted, and a style-layout tree is folded at
        # (z, Om) for the plain cores used below.
        from jax_nbody_emulator_with_dj_tpu.emulator import ensure_native_layout

        params = ensure_native_layout(load_params_npz(args.params))
        has_style = any(
            "style_weight" in layer
            for block in params["params"].values()
            for layer in block.values()
        )
        if has_style:
            params = fold(params, z=args.z, Om=args.Om)
    else:
        style = StyleNBodyEmulatorVelCore(mid_chan=args.mid_chan).init(jax.random.key(0))
        params = fold(style, z=args.z, Om=args.Om)
    model = (NBodyEmulatorVelCore if args.vel else NBodyEmulatorCore)(mid_chan=args.mid_chan)

    cfg = ShardedBoxConfig(size=size, tiles_per_shard=tiles, halo=args.halo,
                           dtype=jnp.bfloat16, output_dtype=np.float16)
    proc = ShardedBoxProcessor(model, params, mesh, cfg)

    if args.ic_seed is not None:
        # Full on-mesh IC generation: every stage leaves the volume sharded
        from jax_nbody_emulator_with_dj_tpu.science import (
            eisenstein_hu_pk,
            gaussian_random_field_sharded,
            zeldovich_displacement_sharded,
        )

        k_t = np.logspace(-4, 2, 512)
        p_t = np.asarray(
            eisenstein_hu_pk(k_t, Om=args.Om, Ob=0.049, h=0.6711,
                             ns=0.9624, sigma8=0.834)
        )
        delta = gaussian_random_field_sharded(
            jax.random.key(args.ic_seed), args.size, mesh, args.boxsize,
            k_t, p_t,
        )
        psi = zeldovich_displacement_sharded(delta, mesh, args.boxsize)
        box = jax.jit(lambda x: x.astype(cfg.dtype))(psi)
        del delta, psi
    elif args.input:
        psi = np.lib.format.open_memmap(args.input, mode="r")
        box = make_sharded_box(mesh, size, lambda idx: psi[idx], dtype=np.float16)
    else:
        rngs = {}

        def synth(idx):  # per-shard deterministic Gaussian block
            key = tuple((s.start or 0) for s in idx)
            rng = rngs.setdefault(key, np.random.default_rng(hash(key) % 2**32))
            shape = tuple(len(range(*s.indices(dim))) for s, dim in zip(idx, (3,) + size))
            return rng.normal(size=shape).astype(np.float16)

        box = make_sharded_box(mesh, size, synth, dtype=np.float16)

    out = proc.process_box(box, z=args.z, Om=args.Om)  # warmup + compile
    force_sync(out)
    t0 = time.perf_counter()
    out = proc.process_box(box, z=args.z, Om=args.Om)
    force_sync(out)
    dt = time.perf_counter() - t0
    if pid == 0:
        vps = float(np.prod(size)) / dt
        print(f"{args.size}^3 {'disp+vel' if args.vel else 'disp'}: "
              f"{dt:.2f} s  ({vps/1e6:.1f} M voxel/s, "
              f"{vps/1e6/n_dev:.1f} M voxel/s/chip)", flush=True)

    if args.validate:
        # On-mesh validation: MAS density of the emulated displacement and
        # its pencil-FFT P(k) — nothing gathered, pod-scale safe
        from jax_nbody_emulator_with_dj_tpu.science import (
            displacement_to_density_sharded,
            power_spectrum_sharded,
        )

        dis = out[0] if args.vel else out
        delta_emu = displacement_to_density_sharded(
            dis, mesh, args.boxsize, margin=args.margin
        )
        k, pk, nm = power_spectrum_sharded(delta_emu, mesh, args.boxsize)
        k, pk, nm = np.asarray(k), np.asarray(pk), np.asarray(nm)
        if pid == 0:
            sel = nm > 0
            rows = np.linspace(0, sel.sum() - 1, 8).astype(int)
            print("emulated-density P(k):", flush=True)
            for i in np.flatnonzero(sel)[rows]:
                print(f"  k={k[i]:.4f} h/Mpc  P={pk[i]:.4e}  ({int(nm[i])} modes)",
                      flush=True)

    if args.out_dir:
        outdir = Path(args.out_dir)
        outdir.mkdir(parents=True, exist_ok=True)
        arrays = out if args.vel else (out,)
        for name, arr in zip(("dis", "vel"), arrays):
            for s in arr.addressable_shards:
                tag = "_".join(f"{sl.start or 0}" for sl in s.index[1:])
                np.save(outdir / f"{name}_{tag}.npy", np.asarray(s.data))
        if pid == 0:
            print(f"per-shard outputs in {outdir}", flush=True)


if __name__ == "__main__":
    main()
