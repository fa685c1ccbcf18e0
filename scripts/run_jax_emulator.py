#!/usr/bin/env python
"""Production batch driver: many displacement boxes through one emulator.

Counterpart of the reference's ``examples/run_jax_emulator.py`` batch CLI:
takes globs of input displacement ``.npy`` files plus per-file (z, Om)
cosmologies, validates ranges, reuses one style emulator across cosmologies
(or builds per-cosmology premodulated emulators), and writes outputs +
per-file timing records.

Performance environment mirrors the reference's tuning block
(``examples/run_jax_emulator.py:38-53``): persistent compilation cache and
explicit matmul precision.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()  # honor JAX_PLATFORMS even with pre-registered plugins


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", required=True, help="glob of input displacement .npy files (3,N,N,N)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--z", type=float, default=0.0, help="output redshift (all files)")
    p.add_argument("--Om", type=float, default=0.3175)
    p.add_argument("--cosmo-json", type=str, default=None,
                   help="JSON file mapping input basename -> {z, Om} (overrides --z/--Om)")
    p.add_argument("--ndiv", type=int, nargs=3, default=(4, 4, 8))
    p.add_argument("--runtime", choices=("subbox", "auto"), default="subbox",
                   help="auto = overlap-minimal hierarchical runtime with "
                        "planner-chosen geometry (ndiv ignored)")
    p.add_argument("--precision", choices=("bf16", "f16", "f32"), default="bf16")
    p.add_argument("--output-dtype", choices=("f16", "f32"), default="f32")
    p.add_argument("--compute-vel", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--style", action="store_true",
                   help="one style emulator reused across cosmologies "
                        "(default: per-cosmology premodulated)")
    p.add_argument("--params", type=str, default=None)
    p.add_argument("--random-params", action="store_true")
    p.add_argument("--mid-chan", type=int, default=64)
    p.add_argument("--compilation-cache", type=str, default="~/.cache/jax_nbody_emulator_xla")
    p.add_argument("--matmul-precision", default=None, choices=(None, "default", "high", "highest"))
    return p.parse_args()


def validate(z: float, om: float, path: str):
    if not (0.0 <= z <= 3.0):
        raise ValueError(f"{path}: z={z} outside [0, 3]")
    if not (0.1 <= om <= 0.5):
        raise ValueError(f"{path}: Om={om} outside [0.1, 0.5]")


def main():
    args = parse_args()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax

    if args.compilation_cache:
        cache = Path(args.compilation_cache).expanduser()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import SubboxConfig, create_emulator
    from jax_nbody_emulator_with_dj_tpu.utils.params import load_params_npz

    files = sorted(glob.glob(args.inputs))
    if not files:
        raise SystemExit(f"no inputs match {args.inputs}")

    cosmo_map = {}
    if args.cosmo_json:
        cosmo_map = json.loads(Path(args.cosmo_json).read_text())

    params = None
    load_params_flag = not args.random_params
    if args.params:
        params = load_params_npz(args.params)
        load_params_flag = False
    elif args.random_params:
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore

        params = StyleNBodyEmulatorVelCore(mid_chan=args.mid_chan).init(jax.random.key(0))
        load_params_flag = False

    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}[args.precision]
    out_dtype = {"f16": np.float16, "f32": np.float32}[args.output_dtype]

    emulators: dict = {}
    records = []
    for path in files:
        name = Path(path).stem
        cz = cosmo_map.get(Path(path).name, {})
        z = float(cz.get("z", args.z))
        om = float(cz.get("Om", args.Om))
        validate(z, om, path)

        box = np.load(path)
        if box.ndim != 4 or box.shape[0] != 3 or len(set(box.shape[1:])) != 1:
            raise ValueError(f"{path}: expected (3, N, N, N), got {box.shape}")
        n = box.shape[1]

        emu_key = ("style", n) if args.style else (z, om, n)
        if emu_key not in emulators:
            # Premodulated emulators are one-per-(z, Om): a long batch of
            # distinct cosmologies would otherwise accumulate a device
            # parameter tree + compiled runtime per file.  Keep only the
            # most recent (same-cosmology files still reuse it; --style
            # shares one emulator across all cosmologies).
            if not args.style:
                emulators.clear()
            if args.runtime == "auto":
                from jax_nbody_emulator_with_dj_tpu import (
                    auto_hierarchical_config,
                )

                cfg = auto_hierarchical_config(
                    (n,) * 3, dtype=dtype, compute_vel=args.compute_vel,
                    output_dtype=out_dtype, mid_chan=args.mid_chan,
                )
            else:
                cfg = SubboxConfig(size=(n,) * 3, ndiv=tuple(args.ndiv), dtype=dtype, output_dtype=out_dtype)
            emulators[emu_key] = create_emulator(
                premodulate=not args.style,
                compute_vel=args.compute_vel,
                load_params=load_params_flag,
                params=params,
                processor_config=cfg,
                premodulate_z=None if args.style else z,
                premodulate_Om=None if args.style else om,
                mid_chan=args.mid_chan,
            )
        emulator = emulators[emu_key]

        t0 = time.perf_counter()
        out = emulator.process_box(box, z=z, Om=om)
        elapsed = time.perf_counter() - t0
        if args.compute_vel:
            disp, vel = out
            np.save(out_dir / f"{name}_vel.npy", vel)
        else:
            disp = out
        np.save(out_dir / f"{name}_disp.npy", disp)
        rec = {"input": path, "z": z, "Om": om, "n": n, "seconds": round(elapsed, 3),
               "voxels_per_sec": round(n**3 / elapsed, 1)}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    with open(out_dir / "batch_summary.json", "w") as f:
        json.dump(records, f, indent=2)


if __name__ == "__main__":
    main()
