#!/usr/bin/env python
"""End-to-end emulation driver: IC -> 1LPT -> emulator -> density -> plots.

TPU-native counterpart of the reference's ``scripts/run_emulator.py``
(argument surface mirrored where it applies; CLASS/DISCO-DJ replaced by the
in-package EH98 / GRF / LPT implementations).

Examples:
    python scripts/run_emulator.py --seed 42 --n-part 256 --boxsize 500 \
        --ndiv 2 2 4 --precision bf16 --out-dir runs/demo --plots
    python scripts/run_emulator.py --input-delta delta.npy --n-part 512 ...
    python scripts/run_emulator.py --out-dir runs/demo --plot-only
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()  # honor JAX_PLATFORMS even with pre-registered plugins


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    ic = p.add_mutually_exclusive_group()
    ic.add_argument("--seed", type=int, default=None, help="GRF seed (IC mode A)")
    ic.add_argument("--input-delta", type=str, default=None, help=".npy linear field (IC mode B)")
    p.add_argument("--n-part", type=int, default=256)
    p.add_argument("--boxsize", type=float, default=1000.0)
    p.add_argument("--z", type=float, default=0.0)
    p.add_argument("--Om", type=float, default=0.3175)
    p.add_argument("--Ob", type=float, default=0.049)
    p.add_argument("--h", dest="h_param", type=float, default=0.6711)
    p.add_argument("--ns", type=float, default=0.9624)
    p.add_argument("--sigma8", type=float, default=0.834)
    p.add_argument("--ndiv", type=int, nargs=3, default=(2, 2, 2))
    p.add_argument("--runtime", choices=("subbox", "auto"), default="subbox",
                   help="auto = overlap-minimal hierarchical runtime with "
                        "planner-chosen geometry (ndiv ignored)")
    p.add_argument("--precision", choices=("bf16", "f16", "f32"), default="bf16")
    p.add_argument("--no-style", dest="premodulate", action="store_true",
                   help="premodulate (fixed cosmology) instead of runtime style")
    p.add_argument("--compute-vel", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--pk-table", type=str, default=None,
                   help="external linear z=0 P(k) table (CLASS .dat / .npy / .npz) "
                        "replacing the in-package EH98")
    p.add_argument("--mas-worder", type=int, default=2, choices=(1, 2, 3, 4))
    p.add_argument("--deconvolve", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--num-sims", type=int, default=1)
    p.add_argument("--params", type=str, default=None, help="weights .npz (else packaged default)")
    p.add_argument("--random-params", action="store_true",
                   help="random weights (pipeline smoke test, no physics fidelity)")
    p.add_argument("--mid-chan", type=int, default=64)
    p.add_argument("--out-dir", type=str, default="runs/emulator")
    p.add_argument("--save-fields", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--plots", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--plot-only", action="store_true", help="re-plot from saved fields")
    return p.parse_args()


def make_plots(out_dir: Path, delta_lin, delta_lpt, delta_emu, boxsize, cosmo, z,
               pk_table=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor
    from jax_nbody_emulator_with_dj_tpu.science import (
        eisenstein_hu_pk,
        minkowski_functionals,
        power_spectrum,
    )

    # Density slices
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for ax, (f, title) in zip(
        axes,
        [(delta_lin, "linear (z=0 norm)"), (delta_lpt, "1LPT"), (delta_emu, "emulator")],
    ):
        sl = np.log10(2.0 + f[: f.shape[0] // 8].mean(axis=0))
        im = ax.imshow(sl, origin="lower", cmap="inferno")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(out_dir / "density_slices.png", dpi=130)
    plt.close(fig)

    # P(k) vs linear theory
    dz = float(growth_factor(z, cosmo["Om"]))
    fig, ax = plt.subplots(figsize=(7, 5))
    for f, label in [(delta_lpt, "1LPT"), (delta_emu, "emulator")]:
        k, pk, _ = power_spectrum(f, boxsize)
        ax.loglog(np.asarray(k), np.asarray(pk), label=label)
    kk = np.asarray(k)
    if pk_table is not None:
        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import load_pk_table

        kt, pt = load_pk_table(pk_table)
        p_lin = np.exp(np.interp(np.log(kk), np.log(kt), np.log(pt))) * dz**2
        lin_label = f"linear table (z={z})"
    else:
        p_lin = np.asarray(
            eisenstein_hu_pk(kk, Om=cosmo["Om"], Ob=cosmo["Ob"], h=cosmo["h"],
                             ns=cosmo["ns"], sigma8=cosmo["sigma8"])
        ) * dz**2
        lin_label = f"linear EH98 (z={z})"
    ax.loglog(kk, p_lin, "k--", label=lin_label)
    ax.set_xlabel("k [h/Mpc]")
    ax.set_ylabel("P(k) [(Mpc/h)^3]")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_dir / "power_spectrum.png", dpi=130)
    plt.close(fig)

    # Minkowski functionals of the emulated field
    sigma = float(np.std(delta_emu))
    ts = np.linspace(-2, 4, 25) * sigma
    mf = np.asarray(minkowski_functionals(delta_emu, ts))
    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for i, (ax, name) in enumerate(zip(axes, ["V0", "V1", "V2", "V3"])):
        ax.plot(ts / sigma, mf[:, i])
        ax.set_xlabel(r"$\nu = \delta/\sigma$")
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(out_dir / "minkowski.png", dpi=130)
    plt.close(fig)


def main():
    args = parse_args()
    out_dir = Path(args.out_dir)
    cosmo = {"Om": args.Om, "Ob": args.Ob, "h": args.h_param, "ns": args.ns, "sigma8": args.sigma8}

    if args.plot_only:
        delta_lin = np.load(out_dir / "delta_lin.npy")
        delta_lpt = np.load(out_dir / "delta_lpt.npy")
        delta_emu = np.load(out_dir / "delta_emu.npy")
        meta = json.loads((out_dir / "metadata.json").read_text())
        saved_pk = meta.get("pk_table")
        make_plots(out_dir, delta_lin, delta_lpt, delta_emu,
                   meta["boxsize"], meta["cosmology"], meta["z"],
                   pk_table=saved_pk if saved_pk not in (None, "eh98", "external-array") else None)
        print(f"plots written to {out_dir}")
        return

    from jax_nbody_emulator_with_dj_tpu.pipeline import run_lpt_emulator_pipeline
    from jax_nbody_emulator_with_dj_tpu.utils.params import load_params_npz

    params = None
    load_params = not args.random_params
    if args.params:
        params = load_params_npz(args.params)
        load_params = False
    elif args.random_params:
        import jax
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore

        params = StyleNBodyEmulatorVelCore(mid_chan=args.mid_chan).init(jax.random.key(0))
        load_params = False

    seed = args.seed if (args.seed is not None or args.input_delta) else 42
    input_delta = np.load(args.input_delta) if args.input_delta else None

    result = run_lpt_emulator_pipeline(
        seed=seed,
        input_delta=input_delta,
        n_part=args.n_part,
        boxsize=args.boxsize,
        z=args.z,
        cosmo=cosmo,
        pk_table=args.pk_table,
        params=params,
        load_params=load_params,
        premodulate=args.premodulate,
        compute_vel=args.compute_vel,
        ndiv=tuple(args.ndiv),
        runtime=args.runtime,
        precision=args.precision,
        mas_worder=args.mas_worder,
        deconvolve=args.deconvolve,
        num_sims=args.num_sims,
        out_dir=out_dir,
        save_fields=args.save_fields,
        mid_chan=args.mid_chan,
    )
    print(json.dumps({k: v for k, v in result.metadata.items() if k != "timings"}, default=str))
    print("timings:", json.dumps(result.timings, default=str))

    if args.plots:
        make_plots(out_dir, result.delta_lin, result.delta_lpt, result.delta_emu,
                   args.boxsize, cosmo, args.z, pk_table=args.pk_table)
        print(f"plots written to {out_dir}")


if __name__ == "__main__":
    main()
