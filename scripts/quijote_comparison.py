#!/usr/bin/env python
"""Validate the emulator against a target N-body (e.g. Quijote) realization.

Counterpart of the reference's ``scripts/quijote_comparison.py``: loads a
target linear IC + nonlinear displacement/density pair, runs the pipeline on
the same IC, and emits the five diagnostics (slices, P(k)+T(k)+C(k), 1-pt
PDF, reduced bispectrum, Minkowski functionals) plus a scalar metric dict in
``metadata.json``.

Target files: ``--target-delta`` (nonlinear density, .npy or torch .pt) and
``--ic-delta`` (linear IC density).  ``--ic-z`` rescales the IC to z=0 by the
exact growth ratio (the reference uses the approximate Carroll-Press-Turner
fit, ``scripts/utils.py:86-96``; we have the exact hypergeometric D(z)).
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


def load_field(path: str) -> np.ndarray:
    p = Path(path)
    if p.suffix == ".pt":
        import torch

        t = torch.load(p, map_location="cpu", weights_only=False)
        return np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)
    return np.asarray(np.load(p), np.float32)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ic-delta", required=True, help="linear IC density (.npy/.pt)")
    p.add_argument("--target-delta", required=True, help="target nonlinear density (.npy/.pt)")
    p.add_argument("--ic-z", type=float, default=0.0, help="redshift of the IC normalization")
    p.add_argument("--z", type=float, default=0.0, help="output redshift")
    p.add_argument("--boxsize", type=float, default=1000.0)
    p.add_argument("--n-part", type=int, default=512)
    p.add_argument("--Om", type=float, default=0.3175)
    p.add_argument("--Ob", type=float, default=0.049)
    p.add_argument("--h", dest="h_param", type=float, default=0.6711)
    p.add_argument("--ns", type=float, default=0.9624)
    p.add_argument("--sigma8", type=float, default=0.834)
    p.add_argument("--pk-table", type=str, default=None,
                   help="external linear z=0 P(k) table (CLASS .dat / .npy / .npz) "
                        "replacing the in-package EH98")
    p.add_argument("--ndiv", type=int, nargs=3, default=(4, 4, 8))
    p.add_argument("--precision", choices=("bf16", "f16", "f32"), default="bf16")
    p.add_argument("--mas-worder", type=int, default=2)
    p.add_argument("--params", type=str, default=None)
    p.add_argument("--random-params", action="store_true")
    p.add_argument("--mid-chan", type=int, default=64)
    p.add_argument("--kmax", type=float, default=0.5, help="metric cut [h/Mpc]")
    p.add_argument("--mesh", type=int, nargs=3, default=None,
                   help="compute metrics on-mesh with the sharded estimators "
                        "(pod validation: fields stay sharded, no gather)")
    p.add_argument("--out-dir", type=str, default="runs/quijote")
    p.add_argument("--plots", action=argparse.BooleanOptionalAction, default=True)
    return p.parse_args()


def main():
    args = parse_args()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cosmo = {"Om": args.Om, "Ob": args.Ob, "h": args.h_param, "ns": args.ns, "sigma8": args.sigma8}

    from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor
    from jax_nbody_emulator_with_dj_tpu.pipeline import run_lpt_emulator_pipeline
    from jax_nbody_emulator_with_dj_tpu.science import (
        minkowski_functionals,
        power_spectrum,
        reduced_bispectrum,
        summary_metrics,
        transfer_and_correlation,
    )
    from jax_nbody_emulator_with_dj_tpu.utils.params import load_params_npz

    ic = load_field(args.ic_delta)
    target = load_field(args.target_delta)

    # Rescale IC to z=0 normalization with the exact growth ratio.
    if args.ic_z != 0.0:
        d_ratio = float(growth_factor(0.0, args.Om)) / float(growth_factor(args.ic_z, args.Om))
        ic = ic * d_ratio

    params = None
    load_params_flag = not args.random_params
    if args.params:
        params = load_params_npz(args.params)
        load_params_flag = False
    elif args.random_params:
        import jax
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore

        params = StyleNBodyEmulatorVelCore(mid_chan=args.mid_chan).init(jax.random.key(0))
        load_params_flag = False

    result = run_lpt_emulator_pipeline(
        input_delta=ic,
        seed=0,
        n_part=args.n_part,
        boxsize=args.boxsize,
        z=args.z,
        cosmo=cosmo,
        pk_table=args.pk_table,
        params=params,
        load_params=load_params_flag,
        premodulate=True,
        compute_vel=False,
        ndiv=tuple(args.ndiv),
        precision=args.precision,
        mas_worder=args.mas_worder,
        out_dir=out_dir,
        save_fields=True,
        mid_chan=args.mid_chan,
    )
    delta_emu = result.delta_emu
    delta_lpt = result.delta_lpt

    if target.shape != delta_emu.shape:
        raise ValueError(f"target shape {target.shape} != emulated {delta_emu.shape}")

    # ---- metrics ----------------------------------------------------------
    if args.mesh and int(np.prod(args.mesh)) > 1:
        from jax_nbody_emulator_with_dj_tpu.parallel import make_mesh
        from jax_nbody_emulator_with_dj_tpu.science import (
            minkowski_functionals_sharded,
            reduced_bispectrum_sharded,
            summary_metrics_sharded,
        )

        mesh = make_mesh(tuple(args.mesh))

        def metric_fn(a, b):
            return summary_metrics_sharded(a, b, mesh, args.boxsize, kmax=args.kmax)

        def bispec_fn(f, k1, k2, thetas):
            return reduced_bispectrum_sharded(f, mesh, args.boxsize, k1, k2, thetas)

        def mink_fn(f, ts):
            return minkowski_functionals_sharded(f, ts, mesh)
    else:

        def metric_fn(a, b):
            return summary_metrics(a, b, args.boxsize, kmax=args.kmax)

        def bispec_fn(f, k1, k2, thetas):
            return reduced_bispectrum(f, args.boxsize, k1, k2, thetas)

        def mink_fn(f, ts):
            return minkowski_functionals(f, ts)

    metrics = {
        "emulator_vs_target": metric_fn(delta_emu, target),
        "lpt_vs_target": metric_fn(delta_lpt, target),
    }
    meta = dict(result.metadata)
    meta["metrics"] = metrics
    with open(out_dir / "metadata.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    print(json.dumps(metrics, indent=2))

    if not args.plots:
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Slices
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for ax, (f, title) in zip(
        axes, [(target, "target"), (delta_emu, "emulator"), (delta_lpt, "1LPT")]
    ):
        im = ax.imshow(np.log10(2.0 + f[0]), origin="lower", cmap="inferno")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(out_dir / "slices.png", dpi=130)
    plt.close(fig)

    # P(k), T(k), C(k)
    k_e, t_e, c_e = transfer_and_correlation(delta_emu, target, args.boxsize)
    k_l, t_l, c_l = transfer_and_correlation(delta_lpt, target, args.boxsize)
    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))
    for f, label in [(target, "target"), (delta_emu, "emulator"), (delta_lpt, "1LPT")]:
        k, pk, _ = power_spectrum(f, args.boxsize)
        axes[0].loglog(np.asarray(k), np.asarray(pk), label=label)
    axes[0].set_xlabel("k"); axes[0].set_ylabel("P(k)"); axes[0].legend()
    axes[1].semilogx(np.asarray(k_e), np.asarray(t_e), label="emu")
    axes[1].semilogx(np.asarray(k_l), np.asarray(t_l), label="1LPT")
    axes[1].axhline(1, color="k", lw=0.5); axes[1].set_ylabel("T(k)"); axes[1].legend()
    axes[2].semilogx(np.asarray(k_e), np.asarray(c_e), label="emu")
    axes[2].semilogx(np.asarray(k_l), np.asarray(c_l), label="1LPT")
    axes[2].axhline(1, color="k", lw=0.5); axes[2].set_ylabel("C(k)"); axes[2].legend()
    fig.tight_layout()
    fig.savefig(out_dir / "spectra.png", dpi=130)
    plt.close(fig)

    # 1-pt PDF
    fig, ax = plt.subplots(figsize=(6, 4.5))
    bins = np.linspace(-1, 6, 100)
    for f, label in [(target, "target"), (delta_emu, "emulator"), (delta_lpt, "1LPT")]:
        ax.hist(f.ravel(), bins=bins, histtype="step", density=True, label=label)
    ax.set_yscale("log"); ax.set_xlabel(r"$\delta$"); ax.legend()
    fig.tight_layout()
    fig.savefig(out_dir / "pdf.png", dpi=130)
    plt.close(fig)

    # Reduced bispectrum at the reference's two configurations
    thetas = np.linspace(0.1, np.pi - 0.1, 15)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for ax, (k1, k2) in zip(axes, [(0.1, 0.1), (0.05, 0.1)]):
        for f, label in [(target, "target"), (delta_emu, "emulator")]:
            out = bispec_fn(f, k1, k2, thetas)
            ax.plot(thetas, out["Q"], label=label)
        ax.set_title(f"k1={k1}, k2={k2}"); ax.set_xlabel(r"$\theta$"); ax.set_ylabel("Q")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_dir / "bispectrum.png", dpi=130)
    plt.close(fig)

    # Minkowski
    sigma = float(np.std(target))
    ts = np.linspace(-2, 4, 25) * sigma
    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for f, label in [(target, "target"), (delta_emu, "emulator")]:
        mf = np.asarray(mink_fn(f, ts))
        for i, ax in enumerate(axes):
            ax.plot(ts / sigma, mf[:, i], label=label)
    for i, (ax, name) in enumerate(zip(axes, ["V0", "V1", "V2", "V3"])):
        ax.set_title(name); ax.set_xlabel(r"$\nu$")
    axes[0].legend()
    fig.tight_layout()
    fig.savefig(out_dir / "minkowski.png", dpi=130)
    plt.close(fig)
    print(f"plots written to {out_dir}")


if __name__ == "__main__":
    main()
