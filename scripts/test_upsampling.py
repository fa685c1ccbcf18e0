#!/usr/bin/env python
"""Upsampling-fidelity diagnostic (counterpart of the reference's
``scripts/test_upsampling.py``): generate a GRF, mode-injection upsample it,
compare P(k) against the target EH98 spectrum, block-downsample back both
ways, and report C(k) against the original plus a timing breakdown.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()  # honor JAX_PLATFORMS even with pre-registered plugins


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-in", type=int, default=128)
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--boxsize", type=float, default=1000.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", type=str, default="runs/upsampling")
    p.add_argument("--plots", action=argparse.BooleanOptionalAction, default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu.science import (
        downsample_average,
        eisenstein_hu_pk,
        gaussian_random_field,
        power_spectrum,
        cross_power,
        upsample_modes,
    )

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_out = args.n_in * args.factor
    timings = {}

    k_tab = jnp.logspace(-4, 2, 512)
    p_tab = eisenstein_hu_pk(k_tab)

    t0 = time.perf_counter()
    coarse = gaussian_random_field(jax.random.key(args.seed), args.n_in, args.boxsize, k_tab, p_tab)
    coarse.block_until_ready()
    timings["grf_seconds"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    fine = upsample_modes(coarse, n_out, args.boxsize, k_tab, p_tab, key=jax.random.key(args.seed + 1))
    fine.block_until_ready()
    timings["upsample_seconds"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    back = downsample_average(fine, args.n_in)
    back.block_until_ready()
    timings["downsample_seconds"] = time.perf_counter() - t0

    # Spectra
    k_c, p_c, _ = power_spectrum(coarse, args.boxsize)
    k_f, p_f, _ = power_spectrum(fine, args.boxsize)
    _, p_x, _ = cross_power(back, coarse, args.boxsize)
    _, p_b, _ = power_spectrum(back, args.boxsize)
    c_k = np.asarray(p_x) / np.sqrt(np.maximum(np.asarray(p_b) * np.asarray(p_c), 1e-30))

    p_target_f = np.interp(np.asarray(k_f), np.asarray(k_tab), np.asarray(p_tab))
    ratio = np.asarray(p_f) / p_target_f
    meta = {
        "n_in": args.n_in,
        "n_out": n_out,
        "boxsize": args.boxsize,
        "timings": timings,
        "fine_pk_over_target_median": float(np.median(ratio)),
        "low_k_c_of_downsampled": float(np.mean(c_k[: len(c_k) // 4])),
    }
    with open(out_dir / "metadata.json", "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta, indent=2))

    if args.plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
        axes[0].loglog(np.asarray(k_c), np.asarray(p_c), label=f"coarse {args.n_in}")
        axes[0].loglog(np.asarray(k_f), np.asarray(p_f), label=f"upsampled {n_out}")
        axes[0].loglog(np.asarray(k_f), p_target_f, "k--", label="target EH98")
        axes[0].set_xlabel("k [h/Mpc]"); axes[0].set_ylabel("P(k)"); axes[0].legend()
        axes[1].semilogx(np.asarray(k_c), c_k)
        axes[1].axhline(1, color="k", lw=0.5)
        axes[1].set_xlabel("k [h/Mpc]"); axes[1].set_ylabel("C(k) down(up(x)) vs x")
        fig.tight_layout()
        fig.savefig(out_dir / "upsampling.png", dpi=130)
        print(f"plots written to {out_dir}")


if __name__ == "__main__":
    main()
