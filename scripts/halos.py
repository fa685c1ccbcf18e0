#!/usr/bin/env python
"""FoF halo pipeline: displacement field -> halo catalog -> mass function.

Counterpart of the reference's ``scripts/halos.py`` (nbodykit+MPI replaced
by the in-package scipy FoF): builds Eulerian positions x = (q + psi) mod L
from a saved displacement field, runs periodic friends-of-friends, saves the
catalog, and plots the halo mass function with a Tinker et al. 2008 overlay.
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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--displacement", required=True,
                   help="psi .npy (3, N, N, N) [Mpc/h], or a glob of "
                        "per-shard pieces named *_<i0>_<j0>_<k0>.npy "
                        "(voxel origins — the naming examples/run_pod.py "
                        "--out-dir emits); shards are memory-mapped and "
                        "streamed, never assembled into one array")
    p.add_argument("--boxsize", type=float, required=True)
    p.add_argument("--Om", type=float, default=0.3175)
    p.add_argument("--z", type=float, default=0.0)
    p.add_argument("--linking-length", type=float, default=0.2, help="in mean interparticle spacings")
    p.add_argument("--nmin", type=int, default=20)
    p.add_argument("--engine", choices=("auto", "numpy", "native"),
                   default="auto",
                   help="FoF linking engine: auto prefers the on-demand-"
                        "compiled C++ kernel, falling back to numpy")
    p.add_argument("--n-slabs", type=int, default=1,
                   help=">1 streams Eulerian x-slabs through the FoF "
                        "(memory-bounded: one slab + ghosts resident; the "
                        "displacement file is memory-mapped) — the single-"
                        "host analog of the reference's MPI slab ranks")
    p.add_argument("--out-dir", type=str, default="runs/halos")
    p.add_argument("--plot-only", action="store_true", help="re-plot from saved catalog")
    p.add_argument("--plots", action=argparse.BooleanOptionalAction, default=True)
    args = p.parse_args()

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from jax_nbody_emulator_with_dj_tpu.science.halos import (
        empirical_hmf,
        friends_of_friends,
        friends_of_friends_sharded,
        friends_of_friends_slabbed,
        particle_mass_msun_h,
        positions_from_displacement,
        tinker08_hmf,
    )

    cat_path = out_dir / "halo_catalog.npz"
    if args.plot_only:
        cat = np.load(cat_path)
        lengths, centers = cat["lengths"], cat["centers"]
        meta = json.loads((out_dir / "fof_summary.json").read_text())
        n_part = meta["n_part"]
    elif any(c in args.displacement for c in "*?["):
        # Per-shard pieces straight from a pod run (examples/run_pod.py
        # --out-dir): origins parsed from the *_<i0>_<j0>_<k0>.npy names.
        import glob
        import re

        files = sorted(glob.glob(args.displacement))
        if not files:
            raise SystemExit(f"no files match {args.displacement!r}")
        shards = []
        n_part = 0
        for f in files:
            m = re.search(r"_(\d+)_(\d+)_(\d+)\.npy$", f)
            if not m:
                raise SystemExit(
                    f"{f}: shard files must be named *_<i0>_<j0>_<k0>.npy"
                )
            origin = tuple(int(g) for g in m.groups())
            piece = np.load(f, mmap_mode="r")
            n_part = max(
                n_part, *(o + s for o, s in zip(origin, piece.shape[1:]))
            )
            shards.append((piece, origin))
        # A partially fetched pod output (a missing shard file) would
        # otherwise silently drop its particles from the catalog: the
        # pieces must tile the full N^3 grid exactly — total volume
        # matches and no two origins coincide.
        total = sum(int(np.prod(p.shape[1:])) for p, _ in shards)
        if total != n_part**3:
            raise SystemExit(
                f"shard pieces cover {total:,} particles but the inferred "
                f"grid is {n_part}^3 = {n_part**3:,} — missing or "
                f"overlapping shard files in {args.displacement!r}"
            )
        origins = [o for _, o in shards]
        if len(set(origins)) != len(origins):
            raise SystemExit(
                f"duplicate shard origins in {args.displacement!r}"
            )
        b_abs = args.linking_length * args.boxsize / n_part
        n_slabs = max(args.n_slabs, 1)
        print(f"sharded FoF over {len(shards)} pieces (N={n_part}), "
              f"b = {b_abs:.4f} Mpc/h, {n_slabs} Eulerian slab(s) ...",
              flush=True)
        fof = friends_of_friends_sharded(
            shards, n_part, args.boxsize, b_abs, nmin=args.nmin,
            n_slabs=n_slabs, engine=args.engine,
        )
        lengths, centers = fof["lengths"], fof["centers"]
        np.savez(cat_path, lengths=lengths, centers=centers)
        meta = {
            "n_part": int(n_part),
            "boxsize": args.boxsize,
            "Om": args.Om,
            "z": args.z,
            "linking_length": args.linking_length,
            "nmin": args.nmin,
            "n_halos": int(fof["n_groups"]),
            "largest_halo_particles": int(lengths.max()) if len(lengths) else 0,
            "n_shards": len(shards),
        }
        with open(out_dir / "fof_summary.json", "w") as f:
            json.dump(meta, f, indent=2)
        print(json.dumps(meta, indent=2))
    else:
        psi = np.load(args.displacement, mmap_mode="r" if args.n_slabs > 1 else None)
        n_part = psi.shape[1]
        b_abs = args.linking_length * args.boxsize / n_part
        print(f"FoF over {n_part**3:,} particles, b = {b_abs:.4f} Mpc/h "
              f"({args.n_slabs} slab{'s' if args.n_slabs > 1 else ''}) ...",
              flush=True)
        if args.n_slabs > 1:
            fof = friends_of_friends_slabbed(
                psi, args.boxsize, b_abs, nmin=args.nmin,
                n_slabs=args.n_slabs, engine=args.engine,
            )
        else:
            pos = positions_from_displacement(psi, args.boxsize)
            fof = friends_of_friends(pos, args.boxsize, b_abs, nmin=args.nmin,
                                     engine=args.engine)
        lengths, centers = fof["lengths"], fof["centers"]
        np.savez(cat_path, lengths=lengths, centers=centers)
        meta = {
            "n_part": int(n_part),
            "boxsize": args.boxsize,
            "Om": args.Om,
            "z": args.z,
            "linking_length": args.linking_length,
            "nmin": args.nmin,
            "n_halos": int(fof["n_groups"]),
            "largest_halo_particles": int(lengths.max()) if len(lengths) else 0,
        }
        with open(out_dir / "fof_summary.json", "w") as f:
            json.dump(meta, f, indent=2)
        print(json.dumps(meta, indent=2))

    if not args.plots or len(lengths) == 0:
        return

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk

    m_p = particle_mass_msun_h(args.boxsize, n_part, args.Om)
    m_centers, dn, err = empirical_hmf(lengths, m_p, args.boxsize)
    k = jnp.logspace(-4, 2, 256)
    pk = eisenstein_hu_pk(k, Om=args.Om)
    dn_theory = tinker08_hmf(m_centers, k, pk, Om=args.Om, z=args.z)

    fig, ax = plt.subplots(figsize=(6.5, 5))
    ax.errorbar(m_centers, dn, yerr=err, fmt="o", ms=4, label="FoF (corrected)")
    ax.loglog(m_centers, dn_theory, "k--", label="Tinker et al. 2008")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel(r"$M\ [M_\odot/h]$")
    ax.set_ylabel(r"$dn/d\log_{10}M\ [h^3\,{\rm Mpc}^{-3}]$")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_dir / "hmf.png", dpi=130)
    plt.close(fig)

    # Halo slice map
    fig, ax = plt.subplots(figsize=(6, 6))
    sel = centers[:, 0] < args.boxsize / 8
    sizes = np.sqrt(lengths[sel]).clip(1, 30)
    ax.scatter(centers[sel, 1], centers[sel, 2], s=sizes, lw=0, alpha=0.6)
    ax.set_xlabel("y [Mpc/h]")
    ax.set_ylabel("z [Mpc/h]")
    ax.set_title(f"halos in x < L/8 slab (N={sel.sum()})")
    fig.tight_layout()
    fig.savefig(out_dir / "halo_slice.png", dpi=130)
    print(f"plots written to {out_dir}")


if __name__ == "__main__":
    main()
