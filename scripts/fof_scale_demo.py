"""Record the FoF scale demonstration as a committed artifact.

Generates an N^3 Zel'dovich displacement from an EH98 Gaussian field,
runs the FoF group finder with the requested engines, and writes
timings + peak RSS + catalog summaries to a JSON artifact
(default ``docs/fof_scale_<N>.json``).  This backs the DESIGN.md scale
claims with a reproducible record (reference scale anchor: the
reference needs MPI nbodykit at 512^3, ``/root/reference/scripts/halos.py:
407-450``; this runs on one host).

Usage: python scripts/fof_scale_demo.py [--n 512] [--engines native numpy]
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def peak_rss_gib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--boxsize", type=float, default=1000.0)
    p.add_argument("--engines", nargs="+", default=["native", "numpy"])
    p.add_argument("--n-slabs", type=int, default=1,
                   help=">1 additionally records the slab-streamed finder")
    p.add_argument("--nmin", type=int, default=20)
    p.add_argument("--clump-sigma", type=float, default=1.0,
                   help="clump radius in grid cells; 0.3 is the extreme "
                        "delta-core regime (~2.7e11 candidate pairs at "
                        "512^3 — native engine only)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from jax_nbody_emulator_with_dj_tpu.science.halos import (
        friends_of_friends,
        friends_of_friends_slabbed,
        positions_from_displacement,
    )

    n, L = args.n, args.boxsize
    cell = L / n
    rec = {
        "n_part": n, "boxsize": L, "nmin": args.nmin,
        "linking_length_rel": 0.2, "host": "single host, no MPI",
        "clump_sigma_cells": args.clump_sigma,
        "ic": "synthetic clumped displacement: 20% of particles fall into "
              "~N^3/5e4 Gaussian clumps, rest stay on the grid — dense "
              "10^4-particle clumps exercise the cell-hash dense-pair "
              "streaming",
        "runs": [],
    }

    # Clumped catalog: Zel'dovich-style smooth displacements never reach
    # FoF overdensities (no collapse), so clustering is synthesized
    # directly — each infalling particle's displacement points at its
    # clump center.  This is the regime where the reference hands off to
    # MPI nbodykit (halos.py:407-450 there).
    t0 = time.perf_counter()
    rng = np.random.RandomState(0)
    n_clumps = max(8, n**3 // 50_000)
    centers = rng.uniform(0, L, size=(n_clumps, 3)).astype(np.float32)
    psi = rng.normal(0.0, 0.05 * cell, size=(3, n, n, n)).astype(np.float32)
    infall = rng.random(n**3) < 0.2
    which = rng.randint(0, n_clumps, size=int(infall.sum()))
    q1 = (np.arange(n, dtype=np.float32)) * cell
    for d in range(3):
        comp = psi[d].reshape(-1)
        # component of the Lagrangian coordinate along axis d
        shape = [1, 1, 1]
        shape[d] = n
        q = np.broadcast_to(q1.reshape(shape), (n, n, n)).reshape(-1)
        comp[infall] = (
            centers[which, d] - q[infall]
            + rng.normal(0.0, args.clump_sigma * cell, size=len(which)).astype(np.float32)
        )
        psi[d] = comp.reshape(n, n, n)
    del infall, which
    rec["ic_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"IC ({n}^3, {n_clumps} clumps) in {rec['ic_seconds']} s",
          flush=True)

    b = 0.2 * L / n
    for engine in args.engines:
        t0 = time.perf_counter()
        if args.n_slabs > 1:
            fof = friends_of_friends_slabbed(
                psi, L, b, nmin=args.nmin, n_slabs=args.n_slabs, engine=engine
            )
        else:
            pos = positions_from_displacement(psi, L)
            fof = friends_of_friends(pos, L, b, nmin=args.nmin, engine=engine)
            del pos
        dt = time.perf_counter() - t0
        run = {
            "engine": engine,
            "n_slabs": args.n_slabs,
            "seconds": round(dt, 1),
            "peak_rss_gib_so_far": round(peak_rss_gib(), 2),
            "n_halos": int(fof["n_groups"]),
            "largest_halo_particles": int(fof["lengths"].max())
            if fof["n_groups"] else 0,
            "particles_in_halos": int(fof["lengths"].sum()),
        }
        rec["runs"].append(run)
        print(json.dumps(run), flush=True)
        del fof

    out = Path(args.out or f"docs/fof_scale_{n}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
