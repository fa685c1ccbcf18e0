#!/usr/bin/env python
"""Full 512^3 performance matrix: {style, premod} x {disp, disp+vel} x
{bf16, f32}, matching the reference's 8-row benchmark table
(``/root/reference/README.md:245-252``).

Each row runs ``bench.py`` in its own subprocess (isolates OOM and keeps
compilation caches honest) and the collected rows land in
``bench_matrix.json`` plus a markdown table on stdout.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

REF = {  # A100 seconds, README.md:245-252
    ("premod", "disp", "bfloat16"): 10.9,
    ("style", "disp", "bfloat16"): 11.1,
    ("premod", "disp", "float32"): 15.6,
    ("style", "disp", "float32"): 15.8,
    ("premod", "dispvel", "bfloat16"): 25.8,
    ("style", "dispvel", "bfloat16"): 25.9,
    ("premod", "dispvel", "float32"): 44.7,
    ("style", "dispvel", "float32"): 44.9,
    # 9th row: the headline config under the PLANNER's geometry (no manual
    # knobs) — records that auto_hierarchical_config stays within a few
    # percent of the measured-best manual geometry (VERDICT r4 #5).
    ("premod", "dispvel-auto", "bfloat16"): 25.8,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--rows", type=str, default="all",
                   help="comma list like premod-disp-bfloat16, or 'all'")
    p.add_argument("--timeout", type=int, default=2400)
    args = p.parse_args()

    out = ROOT / "bench_matrix.json"

    def persist(rows_now):
        """Merge into bench_matrix.json after EVERY row, so a timeout or
        crash on row N never discards rows 1..N-1."""
        merged = {}
        if out.exists():  # partial runs update their rows, keep the rest
            try:
                merged = {r["row"]: r for r in json.loads(out.read_text())}
            except (json.JSONDecodeError, KeyError):
                pass
        merged.update({r["row"]: r for r in rows_now})
        ordered = [f"{k}-{m}-{d}" for (k, m, d) in REF]
        kept = [merged[t] for t in ordered if t in merged]
        out.write_text(json.dumps(kept, indent=2))
        return kept

    rows = []
    for (kind, mode, dtype), ref_s in REF.items():
        tag = f"{kind}-{mode}-{dtype}"
        if args.rows != "all" and tag not in args.rows.split(","):
            continue
        cmd = [
            sys.executable, str(ROOT / "bench.py"),
            "--size", str(args.size), "--runs", str(args.runs),
            "--dtype", dtype,
        ]
        if kind == "style":
            cmd.append("--style")
        if mode.startswith("disp") and "vel" not in mode:
            cmd.append("--no-vel")
        if mode.endswith("-auto"):
            cmd += ["--runtime", "auto"]
        print(f"--- {tag} ---", file=sys.stderr, flush=True)
        record = {"row": tag, "reference_a100_s": ref_s}
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout
            )
            if proc.returncode == 0 and proc.stdout.strip():
                record.update(
                    json.loads(proc.stdout.strip().splitlines()[-1])
                )
            else:
                record["error"] = (proc.stderr or "no output")[-800:]
        except subprocess.TimeoutExpired:
            record["error"] = f"timeout after {args.timeout}s"
        except json.JSONDecodeError as e:
            record["error"] = f"unparseable bench output: {e}"
        rows.append(record)
        persist(rows)
        print(json.dumps(record), flush=True)

    rows = persist(rows)
    print(f"\n| config | this engine (v5e) | reference (A100) | ratio |",
          file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "wall_s" in r:
            print(
                f"| {r['row']} | {r['wall_s']} s | {r['reference_a100_s']} s "
                f"| {r['reference_a100_s']/r['wall_s']:.2f}x |",
                file=sys.stderr,
            )
        else:
            print(f"| {r['row']} | FAILED | {r['reference_a100_s']} s | - |",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
