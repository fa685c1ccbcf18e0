"""End-to-end smoke run of scripts/quijote_comparison.py on synthetic data.

The pieces (pipeline, estimators, metrics) are unit-tested elsewhere; this
pins the script's argument wiring, field loading, metric emission, and plot
paths — the reference validates this flow only manually against real Quijote
samples (``/root/reference/scripts/quijote_comparison.py:227-575``).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_quijote_comparison_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    n = 16
    ic = rng.normal(0, 1.0, size=(n, n, n)).astype(np.float32)
    target = rng.normal(0, 1.2, size=(n, n, n)).astype(np.float32)
    ic_path = tmp_path / "ic.npy"
    tg_path = tmp_path / "target.npy"
    np.save(ic_path, ic)
    np.save(tg_path, target)
    out_dir = tmp_path / "out"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "scripts" / "quijote_comparison.py"),
            "--ic-delta", str(ic_path),
            "--target-delta", str(tg_path),
            "--ic-z", "127.0",
            "--n-part", str(n),
            "--boxsize", "250.0",
            "--ndiv", "1", "1", "1",
            "--precision", "f32",
            "--random-params",
            "--mid-chan", "4",
            "--out-dir", str(out_dir),
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    meta = json.loads((out_dir / "metadata.json").read_text())
    m = meta["metrics"]["emulator_vs_target"]
    for key in ("rmse", "pearson_r", "median_abs_T_minus_1", "mean_1_minus_C"):
        assert key in m and np.isfinite(m[key])
    assert "lpt_vs_target" in meta["metrics"]
    # plot files from the diagnostics pass
    pngs = list(out_dir.glob("*.png"))
    assert pngs, f"no plots written in {out_dir}: {list(out_dir.iterdir())}"


@pytest.mark.slow
def test_quijote_comparison_mesh_mode(tmp_path):
    """--mesh routes every diagnostic (metrics, bispectrum, Minkowski)
    through the sharded estimators on the virtual CPU mesh."""
    rng = np.random.default_rng(1)
    n = 16
    np.save(tmp_path / "ic.npy", rng.normal(0, 1.0, size=(n, n, n)).astype(np.float32))
    np.save(tmp_path / "target.npy", rng.normal(0, 1.2, size=(n, n, n)).astype(np.float32))
    out_dir = tmp_path / "out"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "scripts" / "quijote_comparison.py"),
            "--ic-delta", str(tmp_path / "ic.npy"),
            "--target-delta", str(tmp_path / "target.npy"),
            "--n-part", str(n),
            "--boxsize", "250.0",
            "--ndiv", "1", "1", "1",
            "--precision", "f32",
            "--random-params",
            "--mid-chan", "4",
            "--mesh", "2", "2", "2",
            "--out-dir", str(out_dir),
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    meta = json.loads((out_dir / "metadata.json").read_text())
    m = meta["metrics"]["emulator_vs_target"]
    for key in ("rmse", "pearson_r", "median_abs_T_minus_1"):
        assert key in m and np.isfinite(m[key])
    assert (out_dir / "bispectrum.png").exists()
    assert (out_dir / "minkowski.png").exists()
