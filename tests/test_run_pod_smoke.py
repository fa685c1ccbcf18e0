"""End-to-end smoke of examples/run_pod.py on the virtual CPU mesh.

Pins the pod driver's wiring — initialize() no-op path, mesh factoring,
on-mesh IC generation (--ic-seed), emulation, and on-mesh validation
(--validate) — the way test_quijote_smoke.py pins the comparison script.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_run_pod_on_mesh_pipeline(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "examples" / "run_pod.py"),
            "--size", "64",
            "--boxsize", "200",
            "--ic-seed", "5",
            "--validate",
            "--mid-chan", "4",
            "--no-vel",
            "--out-dir", str(tmp_path / "shards"),
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "emulated-density P(k):" in proc.stdout
    # sharded outputs were flushed per shard
    shards = list((tmp_path / "shards").glob("dis_*.npy"))
    assert len(shards) == 8, proc.stdout
