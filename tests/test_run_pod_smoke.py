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


@pytest.mark.slow
def test_run_pod_with_style_params_file(tmp_path):
    """--params with a style-layout .npz must be folded at (z, Om) for the
    plain cores the driver builds (same normalization as create_emulator)."""
    import numpy as np

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

    build = subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore\n"
            "from jax_nbody_emulator_with_dj_tpu.utils.params import save_params_npz\n"
            "p = StyleNBodyEmulatorVelCore(mid_chan=4).init(jax.random.key(1))\n"
            "save_params_npz(%r, p)\n"
            % (str(ROOT), str(tmp_path / "style.npz")),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "examples" / "run_pod.py"),
            "--size", "64",
            "--mid-chan", "4",
            "--no-vel",
            "--params", str(tmp_path / "style.npz"),
            "--out-dir", str(tmp_path / "shards"),
        ],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    shards = list((tmp_path / "shards").glob("dis_*.npy"))
    assert len(shards) == 8, proc.stdout
    assert all(np.isfinite(np.load(s)).all() for s in shards)
