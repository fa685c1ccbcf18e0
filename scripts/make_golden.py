#!/usr/bin/env python
"""Regenerate the golden-output fixtures in tests/golden/.

The reference validates physics against its packaged pretrained weights
(``nbody_emulator.py:115-129``); that .npz is absent from the reference
checkout and the public map2map release is unreachable from this
environment (no network egress — attempt documented in DESIGN.md).  The
golden fixtures pin the full inference stack instead: fixed-seed random
style weights, premodulated, run through all four model variants and the
subbox runtime on a fixed input, outputs stored here.  Any numerical
regression anywhere in the stack (layer math, premodulation fold, JVP
velocity path, runtime assembly) shows up as a golden mismatch.

Run on CPU with highest matmul precision (the tests' configuration):

    JAX_PLATFORMS=cpu python scripts/make_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jax_nbody_emulator_with_dj_tpu.utils.platform import apply_jax_platforms_env

apply_jax_platforms_env()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from jax_nbody_emulator_with_dj_tpu import (  # noqa: E402
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
    SubboxConfig,
    SubboxProcessor,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)

SEED = 20260816
CFG = dict(levels=1, mid_chan=4)  # margin 12: CPU-fast but full code path
N_IN = 32  # direct-apply input -> 8^3 output
Z, OM = 0.5, 0.3175


def main():
    out_dir = Path(__file__).resolve().parent.parent / "tests" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)

    key = jax.random.key(SEED)
    style_params = StyleNBodyEmulatorVelCore(**CFG).init(key)
    x = jax.random.normal(jax.random.key(SEED + 1), (1, 3, N_IN, N_IN, N_IN), jnp.float32)
    box = np.asarray(
        jax.random.normal(jax.random.key(SEED + 2), (3, 16, 16, 16), jnp.float32)
    )

    from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

    Dz = jnp.atleast_1d(growth_factor(Z, OM))
    vf = jnp.atleast_1d(vel_norm(Z, OM))
    Om = jnp.atleast_1d(jnp.float32(OM))

    rec = {}
    rec["style_disp"] = np.asarray(StyleNBodyEmulatorCore(**CFG).apply(style_params, x, Om, Dz))
    d, v = StyleNBodyEmulatorVelCore(**CFG).apply(style_params, x, Om, Dz, vf)
    rec["style_vel_d"], rec["style_vel_v"] = np.asarray(d), np.asarray(v)

    pm = modulate_emulator_parameters(style_params, Z, OM)
    rec["premod_disp"] = np.asarray(NBodyEmulatorCore(**CFG).apply(pm, x, Dz))
    pmv = modulate_emulator_parameters_vel(style_params, Z, OM)
    d, v = NBodyEmulatorVelCore(**CFG).apply(pmv, x, Dz, vf)
    rec["premod_vel_d"], rec["premod_vel_v"] = np.asarray(d), np.asarray(v)

    cfg = SubboxConfig(size=(16, 16, 16), ndiv=(2, 1, 1), dtype=jnp.float32,
                       padding=((12, 12),) * 3)
    rec["subbox_disp"] = SubboxProcessor(
        StyleNBodyEmulatorCore(**CFG), style_params, cfg
    ).process_box(box, Z, OM)

    np.savez_compressed(out_dir / "emulator_golden.npz", **rec)
    for k, a in rec.items():
        print(f"{k}: shape {a.shape}  mean {a.mean():+.6e}  std {a.std():.6e}")
    print(f"wrote {out_dir / 'emulator_golden.npz'}")


if __name__ == "__main__":
    main()
