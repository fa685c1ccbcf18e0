"""Golden-output regression tests (the packaged-weights substitute).

The reference pins physics against its packaged pretrained weights
(``nbody_emulator.py:115-129``); neither that .npz nor the public map2map
release is reachable from this environment (no network egress), so these
tests pin the complete inference stack against stored outputs of fixed-seed
random weights instead — any numerical change to the layer math, the
premodulation fold, the JVP velocity path, or the runtime assembly fails
here.  Regenerate deliberately with ``scripts/make_golden.py``.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
    SubboxConfig,
    SubboxProcessor,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

SEED = 20260816
CFG = dict(levels=1, mid_chan=4)
N_IN = 32
Z, OM = 0.5, 0.3175
GOLDEN = Path(__file__).parent / "golden" / "emulator_golden.npz"

RTOL, ATOL = 5e-5, 5e-5  # fp32-highest run-to-run reassociation headroom


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "golden fixture missing — run scripts/make_golden.py"
    with np.load(GOLDEN) as f:
        return {k: f[k] for k in f.files}


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(SEED)
    style_params = StyleNBodyEmulatorVelCore(**CFG).init(key)
    x = jax.random.normal(jax.random.key(SEED + 1), (1, 3, N_IN, N_IN, N_IN), jnp.float32)
    Dz = jnp.atleast_1d(growth_factor(Z, OM))
    vf = jnp.atleast_1d(vel_norm(Z, OM))
    Om = jnp.atleast_1d(jnp.float32(OM))
    return style_params, x, Om, Dz, vf


class TestGolden:
    def test_style_disp(self, golden, setup):
        p, x, Om, Dz, vf = setup
        out = StyleNBodyEmulatorCore(**CFG).apply(p, x, Om, Dz)
        np.testing.assert_allclose(out, golden["style_disp"], rtol=RTOL, atol=ATOL)

    def test_style_vel(self, golden, setup):
        p, x, Om, Dz, vf = setup
        d, v = StyleNBodyEmulatorVelCore(**CFG).apply(p, x, Om, Dz, vf)
        np.testing.assert_allclose(d, golden["style_vel_d"], rtol=RTOL, atol=ATOL)
        scale = np.abs(golden["style_vel_v"]).max()
        np.testing.assert_allclose(
            np.asarray(v) / scale, golden["style_vel_v"] / scale, rtol=RTOL, atol=ATOL
        )

    def test_premod_disp(self, golden, setup):
        p, x, Om, Dz, vf = setup
        pm = modulate_emulator_parameters(p, Z, OM)
        out = NBodyEmulatorCore(**CFG).apply(pm, x, Dz)
        np.testing.assert_allclose(out, golden["premod_disp"], rtol=RTOL, atol=ATOL)

    def test_premod_vel(self, golden, setup):
        p, x, Om, Dz, vf = setup
        pmv = modulate_emulator_parameters_vel(p, Z, OM)
        d, v = NBodyEmulatorVelCore(**CFG).apply(pmv, x, Dz, vf)
        np.testing.assert_allclose(d, golden["premod_vel_d"], rtol=RTOL, atol=ATOL)
        scale = np.abs(golden["premod_vel_v"]).max()
        np.testing.assert_allclose(
            np.asarray(v) / scale, golden["premod_vel_v"] / scale, rtol=RTOL, atol=ATOL
        )

    def test_subbox_runtime(self, golden, setup):
        p, *_ = setup
        box = np.asarray(
            jax.random.normal(jax.random.key(SEED + 2), (3, 16, 16, 16), jnp.float32)
        )
        cfg = SubboxConfig(size=(16, 16, 16), ndiv=(2, 1, 1), dtype=jnp.float32,
                           padding=((12, 12),) * 3)
        out = SubboxProcessor(StyleNBodyEmulatorCore(**CFG), p, cfg).process_box(box, Z, OM)
        np.testing.assert_allclose(out, golden["subbox_disp"], rtol=RTOL, atol=ATOL)
