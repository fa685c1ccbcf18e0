"""Numerical parity against the reference implementation.

These tests import the reference package (read-only mount at
/root/reference/src), initialize its Flax models with random weights,
convert the parameter tree into this framework's channels-last layout, and
assert that outputs agree to fp32 tolerance on the canonical 3-level
architecture.  They are skipped automatically when the reference checkout is
not present (e.g. in a deployment environment).

This is the strongest correctness gate in the suite: it pins the exact
modulation-demodulation math, the first-layer tangent rule, the premodulation
fold, the velocity head, and the U-Net crop schedule to the reference's
behavior.
"""

import os
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
ref_available = os.path.isdir(os.path.join(REF_SRC, "jax_nbody_emulator"))

pytestmark = [
    pytest.mark.skipif(not ref_available, reason="reference checkout not available"),
    pytest.mark.slow,  # imports + runs the reference models (minutes on CPU)
]

if ref_available:
    sys.path.insert(0, REF_SRC)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jax_nbody_emulator_with_dj_tpu.models import (  # noqa: E402
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from jax_nbody_emulator_with_dj_tpu.emulator import (  # noqa: E402
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.utils.params import (  # noqa: E402
    convert_reference_params,
    convert_to_reference_params,
)

KEY = jax.random.key(123)
MID = 4  # small channel count keeps the canonical 3-level net CPU-affordable
N = 104  # minimum valid input for the 3-level architecture


def _unfreeze(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    return tree


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(KEY, (1, 3, N, N, N), jnp.float32)


@pytest.fixture(scope="module")
def ref_style_params(x):
    from jax_nbody_emulator.style_nbody_emulator_core import (
        StyleNBodyEmulatorCore as RefStyle,
    )

    model = RefStyle(mid_chan=MID)
    params = model.init(KEY, x, jnp.array([0.3]), jnp.array([0.8]))
    return _unfreeze(params)


@pytest.fixture(scope="module")
def our_params(ref_style_params):
    return convert_reference_params(ref_style_params)


class TestStyleParity:
    def test_param_tree_structure_matches(self, ref_style_params, our_params):
        ours = StyleNBodyEmulatorCore(mid_chan=MID).init(KEY)
        ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(ref_style_params)}
        our_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree.leaves_with_path(ours)}
        assert ref_paths == our_paths

    def test_disp_matches_reference(self, x, ref_style_params, our_params):
        from jax_nbody_emulator.style_nbody_emulator_core import (
            StyleNBodyEmulatorCore as RefStyle,
        )

        om, dz = jnp.array([0.32]), jnp.array([0.85])
        y_ref = RefStyle(mid_chan=MID).apply(ref_style_params, x, om, dz)
        y = StyleNBodyEmulatorCore(mid_chan=MID).apply(our_params, x, om, dz)
        assert y.shape == y_ref.shape == (1, 3, 8, 8, 8)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=2e-4
        )

    def test_vel_matches_reference(self, x, ref_style_params, our_params):
        from jax_nbody_emulator.style_nbody_emulator_vel_core import (
            StyleNBodyEmulatorVelCore as RefStyleVel,
        )

        om, dz, vf = jnp.array([0.32]), jnp.array([0.85]), jnp.array([47.0])
        d_ref, v_ref = RefStyleVel(mid_chan=MID).apply(ref_style_params, x, om, dz, vf)
        d, v = StyleNBodyEmulatorVelCore(mid_chan=MID).apply(our_params, x, om, dz, vf)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=2e-3, atol=2e-4)
        scale = np.abs(np.asarray(v_ref)).max()
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(v_ref) / scale, rtol=5e-3, atol=5e-4
        )


class TestPremodulationParity:
    def test_folded_weights_match_reference(self, ref_style_params, our_params):
        from jax_nbody_emulator.nbody_emulator import (
            modulate_emulator_parameters as ref_fold,
        )

        z, om = 0.5, 0.3175
        ref_folded = _unfreeze(ref_fold(ref_style_params, z, om))
        our_folded = modulate_emulator_parameters(our_params, z, om)
        ours_in_ref_layout = convert_to_reference_params(our_folded)
        for block in ref_folded["params"]:
            for layer in ref_folded["params"][block]:
                w_ref = np.asarray(ref_folded["params"][block][layer]["weight"])
                w_our = np.asarray(ours_in_ref_layout["params"][block][layer]["weight"])
                np.testing.assert_allclose(
                    w_our, w_ref, rtol=1e-4, atol=1e-6,
                    err_msg=f"{block}/{layer}",
                )

    def test_folded_dweights_match_reference(self, ref_style_params, our_params):
        from jax_nbody_emulator.nbody_emulator import (
            modulate_emulator_parameters_vel as ref_fold_vel,
        )

        z, om = 0.5, 0.3175
        ref_folded = _unfreeze(ref_fold_vel(ref_style_params, z, om))
        our_folded = modulate_emulator_parameters_vel(our_params, z, om)
        ours_in_ref_layout = convert_to_reference_params(our_folded)
        for block in ref_folded["params"]:
            for layer in ref_folded["params"][block]:
                dw_ref = np.asarray(ref_folded["params"][block][layer]["dweight"])
                dw_our = np.asarray(ours_in_ref_layout["params"][block][layer]["dweight"])
                np.testing.assert_allclose(
                    dw_our, dw_ref, rtol=2e-4, atol=1e-6,
                    err_msg=f"{block}/{layer}",
                )

    def test_premod_disp_matches_reference(self, x, ref_style_params, our_params):
        from jax_nbody_emulator.nbody_emulator import (
            modulate_emulator_parameters as ref_fold,
        )
        from jax_nbody_emulator.nbody_emulator_core import (
            NBodyEmulatorCore as RefCore,
        )
        from jax_nbody_emulator.cosmology import growth_factor as ref_growth

        z, om = 0.5, 0.3175
        dz = jnp.atleast_1d(ref_growth(z, om))
        ref_folded = ref_fold(ref_style_params, z, om)
        y_ref = RefCore(mid_chan=MID).apply(ref_folded, x, dz)
        our_folded = modulate_emulator_parameters(our_params, z, om)
        y = NBodyEmulatorCore(mid_chan=MID).apply(our_folded, x, dz)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=2e-4)

    def test_premod_vel_matches_reference(self, x, ref_style_params, our_params):
        from jax_nbody_emulator.nbody_emulator import (
            modulate_emulator_parameters_vel as ref_fold_vel,
        )
        from jax_nbody_emulator.nbody_emulator_vel_core import (
            NBodyEmulatorVelCore as RefVelCore,
        )
        from jax_nbody_emulator.cosmology import growth_factor as ref_growth
        from jax_nbody_emulator.cosmology import vel_norm as ref_vel_norm

        z, om = 0.5, 0.3175
        dz = jnp.atleast_1d(ref_growth(z, om))
        vf = jnp.atleast_1d(ref_vel_norm(z, om))
        ref_folded = ref_fold_vel(ref_style_params, z, om)
        d_ref, v_ref = RefVelCore(mid_chan=MID).apply(ref_folded, x, dz, vf)
        our_folded = modulate_emulator_parameters_vel(our_params, z, om)
        d, v = NBodyEmulatorVelCore(mid_chan=MID).apply(our_folded, x, dz, vf)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=2e-3, atol=2e-4)
        scale = np.abs(np.asarray(v_ref)).max()
        np.testing.assert_allclose(
            np.asarray(v) / scale, np.asarray(v_ref) / scale, rtol=5e-3, atol=5e-4
        )


class TestCosmologyParity:
    def test_growth_and_norms_match(self):
        from jax_nbody_emulator import cosmology as ref_cosmo
        from jax_nbody_emulator_with_dj_tpu import cosmology as our_cosmo

        z = jnp.array([0.0, 0.5, 1.0, 2.0, 5.0])
        om = jnp.full_like(z, 0.3175)
        for name in ("growth_factor", "hubble_rate", "growth_rate", "vel_norm", "acc_norm", "dlogH_dloga"):
            a = np.asarray(getattr(ref_cosmo, name)(z, om))
            b = np.asarray(getattr(our_cosmo, name)(z, om))
            np.testing.assert_allclose(b, a, rtol=1e-4, err_msg=name)
