"""Factory / bundle API tests (reference test_nbody_emulator.py contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulator,
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
    SubboxConfig,
    create_emulator,
)
from jax_nbody_emulator_with_dj_tpu.utils.params import (
    convert_reference_params,
    convert_to_reference_params,
    load_params_npz,
    save_params_npz,
)

KEY = jax.random.key(11)
CFG = dict(levels=1, mid_chan=4)
PAD = ((12, 12),) * 3


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorCore(**CFG).init(KEY)


class TestFactory:
    @pytest.mark.parametrize(
        "premod,vel,cls",
        [
            (False, False, StyleNBodyEmulatorCore),
            (False, True, StyleNBodyEmulatorVelCore),
            (True, False, NBodyEmulatorCore),
            (True, True, NBodyEmulatorVelCore),
        ],
    )
    @pytest.mark.slow
    def test_model_selection(self, style_params, premod, vel, cls):
        em = create_emulator(
            premodulate=premod,
            compute_vel=vel,
            params=style_params,
            premodulate_z=0.5 if premod else None,
            premodulate_Om=0.3 if premod else None,
            **CFG,
        )
        assert isinstance(em.model, cls)
        assert em.premodulate == premod
        assert em.compute_vel == vel

    def test_premodulate_requires_cosmology(self, style_params):
        with pytest.raises(ValueError, match="premodulate_z"):
            create_emulator(premodulate=True, compute_vel=False, params=style_params, **CFG)

    def test_missing_default_params_raises(self):
        with pytest.raises(FileNotFoundError):
            create_emulator(load_params=True, **CFG)

    def test_no_params(self):
        em = create_emulator(load_params=False, compute_vel=False, **CFG)
        assert em.params is None
        with pytest.raises(ValueError, match="parameters"):
            em.apply(jnp.zeros((1, 3, 32, 32, 32)), 0.5, 0.3)

    def test_dtype_resolution(self, style_params):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        assert em.dtype == jnp.float32
        em = create_emulator(params=style_params, compute_vel=False, dtype=jnp.bfloat16, **CFG)
        assert em.dtype == jnp.bfloat16
        cfg = SubboxConfig(size=(32,) * 3, ndiv=(2,) * 3, padding=PAD, dtype=jnp.float16)
        em = create_emulator(params=style_params, compute_vel=False, processor_config=cfg, **CFG)
        assert em.dtype == jnp.float16


class TestBundle:
    @pytest.mark.slow
    def test_apply_style(self, style_params):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        x = jax.random.normal(KEY, (1, 3, 32, 32, 32))
        y = em.apply(x, z=0.5, Om=0.3)
        assert y.shape == (1, 3, 8, 8, 8)
        # __call__ alias
        y2 = em(x, 0.5, 0.3)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)

    @pytest.mark.slow
    def test_apply_vel_tuple(self, style_params):
        em = create_emulator(params=style_params, compute_vel=True, **CFG)
        x = jax.random.normal(KEY, (1, 3, 32, 32, 32))
        d, v = em.apply(x, z=0.5, Om=0.3)
        assert d.shape == v.shape == (1, 3, 8, 8, 8)

    @pytest.mark.slow
    def test_apply_premod_matches_style(self, style_params):
        x = jax.random.normal(KEY, (1, 3, 32, 32, 32))
        em_s = create_emulator(params=style_params, compute_vel=False, **CFG)
        em_p = create_emulator(
            params=style_params, compute_vel=False, premodulate=True,
            premodulate_z=0.5, premodulate_Om=0.3, **CFG,
        )
        y_s = em_s.apply(x, 0.5, 0.3)
        y_p = em_p.apply(x, 0.5, 0.3)
        np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_p), rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_process_box_integration(self, style_params):
        cfg = SubboxConfig(size=(32,) * 3, ndiv=(2,) * 3, padding=PAD)
        em = create_emulator(
            params=style_params, compute_vel=True, processor_config=cfg, **CFG
        )
        box = np.asarray(jax.random.normal(KEY, (3, 32, 32, 32)))
        d, v = em.process_box(box, z=0.5, Om=0.3)
        assert d.shape == v.shape == (3, 32, 32, 32)

    def test_process_box_without_processor_raises(self, style_params):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        with pytest.raises(ValueError, match="processor"):
            em.process_box(np.zeros((3, 32, 32, 32)), 0.5, 0.3)


class TestParamIO:
    def test_roundtrip_npz(self, style_params, tmp_path):
        path = tmp_path / "p.npz"
        save_params_npz(path, style_params)
        loaded = load_params_npz(path)
        for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(style_params), jax.tree.leaves_with_path(loaded)
        ):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_layout_conversion_roundtrip(self, style_params):
        ref = convert_to_reference_params(style_params)
        w_ref = ref["params"]["conv_l00"]["conv_0"]["weight"]
        assert w_ref.shape == (4, 3, 3, 3, 3)  # OIDHW
        back = convert_reference_params(ref)
        w = back["params"]["conv_l00"]["conv_0"]["weight"]
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(style_params["params"]["conv_l00"]["conv_0"]["weight"])
        )

    def test_factory_accepts_reference_layout(self, style_params):
        """OIDHW trees are converted automatically."""
        ref_layout = convert_to_reference_params(style_params)
        em_ref = create_emulator(params=ref_layout, compute_vel=False, **CFG)
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        x = jax.random.normal(KEY, (1, 3, 32, 32, 32))
        np.testing.assert_allclose(
            np.asarray(em_ref.apply(x, 0.5, 0.3)),
            np.asarray(em.apply(x, 0.5, 0.3)),
            rtol=1e-6,
        )
