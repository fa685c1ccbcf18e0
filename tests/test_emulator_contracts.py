"""Factory / bundle / premodulation contracts (reference test_nbody_emulator.py).

Ports the reference's contract classes that ``test_emulator.py`` does not
already pin: bundle defaults, scalar-vs-array cosmology arguments,
cosmology sensitivity, modulate-parameters tree contracts (structure
preservation, style-key removal, first-layer rule), packaged-parameter
loading through the env-var path, processor dispatch, jit/vmap
compatibility, and cosmology edge cases.

Reference: ``/root/reference/tests/test_nbody_emulator.py`` (52 tests;
class list at :34-981).
"""

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
    SubboxProcessor,
    create_emulator,
)
from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor
from jax_nbody_emulator_with_dj_tpu.emulator import (
    load_default_parameters,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.models.unet import min_input_size, output_size
from jax_nbody_emulator_with_dj_tpu.ops.style import premodulate_layer, style_vector
from jax_nbody_emulator_with_dj_tpu.utils.params import (
    convert_to_reference_params,
    save_params_npz,
)

KEY = jax.random.key(23)
CFG = dict(levels=1, mid_chan=4)
N = 32  # levels=1: 32^3 in -> 8^3 out


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorCore(**CFG).init(KEY)


@pytest.fixture(scope="module")
def style_vel_params():
    # Same tree structure as style_params (vel adds no parameters).
    return StyleNBodyEmulatorVelCore(**CFG).init(KEY)


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.key(7), (1, 3, N, N, N), jnp.float32)


def _styled_layers(params):
    """(block, layer) pairs carrying style parameters."""
    return [
        (bn, ln)
        for bn, block in params["params"].items()
        for ln, layer in block.items()
        if "style_weight" in layer
    ]


class TestBundleDefaults:
    """Reference :57-81 — dataclass attributes and defaults."""

    def test_defaults(self, style_params):
        em = NBodyEmulator(model=None, params=style_params, processor=None)
        assert em.premodulate is False
        assert em.compute_vel is True
        assert em.dtype == jnp.float32

    def test_factory_populates_attributes(self, style_params):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        assert isinstance(em.model, StyleNBodyEmulatorCore)
        assert em.params is style_params
        assert em.processor is None
        assert em.premodulate is False
        assert em.compute_vel is False

    def test_factory_model_flags_all_variants(self, style_params):
        # Model-selection matrix without running a forward pass
        # (reference :318-377; the forward-pass version is the slow-tier
        # test in test_emulator.py).
        for premod, vel, cls in [
            (False, False, StyleNBodyEmulatorCore),
            (False, True, StyleNBodyEmulatorVelCore),
            (True, False, NBodyEmulatorCore),
            (True, True, NBodyEmulatorVelCore),
        ]:
            em = create_emulator(
                premodulate=premod,
                compute_vel=vel,
                params=style_params,
                premodulate_z=0.5 if premod else None,
                premodulate_Om=0.3 if premod else None,
                **CFG,
            )
            assert isinstance(em.model, cls)


class TestApplyContract:
    """Reference :166-227, :842-862 — apply semantics."""

    def test_scalar_and_array_cosmology_agree(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        y_scalar = em.apply(x, 0.5, 0.3)
        y_array = em.apply(x, jnp.array([0.5]), jnp.array([0.3]))
        np.testing.assert_array_equal(np.asarray(y_scalar), np.asarray(y_array))

    def test_different_redshifts_differ(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        y0 = np.asarray(em.apply(x, 0.0, 0.3))
        y1 = np.asarray(em.apply(x, 2.0, 0.3))
        assert not np.allclose(y0, y1)

    def test_different_cosmologies_differ(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        y0 = np.asarray(em.apply(x, 0.5, 0.25))
        y1 = np.asarray(em.apply(x, 0.5, 0.40))
        assert not np.allclose(y0, y1)

    def test_deterministic(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        a = np.asarray(em.apply(x, 0.5, 0.3))
        b = np.asarray(em.apply(x, 0.5, 0.3))
        np.testing.assert_array_equal(a, b)

    def test_batch_matches_single(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        xb = jnp.concatenate([x, 2.0 * x], axis=0)
        yb = np.asarray(em.apply(xb, 0.5, 0.3))
        y0 = np.asarray(em.apply(x, 0.5, 0.3))
        y1 = np.asarray(em.apply(2.0 * x, 0.5, 0.3))
        np.testing.assert_allclose(yb[0:1], y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(yb[1:2], y1, rtol=1e-5, atol=1e-6)

    def test_vel_tuple_shapes_and_distinct(self, style_vel_params, x):
        em = create_emulator(params=style_vel_params, compute_vel=True, **CFG)
        d, v = em.apply(x, 0.5, 0.3)
        assert d.shape == v.shape == (1, 3, 8, 8, 8)
        assert not np.allclose(np.asarray(d), np.asarray(v))


class TestJAXCompatibility:
    """Reference :866-922 — jit and vmap through the model."""

    def test_jit_apply(self, style_params, x):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        jitted = jax.jit(lambda xx: em.apply(xx, 0.5, 0.3))
        np.testing.assert_allclose(
            np.asarray(jitted(x)),
            np.asarray(em.apply(x, 0.5, 0.3)),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_vmap_over_batch(self, style_params, x):
        model = StyleNBodyEmulatorCore(**CFG)
        xb = jnp.concatenate([x, 0.5 * x], axis=0)  # (2, 3, N, N, N)
        Dz = growth_factor(jnp.array([0.5]), jnp.array([0.3]))
        vmapped = jax.vmap(
            lambda xi: model.apply(style_params, xi[None], jnp.array([0.3]), Dz)[0]
        )
        yv = np.asarray(vmapped(xb))
        yd = np.asarray(model.apply(style_params, xb, jnp.array([0.3]), Dz))
        np.testing.assert_allclose(yv, yd, rtol=1e-5, atol=1e-6)


class TestEdgeCases:
    """Reference :925-981 — cosmology and size extremes."""

    @pytest.mark.parametrize("z,Om", [(10.0, 0.3), (0.0, 0.1), (0.0, 0.5), (3.0, 0.5)])
    def test_extreme_cosmology_finite(self, style_params, x, z, Om):
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        y = np.asarray(em.apply(x, z, Om))
        assert np.all(np.isfinite(y))

    def test_minimum_valid_input(self, style_params):
        n_min = min_input_size(CFG["levels"])
        em = create_emulator(params=style_params, compute_vel=False, **CFG)
        x_min = jax.random.normal(KEY, (1, 3, n_min, n_min, n_min))
        y = em.apply(x_min, 0.5, 0.3)
        n_out = output_size(n_min, CFG["levels"])
        assert y.shape == (1, 3, n_out, n_out, n_out)
        assert np.all(np.isfinite(np.asarray(y)))


class TestModulateEmulatorParameters:
    """Reference :667-720 — tree contracts of the disp-only fold."""

    def test_returns_params_dict(self, style_params):
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        assert isinstance(folded, dict) and "params" in folded

    def test_preserves_structure(self, style_params):
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        assert set(folded["params"]) == set(style_params["params"])
        for bn, block in style_params["params"].items():
            assert set(folded["params"][bn]) == set(block)

    def test_removes_style_keys(self, style_params):
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        for block in folded["params"].values():
            for layer in block.values():
                assert "style_weight" not in layer
                assert "style_bias" not in layer

    def test_preserves_bias_and_unstyled_layers(self, style_params):
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        for bn, block in style_params["params"].items():
            for ln, layer in block.items():
                if "bias" in layer:
                    np.testing.assert_array_equal(
                        np.asarray(folded["params"][bn][ln]["bias"]),
                        np.asarray(layer["bias"]),
                    )
                if "style_weight" not in layer:
                    jax.tree.map(
                        lambda a, b: np.testing.assert_array_equal(
                            np.asarray(a), np.asarray(b)
                        ),
                        folded["params"][bn][ln],
                        layer,
                    )

    def test_different_cosmology_different_weights(self, style_params):
        f0 = modulate_emulator_parameters(style_params, 0.0, 0.3175)
        f1 = modulate_emulator_parameters(style_params, 1.0, 0.28)
        bn, ln = _styled_layers(style_params)[0]
        assert not np.allclose(
            np.asarray(f0["params"][bn][ln]["weight"]),
            np.asarray(f1["params"][bn][ln]["weight"]),
        )

    def test_weight_shape_preserved(self, style_params):
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        for bn, ln in _styled_layers(style_params):
            assert (
                folded["params"][bn][ln]["weight"].shape
                == style_params["params"][bn][ln]["weight"].shape
            )


class TestModulateEmulatorParametersVel:
    """Reference :723-771 — dweight contracts of the velocity fold."""

    def test_dweight_exactly_for_styled_layers(self, style_vel_params):
        folded = modulate_emulator_parameters_vel(style_vel_params, 0.5, 0.3)
        styled = set(_styled_layers(style_vel_params))
        for bn, block in folded["params"].items():
            for ln, layer in block.items():
                assert ("dweight" in layer) == ((bn, ln) in styled)

    def test_dweight_shape_matches_weight(self, style_vel_params):
        folded = modulate_emulator_parameters_vel(style_vel_params, 0.5, 0.3)
        for bn, ln in _styled_layers(style_vel_params):
            layer = folded["params"][bn][ln]
            assert layer["dweight"].shape == layer["weight"].shape

    def test_first_layer_rule_applies_to_conv_l00_only(self, style_vel_params):
        """conv_l00.{conv_0, skip} see the raw Dz-linear input and get the
        +weight/Dz tangent term; every other layer must not.

        Reference ``nbody_emulator.py:242-246``.
        """
        z, Om = 0.5, 0.3
        Dz = growth_factor(z, Om)
        s = style_vector(Om, Dz)[0]
        folded = modulate_emulator_parameters_vel(style_vel_params, z, Om)
        for bn, ln in _styled_layers(style_vel_params):
            first = bn == "conv_l00" and ln in ("conv_0", "skip")
            expect = premodulate_layer(
                style_vel_params["params"][bn][ln], s, vel=True, first_layer=first
            )
            np.testing.assert_allclose(
                np.asarray(folded["params"][bn][ln]["dweight"]),
                np.asarray(expect["dweight"]),
                rtol=1e-6,
                atol=1e-8,
            )
            # The wrong first-layer flag must NOT reproduce it: the rule
            # shifts the tangent by weight/Dz, which is never ~0.
            wrong = premodulate_layer(
                style_vel_params["params"][bn][ln], s, vel=True, first_layer=not first
            )
            assert not np.allclose(
                np.asarray(folded["params"][bn][ln]["dweight"]),
                np.asarray(wrong["dweight"]),
            )

    def test_vel_weight_matches_disp_fold(self, style_vel_params):
        """The primal weight of the vel fold equals the disp-only fold."""
        fv = modulate_emulator_parameters_vel(style_vel_params, 0.5, 0.3)
        fd = modulate_emulator_parameters(style_vel_params, 0.5, 0.3)
        for bn, ln in _styled_layers(style_vel_params):
            np.testing.assert_array_equal(
                np.asarray(fv["params"][bn][ln]["weight"]),
                np.asarray(fd["params"][bn][ln]["weight"]),
            )


class TestPackagedParameterLoading:
    """Reference :535-567 — load_default_parameters, via the env-var path."""

    def test_env_var_roundtrip(self, style_params, tmp_path, monkeypatch):
        path = tmp_path / "params.npz"
        save_params_npz(path, style_params)
        monkeypatch.setenv("JAX_NBODY_EMULATOR_PARAMS", str(path))
        loaded = load_default_parameters()
        for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(style_params),
            jax.tree.leaves_with_path(loaded),
        ):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_env_var_reference_layout_autoconverts(
        self, style_params, tmp_path, monkeypatch
    ):
        path = tmp_path / "ref_layout.npz"
        save_params_npz(path, convert_to_reference_params(style_params))
        monkeypatch.setenv("JAX_NBODY_EMULATOR_PARAMS", str(path))
        loaded = load_default_parameters()
        w = loaded["params"]["conv_l00"]["conv_0"]["weight"]
        assert w.shape == style_params["params"]["conv_l00"]["conv_0"]["weight"].shape
        np.testing.assert_array_equal(
            np.asarray(w),
            np.asarray(style_params["params"]["conv_l00"]["conv_0"]["weight"]),
        )

    def test_factory_uses_env_var(self, style_params, x, tmp_path, monkeypatch):
        path = tmp_path / "params.npz"
        save_params_npz(path, style_params)
        monkeypatch.setenv("JAX_NBODY_EMULATOR_PARAMS", str(path))
        em = create_emulator(load_params=True, compute_vel=False, **CFG)
        np.testing.assert_allclose(
            np.asarray(em.apply(x, 0.5, 0.3)),
            np.asarray(
                create_emulator(
                    params=style_params, compute_vel=False, **CFG
                ).apply(x, 0.5, 0.3)
            ),
            rtol=1e-6,
        )


class TestCreateEmulatorDispatch:
    """Reference :378-475 — validation and processor construction."""

    def test_premodulate_requires_each_of_z_and_om(self, style_params):
        with pytest.raises(ValueError, match="premodulate"):
            create_emulator(
                premodulate=True, compute_vel=False, params=style_params,
                premodulate_Om=0.3, **CFG,
            )
        with pytest.raises(ValueError, match="premodulate"):
            create_emulator(
                premodulate=True, compute_vel=False, params=style_params,
                premodulate_z=0.5, **CFG,
            )

    def test_already_folded_tree_needs_no_cosmology(self, style_params, x):
        """premodulate=True with a style-free tree skips the fold."""
        folded = modulate_emulator_parameters(style_params, 0.5, 0.3)
        em = create_emulator(
            premodulate=True, compute_vel=False, params=folded, **CFG
        )
        em_ref = create_emulator(
            premodulate=True, compute_vel=False, params=style_params,
            premodulate_z=0.5, premodulate_Om=0.3, **CFG,
        )
        np.testing.assert_allclose(
            np.asarray(em.apply(x, 0.5, 0.3)),
            np.asarray(em_ref.apply(x, 0.5, 0.3)),
            rtol=1e-6,
        )

    def test_subbox_processor_dispatch(self, style_params):
        cfg = SubboxConfig(size=(N,) * 3, ndiv=(2,) * 3, padding=((12, 12),) * 3)
        em = create_emulator(
            params=style_params, compute_vel=False, processor_config=cfg, **CFG
        )
        assert isinstance(em.processor, SubboxProcessor)
        assert em.processor.config is cfg

    def test_hierarchical_processor_dispatch(self):
        # The hierarchical runtime hard-codes the levels=3 topology.
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalConfig,
            HierarchicalProcessor,
        )

        params = StyleNBodyEmulatorCore(mid_chan=4).init(KEY)
        cfg = HierarchicalConfig(
            size=(16,) * 3, slab=8, tile=(8, 8, 8), dtype=jnp.float32
        )
        em = create_emulator(
            params=params, compute_vel=False, processor_config=cfg, mid_chan=4
        )
        assert isinstance(em.processor, HierarchicalProcessor)

    def test_chunked_processor_dispatch(self):
        from jax_nbody_emulator_with_dj_tpu.chunked import (
            ChunkedHierarchicalConfig,
            ChunkedHierarchicalProcessor,
        )

        params = StyleNBodyEmulatorCore(mid_chan=4).init(KEY)
        cfg = ChunkedHierarchicalConfig(
            size=(128,) * 3, chunks=(2, 1, 1), pad=48, slab=8, tile=(8, 8, 8),
            dtype=jnp.float32,
        )
        em = create_emulator(
            params=params, compute_vel=False, processor_config=cfg, mid_chan=4
        )
        assert isinstance(em.processor, ChunkedHierarchicalProcessor)

    def test_unknown_processor_config_raises(self, style_params):
        with pytest.raises(TypeError, match="processor_config"):
            create_emulator(
                params=style_params, compute_vel=False, processor_config=42, **CFG
            )

    def test_custom_channels(self):
        em = create_emulator(
            load_params=False, compute_vel=False, levels=1, mid_chan=8
        )
        params = em.model.init(KEY)
        assert params["params"]["conv_l00"]["conv_0"]["weight"].shape[-1] == 8


class TestBundleProcessBoxRuntimes:
    """NBodyEmulator.process_box must work with every processor_config kind
    (the reference bundle only ever wraps SubboxProcessor; here the bundle
    dispatches three runtimes and must filter subbox-only kwargs)."""

    @pytest.mark.slow
    def test_hierarchical_end_to_end_with_progress_kwargs(self):
        from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig

        n = 16
        params = StyleNBodyEmulatorCore(mid_chan=4).init(KEY)
        cfg = HierarchicalConfig(
            size=(n,) * 3, slab=8, tile=(8, 8, 8), dtype=jnp.float32,
            output_dtype=np.float32,
        )
        em = create_emulator(
            params=params, compute_vel=False, processor_config=cfg, mid_chan=4
        )
        box = np.asarray(jax.random.normal(KEY, (3, n, n, n), jnp.float32))
        # desc/show_progress are subbox-only kwargs; the bundle must accept
        # and drop them for the hierarchical runtime.
        out = em.process_box(box, 0.5, 0.3, desc="ignored", show_progress=False)
        assert out.shape == (3, n, n, n)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

        # Equivalence with the subbox runtime through the same bundle API.
        cfg_sb = SubboxConfig(size=(n,) * 3, ndiv=(2,) * 3, dtype=jnp.float32)
        em_sb = create_emulator(
            params=params, compute_vel=False, processor_config=cfg_sb, mid_chan=4
        )
        ref = em_sb.process_box(box, 0.5, 0.3, show_progress=False)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_chunked_end_to_end(self):
        from jax_nbody_emulator_with_dj_tpu.chunked import (
            ChunkedHierarchicalConfig,
        )

        n = 128
        params = StyleNBodyEmulatorCore(mid_chan=4).init(KEY)
        cfg = ChunkedHierarchicalConfig(
            size=(n,) * 3, chunks=(2, 1, 1), pad=48, slab=16, tile=(16, 16, 16),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        em = create_emulator(
            params=params, compute_vel=False, processor_config=cfg, mid_chan=4
        )
        box = np.asarray(jax.random.normal(KEY, (3, n, n, n), jnp.float32))
        out = em.process_box(box, 0.5, 0.3)
        assert out.shape == (3, n, n, n)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))
