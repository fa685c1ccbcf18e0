"""Generic-U-Net and model-core contract suite.

The reference pins its four cores with ~129 tests across
``test_{style_,}nbody_emulator{_vel,}_core.py`` (shape contracts, param-tree
introspection, dtype paths, growth-factor response, architecture checks).
Here those contracts target the generic shape algebra (``models/unet.py``)
and the core dataclasses across ``levels`` — the engine's generalization the
reference hard-codes at levels=3 (crops 40/16/4,
``style_nbody_emulator_core.py:139-160``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)
from jax_nbody_emulator_with_dj_tpu.models.unet import (
    init_unet,
    input_margin,
    min_input_size,
    output_size,
    unet_block_plan,
    unet_forward,
    unet_forward_vel,
    valid_input_size,
)

KEY = jax.random.key(11)


# ---------------------------------------------------------------------------
# Shape algebra across levels
# ---------------------------------------------------------------------------


class TestShapeAlgebraGeneric:
    @pytest.mark.parametrize("levels", (1, 2, 3, 4))
    def test_margin_formula(self, levels):
        assert input_margin(levels) == 12 * 2 ** (levels - 1)

    @pytest.mark.parametrize("levels", (1, 2, 3))
    def test_output_equals_input_minus_twice_margin(self, levels):
        m = input_margin(levels)
        for n in range(min_input_size(levels), min_input_size(levels) + 65):
            if valid_input_size(n, levels):
                assert output_size(n, levels) == n - 2 * m

    def test_canonical_min_sizes(self):
        # levels=3: margin 48 -> smallest valid is 104 (output 8)
        assert min_input_size(1) == 32
        assert min_input_size(3) == 104
        assert output_size(104, 3) == 8

    def test_reference_canonical_128_to_32(self):
        assert output_size(128, 3) == 32

    @pytest.mark.parametrize("levels", (1, 2, 3))
    def test_valid_sizes_are_multiples_of_2_to_levels(self, levels):
        step = 2**levels
        valid = [
            n
            for n in range(min_input_size(levels), min_input_size(levels) + 129)
            if valid_input_size(n, levels)
        ]
        assert valid, "no valid sizes in sweep"
        assert all((n - valid[0]) % step == 0 for n in valid)

    def test_below_min_raises(self):
        with pytest.raises(ValueError):
            output_size(min_input_size(3) - 8, 3)

    def test_odd_down_size_raises(self):
        # n - 8 odd at down_l0
        with pytest.raises(ValueError):
            output_size(105, 3)


# ---------------------------------------------------------------------------
# Architecture introspection (reference param-tree structure classes)
# ---------------------------------------------------------------------------

REF_BLOCKS_L3 = {
    "conv_l00", "conv_l01", "down_l0",
    "conv_l1", "down_l1", "conv_l2", "down_l2",
    "conv_c",
    "up_r2", "conv_r2", "up_r1", "conv_r1",
    "up_r0", "conv_r00", "conv_r01",
}


class TestArchitectureIntrospection:
    def test_levels3_block_names_match_reference(self):
        plan = unet_block_plan(levels=3)
        assert {name for name, *_ in plan} == REF_BLOCKS_L3

    def test_decoder_blocks_take_concat_width(self):
        for name, btype, seq, cin, cout in unet_block_plan(levels=3, mid_chan=64):
            if name.startswith("conv_r") and name != "conv_r01":
                assert (cin, cout) == (128, 64), name

    def test_head_is_cac_to_out_chan(self):
        plan = {name: (btype, seq, cin, cout) for name, btype, seq, cin, cout in unet_block_plan(levels=3)}
        assert plan["conv_r01"] == ("resnet", "CAC", 64, 3)

    @pytest.mark.parametrize("levels", (1, 2, 4))
    def test_block_count_scales_with_levels(self, levels):
        # 3 entry + 2*(levels-1) encoder + conv_c + 2*(levels-1) decoder + 3 exit
        assert len(unet_block_plan(levels=levels)) == 7 + 4 * (levels - 1)

    def test_style_tree_has_style_weights_everywhere(self):
        p = init_unet(KEY, levels=1, mid_chan=4, style=True, vel=False)["params"]
        for block in p.values():
            for layer in block.values():
                assert "style_weight" in layer and "style_bias" in layer
                assert "dweight" not in layer

    def test_premod_vel_tree_has_dweights_everywhere(self):
        p = init_unet(KEY, levels=1, mid_chan=4, style=False, vel=True)["params"]
        for block in p.values():
            for layer in block.values():
                assert "dweight" in layer and "style_weight" not in layer

    def test_resnet_blocks_carry_skip_plus_convs(self):
        p = init_unet(KEY, levels=1, mid_chan=4, style=False, vel=False)["params"]
        assert set(p["conv_l00"]) == {"skip", "conv_0", "conv_1"}  # CACA
        assert set(p["conv_r01"]) == {"skip", "conv_0", "conv_1"}  # CAC
        assert set(p["down_l0"]) == {"conv_0"}
        assert set(p["up_r0"]) == {"conv_0"}

    def test_core_init_matches_init_unet(self):
        a = StyleNBodyEmulatorCore(levels=1, mid_chan=4).init(KEY)
        b = init_unet(KEY, levels=1, mid_chan=4, style=True, vel=False)
        assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Generic forward at levels != 3
# ---------------------------------------------------------------------------


class TestGenericForward:
    @pytest.mark.parametrize("levels", (1, 2))
    def test_forward_shape_contract(self, levels):
        n = min_input_size(levels)
        p = init_unet(KEY, levels=levels, mid_chan=4, style=False, vel=False)
        x = jax.random.normal(KEY, (1, 3, n, n, n))
        y = unet_forward(p, x, levels=levels)
        m = output_size(n, levels)
        assert y.shape == (1, 3, m, m, m)

    def test_io_format_equivalence(self):
        n = min_input_size(1)
        p = init_unet(KEY, levels=1, mid_chan=4, style=False, vel=False)
        x = jax.random.normal(KEY, (1, 3, n, n, n))
        y_cf = unet_forward(p, x, levels=1, io_fmt="NCDHW")
        y_cl = unet_forward(p, jnp.transpose(x, (0, 2, 3, 4, 1)), levels=1, io_fmt="NDHWC")
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(y_cl, (0, 4, 1, 2, 3))), np.asarray(y_cf),
            rtol=2e-5, atol=2e-5,
        )

    def test_vel_primal_matches_plain_forward(self):
        n = min_input_size(1)
        style = init_unet(KEY, levels=1, mid_chan=4, style=True, vel=False)
        folded = modulate_emulator_parameters_vel(style, z=0.5, Om=0.3175)
        x = jax.random.normal(KEY, (1, 3, n, n, n))
        h, dh = unet_forward_vel(folded, x, levels=1)
        h_plain = unet_forward({"params": folded["params"]}, x, levels=1)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_plain), rtol=1e-5, atol=1e-5)
        assert dh.shape == h.shape

    def test_anisotropic_input(self):
        p = init_unet(KEY, levels=1, mid_chan=4, style=False, vel=False)
        x = jax.random.normal(KEY, (1, 3, 32, 40, 48))
        y = unet_forward(p, x, levels=1)
        assert y.shape == (1, 3, 8, 16, 24)


# ---------------------------------------------------------------------------
# Core-level contracts at levels=2 (the generic depth the reference lacks)
# ---------------------------------------------------------------------------


class TestCoresGenericDepth:
    N2 = 56  # min valid input for levels=2 (margin 24 -> 8^3 output)

    @pytest.fixture(scope="class")
    def style_params2(self):
        return StyleNBodyEmulatorVelCore(levels=2, mid_chan=4).init(KEY)

    @pytest.fixture(scope="class")
    def x2(self):
        n = self.N2
        return jax.random.normal(jax.random.key(5), (1, 3, n, n, n))

    def test_min_size_is_56(self):
        assert min_input_size(2) == self.N2

    def test_style_disp_levels2(self, style_params2, x2):
        m = StyleNBodyEmulatorCore(levels=2, mid_chan=4)
        y = m.apply(style_params2, x2, 0.3175, 0.8)
        assert y.shape == (1, 3, 8, 8, 8)
        assert bool(jnp.isfinite(y).all())

    def test_style_vel_levels2(self, style_params2, x2):
        m = StyleNBodyEmulatorVelCore(levels=2, mid_chan=4)
        disp, vel = m.apply(style_params2, x2, 0.3175, 0.8, 1.0)
        assert disp.shape == vel.shape == (1, 3, 8, 8, 8)
        assert bool(jnp.isfinite(vel).all())

    def test_premod_matches_style_levels2(self, style_params2, x2):
        folded = modulate_emulator_parameters(style_params2, z=0.5, Om=0.3175)
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor

        Dz = growth_factor(0.5, 0.3175)
        y_style = StyleNBodyEmulatorCore(levels=2, mid_chan=4).apply(
            style_params2, x2, 0.3175, Dz
        )
        y_premod = NBodyEmulatorCore(levels=2, mid_chan=4).apply(folded, x2, Dz)
        np.testing.assert_allclose(np.asarray(y_premod), np.asarray(y_style), rtol=2e-4, atol=2e-4)

    def test_premod_vel_matches_style_vel_levels2(self, style_params2, x2):
        folded = modulate_emulator_parameters_vel(style_params2, z=0.5, Om=0.3175)
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

        Dz = growth_factor(0.5, 0.3175)
        vf = vel_norm(0.5, 0.3175)
        d_s, v_s = StyleNBodyEmulatorVelCore(levels=2, mid_chan=4).apply(
            style_params2, x2, 0.3175, Dz, vf
        )
        d_p, v_p = NBodyEmulatorVelCore(levels=2, mid_chan=4).apply(folded, x2, Dz, vf)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_s), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_s), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Core dtype / input-hygiene contracts
# ---------------------------------------------------------------------------


class TestCoreInputHygiene:
    N = 32

    @pytest.fixture(scope="class")
    def style_params(self):
        return StyleNBodyEmulatorVelCore(levels=1, mid_chan=4).init(KEY)

    @pytest.fixture(scope="class")
    def x(self):
        return jax.random.normal(jax.random.key(5), (1, 3, self.N, self.N, self.N))

    def test_output_dtype_follows_input(self, style_params, x):
        m = StyleNBodyEmulatorCore(levels=1, mid_chan=4)
        assert m.apply(style_params, x.astype(jnp.bfloat16), 0.3175, 0.8).dtype == jnp.bfloat16
        assert m.apply(style_params, x, 0.3175, 0.8).dtype == jnp.float32

    def test_integer_dz_does_not_crash_style_vel(self, style_params, x):
        # jax.jvp needs a floating tangent; the core casts integral Dz.
        m = StyleNBodyEmulatorVelCore(levels=1, mid_chan=4)
        disp, vel = m.apply(style_params, x, 0.3175, 1, 1.0)
        assert bool(jnp.isfinite(vel).all())

    def test_input_not_mutated(self, style_params, x):
        m = StyleNBodyEmulatorCore(levels=1, mid_chan=4)
        before = np.asarray(x).copy()
        m.apply(style_params, x, 0.3175, 0.8)
        np.testing.assert_array_equal(np.asarray(x), before)

    def test_deterministic(self, style_params, x):
        m = StyleNBodyEmulatorCore(levels=1, mid_chan=4)
        y1 = np.asarray(m.apply(style_params, x, 0.3175, 0.8))
        y2 = np.asarray(m.apply(style_params, x, 0.3175, 0.8))
        np.testing.assert_array_equal(y1, y2)

    @pytest.mark.parametrize("om,z", [(0.1, 0.0), (0.5, 0.0), (0.3175, 3.0), (0.1, 3.0)])
    def test_extreme_cosmology_finite(self, style_params, x, om, z):
        from jax_nbody_emulator_with_dj_tpu.cosmology import growth_factor, vel_norm

        Dz = growth_factor(z, om)
        m = StyleNBodyEmulatorVelCore(levels=1, mid_chan=4)
        disp, vel = m.apply(style_params, x, om, Dz, vel_norm(z, om))
        assert bool(jnp.isfinite(disp).all()) and bool(jnp.isfinite(vel).all())
