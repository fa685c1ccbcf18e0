"""Block-level contract tests (reference: tests/test_blocks*.py, 131 tests).

Covers the sequence-string-driven composites at small shapes: shape algebra,
channel plans, cross-variant consistency (vel primal == plain; packed ==
unpacked; tangent linearity vs the fused-conv formulation), and resample
geometry.  Reference semantics: /root/reference/src/jax_nbody_emulator/
blocks.py:26-153 (sequence strings, skip-crop arithmetic, residual add).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.models.blocks import (
    _center_crop,
    _resnet_channel_plan,
    apply_resample_block,
    apply_resample_block_packed,
    apply_resample_block_vel,
    apply_resample_block_vel_packed,
    apply_resnet_block,
    apply_resnet_block_packed,
    apply_resnet_block_vel,
    apply_resnet_block_vel_packed,
    init_resample_block,
    init_resnet_block,
    pack_resample_params,
    pack_resnet_params,
)
from jax_nbody_emulator_with_dj_tpu.ops import s2d

KEY = jax.random.key(3)


def x5(c=6, n=12, key=KEY):
    return jax.random.normal(key, (1, n, n, n, c), jnp.float32)


class TestChannelPlan:
    def test_caca_plan(self):
        main_seq, num_conv, chans = _resnet_channel_plan("CACA", 6, 10)
        assert main_seq == "CAC"
        assert num_conv == 2
        assert chans == [(6, 10), (10, 10)]  # in -> mid=max(in,out) -> out

    def test_cac_plan(self):
        main_seq, num_conv, chans = _resnet_channel_plan("CAC", 8, 3)
        assert main_seq == "CAC"
        assert num_conv == 2
        assert chans == [(8, 8), (8, 3)]  # mid = max(in, out) = 8

    def test_single_conv(self):
        main_seq, num_conv, _ = _resnet_channel_plan("CA", 4, 4)
        assert num_conv == 1


class TestResNetShapes:
    @pytest.mark.parametrize("seq,shrink", [("CACA", 4), ("CAC", 4), ("CA", 2)])
    def test_valid_shrinkage(self, seq, shrink):
        p = init_resnet_block(KEY, seq, 6, 8, style=False, vel=False)
        y = apply_resnet_block(p, x5(), seq)
        assert y.shape == (1, 12 - shrink, 12 - shrink, 12 - shrink, 8)

    def test_residual_identity_zero_weights(self):
        """With zero conv/skip weights the output is the (cropped) bias."""
        p = init_resnet_block(KEY, "CAC", 6, 6, style=False, vel=False)
        p = jax.tree.map(jnp.zeros_like, p)
        y = apply_resnet_block(p, x5(), "CAC")
        np.testing.assert_array_equal(np.asarray(y), 0.0)

    def test_input_immutable(self):
        x = x5()
        before = np.asarray(x).copy()
        p = init_resnet_block(KEY, "CACA", 6, 6, style=False, vel=False)
        apply_resnet_block(p, x, "CACA")
        np.testing.assert_array_equal(np.asarray(x), before)

    def test_nan_free(self):
        p = init_resnet_block(KEY, "CACA", 6, 8, style=False, vel=False)
        y = apply_resnet_block(p, x5(), "CACA")
        assert np.isfinite(np.asarray(y)).all()

    def test_bad_op_raises(self):
        p = init_resnet_block(KEY, "CACA", 6, 6, style=False, vel=False)
        with pytest.raises(ValueError):
            apply_resnet_block(p, x5(), "CXCA")


class TestResampleShapes:
    def test_down_halves(self):
        p = init_resample_block(KEY, "DA", 6, 8, style=False, vel=False)
        y = apply_resample_block(p, x5(), "DA")
        assert y.shape == (1, 6, 6, 6, 8)

    def test_up_doubles(self):
        p = init_resample_block(KEY, "UA", 6, 8, style=False, vel=False)
        y = apply_resample_block(p, x5(), "UA")
        assert y.shape == (1, 24, 24, 24, 8)

    def test_down_then_up_restores_extent(self):
        pd = init_resample_block(KEY, "DA", 6, 6, style=False, vel=False)
        pu = init_resample_block(KEY, "UA", 6, 6, style=False, vel=False)
        y = apply_resample_block(pu, apply_resample_block(pd, x5(), "DA"), "UA")
        assert y.shape == x5().shape


class TestVelConsistency:
    """Premod-vel blocks: primal must equal the plain block; tangent obeys
    the product rule dy = op(x, dW) + op(dx, W) (linearity in dx)."""

    @pytest.mark.parametrize("seq", ["CACA", "CAC"])
    def test_primal_matches_plain(self, seq):
        pv = init_resnet_block(KEY, seq, 6, 8, style=False, vel=True)
        x = x5()
        dx = jax.random.normal(jax.random.key(9), x.shape, x.dtype)
        y, _ = apply_resnet_block_vel(pv, x, dx, seq)
        # plain block with the same weight/bias (ignores dweight)
        y_plain = apply_resnet_block(pv, x, seq)
        np.testing.assert_allclose(y, y_plain, rtol=1e-5, atol=1e-6)

    def test_tangent_affine_in_dx(self):
        """dy(dx) - dy(0) is linear in dx (activations freeze the masks)."""
        pv = init_resnet_block(KEY, "CAC", 6, 6, style=False, vel=True)
        x = x5()
        dx = jax.random.normal(jax.random.key(10), x.shape, x.dtype)
        _, dy0 = apply_resnet_block_vel(pv, x, jnp.zeros_like(dx), "CAC")
        _, dy1 = apply_resnet_block_vel(pv, x, dx, "CAC")
        _, dy2 = apply_resnet_block_vel(pv, x, 2.0 * dx, "CAC")
        np.testing.assert_allclose(
            np.asarray(dy2 - dy0), 2.0 * np.asarray(dy1 - dy0), rtol=1e-4, atol=1e-5
        )

    def test_first_layer_none_tangent_equals_zero_dx_seed(self):
        """dx=None seeds the tangent purely from dweight terms."""
        pv = init_resnet_block(KEY, "CACA", 6, 8, style=False, vel=True)
        x = x5()
        _, dy_none = apply_resnet_block_vel(pv, x, None, "CACA")
        _, dy_zero = apply_resnet_block_vel(pv, x, jnp.zeros_like(x), "CACA")
        np.testing.assert_allclose(dy_none, dy_zero, rtol=1e-5, atol=1e-6)

    def test_resample_vel_primal_matches_plain(self):
        for seq in ("DA", "UA"):
            pv = init_resample_block(KEY, seq, 6, 8, style=False, vel=True)
            x = x5()
            y, _ = apply_resample_block_vel(pv, x, jnp.zeros_like(x), seq)
            y_plain = apply_resample_block(pv, x, seq)
            np.testing.assert_allclose(y, y_plain, rtol=1e-5, atol=1e-6)


class TestPackedBlockEquivalence:
    """Packed forms are the same math on reshaped operands — exact up to
    fp reordering, for every block kind (incl. the groups=2 concat form)."""

    def test_resnet_packed(self):
        p = init_resnet_block(KEY, "CACA", 8, 8, style=False, vel=False)
        x = x5(8)
        ref = apply_resnet_block(p, x, "CACA")
        pp = pack_resnet_params(p, "CACA")
        y = s2d.unpack(apply_resnet_block_packed(pp, s2d.pack(x), "CACA"))
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    def test_resnet_packed_groups2(self):
        """Concat of two packed tensors == grouped-packed concat conv."""
        p = init_resnet_block(KEY, "CACA", 8, 4, style=False, vel=False)
        a = x5(4, key=jax.random.key(11))
        b = x5(4, key=jax.random.key(12))
        ref = apply_resnet_block(p, jnp.concatenate([a, b], -1), "CACA")
        pp = pack_resnet_params(p, "CACA", groups=2)
        xp = jnp.concatenate([s2d.pack(a), s2d.pack(b)], -1)
        y = s2d.unpack(apply_resnet_block_packed(pp, xp, "CACA"))
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("seq", ["DA", "UA"])
    def test_resample_packed(self, seq):
        p = init_resample_block(KEY, seq, 8, 8, style=False, vel=False)
        x = x5(8)
        ref = apply_resample_block(p, x, seq)
        pp = pack_resample_params(p, seq)
        y = s2d.unpack(apply_resample_block_packed(pp, s2d.pack(x), seq))
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    def test_resnet_vel_packed(self):
        pv = init_resnet_block(KEY, "CACA", 8, 8, style=False, vel=True)
        x = x5(8)
        dx = jax.random.normal(jax.random.key(13), x.shape, x.dtype)
        ry, rdy = apply_resnet_block_vel(pv, x, dx, "CACA")
        pp = pack_resnet_params(pv, "CACA", vel=True)
        y, dy = apply_resnet_block_vel_packed(pp, s2d.pack(x), s2d.pack(dx), "CACA")
        np.testing.assert_allclose(s2d.unpack(y), ry, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s2d.unpack(dy), rdy, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("seq", ["DA", "UA"])
    def test_resample_vel_packed(self, seq):
        pv = init_resample_block(KEY, seq, 8, 8, style=False, vel=True)
        x = x5(8)
        dx = jax.random.normal(jax.random.key(14), x.shape, x.dtype)
        ry, rdy = apply_resample_block_vel(pv, x, dx, seq)
        pp = pack_resample_params(pv, seq, vel=True)
        y, dy = apply_resample_block_vel_packed(pp, s2d.pack(x), s2d.pack(dx), seq)
        np.testing.assert_allclose(s2d.unpack(y), ry, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s2d.unpack(dy), rdy, rtol=1e-5, atol=1e-5)


class TestCenterCrop:
    def test_crop_is_centered(self):
        t = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1, 1, 1)
        t = jnp.broadcast_to(t, (1, 10, 10, 10, 2))
        c = _center_crop(t, (6, 6, 6))
        assert c.shape == (1, 6, 6, 6, 2)
        np.testing.assert_array_equal(np.asarray(c[0, :, 0, 0, 0]), np.arange(2, 8))

    def test_noop_crop(self):
        t = x5()
        c = _center_crop(t, t.shape[1:4])
        np.testing.assert_array_equal(np.asarray(c), np.asarray(t))


class TestSplitCatBlocks:
    """The implicit-concat decoder blocks must equal the explicit concat."""

    def test_packed_cat_matches_concat(self):
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            apply_resnet_block_packed,
            apply_resnet_block_packed_cat,
        )

        p = init_resnet_block(KEY, "CACA", 8, 4, style=False, vel=False)
        pp = pack_resnet_params(p, "CACA", groups=2)
        a = s2d.pack(x5(4, key=jax.random.key(20)))
        b = s2d.pack(x5(4, key=jax.random.key(21)))
        ref = apply_resnet_block_packed(pp, jnp.concatenate([a, b], -1), "CACA")
        y = apply_resnet_block_packed_cat(pp, (a, b), "CACA")
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    def test_packed_vel_cat_matches_concat(self):
        from jax_nbody_emulator_with_dj_tpu.models.blocks import (
            apply_resnet_block_vel_packed,
            apply_resnet_block_vel_packed_cat,
        )

        p = init_resnet_block(KEY, "CACA", 8, 4, style=False, vel=True)
        pp = pack_resnet_params(p, "CACA", groups=2, vel=True)
        a = s2d.pack(x5(4, key=jax.random.key(22)))
        b = s2d.pack(x5(4, key=jax.random.key(23)))
        da = s2d.pack(x5(4, key=jax.random.key(24)))
        db = s2d.pack(x5(4, key=jax.random.key(25)))
        ry, rdy = apply_resnet_block_vel_packed(
            pp, jnp.concatenate([a, b], -1), jnp.concatenate([da, db], -1), "CACA"
        )
        y, dy = apply_resnet_block_vel_packed_cat(pp, (a, b), (da, db), "CACA")
        np.testing.assert_allclose(y, ry, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(dy, rdy, rtol=1e-5, atol=1e-5)
