"""Strip-streamed Pallas conv kernel: exactness vs the XLA packed conv.

Runs in Pallas interpreter mode on CPU (the TPU-compiled path is exercised
by ``scripts/experiments/microbench_stripe.py`` on real hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.ops import s2d
from jax_nbody_emulator_with_dj_tpu.ops.stripe_conv import conv3_packed_stripe


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


class TestStripeConv:
    def test_exact_vs_xla_single_part(self):
        x = _rand(0, (1, 10, 18, 16, 128))
        w = _rand(1, (3, 3, 3, 64, 64)) * 0.05
        wp = s2d.pack_w3(w)
        ref = s2d.conv3_packed(x, wp)
        got = conv3_packed_stripe(x, wp, None, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_bias_and_leaky_fused(self):
        x = _rand(2, (1, 8, 12, 16, 128))
        w = _rand(3, (3, 3, 3, 64, 64)) * 0.05
        bias = _rand(4, (64,))
        wp = s2d.pack_w3(w)
        bp = s2d.pack_bias(bias)
        ref = jax.nn.leaky_relu(
            s2d.conv3_packed(x, wp) + bp.astype(x.dtype), 0.01
        )
        got = conv3_packed_stripe(x, wp, bp, leaky=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_multi_part_concat_equivalence(self):
        """Two input parts == conv of their channel concat (groups weight)."""
        a = _rand(5, (1, 8, 12, 16, 128))
        b = _rand(6, (1, 8, 12, 16, 128))
        w = _rand(7, (3, 3, 3, 128, 64)) * 0.05
        wp = s2d.pack_w3(w, groups=2)
        ref = s2d.conv3_packed(jnp.concatenate([a, b], -1), wp)
        got = conv3_packed_stripe((a, b), wp, None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_unaligned_w_padding(self):
        """WP not a multiple of 8 exercises the pad path."""
        x = _rand(8, (1, 8, 11, 13, 128))
        w = _rand(9, (3, 3, 3, 64, 64)) * 0.05
        wp = s2d.pack_w3(w)
        ref = s2d.conv3_packed(x, wp)
        got = conv3_packed_stripe(x, wp, None, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
