"""Tests for utility modules: torch conversion, checkpointing, timing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorCore
from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync
from jax_nbody_emulator_with_dj_tpu.utils.torch_convert import (
    convert_torch_state_dict,
    default_key_map,
)

CFG = dict(levels=1, mid_chan=4)


class TestTorchConvert:
    def test_default_key_map(self):
        assert default_key_map("conv_l00.conv_0.weight") == ("conv_l00", "conv_0", "weight")
        assert default_key_map("module.conv_l00.skip.style_weight") == (
            "conv_l00", "skip", "style_weight",
        )
        # wrapper prefixes (module./model./net.) strip repeatedly
        assert default_key_map("model.net.conv_c.conv_1.bias") == ("conv_c", "conv_1", "bias")
        assert default_key_map("optimizer_state") is None
        assert default_key_map("conv_l00.conv_0.running_mean") is None

    def test_state_dict_conversion(self):
        rng = np.random.default_rng(0)
        sd = {
            "conv_l00.conv_0.weight": rng.normal(size=(4, 3, 3, 3, 3)).astype(np.float32),
            "conv_l00.conv_0.bias": rng.normal(size=(4,)).astype(np.float32),
            "conv_l00.conv_0.style_weight": rng.normal(size=(3, 2)).astype(np.float32),
            "conv_l00.conv_0.style_bias": np.ones(3, np.float32),
        }
        params = convert_torch_state_dict(sd)
        layer = params["params"]["conv_l00"]["conv_0"]
        assert layer["weight"].shape == (3, 3, 3, 3, 4)  # DHWIO
        np.testing.assert_array_equal(
            np.asarray(layer["weight"]),
            np.transpose(sd["conv_l00.conv_0.weight"], (2, 3, 4, 1, 0)),
        )
        assert layer["style_weight"].shape == (3, 2)

    def test_torch_tensor_inputs(self):
        torch = pytest.importorskip("torch")
        sd = {
            "conv_l00.skip.weight": torch.randn(4, 3, 1, 1, 1),
            "conv_l00.skip.bias": torch.zeros(4),
        }
        params = convert_torch_state_dict(sd)
        assert params["params"]["conv_l00"]["skip"]["weight"].shape == (1, 1, 1, 3, 4)

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="key_map"):
            convert_torch_state_dict({"some.unrelated.thing": np.zeros(3)})


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        from jax_nbody_emulator_with_dj_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        params = StyleNBodyEmulatorCore(**CFG).init(jax.random.key(0))
        path = tmp_path / "ckpt"
        save_checkpoint(path, params)
        restored = load_checkpoint(path, like=params)
        for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(params), jax.tree.leaves_with_path(restored)
        ):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTiming:
    def test_force_sync_returns_tree(self):
        x = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 2)),)}
        out = force_sync(x)
        assert out is x

    def test_stage_timer(self):
        from jax_nbody_emulator_with_dj_tpu.utils.profiling import stage_timer

        timings = {}
        arr = jnp.arange(16.0)
        with stage_timer(timings, "stage", sync_on=arr):
            _ = arr * 2
        assert timings["stage"] >= 0
