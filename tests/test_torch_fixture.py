"""Real torch-serialized checkpoint -> converter -> emulator golden outputs.

``tests/fixtures/map2map_style_ckpt.pt`` is a genuine ``torch.save`` byte
stream in the upstream map2map layout (dotted keys, OIDHW kernels; see
``scripts/make_torch_fixture.py``).  This pins the entire import path that
the public release weights will take — torch deserialization, key mapping,
layout transpose, create_emulator, premodulation — so when the real weights
become reachable, the only untested step is the download itself.

Reference provenance: ``/root/reference/README.md:5-8`` (map2map).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parent / "fixtures"
CKPT = FIXTURES / "map2map_style_ckpt.pt"

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="torch fixture not generated"
)


@pytest.fixture(scope="module")
def loaded():
    torch = pytest.importorskip("torch")
    del torch
    from jax_nbody_emulator_with_dj_tpu.utils.torch_convert import (
        load_torch_checkpoint,
    )

    return load_torch_checkpoint(CKPT)


class TestTorchCheckpointImport:
    def test_tree_structure_matches_model(self, loaded):
        from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorCore

        ref = StyleNBodyEmulatorCore(mid_chan=4).init(jax.random.key(0))
        ref_paths = {
            (b, l, leaf)
            for b, layers in ref["params"].items()
            for l, leaves in layers.items()
            for leaf in leaves
        }
        got_paths = {
            (b, l, leaf)
            for b, layers in loaded["params"].items()
            for l, leaves in layers.items()
            for leaf in leaves
        }
        assert got_paths == ref_paths
        for b, l, leaf in ref_paths:
            assert (
                loaded["params"][b][l][leaf].shape
                == ref["params"][b][l][leaf].shape
            ), (b, l, leaf)

    def test_kernel_layout_is_dhwio(self, loaded):
        w = loaded["params"]["conv_l00"]["conv_0"]["weight"]
        assert w.shape[:3] == (3, 3, 3)  # kernel dims lead after conversion

    @pytest.mark.slow
    def test_golden_style_output(self, loaded):
        """Serialized bytes -> create_emulator(style) -> stored golden."""
        from jax_nbody_emulator_with_dj_tpu import SubboxConfig, create_emulator

        box = np.load(FIXTURES / "torch_golden_input.npy")
        golden = np.load(FIXTURES / "torch_golden_style.npy")
        cfg = SubboxConfig(
            size=box.shape[1:], ndiv=(2, 2, 2), padding=((48, 48),) * 3,
            dtype=jnp.float32, output_dtype=np.float32,
        )
        emu = create_emulator(
            premodulate=False, compute_vel=False, params=loaded,
            processor_config=cfg, mid_chan=4,
        )
        out = emu.process_box(box, z=0.5, Om=0.3175, show_progress=False)
        np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_golden_premodulated_output(self, loaded):
        """Same bytes through the premodulation fold."""
        golden_path = FIXTURES / "torch_golden_premod.npy"
        if not golden_path.exists():
            pytest.skip("premod golden not generated")
        from jax_nbody_emulator_with_dj_tpu import SubboxConfig, create_emulator

        box = np.load(FIXTURES / "torch_golden_input.npy")
        golden = np.load(golden_path)
        cfg = SubboxConfig(
            size=box.shape[1:], ndiv=(2, 2, 2), padding=((48, 48),) * 3,
            dtype=jnp.float32, output_dtype=np.float32,
        )
        emu = create_emulator(
            premodulate=True, compute_vel=False, params=loaded,
            processor_config=cfg, premodulate_z=0.5, premodulate_Om=0.3175,
            mid_chan=4,
        )
        out = emu.process_box(box, z=0.5, Om=0.3175, show_progress=False)
        np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-6)

    def test_wrapper_prefix_stripping(self):
        """state_dict wrappers and module. prefixes are handled."""
        from jax_nbody_emulator_with_dj_tpu.utils.torch_convert import (
            default_key_map,
        )

        assert default_key_map("module.conv_l00.conv_0.weight") == (
            "conv_l00", "conv_0", "weight",
        )
        assert default_key_map("model.conv_c.skip.style_bias") == (
            "conv_c", "skip", "style_bias",
        )
        assert default_key_map("optimizer.state.step") is None
