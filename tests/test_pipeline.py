"""End-to-end pipeline test (tiny config, random weights, CPU)."""

import json

import jax
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import StyleNBodyEmulatorVelCore
from jax_nbody_emulator_with_dj_tpu.pipeline import (
    QUIJOTE_FIDUCIAL,
    run_lpt_emulator_pipeline,
)

CFG = dict(mid_chan=4)


@pytest.fixture(scope="module")
def params():
    return StyleNBodyEmulatorVelCore(**CFG).init(jax.random.key(0))


class TestPipeline:
    @pytest.mark.slow
    def test_seed_mode_end_to_end(self, params, tmp_path_factory):
        out = tmp_path_factory.mktemp("pipe")
        res = run_lpt_emulator_pipeline(
            seed=1,
            n_part=16,
            boxsize=250.0,
            z=0.5,
            params=params,
            load_params=False,
            premodulate=True,
            compute_vel=True,
            ndiv=(1, 1, 1),
            precision="f32",
            out_dir=out,
            save_fields=True,
            mid_chan=4,
        )
        assert res.psi_emu.shape == (3, 16, 16, 16)
        assert res.vel_emu.shape == (3, 16, 16, 16)
        assert res.delta_emu.shape == (16, 16, 16)
        assert np.all(np.isfinite(res.delta_emu))
        assert res.timings["emulator_seconds"] > 0
        meta = json.loads((out / "metadata.json").read_text())
        assert meta["n_part"] == 16
        assert (out / "delta_emu.npy").exists()
        assert (out / "vel_emu.npy").exists()

    @pytest.mark.slow
    def test_delta_mode(self, params):
        rng = np.random.default_rng(0)
        delta = rng.normal(size=(16, 16, 16)).astype(np.float32) * 0.1
        res = run_lpt_emulator_pipeline(
            input_delta=delta,
            n_part=16,
            boxsize=250.0,
            z=0.0,
            params=params,
            load_params=False,
            premodulate=True,
            compute_vel=False,
            ndiv=(1, 1, 1),
            precision="f32",
            mid_chan=4,
        )
        assert res.vel_emu is None
        assert res.delta_emu.shape == (16, 16, 16)
        # delta-mode must start from the provided field
        np.testing.assert_allclose(res.delta_lin, delta, atol=1e-6)

    @pytest.mark.slow
    def test_lpt_density_tracks_linear_at_z(self, params):
        """LPT density amplitude scales with D(z)."""
        res0 = run_lpt_emulator_pipeline(
            seed=2, n_part=16, boxsize=4000.0, z=0.0, params=params,
            load_params=False, ndiv=(1, 1, 1), precision="f32",
            compute_vel=False, mid_chan=4,
        )
        res1 = run_lpt_emulator_pipeline(
            seed=2, n_part=16, boxsize=4000.0, z=1.0, params=params,
            load_params=False, ndiv=(1, 1, 1), precision="f32",
            compute_vel=False, mid_chan=4,
        )
        ratio = res1.delta_lpt.std() / res0.delta_lpt.std()
        d_ratio = res1.metadata["growth_factor"] / res0.metadata["growth_factor"]
        assert np.isclose(ratio, d_ratio, rtol=0.05)

    def test_fiducial_constants(self):
        assert QUIJOTE_FIDUCIAL["Om"] == 0.3175
        assert QUIJOTE_FIDUCIAL["sigma8"] == 0.834

    @pytest.mark.slow
    def test_external_pk_table(self, params, tmp_path):
        """A CLASS-style (k, P) file replaces EH98 end-to-end (reference
        pathway: scripts/core.py:263-302)."""
        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import (
            eisenstein_hu_pk,
            load_pk_table,
        )

        k = np.logspace(-4, 2, 256)
        pk = np.asarray(eisenstein_hu_pk(k)) * 2.0  # distinguishable amplitude
        tab = tmp_path / "pk.dat"
        np.savetxt(tab, np.c_[k, pk], header="k [h/Mpc]  P [(Mpc/h)^3]")
        kk, pp = load_pk_table(tab)
        np.testing.assert_allclose(kk, k)

        common = dict(
            seed=3, n_part=16, boxsize=1000.0, z=0.0, params=params,
            load_params=False, ndiv=(1, 1, 1), precision="f32",
            compute_vel=False, mid_chan=4,
        )
        res_tab = run_lpt_emulator_pipeline(pk_table=str(tab), **common)
        res_eh = run_lpt_emulator_pipeline(**common)
        assert res_tab.metadata["pk_table"] == str(tab)
        # 2x P(k) -> sqrt(2)x field amplitude for the same seed
        ratio = res_tab.delta_lin.std() / res_eh.delta_lin.std()
        assert np.isclose(ratio, np.sqrt(2.0), rtol=0.05)

    @pytest.mark.slow
    def test_auto_runtime_matches_subbox(self, params):
        """runtime='auto' (planner-chosen hierarchical geometry) must give
        the same emulated displacement as the subbox runtime."""
        common = dict(
            seed=5, n_part=16, boxsize=1000.0, z=0.0, params=params,
            load_params=False, precision="f32", compute_vel=False,
            mid_chan=4,
        )
        res_sub = run_lpt_emulator_pipeline(ndiv=(1, 1, 1), **common)
        res_auto = run_lpt_emulator_pipeline(runtime="auto", **common)
        assert res_auto.metadata["runtime"] == "auto"
        ref = np.asarray(res_sub.psi_emu, np.float32)
        np.testing.assert_allclose(
            np.asarray(res_auto.psi_emu, np.float32), ref,
            rtol=1e-3, atol=1e-3 * float(np.abs(ref).std()),
        )

    def test_bad_runtime_rejected(self, params):
        with pytest.raises(ValueError, match="runtime"):
            run_lpt_emulator_pipeline(
                seed=1, n_part=16, params=params, load_params=False,
                runtime="warp", precision="f32", compute_vel=False, mid_chan=4,
            )
