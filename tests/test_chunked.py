"""Chunked hierarchical runtime must reproduce the monolithic runtime exactly.

The chunked decomposition pads each chunk by the full 48-voxel receptive
margin and runs it as an independent periodic box; the kept center crop
must match the monolithic hierarchical output bit-for-bit reordering-wise
(same tolerance class as hierarchical-vs-subbox).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu import (
    ChunkedHierarchicalConfig,
    ChunkedHierarchicalProcessor,
    HierarchicalConfig,
    HierarchicalProcessor,
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorVelCore,
    modulate_emulator_parameters,
    modulate_emulator_parameters_vel,
)

KEY = jax.random.key(23)
MID = 4
N = 32  # global box; chunks of 16 (packed alignment) padded to 112


@pytest.fixture(scope="module")
def style_params():
    return StyleNBodyEmulatorVelCore(mid_chan=MID).init(KEY)


@pytest.fixture(scope="module")
def box():
    return np.asarray(jax.random.normal(KEY, (3, N, N, N), jnp.float32))


@pytest.fixture(scope="module")
def mono_disp(style_params, box):
    params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
    model = NBodyEmulatorCore(mid_chan=MID)
    cfg = HierarchicalConfig(
        size=(N,) * 3, slab=8, tile=(16, 16, 16),
        dtype=jnp.float32, output_dtype=np.float32,
    )
    return HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)


@pytest.fixture(scope="module")
def mono_vel(style_params, box):
    params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
    model = NBodyEmulatorVelCore(mid_chan=MID)
    cfg = HierarchicalConfig(
        size=(N,) * 3, slab=8, tile=(16, 16, 16),
        dtype=jnp.float32, output_dtype=np.float32,
    )
    return HierarchicalProcessor(model, params, cfg).process_box(box, 0.5, 0.3175)


class TestChunkedDisp:
    def test_matches_monolithic(self, style_params, box, mono_disp):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        out = ChunkedHierarchicalProcessor(model, params, cfg).process_box(
            box, 0.5, 0.3175
        )
        assert out.shape == (3, N, N, N)
        np.testing.assert_allclose(out, mono_disp, rtol=2e-4, atol=2e-5)

    def test_two_axis_chunks(self, style_params, box, mono_disp):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 2, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        out = ChunkedHierarchicalProcessor(model, params, cfg).process_box(
            box, 0.5, 0.3175
        )
        np.testing.assert_allclose(out, mono_disp, rtol=2e-4, atol=2e-5)

    def test_no_donation_warnings_and_phase_buffers_alias(
        self, style_params, box
    ):
        """Donation audit: a chunked run emits NO "donated buffers were not
        usable" warnings (the scale program's free-early donation is
        silenced at source, where its intent is documented), and the
        phase-1 jit genuinely aliases its donated output buffers (a missed
        donation there would double the level-1 buffer in HBM)."""
        import warnings

        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        proc = ChunkedHierarchicalProcessor(model, params, cfg)
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "error", message="Some donated buffers were not usable"
            )
            proc.process_box(box, 0.5, 0.3175)

        inner = proc.inner
        hcfg = inner.config
        boxp_shape = (1, hcfg.in_chan) + tuple(s + 16 for s in hcfg.size)
        h1 = tuple(
            jnp.zeros(inner._buf_shape(inner._h1_margin()), hcfg.buf_dtype)
            for _ in range(1)
        )
        compiled = inner._phase1.lower(
            inner._exec_params, jnp.zeros(boxp_shape, hcfg.dtype), h1
        ).compile()
        assert "input_output_alias" in compiled.as_text(), (
            "phase-1 donated h1 buffer is not aliased in the compiled HLO"
        )

    def test_device_input_and_output(self, style_params, box, mono_disp):
        """Device path: jitted periodic extraction + device scatter."""
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        proc = ChunkedHierarchicalProcessor(model, params, cfg)
        out = proc.process_box(jnp.asarray(box), 0.5, 0.3175, as_numpy=False)
        assert isinstance(out, jax.Array)
        np.testing.assert_allclose(np.asarray(out), mono_disp, rtol=2e-4, atol=2e-5)


class TestChunkedVel:
    def test_matches_monolithic(self, style_params, box, mono_vel):
        params = modulate_emulator_parameters_vel(style_params, 0.5, 0.3175)
        model = NBodyEmulatorVelCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        dis, vel = ChunkedHierarchicalProcessor(model, params, cfg).process_box(
            box, 0.5, 0.3175
        )
        np.testing.assert_allclose(dis, mono_vel[0], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(vel, mono_vel[1], rtol=2e-4, atol=3e-5)


class TestChunkedStyle:
    @pytest.mark.slow
    def test_style_vel_matches_monolithic(self, style_params, box):
        model = StyleNBodyEmulatorVelCore(mid_chan=MID)
        hcfg = HierarchicalConfig(
            size=(N,) * 3, slab=8, tile=(16, 16, 16),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        mono = HierarchicalProcessor(model, style_params, hcfg).process_box(
            box, 0.5, 0.3175
        )
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(1, 2, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        dis, vel = ChunkedHierarchicalProcessor(model, style_params, cfg).process_box(
            box, 0.5, 0.3175
        )
        np.testing.assert_allclose(dis, mono[0], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(vel, mono[1], rtol=2e-4, atol=3e-5)


class TestChunkedConfig:
    def test_rejects_small_pad(self):
        with pytest.raises(ValueError, match="pad"):
            ChunkedHierarchicalConfig(size=(64,) * 3, chunks=(2, 1, 1), pad=32)

    def test_rejects_misaligned_chunks(self):
        with pytest.raises(ValueError, match="multiple"):
            ChunkedHierarchicalConfig(size=(24,) * 3, chunks=(3, 1, 1))

    def test_unsplit_axes_not_padded(self):
        cfg = ChunkedHierarchicalConfig(size=(32,) * 3, chunks=(2, 1, 1))
        assert cfg.pads == (48, 0, 0)
        assert cfg.inner_size == (112, 32, 32)

    def test_shape_validation(self, style_params):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(size=(N,) * 3, chunks=(2, 1, 1))
        proc = ChunkedHierarchicalProcessor(model, params, cfg)
        with pytest.raises(ValueError, match="box shape"):
            proc.process_box(np.zeros((3, 16, 16, 16), np.float32), 0.5, 0.3175)


class TestChunkedContracts:
    """Runtime contracts the reference pins for its subbox processor
    (``/root/reference/tests/test_subbox.py:320-340``): determinism and
    input immutability, here for the chunked runtime (whose pipelined
    fetch and donated inner runs make both worth guarding)."""

    @pytest.fixture(scope="class")
    def proc(self, style_params):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        return ChunkedHierarchicalProcessor(model, params, cfg)

    def test_deterministic(self, proc, box):
        a = proc.process_box(box, 0.5, 0.3175)
        b = proc.process_box(box, 0.5, 0.3175)
        np.testing.assert_array_equal(a, b)

    def test_input_immutable(self, proc, box):
        before = box.copy()
        proc.process_box(box, 0.5, 0.3175)
        np.testing.assert_array_equal(box, before)

    def test_device_input_survives_donated_chunks(self, proc, box):
        """The global device box must stay valid across chunk runs (each
        CHUNK is donated, never the global input)."""
        dev = jnp.asarray(box)
        proc.process_box(dev, 0.5, 0.3175, as_numpy=False)
        np.testing.assert_array_equal(np.asarray(dev), box)

    def test_profile_timings_cover_all_phases(self, proc, box):
        proc.process_box(box, 0.5, 0.3175, profile=True)
        assert {"phase1", "phase3"} <= set(proc.last_timings)
        assert all(v >= 0 for v in proc.last_timings.values())


class TestChunkedResume:
    """Mid-box resume: finished chunks flush to disk and are never
    recomputed on restart (the reference restarts its subbox loop from
    zero on a crash)."""

    def _build(self, style_params):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        return ChunkedHierarchicalProcessor(model, params, cfg)

    def test_full_run_then_resume_skips_all(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        ref = proc.process_box(box, 0.5, 0.3175)
        first = proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        np.testing.assert_array_equal(first, ref)
        calls = []
        inner_run = proc.inner.process_box
        proc.inner.process_box = lambda *a, **k: calls.append(1) or inner_run(*a, **k)
        resumed = proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        assert calls == []  # every chunk loaded from disk
        np.testing.assert_array_equal(resumed, ref)

    def test_partial_resume_computes_only_missing(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        ref = proc.process_box(box, 0.5, 0.3175)
        proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        # drop one chunk's file -> exactly one inner run on resume
        victims = sorted(tmp_path.glob("chunk_*_0.npy"))
        victims[0].unlink()
        calls = []
        inner_run = proc.inner.process_box
        proc.inner.process_box = lambda *a, **k: calls.append(1) or inner_run(*a, **k)
        resumed = proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        assert len(calls) == 1
        np.testing.assert_array_equal(resumed, ref)

    def test_resume_requires_host_assembly(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        with pytest.raises(ValueError, match="resume_dir"):
            proc.process_box(jnp.asarray(box), 0.5, 0.3175, as_numpy=False,
                             resume_dir=tmp_path)


class TestNativeStaging:
    """The native (C++) periodic chunk gather must match the numpy
    broadcast fancy-index bit-for-bit, and the chunked runtime must
    produce identical output with and without it (the numpy path is the
    canonical always-available fallback)."""

    def test_kernel_matches_numpy_fancy_index(self):
        from jax_nbody_emulator_with_dj_tpu import native

        if not native.native_staging_available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(7)
        for dtype in (np.float16, np.float32):
            for shape, start, out in [
                ((3, 16, 16, 16), (10, 15, 3), (12, 9, 20)),  # all-axis wrap
                ((2, 8, 8, 8), (0, 0, 0), (8, 8, 8)),         # identity
                ((1, 4, 5, 6), (3, 4, 5), (11, 12, 13)),      # torus tiling
            ]:
                src = rng.normal(size=shape).astype(dtype)
                got = native.periodic_gather(src, start, out)
                idx = [
                    (np.arange(s, s + m) % n)
                    for s, m, n in zip(start, out, shape[1:])
                ]
                want = src[:, idx[0][:, None, None], idx[1][None, :, None],
                           idx[2][None, None, :]]
                np.testing.assert_array_equal(got, want)

    def test_chunked_output_identical_without_native(
        self, style_params, box, monkeypatch
    ):
        from jax_nbody_emulator_with_dj_tpu import native

        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        proc = ChunkedHierarchicalProcessor(model, params, cfg)
        with_native = proc.process_box(box, 0.5, 0.3175)
        monkeypatch.setattr(native, "periodic_gather", lambda *a, **k: None)
        without = proc.process_box(box, 0.5, 0.3175)
        np.testing.assert_array_equal(with_native, without)


class TestResumeManifest:
    """resume_dir refuses chunks from a different run: files are keyed by
    anchor only, so mixing inputs/cosmologies would silently assemble a
    corrupted box."""

    def _build(self, style_params):
        params = modulate_emulator_parameters(style_params, 0.5, 0.3175)
        model = NBodyEmulatorCore(mid_chan=MID)
        cfg = ChunkedHierarchicalConfig(
            size=(N,) * 3, chunks=(2, 1, 1),
            dtype=jnp.float32, output_dtype=np.float32,
        )
        return ChunkedHierarchicalProcessor(model, params, cfg)

    def test_different_cosmology_rejected(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        with pytest.raises(ValueError, match="different run"):
            proc.process_box(box, 1.0, 0.3175, resume_dir=tmp_path)

    def test_different_input_rejected(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        other = np.asarray(box) + 0.1
        with pytest.raises(ValueError, match="different run"):
            proc.process_box(other, 0.5, 0.3175, resume_dir=tmp_path)

    def test_same_run_resumes(self, style_params, box, tmp_path):
        proc = self._build(style_params)
        ref = proc.process_box(box, 0.5, 0.3175)
        proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        again = proc.process_box(box, 0.5, 0.3175, resume_dir=tmp_path)
        np.testing.assert_array_equal(again, ref)
