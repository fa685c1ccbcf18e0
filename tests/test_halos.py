"""FoF halo finder and mass function tests."""

import numpy as np
import pytest

from jax_nbody_emulator_with_dj_tpu.science.halos import (
    empirical_hmf,
    friends_of_friends,
    friends_of_friends_slabbed,
    particle_mass_msun_h,
    positions_from_displacement,
    tinker08_hmf,
)


class TestPositions:
    def test_zero_displacement_grid(self):
        psi = np.zeros((3, 4, 4, 4), np.float32)
        pos = positions_from_displacement(psi, 100.0)
        assert pos.shape == (64, 3)
        assert pos.min() >= 0 and pos.max() < 100.0
        assert np.isclose(pos[1, 2], 25.0)  # second z grid point

    def test_periodic_wrap(self):
        psi = np.full((3, 2, 2, 2), -10.0, np.float32)
        pos = positions_from_displacement(psi, 100.0)
        assert np.all((pos >= 0) & (pos < 100.0))


class TestFoF:
    def test_two_well_separated_clusters(self):
        rng = np.random.default_rng(0)
        c1 = rng.normal(scale=0.5, size=(50, 3)) + 20.0
        c2 = rng.normal(scale=0.5, size=(80, 3)) + 70.0
        field = rng.uniform(0, 100, size=(30, 3))  # sparse background
        pos = np.concatenate([c1, c2, field]).astype(np.float64) % 100.0
        out = friends_of_friends(pos, 100.0, linking_length=1.0, nmin=20)
        assert out["n_groups"] == 2
        assert sorted(out["lengths"].tolist()) == [50, 80]
        centers = out["centers"][np.argsort(out["lengths"])]
        np.testing.assert_allclose(centers[0], [20, 20, 20], atol=1.0)
        np.testing.assert_allclose(centers[1], [70, 70, 70], atol=1.0)

    def test_periodic_linking_across_boundary(self):
        # cluster straddling the box edge
        rng = np.random.default_rng(1)
        offs = rng.normal(scale=0.4, size=(40, 3))
        pos = np.mod(offs + np.array([0.0, 50.0, 50.0]), 100.0)
        out = friends_of_friends(pos, 100.0, linking_length=1.5, nmin=10)
        assert out["n_groups"] == 1
        # periodic CM near x=0 (or 100)
        cx = out["centers"][0, 0]
        assert cx < 5.0 or cx > 95.0

    def test_nmin_filtering(self):
        rng = np.random.default_rng(2)
        small = rng.normal(scale=0.2, size=(5, 3)) + 10.0
        big = rng.normal(scale=0.2, size=(30, 3)) + 60.0
        pos = np.concatenate([small, big]) % 100.0
        out = friends_of_friends(pos, 100.0, 1.0, nmin=20)
        assert out["n_groups"] == 1
        assert out["lengths"][0] == 30
        # small group unlabeled
        assert np.all(out["labels"][:5] == -1)


class TestHMF:
    def test_particle_mass(self):
        m = particle_mass_msun_h(1000.0, 512, 0.3175)
        # standard Quijote-like particle mass ~6.5e11
        assert 5e11 < m < 8e11

    def test_empirical_histogram_conserves_counts(self):
        lengths = np.array([20, 25, 40, 80, 160, 320])
        centers, dn, err = empirical_hmf(lengths, 1e12, 100.0, fof_correction=False)
        total = np.sum(dn * np.diff(np.log10(centers)).mean() * 100.0**3)
        assert np.isclose(total, len(lengths), rtol=0.2)

    def test_tinker_shape(self):
        import jax.numpy as jnp

        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk

        k = jnp.logspace(-4, 2, 256)
        p = eisenstein_hu_pk(k)
        m = np.logspace(12, 15, 16)
        dn = tinker08_hmf(m, k, p, Om=0.3175)
        assert np.all(dn > 0)
        assert np.all(np.diff(np.log(dn)) < 0)  # monotone decreasing
        # Rough normalization anchor: dn/dlog10M at 1e13 ~ 1e-3..1e-4
        i = np.argmin(np.abs(m - 1e13))
        assert 1e-5 < dn[i] < 1e-2

    def test_tinker_redshift_suppression(self):
        import jax.numpy as jnp

        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import eisenstein_hu_pk

        k = jnp.logspace(-4, 2, 256)
        p = eisenstein_hu_pk(k)
        m = np.logspace(13, 15, 8)
        dn0 = tinker08_hmf(m, k, p, Om=0.3175, z=0.0)
        dn1 = tinker08_hmf(m, k, p, Om=0.3175, z=1.0)
        assert np.all(dn1 < dn0)  # fewer massive halos at high z


class TestFoFAgainstKDTree:
    """The cell-hash union-find must reproduce an independent scipy
    cKDTree + connected-components FoF exactly (same groups, same sizes)."""

    @staticmethod
    def _kdtree_fof(pos, boxsize, b):
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components
        from scipy.spatial import cKDTree

        tree = cKDTree(pos, boxsize=boxsize)
        pairs = tree.query_pairs(b, output_type="ndarray")
        n = len(pos)
        g = coo_matrix(
            (np.ones(len(pairs), np.int8), (pairs[:, 0], pairs[:, 1])),
            shape=(n, n),
        )
        ncomp, labels = connected_components(g, directed=False)
        return labels

    def _compare(self, pos, boxsize, b, nmin=2):
        ref_labels = self._kdtree_fof(pos, boxsize, b)
        ref_lengths = np.sort(
            np.bincount(ref_labels)[np.bincount(ref_labels) >= nmin]
        )
        res = friends_of_friends(pos, boxsize, b, nmin=nmin)
        got_lengths = np.sort(res["lengths"])
        np.testing.assert_array_equal(got_lengths, ref_lengths)
        # group partitions must agree exactly: co-membership check
        got = res["labels"]
        both = (got >= 0) & (np.isin(ref_labels, np.nonzero(
            np.bincount(ref_labels) >= nmin)[0]))
        # map each got-group to the ref-group of its first member
        for gid in range(res["n_groups"]):
            members = np.nonzero(got == gid)[0]
            assert len(np.unique(ref_labels[members])) == 1

    def test_random_points(self):
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 50.0, size=(4000, 3)).astype(np.float32)
        self._compare(pos, 50.0, b=1.2)

    def test_clustered_points(self):
        rng = np.random.default_rng(1)
        centers = rng.uniform(0, 100.0, size=(40, 3))
        pts = (centers[:, None, :] + rng.normal(0, 0.8, size=(40, 60, 3))).reshape(-1, 3)
        pos = np.mod(pts, 100.0).astype(np.float32)
        self._compare(pos, 100.0, b=0.9)

    def test_boundary_wrap_clusters(self):
        rng = np.random.default_rng(2)
        # clusters straddling all three periodic faces
        base = np.array([[0.0, 25.0, 25.0], [25.0, 0.0, 25.0], [25.0, 25.0, 0.0]])
        pts = (base[:, None, :] + rng.normal(0, 0.5, size=(3, 200, 3))).reshape(-1, 3)
        pos = np.mod(pts, 50.0).astype(np.float32)
        self._compare(pos, 50.0, b=0.6)

    @pytest.mark.slow
    def test_grid_displaced_64(self):
        """64^3 grid particles with LPT-like displacements (the production
        input shape) against the kdtree reference."""
        import jax
        import jax.numpy as jnp

        from jax_nbody_emulator_with_dj_tpu.science import (
            positions_from_displacement,
        )

        n = 64
        psi = np.asarray(
            2.0 * jax.random.normal(jax.random.key(5), (3, n, n, n), jnp.float32)
        )
        pos = positions_from_displacement(psi, boxsize=100.0)
        b = 0.2 * (100.0 / n)
        self._compare(pos, 100.0, b=b, nmin=5)


class TestFoFSlabbed:
    """Slab-streamed FoF must reproduce the monolithic finder exactly."""

    @staticmethod
    def _canonical(labels):
        """Map each group label to the smallest particle id it contains."""
        lab = np.asarray(labels, np.int64)
        out = -np.ones(len(lab), np.int64)
        grouped = lab >= 0
        if grouped.any():
            nmax = lab[grouped].max() + 1
            first = np.full(nmax, np.iinfo(np.int64).max)
            np.minimum.at(first, lab[grouped], np.nonzero(grouped)[0])
            out[grouped] = first[lab[grouped]]
        return out

    @staticmethod
    def _psi_grf(n, boxsize, seed=3):
        import jax

        from jax_nbody_emulator_with_dj_tpu.science.grf import (
            gaussian_random_field,
        )
        from jax_nbody_emulator_with_dj_tpu.science.linear_pk import (
            eisenstein_hu_pk,
        )
        from jax_nbody_emulator_with_dj_tpu.science.lpt import (
            zeldovich_displacement,
        )

        k = np.logspace(-3, 1.5, 128)
        p = eisenstein_hu_pk(
            k, Om=0.3175, Ob=0.049, h=0.6711, ns=0.9624, sigma8=0.834
        )
        d = gaussian_random_field(jax.random.key(seed), n, boxsize, k, p)
        return np.asarray(zeldovich_displacement(d, boxsize))

    @pytest.mark.parametrize("n_slabs", [2, 3, 5])
    def test_matches_monolithic_grf(self, n_slabs):
        n, box = 24, 60.0
        psi = self._psi_grf(n, box)
        b = 0.2 * box / n
        pos = positions_from_displacement(psi, box)
        ref = friends_of_friends(pos, box, b, nmin=5)
        got = friends_of_friends_slabbed(
            psi, box, b, nmin=5, n_slabs=n_slabs, return_labels=True
        )
        assert got["n_groups"] == ref["n_groups"]
        np.testing.assert_array_equal(
            self._canonical(got["labels"]), self._canonical(ref["labels"])
        )
        # per-group stats compared through the canonical (min-gid) key
        for res in (ref, got):
            res["_key"] = self._canonical(res["labels"])
        for gid_key in np.unique(ref["_key"][ref["_key"] >= 0]):
            li = ref["labels"][gid_key]
            lj = got["labels"][gid_key]
            assert ref["lengths"][li] == got["lengths"][lj]
            np.testing.assert_allclose(
                ref["centers"][li], got["centers"][lj], rtol=1e-5, atol=1e-4
            )

    def test_group_spanning_every_boundary(self):
        """psi = 0, b > grid spacing: the whole box is ONE group, crossing
        every slab boundary; nmin must apply to the merged multiplicity."""
        n, box = 12, 36.0
        psi = np.zeros((3, n, n, n), np.float32)
        got = friends_of_friends_slabbed(
            psi, box, 1.2 * box / n, nmin=n**3, n_slabs=4
        )
        assert got["n_groups"] == 1
        assert got["lengths"][0] == n**3

    def test_single_slab_degenerates_to_monolithic(self):
        n, box = 16, 40.0
        psi = self._psi_grf(n, box, seed=7)
        b = 0.2 * box / n
        pos = positions_from_displacement(psi, box)
        ref = friends_of_friends(pos, box, b, nmin=3)
        got = friends_of_friends_slabbed(
            psi, box, b, nmin=3, n_slabs=1, return_labels=True
        )
        assert got["n_groups"] == ref["n_groups"]
        np.testing.assert_array_equal(
            self._canonical(got["labels"]), self._canonical(ref["labels"])
        )

    def test_rejects_too_many_slabs(self):
        psi = np.zeros((3, 8, 8, 8), np.float32)
        with pytest.raises(ValueError, match="slab width"):
            friends_of_friends_slabbed(psi, 8.0, 2.0, n_slabs=4)

    @pytest.mark.parametrize("grid", [(2, 2, 2), (4, 1, 1), (1, 2, 3)])
    def test_sharded_matches_monolithic(self, grid, tmp_path):
        """Per-shard pieces (arrays + .npy paths mixed) -> same catalog."""
        from jax_nbody_emulator_with_dj_tpu.science.halos import (
            friends_of_friends_sharded,
        )

        n, box = 24, 60.0
        psi = self._psi_grf(n, box, seed=11)
        b = 0.2 * box / n
        shards = []
        gi, gj, gk = grid
        di, dj, dk = n // gi, n // gj, n // gk
        for i in range(gi):
            for j in range(gj):
                for k in range(gk):
                    piece = psi[
                        :, i * di:(i + 1) * di, j * dj:(j + 1) * dj,
                        k * dk:(k + 1) * dk,
                    ]
                    if (i + j + k) % 2:  # half the shards arrive as files
                        f = tmp_path / f"shard_{i}{j}{k}.npy"
                        np.save(f, piece)
                        piece = str(f)
                    shards.append((piece, (i * di, j * dj, k * dk)))
        got = friends_of_friends_sharded(
            shards, n, box, b, nmin=5, n_slabs=3, return_labels=True
        )
        pos = positions_from_displacement(psi, box)
        ref = friends_of_friends(pos, box, b, nmin=5)
        assert got["n_groups"] == ref["n_groups"]
        np.testing.assert_array_equal(
            self._canonical(got["labels"]), self._canonical(ref["labels"])
        )
        np.testing.assert_array_equal(
            np.sort(got["lengths"]), np.sort(ref["lengths"])
        )

    def test_memmap_input(self, tmp_path):
        n, box = 16, 40.0
        psi = self._psi_grf(n, box, seed=9)
        f = tmp_path / "psi.npy"
        np.save(f, psi)
        mm = np.load(f, mmap_mode="r")
        b = 0.2 * box / n
        got = friends_of_friends_slabbed(mm, box, b, nmin=3, n_slabs=2)
        pos = positions_from_displacement(psi, box)
        ref = friends_of_friends(pos, box, b, nmin=3)
        assert got["n_groups"] == ref["n_groups"]
        np.testing.assert_array_equal(
            np.sort(got["lengths"]), np.sort(ref["lengths"])
        )


class TestNativeEngine:
    """The C++ linking kernel must agree with the numpy engine exactly
    (both emit min-component-index roots -> identical label arrays)."""

    @pytest.fixture(scope="class", autouse=True)
    def _require_native(self):
        from jax_nbody_emulator_with_dj_tpu.native import native_fof_available

        if not native_fof_available():
            pytest.skip("native kernel did not build")

    @pytest.mark.parametrize("seed,b_frac", [(0, 0.25), (1, 0.6), (2, 1.1)])
    def test_random_points_identical(self, seed, b_frac):
        rng = np.random.default_rng(seed)
        box = 40.0
        pos = rng.uniform(0, box, size=(6000, 3)).astype(np.float32)
        b = b_frac * box / 20
        a = friends_of_friends(pos, box, b, nmin=2, engine="numpy")
        c = friends_of_friends(pos, box, b, nmin=2, engine="native")
        np.testing.assert_array_equal(a["labels"], c["labels"])
        np.testing.assert_array_equal(a["lengths"], c["lengths"])
        np.testing.assert_allclose(a["centers"], c["centers"], rtol=1e-6, atol=1e-5)

    def test_boundary_wrap_identical(self):
        """Clusters straddling all three periodic faces."""
        box = 30.0
        rng = np.random.default_rng(3)
        corners = rng.uniform(-0.4, 0.4, size=(400, 3)) % box
        mid = rng.uniform(10, 20, size=(300, 3))
        pos = np.concatenate([corners, mid]).astype(np.float32)
        a = friends_of_friends(pos, box, 1.0, nmin=5, engine="numpy")
        c = friends_of_friends(pos, box, 1.0, nmin=5, engine="native")
        np.testing.assert_array_equal(a["labels"], c["labels"])

    def test_tiny_grid_identical(self):
        """linking length > L/3 -> degenerate 1-2 cell grids."""
        box = 10.0
        rng = np.random.default_rng(4)
        pos = rng.uniform(0, box, size=(500, 3)).astype(np.float32)
        for b in (3.5, 5.5):
            a = friends_of_friends(pos, box, b, nmin=1, engine="numpy")
            c = friends_of_friends(pos, box, b, nmin=1, engine="native")
            np.testing.assert_array_equal(a["labels"], c["labels"])

    def test_auto_prefers_native(self):
        from jax_nbody_emulator_with_dj_tpu.science import halos as H

        pos = np.random.default_rng(5).uniform(0, 20, (200, 3)).astype(np.float32)
        a = friends_of_friends(pos, 20.0, 0.8, nmin=2, engine="auto")
        c = friends_of_friends(pos, 20.0, 0.8, nmin=2, engine="native")
        np.testing.assert_array_equal(a["labels"], c["labels"])

    def test_bad_engine_rejected(self):
        with pytest.raises(ValueError, match="engine"):
            friends_of_friends(
                np.zeros((4, 3), np.float32), 1.0, 0.1, engine="gpu"
            )

    @pytest.mark.parametrize("n_threads", [2, 4, 7])
    def test_multithreaded_identical(self, n_threads):
        """Thread count must not change a single label: the lock-free
        union-find hooks larger roots under smaller, so final labels are
        a pure function of the pair set (fof.cpp round 5) — asserted
        against both the single-threaded kernel and the numpy engine,
        including clustered (dense-cell) and wrap geometries."""
        from jax_nbody_emulator_with_dj_tpu.native import fof_labels

        rng = np.random.default_rng(11)
        box = 40.0
        # uniform + a dense clump (exercises intra-cell self pairs) + a
        # wrap-straddling clump
        pos = np.concatenate([
            rng.uniform(0, box, size=(5000, 3)),
            rng.normal(25.0, 0.3, size=(1500, 3)),
            rng.normal(0.0, 0.3, size=(800, 3)) % box,
        ]).astype(np.float32)
        np.clip(pos, 0, np.nextafter(box, 0, dtype=np.float32), out=pos)
        for b in (0.5, 1.2):
            l1 = fof_labels(pos, box, b, n_threads=1)
            lt = fof_labels(pos, box, b, n_threads=n_threads)
            np.testing.assert_array_equal(l1, lt)
            a = friends_of_friends(pos, box, b, nmin=2, engine="numpy")
            c = friends_of_friends(pos, box, b, nmin=2, engine="native")
            np.testing.assert_array_equal(a["labels"], c["labels"])


class TestReviewRegressions:
    """Regressions for the round-3 review findings (engine fp parity,
    clustered batching, out-of-contract inputs, HMF singletons)."""

    def test_chain_across_cell_boundaries_single_group(self):
        """A chain of particles spaced just under b spanning the box must be
        ONE group: an f32 cell-index quotient can misassign a boundary
        particle by a cell and silently drop genuine links (the engines now
        both divide in float64)."""
        box = 100.0
        b = box / 256 * (1 + 1e-7)  # cell_w within rounding of the spacing
        step = b * (1 - 1e-6)
        xs = np.arange(0, box - b, step, dtype=np.float64)
        pos = np.zeros((len(xs), 3), np.float32)
        pos[:, 0] = xs
        pos[:, 1] = pos[:, 2] = 50.0
        out = friends_of_friends(pos, box, b, nmin=2, engine="numpy")
        assert out["n_groups"] == 1
        assert out["lengths"][0] == len(xs)

    def test_tiny_chunk_matches_default_on_clustered_input(self):
        """Cumsum pair batching + dense-cell streaming must give identical
        results at any chunk size (chunk=64 forces both the multi-batch and
        the single-dense-cell-pair streaming paths)."""
        rng = np.random.default_rng(11)
        core = rng.normal(scale=0.3, size=(60, 3)) + 25.0  # one dense cell
        spread = rng.uniform(0, 50.0, size=(300, 3))
        pos = np.concatenate([core, spread]).astype(np.float32) % 50.0
        ref = friends_of_friends(pos, 50.0, 1.0, nmin=2, engine="numpy")
        got = friends_of_friends(
            pos, 50.0, 1.0, nmin=2, engine="numpy", chunk=64
        )
        np.testing.assert_array_equal(ref["labels"], got["labels"])
        np.testing.assert_array_equal(ref["lengths"], got["lengths"])

    def test_slightly_out_of_range_positions_accepted(self):
        """Coordinates a few ulp below 0 / at L (file-format rounding) are
        wrapped into [0, L) instead of crashing the native engine or
        diverging between engines."""
        rng = np.random.default_rng(12)
        pos = rng.uniform(0, 30.0, size=(200, 3)).astype(np.float32)
        pos[0] = [-1e-6, 5.0, 5.0]
        pos[1] = [30.0, 5.0, 5.0]  # == L exactly
        out = friends_of_friends(pos, 30.0, 1.0, nmin=1, engine="auto")
        ref = friends_of_friends(pos, 30.0, 1.0, nmin=1, engine="numpy")
        assert out["n_groups"] == ref["n_groups"]
        np.testing.assert_array_equal(out["lengths"], ref["lengths"])

    def test_empirical_hmf_tolerates_singletons(self):
        """n=1 maps to corrected mass 0 (log -inf) — singletons must be
        dropped, not crash the histogram."""
        centers, dn, err = empirical_hmf(
            np.array([1, 1, 5, 30, 200]), 1e12, 100.0
        )
        assert np.all(np.isfinite(centers))
        assert np.isclose(np.sum(dn > 0), 3, atol=1)  # 3 surviving groups

    def test_empirical_hmf_all_singletons_raises(self):
        with pytest.raises(ValueError, match="corrected mass"):
            empirical_hmf(np.array([1, 1, 1]), 1e12, 100.0)


class TestNativeCacheRecovery:
    """A corrupted cached .so (e.g. a torn concurrent write) must be
    rebuilt on next load, not permanently disable the native engine."""

    def test_corrupted_so_is_rebuilt(self, tmp_path, monkeypatch):
        """Model a fresh process finding a torn cache entry: the corrupt
        file exists at the expected path BEFORE any dlopen (overwriting an
        already-loaded .so in-process would corrupt live mappings)."""
        import hashlib
        from pathlib import Path

        from jax_nbody_emulator_with_dj_tpu import native

        monkeypatch.setenv("JAX_NBODY_NATIVE_CACHE", str(tmp_path))
        saved = dict(native._CACHE)
        native._CACHE.clear()
        try:
            src = Path(native.__file__).with_name("fof.cpp").read_bytes()
            tag = hashlib.sha256(src).hexdigest()[:16]
            so = tmp_path / f"fof_{tag}.so"
            so.write_bytes(b"not an ELF file")
            if not native.native_fof_available():
                pytest.skip("native kernel did not build (no toolchain)")
            pos = np.random.default_rng(0).uniform(0, 10, (50, 3)).astype(
                np.float32
            )
            assert native.fof_labels(pos, 10.0, 0.5) is not None
            assert so.read_bytes()[:4] == b"\x7fELF"  # rebuilt in place
        finally:
            native._CACHE.clear()
            native._CACHE.update(saved)
