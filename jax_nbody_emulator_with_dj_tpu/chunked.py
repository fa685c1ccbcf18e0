"""Chunked hierarchical runtime: boxes larger than one chip's buffer memory.

The hierarchical runtime (``hierarchical.py``) keeps level-1 feature
volumes resident in HBM; at 512^3 float32 — or bfloat16 boxes >= 1024^3 —
those buffers exceed a 16 GB chip.  This wrapper splits the global
periodic box into ``chunks`` sub-volumes, pads each by the network's full
receptive margin (48 voxels, ``models.unet.input_margin``) with periodic
wrap, runs every padded chunk as an *independent periodic box* through
``HierarchicalProcessor``, and keeps only the exact center crop.

Why the center crop is exact: the padded chunk differs from the true
periodic environment only within ``pad`` voxels of the chunk boundary
(the inner run wraps the chunk onto itself instead of seeing the real
neighbors).  A VALID-conv U-Net output voxel depends on inputs within the
48-voxel receptive radius, so every voxel of the center crop — at least
``pad >= 48`` from the boundary — sees only genuine data.  Chunk anchors
and pads are multiples of 8 (16 packed), which keeps the three stride-2
lattices aligned with the global grid; this is the same decomposition
contract as the reference's subbox runtime (``subbox.py:25-97`` there),
and equality with the monolithic runtimes is asserted in tests.

Overhead vs the monolithic hierarchical run is the pad recompute,
prod_i((c_i + 2*pad)/c_i) over split axes — e.g. 2.25x for two split axes
with 256-voxel chunks — still far below the subbox runtime's ~5.4x at
128^3 tiles, while peak HBM drops by roughly the chunk ratio.  Use it
when the monolithic buffers do not fit: float32 at 512^3 (the velocity
pair needs ~24 GB monolithic), or single-chip bfloat16 boxes >= 1024^3.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .hierarchical import HierarchicalConfig, HierarchicalProcessor
from .models.unet import input_margin


def _largest_divisor(n: int, cap: int, mult: int) -> int:
    """Largest d <= cap with d % mult == 0 and n % d == 0 (or mult if none)."""
    for d in range(min(cap, n), mult - 1, -1):
        if d % mult == 0 and n % d == 0:
            return d
    return mult


@dataclass
class ChunkedHierarchicalConfig:
    """Decomposition geometry for :class:`ChunkedHierarchicalProcessor`.

    ``slab`` / ``slab_h`` / ``tile`` / ``tile1`` configure the *inner*
    hierarchical run on one padded chunk; unset values are auto-derived
    divisors of the padded chunk extent.
    """

    size: tuple[int, int, int]
    chunks: tuple[int, int, int] = (2, 1, 1)
    pad: int = 48  # receptive margin per side of each split axis
    slab: int | None = None
    slab_h: int | None = None
    tile: tuple[int, int, int] | None = None
    tile1: int | None = None
    dtype: jnp.dtype = jnp.bfloat16
    output_dtype: np.dtype = np.float16
    in_chan: int = 3
    packed: bool = True
    buf_dtype: jnp.dtype | None = None  # see HierarchicalConfig.buf_dtype
    # derived in __post_init__
    chunk_size: tuple[int, int, int] = field(init=False)
    pads: tuple[int, int, int] = field(init=False)
    inner_size: tuple[int, int, int] = field(init=False)

    def __post_init__(self):
        self.size = tuple(int(s) for s in self.size)
        self.chunks = tuple(int(c) for c in self.chunks)
        margin = input_margin(3)
        if self.pad < margin or self.pad % 8:
            raise ValueError(
                f"pad {self.pad} must be a multiple of 8 and >= the receptive "
                f"margin {margin} (smaller pads would let the inner run's "
                f"periodic wrap contaminate the kept crop)"
            )
        align = 16 if self.packed else 8
        for s, c in zip(self.size, self.chunks):
            if c < 1 or s % c:
                raise ValueError(f"chunks {self.chunks} must divide size {self.size}")
            if c > 1 and (s // c) % align:
                raise ValueError(
                    f"chunk extent {s // c} must be a multiple of {align} "
                    f"(stride-lattice and W-packing alignment)"
                )
        self.chunk_size = tuple(s // c for s, c in zip(self.size, self.chunks))
        self.pads = tuple(self.pad if c > 1 else 0 for c in self.chunks)
        self.inner_size = tuple(
            cs + 2 * p for cs, p in zip(self.chunk_size, self.pads)
        )

    def inner_config(self) -> HierarchicalConfig:
        inner = self.inner_size
        slab = self.slab or _largest_divisor(inner[0], 32, 2)
        tile = self.tile or (
            _largest_divisor(inner[0], 128, 2),
            _largest_divisor(inner[1], 128, 2),
            _largest_divisor(inner[2], 128, 4 if self.packed else 2),
        )
        return HierarchicalConfig(
            size=inner,
            slab=slab,
            slab_h=self.slab_h,
            tile=tile,
            tile1=self.tile1,
            dtype=self.dtype,
            output_dtype=self.output_dtype,
            in_chan=self.in_chan,
            packed=self.packed,
            buf_dtype=self.buf_dtype,
        )


class ChunkedHierarchicalProcessor:
    """Big-box runtime for boxes whose hierarchical buffers overflow HBM.

    Same ``process_box(box, z, Om)`` contract as the other runtimes.  Host
    (numpy) inputs are chunk-gathered on the host and assembled into host
    output arrays; device inputs are chunk-extracted on device (periodic
    roll + slice) and, with ``as_numpy=False``, scattered into device
    output buffers.  Supports all four model variants (the style fold
    happens once inside the shared inner processor).
    """

    def __init__(self, model, params, config: ChunkedHierarchicalConfig):
        self.config = config
        self.inner = HierarchicalProcessor(model, params, config.inner_config())
        self.compute_vel = self.inner.compute_vel
        csz = (config.in_chan,) + config.inner_size

        def _extract(box, shift):
            # Periodic chunk extraction: roll the anchor to the origin, then
            # one static slice.  XLA lowers each roll to two dynamic slices
            # + concat; transient peak is ~2 box copies, before the phase
            # buffers exist.  Padded chunks wider than the global box (tiny
            # test geometries) tile the torus first.
            for ax in range(3):
                box = jnp.roll(box, -shift[ax], axis=ax + 1)
            reps = [1] + [
                -(-m // n) for m, n in zip(config.inner_size, box.shape[1:])
            ]
            if any(r > 1 for r in reps):
                box = jnp.tile(box, reps)
            return jax.lax.slice(box, (0, 0, 0, 0), csz)

        self._extract = jax.jit(_extract)

        def _crop(t):
            return jax.lax.slice(
                t,
                (0, *config.pads),
                tuple(p + n for p, n in zip((config.in_chan, *config.pads), (0, *config.chunk_size))),
            )

        def _crop_scatter(buf, t, anchor):
            return jax.lax.dynamic_update_slice(
                buf, _crop(t).astype(buf.dtype), (0, anchor[0], anchor[1], anchor[2])
            )

        # Host-assembly path: crop to the kept center ON DEVICE before the
        # readback — the pad margins are (inner/chunk - 1) pure overhead on
        # the device->host link (2x at 2*48/512-pad chunks; worse for small
        # chunks), and that link is the bottleneck whenever the chunked
        # runtime is the right tool at all.
        self._crop = jax.jit(lambda t, odt: _crop(t).astype(odt),
                             static_argnums=(1,), donate_argnums=(0,))
        self._crop_scatter = jax.jit(_crop_scatter, donate_argnums=(0,))

    def _resume_fingerprint(self, input_box, z, Om) -> str:
        """Identity of one (input, cosmology, geometry) run for resume_dir.

        Chunk files are keyed by anchor only, so resuming with a different
        input box / (z, Om) / decomposition would silently assemble stale
        chunks; this fingerprint (hash of a strided input sample plus the
        run parameters — cheap even for multi-GiB boxes) catches that.
        """
        import hashlib

        cfg = self.config
        stride = max(1, input_box.shape[-1] // 16)
        sample = np.ascontiguousarray(
            np.asarray(input_box[..., ::stride, ::stride, ::stride],
                       np.float32)
        )
        h = hashlib.sha256()
        h.update(sample.tobytes())
        h.update(
            repr((
                tuple(input_box.shape), str(np.dtype(input_box.dtype)),
                float(z), float(Om), cfg.size, cfg.chunks, cfg.pad,
                str(jnp.dtype(cfg.dtype)), str(np.dtype(cfg.output_dtype)),
            )).encode()
        )
        return h.hexdigest()

    def _check_resume_manifest(self, rdir, input_box, z, Om) -> None:
        """Refuse to mix chunks from a different run into this one."""
        manifest = rdir / "manifest.json"
        fp = self._resume_fingerprint(input_box, z, Om)
        if manifest.exists():
            import json

            try:
                stored = json.loads(manifest.read_text()).get("fingerprint")
            except (OSError, ValueError):
                stored = None
            if stored != fp:
                raise ValueError(
                    f"resume_dir {rdir} holds chunks from a different run "
                    f"(input box, z/Om, or decomposition changed); delete "
                    f"it or pass a fresh directory"
                )
        else:
            import json

            tmp = manifest.with_suffix(".json.tmp")
            tmp.write_text(json.dumps({"fingerprint": fp}))
            tmp.replace(manifest)

    def _anchors(self):
        cfg = self.config
        return [
            tuple(i * cs for i, cs in zip(idx, cfg.chunk_size))
            for idx in itertools.product(*(range(c) for c in cfg.chunks))
        ]

    def process_box(self, input_box, z, Om, as_numpy: bool = True,
                    profile: bool = False, resume_dir=None):
        """Emulate a full periodic box chunk by chunk.

        The global input stays alive across all chunks, so there is no
        ``donate_input`` here; each *chunk* is donated into the inner run.
        With ``profile=True``, per-phase times summed over chunks land in
        ``self.last_timings``.

        ``resume_dir`` (host-assembly mode only) makes multi-hour runs
        restartable: every finished chunk's center crop is flushed to
        ``<dir>/chunk_<anchor>_<out>.npy`` and chunks whose files already
        exist are loaded instead of recomputed — the reference's pipeline
        restarts a crashed subbox loop from zero (SURVEY §5), this resumes
        mid-box.  The caller may delete the directory once the returned
        arrays are persisted.
        """
        cfg = self.config
        if tuple(input_box.shape) != (cfg.in_chan,) + cfg.size:
            raise ValueError(
                f"box shape {input_box.shape} != {(cfg.in_chan,) + cfg.size}"
            )
        host_in = isinstance(input_box, np.ndarray)
        nout = 2 if self.compute_vel else 1
        odt = np.dtype(cfg.output_dtype)
        if as_numpy:
            outs = [np.empty((cfg.in_chan,) + cfg.size, odt) for _ in range(nout)]
        else:
            if resume_dir is not None:
                raise ValueError("resume_dir needs host assembly (as_numpy=True)")
            outs = [
                jnp.zeros((cfg.in_chan,) + cfg.size, jnp.dtype(odt))
                for _ in range(nout)
            ]
        timings: dict[str, float] = {}
        anchors = self._anchors()

        chunk_files = None
        if resume_dir is not None:
            from pathlib import Path

            rdir = Path(resume_dir)
            rdir.mkdir(parents=True, exist_ok=True)
            self._check_resume_manifest(rdir, input_box, z, Om)

            def chunk_files(a):  # noqa: F811 — one file per output array
                tag = "_".join(str(ai) for ai in a)
                return [rdir / f"chunk_{tag}_{i}.npy" for i in range(nout)]

            done, pending = [], []
            for a in anchors:
                (done if all(f.exists() for f in chunk_files(a)) else pending).append(a)
            for a in done:
                dst = tuple(slice(ai, ai + c) for ai, c in zip(a, cfg.chunk_size))
                for o, f in zip(outs, chunk_files(a)):
                    o[(slice(None),) + dst] = np.load(f).astype(odt)
            anchors = pending
            if not anchors:
                if profile:
                    self.last_timings = {}
                return tuple(outs) if self.compute_vel else outs[0]

        def fetch(a):
            """Stage the padded chunk at anchor ``a`` onto the device."""
            start = tuple(
                (ai - p) % n for ai, p, n in zip(a, cfg.pads, cfg.size)
            )
            if host_in:
                # Native segment-memcpy gather when available (numpy's
                # broadcast fancy-index runs element-by-element — ~30 MiB/s
                # for fp16 on this host, which would dominate the pipeline
                # at >= 1 GiB padded chunks); the numpy path is the
                # always-available canonical fallback and tests assert
                # equality (tests/test_chunked.py).
                from .native import periodic_gather

                gathered = None
                if input_box.flags.c_contiguous:
                    gathered = periodic_gather(input_box, start, cfg.inner_size)
                if gathered is None:
                    idx = [
                        (np.arange(s, s + m) % n)
                        for s, m, n in zip(start, cfg.inner_size, cfg.size)
                    ]
                    gathered = input_box[
                        :, idx[0][:, None, None], idx[1][None, :, None], idx[2][None, None, :]
                    ]
                return jax.device_put(gathered)
            return self._extract(input_box, jnp.asarray(start, jnp.int32))

        # One-chunk software pipeline: the host gather + H2D of chunk i+1
        # runs while the device computes chunk i (the inner dispatch is
        # async; the blocking point is the output readback below).  Only
        # ONE inner run is ever in flight — overlapping two would double
        # the phase buffers, defeating the runtime's purpose — so the
        # extra residency is a single input chunk.  Prefetch only when a
        # blocking readback exists (host assembly): in the all-device path
        # nothing blocks, so an early _extract would just execute while
        # chunk i's uncropped outputs are still live and raise peak HBM.
        prefetch = as_numpy
        chunk = fetch(anchors[0])
        for ci, a in enumerate(anchors):
            res = self.inner.process_box(
                chunk, z, Om, as_numpy=False, profile=profile, donate_input=True
            )
            nxt = anchors[ci + 1] if ci + 1 < len(anchors) else None
            chunk = fetch(nxt) if (prefetch and nxt is not None) else None
            res = res if self.compute_vel else (res,)
            if profile:
                for k, v in self.inner.last_timings.items():
                    timings[k] = timings.get(k, 0.0) + v
            for i, (o, r) in enumerate(zip(outs, res)):
                if as_numpy:
                    # _crop donates the uncropped inner output for early
                    # release; the cropped result can never alias it
                    # (different shape), so silence the known-benign
                    # "not usable" warning (intent documented at the jit).
                    import warnings as _warnings

                    with _warnings.catch_warnings():
                        _warnings.filterwarnings(
                            "ignore",
                            message="Some donated buffers were not usable",
                        )
                        r = np.asarray(self._crop(r, jnp.dtype(odt)))
                    dst = tuple(slice(ai, ai + c) for ai, c in zip(a, cfg.chunk_size))
                    o[(slice(None),) + dst] = r
                    if chunk_files is not None:
                        f = chunk_files(a)[i]
                        tmp = f.with_suffix(".npy.tmp")
                        with open(tmp, "wb") as fh:  # file handle: np.save
                            np.save(fh, r)           # must not append .npy
                        tmp.replace(f)  # atomic: partial writes never resume
                else:
                    outs[i] = self._crop_scatter(
                        o, r, jnp.asarray(a, jnp.int32)
                    )
            del res
            if not prefetch and ci + 1 < len(anchors):
                chunk = fetch(anchors[ci + 1])
        if profile:
            self.last_timings = timings
        if self.compute_vel:
            return outs[0], outs[1]
        return outs[0]
