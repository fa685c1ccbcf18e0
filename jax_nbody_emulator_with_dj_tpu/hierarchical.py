"""Hierarchical big-box runtime: overlap-minimal periodic U-Net evaluation.

The subbox runtime (``subbox.py``) recomputes each tile's 48-voxel halo
through the whole network: at 128^3 tiles that is a 5.4x FLOP overhead.  This
runtime exploits the U-Net's structure to cut the overhead to ~1.3x:

  Phase 1 (slab-streamed encoder, level 0): conv_l00/conv_l01/down_l0 are
    applied to D-axis slabs of the full box (4-voxel D halos, periodic
    wrap in H/W), immediately downsampling each slab into the level-1
    buffer.  Full-resolution features are never stored.
  Phase 2a (conv_l1, tiled at level 1): 2-voxel halo only — the level-1
    encoder block writes a padded y1 volume.
  Phase 2b (down_l1 + conv_l2, tiled at level 1): 4-voxel halo windows of
    y1 produce a padded *level-2* buffer y2 (conv_l2 outputs).  y2 is
    1/8th the volume of y1, so carrying it is nearly free.
  Phase 2c (down_l2 .. conv_r1, tiled at level 1): the mid stack runs on
    8-voxel-margin windows of y2 (level-2 units); conv_r2's skip operand
    is the window's own center crop, conv_r1's skip is a 4-halo slice of
    y1 (still alive).  Splitting 2b/2c replaces the previous design's
    20-voxel level-1 margin — which both inflated the y1 buffer by ~1.5x
    and recomputed the whole mid stack at ~4x — with small per-stage
    halos (the deepest, cheapest ops pay the largest relative margins).
  Phase 3 (tiled final decode): per output tile, y0 is recomputed from the
    input box (halo 8) and combined with an up_r0 slice of the phase-2
    buffer through conv_r00/conv_r01 (halo 4 [3 unpacked]) — small halos
    because only four convs separate these inputs from the output.

All tiles are anchored on the global grid with even offsets at every level,
which makes this runtime equivalent (up to fp reordering) to the subbox
decomposition — asserted in tests.  Each phase is a single jitted fori_loop
with donated output buffers; inputs are expected device-resident.

**Packed execution (default).**  The 64-channel interior runs space-to-depth
packed (``ops/s2d.py``): activations keep shape (B, D, H, W/2, 2C) so every
MXU operand is 128 lanes wide — measured 1.45x over the unpacked convs on a
v5e.  Weights are pre-packed once at processor build.  The level-1 buffers
store the packed layout channels-last, (1, D/2, H/2, W/4, 2C): 2C = 128 is
exactly the TPU lane width, so the layout pays no padding and tile slices
need no transposes.  ``HierarchicalConfig(packed=False)`` falls back to the
unpacked path (equivalence asserted in tests; its C=64 channels-last
buffers pad to 128 lanes — the fallback trades HBM for simplicity).

**Periodic access = padded buffers + ghost fill.**  The level-1 buffers are
allocated with their consumer's halo margin baked in: each phase's loop
writes the interior, then six in-place strip copies replicate the periodic
ghosts (axis by axis, so edges/corners compose).  Tile reads in the next
phase are then pure ``dynamic_slice`` calls — the mod-index ``take``
gathers this replaces were previously the dominant non-conv cost.

Supports all four model variants.  The premodulated models run directly;
the flexible-cosmology *style* models fold their style vector into
premodulated weights per box (one jitted fold+pack — exact, since a
whole-box call has a single style vector) and then ride the identical
phases, so style big boxes get the same overlap-minimal runtime instead
of falling back to the 5.4x-recompute subbox path.  512^3 disp+vel fits
a 16 GB chip.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .cosmology import growth_factor, vel_norm
from .models.blocks import (
    _center_crop,
    apply_resample_block,
    apply_resample_block_packed,
    apply_resample_block_vel,
    apply_resample_block_vel_packed,
    apply_resnet_block,
    apply_resnet_block_packed,
    apply_resnet_block_packed_cat,
    apply_resnet_block_vel,
    apply_resnet_block_vel_packed,
    apply_resnet_block_vel_packed_cat,
    apply_resnet_entry_packed,
    apply_resnet_entry_vel_packed,
    pack_resample_params,
    pack_resnet_entry_params,
    pack_resnet_params,
)
from .models.cores import (
    NBodyEmulatorCore,
    NBodyEmulatorVelCore,
    StyleNBodyEmulatorCore,
    StyleNBodyEmulatorVelCore,
)
from .ops import s2d
from .ops.style import style_vector


def _wrap_pad(x, pad, axes=(1, 2, 3)):
    """Periodic pad of selected spatial axes of (B, D, H, W, C)."""
    widths = [(0, 0)] * x.ndim
    for ax, p in zip(axes, pad if isinstance(pad, (tuple, list)) else [pad] * len(axes)):
        widths[ax] = (p, p)
    return jnp.pad(x, widths, mode="wrap")


@dataclass
class HierarchicalConfig:
    size: tuple[int, int, int]
    slab: int = 32  # phase-1 D-slab thickness (even, divides size[0])
    slab_h: int | None = None  # optional phase-1 H split (even, divides
    # size[1]); halves the slab working set so memory-tight configs (the
    # velocity path) can afford thicker D-slabs (smaller relative halo)
    tile: tuple[int, int, int] = (128, 128, 128)  # phase-3 output tiles
    tile1: int | None = None  # phase-2 level-1 tile (default min(64, N/2))
    dtype: jnp.dtype = jnp.bfloat16
    output_dtype: np.dtype = np.float16
    in_chan: int = 3
    packed: bool = True  # space-to-depth packed interior (see module doc)
    wino: bool | None = None  # run eligible 3x3x3 convs through the Pallas
    # F(2,3)^2 Winograd kernel (``ops/winograd_pallas.py``; measured 1.4x
    # over XLA's conv emitter on a v5e).  None = auto: on when the packed
    # path runs on a TPU backend, off elsewhere (the kernel only compiles
    # for TPU; the packed apply functions also fall back per-call).
    y0_cache: bool = False  # phase 3 shares the recomputed level-0 skips
    # (conv_l00 + conv_l01) across the W tiles of one (D, H) strip via a
    # cached y0 strip instead of recomputing them per tile, cutting the
    # level-0 re-encode overhead from (tile+16)^3/tile^3 (~1.42x at 128^3
    # tiles) to ~1.14x.  MEASURED SLOWER on a v5e at 512^3 velocity
    # (phase 3: 8.4 s cached vs 8.0 s monolithic, Winograd convs both
    # ways): the saved re-encode MACs cost less than the strip's extra
    # HBM round-trip (write (136,136,260,128)x2 per strip + slice reads)
    # plus the decode fusion the split forfeits.  Kept as an option —
    # the balance may flip for narrower chips or mid_chan > 64.
    y0_slab_h: int | None = None  # H-segment height of the y0 strip fill
    # (bounds the entry conv's im2col transient — at (td+16) x (sh+16) x 528
    # the vel entry stack peaks at ~(sh/64) x 2 GiB); default
    # min(68, tile H + 8).  Segments are exact partitions (no overlap).
    buf_dtype: jnp.dtype | None = None  # inter-phase level-buffer storage
    # (default: same as ``dtype``).  For float32 compute on TPU, set
    # bfloat16: every buffer consumer is a conv whose operands XLA rounds
    # to bfloat16 anyway (default TPU matmul precision — the analog of the
    # reference's TF32-on-A100 f32 rows), so rounding at the buffer write
    # is the same single rounding the consumer would apply; in-tile math
    # stays f32.  Left at f32, XLA hoists a FULL bf16 copy of each
    # loop-invariant buffer out of the tile loops (convert(dynamic_slice)
    # -> dynamic_slice(convert) + LICM; optimization_barrier does not
    # survive the TPU backend) — +2.2 GiB temp per consumed buffer at
    # 512^3, which is what pushed monolithic f32 past 16 GB.

    def __post_init__(self):
        self.size = tuple(int(s) for s in self.size)
        self.tile = tuple(int(t) for t in self.tile)
        if self.size[0] % self.slab or self.slab % 2:
            raise ValueError(f"slab {self.slab} must be even and divide D={self.size[0]}")
        if self.slab_h is not None and (self.size[1] % self.slab_h or self.slab_h % 2):
            raise ValueError(
                f"slab_h {self.slab_h} must be even and divide H={self.size[1]}"
            )
        for s, t in zip(self.size, self.tile):
            if s % t or t % 2:
                raise ValueError(f"tile {self.tile} must be even and divide size {self.size}")
        for s in self.size:
            if s % 8:
                raise ValueError(f"size {self.size} must be divisible by 8 (3 levels)")
        if self.tile1 is None:
            cap = min(64, min(self.size) // 2)
            step = 8 if self.packed else 4
            self.tile1 = next(
                (m for m in range(cap - cap % step, 0, -step)
                 if all((s // 2) % m == 0 for s in self.size)),
                cap,
            )
        if self.tile1 % 4 or any((s // 2) % self.tile1 for s in self.size):
            raise ValueError(
                f"tile1 {self.tile1} must be a multiple of 4 dividing size/2"
            )
        if self.packed:
            # W-parity packing: stride-2 grids and cell-aligned tile slices
            # need one extra factor of 2 in the W geometry.
            if self.tile1 % 8:
                raise ValueError(f"packed mode needs tile1 % 8 == 0, got {self.tile1}")
            if self.tile[2] % 4:
                raise ValueError(f"packed mode needs tile W % 4 == 0, got {self.tile}")
        if self.y0_slab_h is None:
            self.y0_slab_h = min(68, self.tile[1] + 8)
        if self.y0_slab_h < 2:
            raise ValueError(f"y0_slab_h {self.y0_slab_h} must be >= 2")
        if self.buf_dtype is None:
            self.buf_dtype = self.dtype


class HierarchicalProcessor:
    """Overlap-minimal runtime for the 3-level models (premod or style)."""

    def __init__(self, model, params, config: HierarchicalConfig):
        if not isinstance(
            model,
            (
                NBodyEmulatorCore,
                NBodyEmulatorVelCore,
                StyleNBodyEmulatorCore,
                StyleNBodyEmulatorVelCore,
            ),
        ):
            raise TypeError(
                "HierarchicalProcessor supports the premodulated and style "
                "emulator cores."
            )
        if getattr(model, "levels", 3) != 3:
            raise ValueError("hierarchical runtime implements the 3-level topology")
        self.model = model
        self.params = params
        self.config = config
        self.styled = isinstance(
            model, (StyleNBodyEmulatorCore, StyleNBodyEmulatorVelCore)
        )
        self.compute_vel = isinstance(
            model, (NBodyEmulatorVelCore, StyleNBodyEmulatorVelCore)
        )
        if self.styled:
            # A whole-box call evaluates ONE style vector, so the styled
            # forward equals the premodulated forward with the style folded
            # at that (z, Om) — the fold IS the reference's premodulation
            # (``nbody_emulator.py:150-187, 221-266``), bit-compared in
            # tests.  Folding + packing per box is ~25 MB of weight math,
            # negligible against the box itself, and lets the flexible-
            # cosmology models ride the same overlap-minimal phases.
            self._exec_params = None
            self._fold = jax.jit(self._fold_exec)
        else:
            self._exec_params = (
                {"params": self._pack_params(params["params"])}
                if config.packed
                else params
            )

        # Each phase is ONE jitted program: a fori_loop whose body does
        # slice(s) from the source buffer, the phase network, and an
        # in-place scatter into the (donated) destination buffer.  Eager
        # per-tile dispatch (and per-tile host->device anchor transfers)
        # dominated early versions of this runtime.
        self._phase1 = jax.jit(self._phase1_all, donate_argnums=(2,))
        self._phase2a = jax.jit(self._phase2a_all, donate_argnums=(2,))
        self._phase2b = jax.jit(self._phase2b_all, donate_argnums=(2,))
        self._phase2c = jax.jit(self._phase2c_all, donate_argnums=(3,))
        self._phase3 = jax.jit(self._phase3_all, donate_argnums=(3,))
        # Input scale+wrap-pad, jitted ONCE here: a fresh jit(lambda) per
        # process_box call retraces and recompiles every box (~3 s at 512^3).
        dtype = config.dtype

        def _scale_fn(b, dz):
            return _wrap_pad(
                b[None] * (dz.astype(dtype) / jnp.asarray(6.0, dtype)),
                8,
                axes=(2, 3, 4),
            )

        self._scale = jax.jit(_scale_fn)
        # Donating variant: frees the caller's input buffer once the padded
        # copy exists (~1 GB at 512^3) — the margin that lets the widest
        # phase-3 tiles fit a 16 GB chip.  Callers opt in via
        # ``process_box(..., donate_input=True)`` and must not reuse the
        # array afterwards.
        self._scale_donate = jax.jit(_scale_fn, donate_argnums=(0,))

    def _fold_exec(self, params, z, Om):
        """Style params -> premodulated (packed) exec params at one (z, Om)."""
        from .emulator import _modulate_tree

        Dz = growth_factor(z, Om)
        s = style_vector(Om, Dz)[0]
        # factors=True: the fold also emits the tangent kernel's exact rank
        # factors (g, c), which the packed vel layers use to run the tangent
        # as ONE conv sharing the primal kernel (see pack_conv_layer_params).
        folded = _modulate_tree(
            params, s, vel=self.compute_vel, eps=self.model.eps, factors=True
        )
        if self.config.packed:
            return {"params": self._pack_params(folded["params"])}
        return folded

    def _exec_params_for(self, z, Om):
        """Per-call execution params (jitted style fold, or the baked tree)."""
        if not self.styled:
            return self._exec_params
        return self._fold(
            self.params,
            jnp.asarray(z, jnp.float32),
            jnp.asarray(Om, jnp.float32),
        )

    def _pack_params(self, p):
        """Pre-pack the interior layers' weights for packed execution."""
        vel = self.compute_vel
        wino = self.config.wino
        if wino is None:
            wino = jax.default_backend() == "tpu"
        pp = {
            # entry block: NCDHW C=3 input -> packed directly (XLA's conv
            # emitter is pathological on 3-channel inputs)
            "conv_l00": pack_resnet_entry_params(
                p["conv_l00"], "CACA", vel=vel, wino=wino
            ),
            # exit block: stays packed through the 64->3 tail; the output
            # leaves packed space via one unpack_to_ncdhw relayout
            "conv_r01": pack_resnet_params(p["conv_r01"], "CAC", vel=vel, wino=wino),
        }
        for name in ("conv_l01", "conv_l1", "conv_l2", "conv_c"):
            pp[name] = pack_resnet_params(p[name], "CACA", vel=vel, wino=wino)
        for name in ("conv_r2", "conv_r1", "conv_r00"):
            pp[name] = pack_resnet_params(
                p[name], "CACA", groups=2, vel=vel, wino=wino
            )
        for name in ("down_l0", "down_l1", "down_l2"):
            pp[name] = pack_resample_params(p[name], "DA", vel=vel)
        for name in ("up_r2", "up_r1", "up_r0"):
            pp[name] = pack_resample_params(p[name], "UA", vel=vel)
        return pp

    # Level-1 buffer margins: each buffer is padded by its consumer's halo
    # so tile reads are pure dynamic_slices (ghosts filled in-place after
    # the producing phase).  Margins are (D, H, W) in the buffer's own W
    # units (cells when packed).
    def _h1_margin(self):
        m = self.PHASE2A_MARGIN
        return (m, m, m // 2) if self.config.packed else (m, m, m)

    def _y1_margin(self):
        m = self.PHASE2B_MARGIN
        return (m, m, m // 2) if self.config.packed else (m, m, m)

    def _y2_margin(self):
        m = self.PHASE2C_MARGIN
        return (m, m, m // 2) if self.config.packed else (m, m, m)

    def _r1_margin(self):
        if self.config.packed:
            m = self.PHASE3_R1_MARGIN_PACKED
            return (m, m, m // 2)
        m = self.PHASE3_R1_MARGIN
        return (m, m, m)

    def _buf_shape(self, margin, level: int = 1):
        """Padded level-``level`` buffer shape (channels-last; packed 2C)."""
        cfg = self.config
        mid = self.model.mid_chan
        nd, nh, nw = cfg.size
        f = 2**level
        wdim = nw // (2 * f) if cfg.packed else nw // f
        chan = 2 * mid if cfg.packed else mid
        return (
            1,
            nd // f + 2 * margin[0],
            nh // f + 2 * margin[1],
            wdim + 2 * margin[2],
            chan,
        )

    def _fill_margins(self, buf, margins):
        """Fill a padded buffer's halo margins.

        Single-device: periodic self-wrap (ghost fill).  The sharded
        composition (``parallel/sharded_hierarchical.py``) overrides this
        with a ``ppermute`` exchange that pulls the margins from mesh
        neighbors instead — everything else about the phases is shared.
        """
        return self._ghost_fill(buf, margins)

    @staticmethod
    def _ghost_fill(buf, margins):
        """Fill periodic ghost strips of a (1, D, H, W, C) padded buffer.

        Sequential per-axis copies: once axis d's ghosts are filled, axis
        h's strip copies span the full (already-ghosted) d extent, so
        edges/corners come out right.  Each ghost side grows outward in
        period-sized chunks so margins wider than the interior (tiny test
        boxes) wrap correctly; production margins need one chunk per side.
        """
        for ax, m in zip((1, 2, 3), margins):
            if m == 0:
                continue
            n = buf.shape[ax] - 2 * m
            lo = m  # lowest filled index
            while lo > 0:
                w = min(n, lo)
                src = jax.lax.slice_in_dim(buf, lo + n - w, lo + n, axis=ax)
                buf = jax.lax.dynamic_update_slice_in_dim(buf, src, lo - w, axis=ax)
                lo -= w
            hi = m + n  # first unfilled index on the high side
            while hi < n + 2 * m:
                w = min(n, n + 2 * m - hi)
                src = jax.lax.slice_in_dim(buf, hi - n, hi - n + w, axis=ax)
                buf = jax.lax.dynamic_update_slice_in_dim(buf, src, hi, axis=ax)
                hi += w
        return buf

    def _tile_anchors(self, steps3):
        import itertools

        grid = list(itertools.product(*[range(0, n, s) for n, s in steps3]))
        return jnp.asarray(np.asarray(grid, np.int32))

    def _phase1_all(self, params, boxp, h1_out):
        cfg = self.config
        n_slabs = cfg.size[0] // cfg.slab
        sh = cfg.slab_h or cfg.size[1]
        n_h = cfg.size[1] // sh

        def body(i, h1):
            return self._phase1_step(
                params, boxp, (i // n_h) * cfg.slab, (i % n_h) * sh, h1
            )

        h1 = jax.lax.fori_loop(0, n_slabs * n_h, body, h1_out)
        m = self._h1_margin()
        return tuple(self._fill_margins(h, m) for h in h1)

    def _phase2a_all(self, params, h1, y1_out):
        cfg = self.config
        anchors = self._tile_anchors([(s // 2, cfg.tile1) for s in cfg.size])

        def body(i, y1):
            return self._phase2a_step(params, h1, anchors[i], y1)

        y1 = jax.lax.fori_loop(0, anchors.shape[0], body, y1_out)
        m = self._y1_margin()
        return tuple(self._fill_margins(y, m) for y in y1)

    def _phase2b_all(self, params, y1, y2_out):
        cfg = self.config
        anchors = self._tile_anchors([(s // 2, cfg.tile1) for s in cfg.size])

        def body(i, y2):
            return self._phase2b_step(params, y1, anchors[i], y2)

        y2 = jax.lax.fori_loop(0, anchors.shape[0], body, y2_out)
        m = self._y2_margin()
        return tuple(self._fill_margins(y, m) for y in y2)

    def _phase2c_all(self, params, y1, y2, r1_out):
        cfg = self.config
        anchors = self._tile_anchors([(s // 2, cfg.tile1) for s in cfg.size])

        def body(i, r1):
            return self._phase2c_step(params, y1, y2, anchors[i], r1)

        r1 = jax.lax.fori_loop(0, anchors.shape[0], body, r1_out)
        m = self._r1_margin()
        return tuple(self._fill_margins(r, m) for r in r1)

    def _phase3_all(self, params, boxp, r1, outs, Dz, vel_fac):
        cfg = self.config
        if not cfg.y0_cache:
            anchors = self._tile_anchors(list(zip(cfg.size, cfg.tile)))

            def body(i, o):
                return self._phase3_step(
                    params, (boxp,) + r1, anchors[i], o, Dz, vel_fac
                )

            return jax.lax.fori_loop(0, anchors.shape[0], body, outs)

        # y0-strip-cached decode: one level-0 re-encode per (D, H) strip,
        # shared by every W tile of that strip (see config.y0_cache).  The
        # strip is a loop-body VALUE, never a loop carry — a slab-wide
        # cache carried across fori iterations gets multi-buffered by XLA
        # (3x a 4.4 GiB buffer at 512^3 velocity); a per-strip value costs
        # one ~1.2 GiB transient the allocator frees at iteration end.
        td, th, tw = cfg.tile
        nd, nh_, nw_ = cfg.size
        anchors_dh = self._tile_anchors([(nd, td), (nh_, th)])
        n_w = nw_ // tw

        def dh_body(i, o):
            d0, h0 = anchors_dh[i][0], anchors_dh[i][1]
            y0 = self._y0_strip(params, boxp, d0, h0)

            def w_body(wi, oo):
                return self._phase3_step_cached(
                    params, boxp, r1, y0, d0, h0, wi * tw, oo, Dz, vel_fac
                )

            return jax.lax.fori_loop(0, n_w, w_body, o)

        return jax.lax.fori_loop(0, anchors_dh.shape[0], dh_body, outs)

    def _y0_strip(self, params, boxp, d0, h0):
        """Level-0 features (conv_l00 + conv_l01) for one (D, H) strip.

        Returns a tuple of (1, td+8, th+8, (W+8)[/2, cells], mid) values
        (primal[, tangent]) covering the halo-4 needs of every W tile in
        the strip.  Computed in static H segments of ~y0_slab_h rows
        (bounding the entry conv's im2col transient) and concatenated —
        straight-line code, so no buffer is ever a loop carry.
        """
        cfg = self.config
        td, th = cfg.tile[0], cfg.tile[1]
        nw_ = cfg.size[2]
        sh = cfg.y0_slab_h
        rows = th + 8
        nbuf = 2 if self.compute_vel else 1
        segs = []
        o = 0
        while o < rows:
            n = min(sh, rows - o)
            slab = jax.lax.dynamic_slice(
                boxp,
                (0, 0, d0, h0 + o, 0),
                (1, cfg.in_chan, td + 16, n + 8, nw_ + 16),
            )
            if segs:
                # Serialize the segments: without this barrier XLA's
                # scheduler interleaves the independent segment subgraphs
                # and their ~0.3 GiB intermediates all coexist (measured
                # +3 GiB peak at 512^3 velocity).
                slab, _ = jax.lax.optimization_barrier((slab, segs[-1][0]))
            out = self._y0_slab(params, slab)
            segs.append(out if self.compute_vel else (out,))
            o += n
        if len(segs) == 1:
            out = segs[0]
        else:
            out = tuple(
                jnp.concatenate([s[b] for s in segs], axis=2) for b in range(nbuf)
            )
        # Store the strip at buf_dtype (bf16 in the f32-compute mode — the
        # same single rounding every inter-phase buffer applies); consumers
        # upcast via _read_tile.
        if jnp.dtype(cfg.buf_dtype) != jnp.dtype(cfg.dtype):
            out = tuple(t.astype(cfg.buf_dtype) for t in out)
        return out

    def _y0_slab(self, params, slab):
        """conv_l00 + conv_l01 on one NCDHW slab (phase-1's stack minus the
        downsample): (1, C, SD+16, SH+16, W+16) -> level-0 features
        (1, SD+8, SH+8, (W+8)[/2, cells], mid) (+ tangent)."""
        p = params["params"]
        packed = self.config.packed
        if self.compute_vel:
            if packed:
                h, dh = apply_resnet_entry_vel_packed(p["conv_l00"], slab)
                return apply_resnet_block_vel_packed(p["conv_l01"], h, dh, "CACA")
            h, dh = apply_resnet_block_vel(
                p["conv_l00"], slab, None, "CACA", in_fmt="NCDHW"
            )
            return apply_resnet_block_vel(p["conv_l01"], h, dh, "CACA")
        if packed:
            h = apply_resnet_entry_packed(p["conv_l00"], slab)
            return apply_resnet_block_packed(p["conv_l01"], h, "CACA")
        h = apply_resnet_block(p["conv_l00"], slab, "CACA", in_fmt="NCDHW")
        return apply_resnet_block(p["conv_l01"], h, "CACA")

    def _phase1_step(self, params, boxp, d0, h0, h1_out):
        cfg = self.config
        sh = cfg.slab_h or cfg.size[1]
        nw = cfg.size[2]
        slab = jax.lax.dynamic_slice(
            boxp,
            (0, 0, d0 + 4, h0 + 4, 4),
            (1, cfg.in_chan, cfg.slab + 8, sh + 8, nw + 8),
        )
        out = self._phase1_slab(params, slab)
        outs = out if self.compute_vel else (out,)
        m = self._h1_margin()
        return tuple(
            jax.lax.dynamic_update_slice(
                buf, o.astype(buf.dtype), (0, m[0] + d0 // 2, m[1] + h0 // 2, m[2], 0)
            )
            for buf, o in zip(h1_out, outs)
        )

    def _read_tile(self, t):
        """Upcast a level-buffer tile slice to the compute dtype.

        No-op unless ``buf_dtype != dtype`` (the f32-compute/bf16-buffer
        mode, see ``HierarchicalConfig.buf_dtype``).  XLA folds the
        upcast into consumers: conv operands collapse back to bf16
        (convert(convert(x)) -> x), while elementwise ops (the factored
        tangent's x*g + dx, biases, residual adds) run in f32.
        """
        if jnp.dtype(self.config.buf_dtype) != jnp.dtype(self.config.dtype):
            return t.astype(self.config.dtype)
        return t

    def _tile_window(self, bufs, start, halo, out_margin):
        """Slice a (tile1 + 2*halo) window from padded buffers at `start`.

        The buffers carry exactly `halo` baked margin, so the window begins
        at the plain anchor in buffer coordinates.  Returns (windows, s5)
        where s5 is the write offset into a buffer with `out_margin`.
        """
        cfg = self.config
        m1 = cfg.tile1
        if cfg.packed:
            starts = (0, start[0], start[1], start[2] // 2, 0)
            sizes = (m1 + 2 * halo, m1 + 2 * halo, (m1 + 2 * halo) // 2)
            s5 = (
                0,
                out_margin[0] + start[0],
                out_margin[1] + start[1],
                out_margin[2] + start[2] // 2,
                0,
            )
        else:
            starts = (0, start[0], start[1], start[2], 0)
            sizes = (m1 + 2 * halo,) * 3
            s5 = (
                0,
                out_margin[0] + start[0],
                out_margin[1] + start[1],
                out_margin[2] + start[2],
                0,
            )
        chan = bufs[0].shape[-1]

        def tslice(h):
            return self._read_tile(
                jax.lax.dynamic_slice(h, starts, (1,) + sizes + (chan,))
            )

        if self.compute_vel:
            return tuple(tslice(h) for h in bufs), s5
        return tslice(bufs[0]), s5

    def _phase2a_step(self, params, h1, start, y1_out):
        t, s5 = self._tile_window(h1, start, self.PHASE2A_MARGIN, self._y1_margin())
        out = self._phase2a_tile(params, t)
        outs = out if self.compute_vel else (out,)
        return tuple(
            jax.lax.dynamic_update_slice(buf, o.astype(buf.dtype), s5)
            for buf, o in zip(y1_out, outs)
        )

    def _phase2b_step(self, params, y1, start, y2_out):
        t, _ = self._tile_window(y1, start, self.PHASE2B_MARGIN, (0, 0, 0))
        out = self._phase2b_tile(params, t)
        outs = out if self.compute_vel else (out,)
        m = self._y2_margin()
        wdiv = 4 if self.config.packed else 2
        s5 = (
            0,
            m[0] + start[0] // 2,
            m[1] + start[1] // 2,
            m[2] + start[2] // wdiv,
            0,
        )
        return tuple(
            jax.lax.dynamic_update_slice(buf, o.astype(buf.dtype), s5)
            for buf, o in zip(y2_out, outs)
        )

    def _phase2c_step(self, params, y1, y2, start, r1_out):
        cfg = self.config
        m1 = cfg.tile1
        # y2 window: level-2 extent M/2 + 2*PHASE2C_MARGIN anchored at the
        # plain level-2 anchor (the buffer carries exactly that margin).
        mc = self.PHASE2C_MARGIN
        if cfg.packed:
            st2 = (0, start[0] // 2, start[1] // 2, start[2] // 4, 0)
            sz2 = (m1 // 2 + 2 * mc, m1 // 2 + 2 * mc, (m1 // 2 + 2 * mc) // 2)
        else:
            st2 = (0, start[0] // 2, start[1] // 2, start[2] // 2, 0)
            sz2 = (m1 // 2 + 2 * mc,) * 3
        chan = y2[0].shape[-1]

        def t2slice(b):
            return self._read_tile(
                jax.lax.dynamic_slice(b, st2, (1,) + sz2 + (chan,))
            )

        t2 = tuple(t2slice(b) for b in y2) if self.compute_vel else t2slice(y2[0])
        # conv_r1's skip: 4-halo y1 slice (extent M+8), same margin the
        # phase-2b windows use, so the y1 buffer serves both consumers.
        t1, s5 = self._tile_window(y1, start, self.PHASE2B_MARGIN, self._r1_margin())
        out = self._phase2c_tile(params, t2, t1)
        outs = out if self.compute_vel else (out,)
        return tuple(
            jax.lax.dynamic_update_slice(buf, o.astype(buf.dtype), s5)
            for buf, o in zip(r1_out, outs)
        )

    def _phase3_step(self, params, srcs, a, outs, Dz, vel_fac):
        cfg = self.config
        boxp, r1 = srcs[0], srcs[1:]
        td, th, tw = cfg.tile
        box_tile = jax.lax.dynamic_slice(
            boxp, (0, 0, a[0], a[1], a[2]),
            (1, cfg.in_chan, td + 16, th + 16, tw + 16),
        )
        # Level-1 slices (halo 4 packed / 3 unpacked): r1 is padded by that
        # margin, so the slice starts at the plain level-1 anchor.
        hm = self.PHASE3_R1_MARGIN_PACKED if cfg.packed else self.PHASE3_R1_MARGIN

        def r_slice(buf):
            starts = [a[0] // 2, a[1] // 2]
            sizes = [td // 2 + 2 * hm, th // 2 + 2 * hm]
            if cfg.packed:
                starts.append(a[2] // 4)
                sizes.append((tw // 2 + 2 * hm) // 2)
            else:
                starts.append(a[2] // 2)
                sizes.append(tw // 2 + 2 * hm)
            return self._read_tile(
                jax.lax.dynamic_slice(
                    buf, (0, *starts, 0), (1, *sizes, buf.shape[-1])
                )
            )

        if self.compute_vel:
            r1_tile = tuple(r_slice(r) for r in r1)
        else:
            r1_tile = r_slice(r1[0])
        out = self._phase3_tile(params, box_tile, r1_tile, Dz, vel_fac)
        out = out if self.compute_vel else (out,)
        out_dtype = outs[0].dtype
        return tuple(
            jax.lax.dynamic_update_slice(buf, o.astype(out_dtype), (0, 0, a[0], a[1], a[2]))
            for buf, o in zip(outs, out)
        )

    def _phase3_step_cached(self, params, boxp, r1, y0, d0, a1, aw, outs, Dz, vel_fac):
        """Decode one W tile of the current (D, H) y0 strip.

        y0 strip coordinates (derivation: the level-0 stack consumes 4
        voxels/side from the padded box, so strip index i maps to global
        coordinate d0+i-4 / h0+i-4; packed W cell u holds globals
        {2u-4, 2u-3}): the halo-4 window for output tile (d0, h0, aw)
        spans the full strip in D and H and starts at cell aw[/2] in W
        with extent (tw+8)[/2].
        """
        cfg = self.config
        td, th, tw = cfg.tile
        wu = 2 if cfg.packed else 1

        def y0_slice(buf):
            return self._read_tile(
                jax.lax.dynamic_slice(
                    buf,
                    (0, 0, 0, aw // wu, 0),
                    (1, td + 8, th + 8, (tw + 8) // wu, buf.shape[-1]),
                )
            )

        hm = self.PHASE3_R1_MARGIN_PACKED if cfg.packed else self.PHASE3_R1_MARGIN

        def r_slice(buf):
            starts = [d0 // 2, a1 // 2]
            sizes = [td // 2 + 2 * hm, th // 2 + 2 * hm]
            if cfg.packed:
                starts.append(aw // 4)
                sizes.append((tw // 2 + 2 * hm) // 2)
            else:
                starts.append(aw // 2)
                sizes.append(tw // 2 + 2 * hm)
            return self._read_tile(
                jax.lax.dynamic_slice(
                    buf, (0, *starts, 0), (1, *sizes, buf.shape[-1])
                )
            )

        # Residual slice needs no halo at all (the monolithic step's
        # (T+16)^3 box window existed only for the per-tile re-encode).
        x0 = jax.lax.dynamic_slice(
            boxp, (0, 0, d0 + 8, a1 + 8, aw + 8), (1, cfg.in_chan, td, th, tw)
        )
        if self.compute_vel:
            y0_t = tuple(y0_slice(b) for b in y0)
            r1_t = tuple(r_slice(r) for r in r1)
        else:
            y0_t = y0_slice(y0[0])
            r1_t = r_slice(r1[0])
        out = self._phase3_tile_cached(params, x0, y0_t, r1_t, Dz, vel_fac)
        out = out if self.compute_vel else (out,)
        out_dtype = outs[0].dtype
        return tuple(
            jax.lax.dynamic_update_slice(
                buf, o.astype(out_dtype), (0, 0, d0, a1, aw)
            )
            for buf, o in zip(outs, out)
        )

    def _phase3_tile_cached(self, params, x0, y0_t, r1_tile, Dz, vel_fac):
        """``_phase3_tile`` minus the level-0 re-encode: y0 comes from the
        slab cache; x0 is the exact residual slice."""
        p = params["params"]
        vel = self.compute_vel
        packed = self.config.packed
        uc, ucw = (4, 2) if packed else (2, 2)

        if vel:
            y0, dy0 = y0_t
            r1, dr1 = r1_tile
            if packed:
                u, du = apply_resample_block_vel_packed(p["up_r0"], r1, dr1, "UA")
                u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
                du = du[:, uc:-uc, uc:-uc, ucw:-ucw]
                h, dh = apply_resnet_block_vel_packed_cat(
                    p["conv_r00"], (y0, u), (dy0, du), "CACA"
                )
                h, dh = apply_resnet_block_vel_packed(p["conv_r01"], h, dh, "CAC")
                h, dh = s2d.unpack_to_ncdhw(h), s2d.unpack_to_ncdhw(dh)
            else:
                u, du = apply_resample_block_vel(p["up_r0"], r1, dr1, "UA")
                u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
                du = du[:, uc:-uc, uc:-uc, ucw:-ucw]
                h = jnp.concatenate([y0, u], -1)
                dh = jnp.concatenate([dy0, du], -1)
                h, dh = apply_resnet_block_vel(p["conv_r00"], h, dh, "CACA")
                h, dh = apply_resnet_block_vel(
                    p["conv_r01"], h, dh, "CAC", out_fmt="NCDHW"
                )
            disp = (h + x0) * jnp.asarray(6.0, h.dtype)
            vf = vel_fac.reshape((1,) * 5)
            dz = Dz.reshape((1,) * 5)
            velocity = dh * (vf * 6.0).astype(h.dtype) + x0 * (
                vf * 6.0 / dz
            ).astype(h.dtype)
            return disp, velocity
        if packed:
            u = apply_resample_block_packed(p["up_r0"], r1_tile, "UA")
            u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
            h = apply_resnet_block_packed_cat(p["conv_r00"], (y0_t, u), "CACA")
            h = apply_resnet_block_packed(p["conv_r01"], h, "CAC")
            h = s2d.unpack_to_ncdhw(h)
        else:
            u = apply_resample_block(p["up_r0"], r1_tile, "UA")
            u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
            h = jnp.concatenate([y0_t, u], -1)
            h = apply_resnet_block(p["conv_r00"], h, "CACA")
            h = apply_resnet_block(p["conv_r01"], h, "CAC", out_fmt="NCDHW")
        return (h + x0) * jnp.asarray(6.0, h.dtype)

    # ------------------------------------------------------------------
    # Phase 1: level-0 encoder on one D-slab -> level-1 rows
    # ------------------------------------------------------------------

    def _phase1_slab(self, params, slab):
        """slab: (1, C, S+8, H+8, W+8) scaled input (wrap halos included).

        Returns the down_l0 output rows (1, S/2, H/2, W/2[, cells], mid)
        (+ tangent).
        """
        p = params["params"]
        packed = self.config.packed
        if self.compute_vel:
            if packed:
                h, dh = apply_resnet_entry_vel_packed(p["conv_l00"], slab)
                h, dh = apply_resnet_block_vel_packed(p["conv_l01"], h, dh, "CACA")
                return apply_resample_block_vel_packed(p["down_l0"], h, dh, "DA")
            h, dh = apply_resnet_block_vel(p["conv_l00"], slab, None, "CACA", in_fmt="NCDHW")
            h, dh = apply_resnet_block_vel(p["conv_l01"], h, dh, "CACA")
            return apply_resample_block_vel(p["down_l0"], h, dh, "DA")
        if packed:
            h = apply_resnet_entry_packed(p["conv_l00"], slab)
            h = apply_resnet_block_packed(p["conv_l01"], h, "CACA")
            return apply_resample_block_packed(p["down_l0"], h, "DA")
        h = apply_resnet_block(p["conv_l00"], slab, "CACA", in_fmt="NCDHW")
        h = apply_resnet_block(p["conv_l01"], h, "CACA")
        return apply_resample_block(p["down_l0"], h, "DA")

    # ------------------------------------------------------------------
    # Phase 2: deep network (level 1 .. conv_r1), tiled at level 1
    # ------------------------------------------------------------------
    #
    # Phase 2 is split so the margin recompute stays small:
    #   2a: conv_l1 alone — 2-voxel halo at level 1;
    #   2b: down_l1 + conv_l2 — 4-voxel halo at level 1, writing the
    #       level-2 buffer y2 (exact tiles, no slack);
    #   2c: down_l2 .. conv_r1 — 8-voxel halo at level 2 around y2 windows
    #       (the margin the L3 round trip consumes: down 16 -> conv_c 8 ->
    #       up 8 -> conv_r2 4 -> up 8 -> conv_r1 4, with a final 2-voxel
    #       level-1 slack crop keeping every stride-2 grid even-aligned);
    #       conv_r2's skip is the window's own center crop, conv_r1's skip
    #       is a 4-halo slice of the still-live y1 buffer.
    # Earlier designs: monolithic margin 22 paid ~4.8x recompute at
    # tile1=64; a two-way split (margin 20 around the whole mid stack)
    # paid ~4x on the mid stack AND inflated the y1 buffer by ~1.5x — at
    # 512^3 velocity that margin alone was ~2 GB of HBM.
    PHASE2A_MARGIN = 2
    PHASE2B_MARGIN = 4
    PHASE2C_MARGIN = 8  # level-2 voxels
    # Phase-3 level-1 halo: 3 voxels suffice (up_r0 + 2 convs); packed mode
    # uses 4 so the slice start lands on a W cell boundary.
    PHASE3_R1_MARGIN = 3
    PHASE3_R1_MARGIN_PACKED = 4

    def _block_helpers(self, params):
        """(resnet, resample, cat, crop_like) closures over packed/vel mode."""
        p = params["params"]
        vel = self.compute_vel
        packed = self.config.packed

        def crop_like(y, h):
            target = h[0].shape[1:4] if vel else h.shape[1:4]
            if vel:
                return (_center_crop(y[0], target), _center_crop(y[1], target))
            return _center_crop(y, target)

        def resnet(name, x):
            if packed:
                if vel:
                    return apply_resnet_block_vel_packed(p[name], x[0], x[1], "CACA")
                return apply_resnet_block_packed(p[name], x, "CACA")
            if vel:
                return apply_resnet_block_vel(p[name], x[0], x[1], "CACA")
            return apply_resnet_block(p[name], x, "CACA")

        def resample(name, x, seq):
            if packed:
                if vel:
                    return apply_resample_block_vel_packed(p[name], x[0], x[1], seq)
                return apply_resample_block_packed(p[name], x, seq)
            if vel:
                return apply_resample_block_vel(p[name], x[0], x[1], seq)
            return apply_resample_block(p[name], x, seq)

        def cat(a, b):
            if vel:
                return (
                    jnp.concatenate([a[0], b[0]], -1),
                    jnp.concatenate([a[1], b[1]], -1),
                )
            return jnp.concatenate([a, b], -1)

        def resnet_cat(name, a, b):
            """Decoder block on cat(a, b) without materializing the concat
            (packed mode; the unpacked fallback concatenates)."""
            if packed:
                if vel:
                    return apply_resnet_block_vel_packed_cat(
                        p[name], (a[0], b[0]), (a[1], b[1]), "CACA"
                    )
                return apply_resnet_block_packed_cat(p[name], (a, b), "CACA")
            return resnet(name, cat(a, b))

        return resnet, resample, cat, crop_like, resnet_cat

    def _phase2a_tile(self, params, t):
        """conv_l1 on a (1, M+4, M+4, (M+4)[/2], mid) slice -> exact M tile."""
        resnet, _, _, _, _ = self._block_helpers(params)
        return resnet("conv_l1", t)

    def _phase2b_tile(self, params, t):
        """down_l1 + conv_l2 on a (1, M+8, M+8, (M+8)[/2], mid) y1 window.

        Returns the exact (1, M/2, M/2, (M/2)[/2], mid) conv_l2 tile
        (+tangent) — no slack: down halves M+8 to M/2+4 and the 'CACA'
        block consumes 2 per side.
        """
        resnet, resample, _, _, _ = self._block_helpers(params)
        h = resample("down_l1", t, "DA")
        return resnet("conv_l2", h)

    def _phase2c_tile(self, params, t2, t1):
        """down_l2 .. conv_r1 on a level-2 y2 window plus a y1 skip slice.

        Args:
            t2: (1, M/2+16, M/2+16, (M/2+16)[/2], mid) conv_l2 window.
            t1: (1, M+8, M+8, (M+8)[/2], mid) conv_l1 (skip) slice.
        Returns the conv_r1 output tile (1, M, M, M[/2], mid) (+tangent).
        Extents (level): t2 M/2+16 (L2) -> down M/4+8 (L3) -> conv_c
        M/4+4 -> up M/2+8 (L2) -> conv_r2[cat center-crop(t2)] M/2+4 ->
        up M+8 (L1) -> conv_r1[cat t1] M+4 -> slack crop 2/side -> M.
        """
        vel = self.compute_vel
        packed = self.config.packed
        resnet, resample, cat, crop_like, resnet_cat = self._block_helpers(params)

        h = resample("down_l2", t2, "DA")
        h = resnet("conv_c", h)
        h = resample("up_r2", h, "UA")
        h = resnet_cat("conv_r2", crop_like(t2, h), h)
        h = resample("up_r1", h, "UA")
        h = resnet_cat("conv_r1", crop_like(t1, h), h)
        wslack = 1 if packed else 2
        if vel:
            return (
                h[0][:, 2:-2, 2:-2, wslack:-wslack],
                h[1][:, 2:-2, 2:-2, wslack:-wslack],
            )
        return h[:, 2:-2, 2:-2, wslack:-wslack]

    # ------------------------------------------------------------------
    # Phase 3: final decode of one tile
    # ------------------------------------------------------------------

    def _phase3_tile(self, params, box_tile, r1_tile, Dz, vel_fac):
        """One output tile.

        Args:
            box_tile: (1, C, T+16, ., .) scaled input slice (halo 8/side).
            r1_tile: level-1 slice (+tangent) — halo 4 packed / 3 unpacked.
        Returns NCDHW displacement tile (and velocity tile).
        """
        p = params["params"]
        vel = self.compute_vel
        packed = self.config.packed
        m = 8  # margin consumed from box_tile: (T+16) -> T
        x0 = box_tile[:, :, m:-m, m:-m, m:-m]
        # up_r0 slack crop per side: margin 4 -> 4 voxels (2 cells) packed,
        # margin 3 -> 2 voxels unpacked.
        uc, ucw = (4, 2) if packed else (2, 2)

        if vel:
            r1, dr1 = r1_tile
            if packed:
                y0, dy0 = apply_resnet_entry_vel_packed(p["conv_l00"], box_tile)
                y0, dy0 = apply_resnet_block_vel_packed(p["conv_l01"], y0, dy0, "CACA")
                u, du = apply_resample_block_vel_packed(p["up_r0"], r1, dr1, "UA")
                u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
                du = du[:, uc:-uc, uc:-uc, ucw:-ucw]
                h, dh = apply_resnet_block_vel_packed_cat(
                    p["conv_r00"], (y0, u), (dy0, du), "CACA"
                )
                h, dh = apply_resnet_block_vel_packed(p["conv_r01"], h, dh, "CAC")
                h, dh = s2d.unpack_to_ncdhw(h), s2d.unpack_to_ncdhw(dh)
            else:
                y0, dy0 = apply_resnet_block_vel(
                    p["conv_l00"], box_tile, None, "CACA", in_fmt="NCDHW"
                )
                y0, dy0 = apply_resnet_block_vel(p["conv_l01"], y0, dy0, "CACA")
                u, du = apply_resample_block_vel(p["up_r0"], r1, dr1, "UA")
                u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
                du = du[:, uc:-uc, uc:-uc, ucw:-ucw]
                h = jnp.concatenate([y0, u], -1)
                dh = jnp.concatenate([dy0, du], -1)
                h, dh = apply_resnet_block_vel(p["conv_r00"], h, dh, "CACA")
                h, dh = apply_resnet_block_vel(p["conv_r01"], h, dh, "CAC", out_fmt="NCDHW")
            disp = (h + x0) * jnp.asarray(6.0, h.dtype)
            vf = vel_fac.reshape((1,) * 5)
            dz = Dz.reshape((1,) * 5)
            velocity = dh * (vf * 6.0).astype(h.dtype) + x0 * (vf * 6.0 / dz).astype(h.dtype)
            return disp, velocity
        if packed:
            y0 = apply_resnet_entry_packed(p["conv_l00"], box_tile)
            y0 = apply_resnet_block_packed(p["conv_l01"], y0, "CACA")
            u = apply_resample_block_packed(p["up_r0"], r1_tile, "UA")
            u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
            h = apply_resnet_block_packed_cat(p["conv_r00"], (y0, u), "CACA")
            h = apply_resnet_block_packed(p["conv_r01"], h, "CAC")
            h = s2d.unpack_to_ncdhw(h)
        else:
            y0 = apply_resnet_block(p["conv_l00"], box_tile, "CACA", in_fmt="NCDHW")
            y0 = apply_resnet_block(p["conv_l01"], y0, "CACA")
            u = apply_resample_block(p["up_r0"], r1_tile, "UA")
            u = u[:, uc:-uc, uc:-uc, ucw:-ucw]
            h = jnp.concatenate([y0, u], -1)
            h = apply_resnet_block(p["conv_r00"], h, "CACA")
            h = apply_resnet_block(p["conv_r01"], h, "CAC", out_fmt="NCDHW")
        return (h + x0) * jnp.asarray(6.0, h.dtype)

    # ------------------------------------------------------------------
    # Driver
    # ------------------------------------------------------------------

    def memory_audit(self, z: float = 0.0, Om: float = 0.3175):
        """AOT-compile every phase program and report its HBM peak.

        Returns ``{"phases": {name: {"peak", "args", "out", "temps",
        "extra_live", "total"}}, "max_total": int, "max_phase": str}``
        (bytes).  ``peak`` is XLA's buffer-assignment peak for the phase
        program (arguments + outputs + temporaries); ``extra_live`` adds
        process-level buffers alive during that phase but NOT program
        arguments — the padded input box through phases 2a-2c.
        ``max_total`` is therefore the device-memory high-water mark of a
        ``process_box(donate_input=True)`` call, the number to hold
        against the chip's HBM (leave >= 5% headroom: a geometry that
        audits at the edge can still RESOURCE_EXHAUST on allocator
        fragmentation — measured round 4 at 512^3 f32 vel).

        No device allocation happens; lowering + compilation hit the
        persistent compile cache when this geometry has already run.
        """
        cfg = self.config
        as_sds = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t
        )
        ep = as_sds(self._exec_params_for(z, Om))
        box = jax.ShapeDtypeStruct((cfg.in_chan,) + cfg.size, jnp.dtype(cfg.dtype))
        Dz = jax.ShapeDtypeStruct((1,), jnp.float32)
        vel_fac = Dz
        boxp = jax.eval_shape(self._scale, box, Dz)
        nbuf = 2 if self.compute_vel else 1

        def bufs(margin, level=1):
            s = self._buf_shape(margin, level)
            return tuple(
                jax.ShapeDtypeStruct(s, jnp.dtype(cfg.buf_dtype))
                for _ in range(nbuf)
            )

        h1 = bufs(self._h1_margin())
        y1 = bufs(self._y1_margin())
        y2 = bufs(self._y2_margin(), level=2)
        r1 = bufs(self._r1_margin())
        out_dtype = jnp.dtype(np.dtype(cfg.output_dtype))
        outs = tuple(
            jax.ShapeDtypeStruct((1, cfg.in_chan) + cfg.size, out_dtype)
            for _ in range(nbuf)
        )
        boxp_bytes = int(np.prod(boxp.shape)) * boxp.dtype.itemsize

        plan = {
            "scale": ((self._scale, (box, Dz)), 0),
            "phase1": ((self._phase1, (ep, boxp, h1)), 0),
            "phase2a": ((self._phase2a, (ep, h1, y1)), boxp_bytes),
            "phase2b": ((self._phase2b, (ep, y1, y2)), boxp_bytes),
            "phase2c": ((self._phase2c, (ep, y1, y2, r1)), boxp_bytes),
            "phase3": ((self._phase3, (ep, boxp, r1, outs, Dz, vel_fac)), 0),
        }
        report = {}
        for name, ((fn, args), extra) in plan.items():
            ma = fn.lower(*args).compile().memory_analysis()
            peak = int(ma.peak_memory_in_bytes)
            report[name] = {
                "peak": peak,
                "args": int(ma.argument_size_in_bytes),
                "out": int(ma.output_size_in_bytes),
                "temps": int(ma.temp_size_in_bytes),
                "extra_live": extra,
                "total": peak + extra,
            }
        max_phase = max(report, key=lambda k: report[k]["total"])
        return {
            "phases": report,
            "max_total": report[max_phase]["total"],
            "max_phase": max_phase,
        }

    def process_box(
        self,
        input_box,
        z: float,
        Om: float,
        as_numpy: bool = True,
        profile: bool = False,
        donate_input: bool = False,
    ):
        """Emulate a full periodic box.

        With ``profile=True`` a completion barrier runs after each phase and
        per-stage wall times land in ``self.last_timings`` (adds barrier
        latency; leave False in production).  ``donate_input=True`` consumes
        a device-resident input array (its buffer is freed after the scaled
        padded copy is built — do not reuse it); memory-tight geometries
        need the ~1 GB this returns to the pool.
        """
        import time as _time

        from .utils.timing import force_sync as _fsync

        timings = {}
        _t0 = _time.perf_counter()

        def _stamp(name, val):
            nonlocal _t0
            if profile:
                _fsync(val)
                timings[name] = _time.perf_counter() - _t0
                _t0 = _time.perf_counter()

        cfg = self.config
        if tuple(input_box.shape) != (cfg.in_chan,) + cfg.size:
            raise ValueError(f"box shape {input_box.shape} != {(cfg.in_chan,) + cfg.size}")
        Dz = jnp.atleast_1d(growth_factor(z, Om)).astype(jnp.float32)
        vel_fac = (
            jnp.atleast_1d(vel_norm(z, Om)).astype(jnp.float32)
            if self.compute_vel
            else jnp.zeros((1,))
        )

        # NCDHW scaled input (channel-first: C=3 must not sit in the 128-lane
        # minor dim), wrap-padded by 8 (covers phase-1 halo 4 and phase-3
        # halo 8).  Cast on host first so no fp32 copy lands in HBM, and drop
        # intermediate buffers eagerly — at 512^3 every full-box copy is
        # ~1 GB and the phase buffers dominate a 16 GB chip.
        if isinstance(input_box, np.ndarray):
            input_box = input_box.astype(jnp.dtype(cfg.dtype))
        exec_params = self._exec_params_for(z, Om)
        scale = self._scale_donate if donate_input else self._scale
        if donate_input:
            # The donated input can never alias the output (the scale
            # program's only output is the PADDED box — different shape),
            # so jax warns "donated buffers were not usable".  The
            # donation is intentional free-early semantics, not aliasing:
            # XLA may release the input buffer as soon as the pad has
            # consumed it, which is the ~1 GB margin memory-tight
            # geometries need.  Silence the known-benign warning.
            import warnings as _warnings

            with _warnings.catch_warnings():
                _warnings.filterwarnings(
                    "ignore", message="Some donated buffers were not usable"
                )
                boxp = scale(jnp.asarray(input_box, cfg.dtype), Dz)
        else:
            boxp = scale(jnp.asarray(input_box, cfg.dtype), Dz)
        del input_box
        _stamp("scale", boxp)

        # ---- Phase 1: build the (phase-2-padded) level-1 volume -----------
        nbuf = 2 if self.compute_vel else 1
        h1_shape = self._buf_shape(self._h1_margin())
        h1 = tuple(jnp.zeros(h1_shape, cfg.buf_dtype) for _ in range(nbuf))
        h1 = self._phase1(exec_params, boxp, h1)
        _stamp("phase1", h1)

        # ---- Phase 2a: conv_l1 (level-1 block) ----------------------------
        y1 = tuple(
            jnp.zeros(self._buf_shape(self._y1_margin()), cfg.buf_dtype)
            for _ in range(nbuf)
        )
        y1 = self._phase2a(exec_params, h1, y1)
        del h1
        _stamp("phase2a", y1)
        # ---- Phase 2b: down_l1 + conv_l2 -> level-2 buffer ----------------
        y2_shape = self._buf_shape(self._y2_margin(), level=2)
        y2 = tuple(jnp.zeros(y2_shape, cfg.buf_dtype) for _ in range(nbuf))
        y2 = self._phase2b(exec_params, y1, y2)
        _stamp("phase2b", y2)
        # ---- Phase 2c: mid stack + conv_r1 (y1 still feeds the skips) -----
        r1_shape = self._buf_shape(self._r1_margin())
        r1 = tuple(jnp.zeros(r1_shape, cfg.buf_dtype) for _ in range(nbuf))
        r1 = self._phase2c(exec_params, y1, y2, r1)
        del y1, y2
        _stamp("phase2c", r1)
        # ---- Phase 3: final decode, tiled ---------------------------------
        out_dtype = jnp.dtype(np.dtype(cfg.output_dtype))
        outs = tuple(
            jnp.zeros((1, cfg.in_chan) + cfg.size, out_dtype) for _ in range(nbuf)
        )
        outs = self._phase3(exec_params, boxp, r1, outs, Dz, vel_fac)
        del r1
        _stamp("phase3", outs)
        if profile:
            self.last_timings = timings

        def fin(t):
            return np.asarray(t[0]) if as_numpy else t[0]

        if self.compute_vel:
            return fin(outs[0]), fin(outs[1])
        return fin(outs[0])
