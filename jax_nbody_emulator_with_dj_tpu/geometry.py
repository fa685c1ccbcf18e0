"""Automatic execution-geometry planning for the hierarchical runtime.

The hierarchical runtime's speed/fit depends on five knobs (phase-1 slab
and H-split, phase-2 level-1 tile, phase-3 output tile, buffer dtype)
whose best values were found by measured sweeps on a 16 GB v5e (see
``bench.py`` and README).  :func:`auto_hierarchical_config` encodes those
measured rules, generalizes them to arbitrary (divisible) box extents,
estimates the resulting peak HBM, and — when the monolithic phase buffers
cannot fit the chip — falls back to a :class:`ChunkedHierarchicalConfig`
decomposition, growing the chunk grid until the inner run fits.

This gives ``create_emulator(processor_config=auto_hierarchical_config(
size, compute_vel=True))`` the same out-of-the-box ergonomics as the
reference's ``SubboxConfig(size, ndiv)`` (``subbox.py:25-43`` there) while
selecting the overlap-minimal runtime: the reference user picks ``ndiv``
by trial-and-OOM; here the planner picks a measured-fitting geometry.

The peak estimate is intentionally simple and calibrated against measured
runs rather than derived from the HLO: per-phase peak = live inter-phase
buffers + padded input + outputs + a per-voxel transient coefficient for
the in-flight tile/slab (see ``_LIVE_P1`` / ``_LIVE_P3``).  The 12%
headroom absorbs allocator fragmentation — the f32 velocity geometry that
audited at 14.5 GiB still RESOURCE_EXHAUSTed at runtime, so the planner
must not sail that close.  At 512^3 the planner reproduces the measured
bench geometries exactly for all four (dtype, vel) combinations
(pinned in ``tests/test_geometry.py``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .chunked import _largest_divisor
from .hierarchical import HierarchicalConfig

# Per-voxel transient coefficients: live mid-channel tensors in flight per
# stage, calibrated so every measured-working 512^3 v5e geometry passes and
# every measured-OOM one fails.  Round 4 (Winograd conv path — each conv
# adds a padded-window input copy and a padded output): bf16 vel
# (128,128,128) ok / (128,128,256) OOM (was ok pre-Winograd); f32 vel
# (128,128,64) ok; bf16 disp (128,256,256) ok; f32 disp (128,128,256) ok.
# Phase 1 streams fewer simultaneous tensors than the decode (no skip
# concat, no residual stash).
_LIVE_P1 = {False: 3, True: 6}   # keyed by compute_vel
_LIVE_P3 = {False: 6, True: 12}
_HEADROOM = 0.88  # use at most this fraction of the stated HBM

MID_CHAN = 64  # the shipped models' interior width (mid_chan)


def _tile1_for(size, cap: int) -> int:
    half = [s // 2 for s in size]
    for m in range(cap - cap % 8, 7, -8):
        if all(h % m == 0 for h in half):
            return m
    return 8


def estimate_peak_bytes(cfg: HierarchicalConfig, compute_vel: bool,
                        mid_chan: int = MID_CHAN) -> int:
    """Approximate peak HBM of a monolithic hierarchical run.

    Mirrors ``HierarchicalProcessor``'s buffer algebra (packed layout) and
    adds the calibrated per-voxel transient for the busiest phase.
    """
    nbuf = 2 if compute_vel else 1
    bufb = jnp.dtype(cfg.buf_dtype).itemsize
    dtb = jnp.dtype(cfg.dtype).itemsize
    outb = np.dtype(cfg.output_dtype).itemsize
    nd, nh, nw = cfg.size

    def buf_bytes(margin, level):
        f = 2 ** level
        m = (margin, margin, margin // 2) if cfg.packed else (margin,) * 3
        wdim = nw // (2 * f) if cfg.packed else nw // f
        chan = 2 * mid_chan if cfg.packed else mid_chan
        return (
            (nd // f + 2 * m[0]) * (nh // f + 2 * m[1]) * (wdim + 2 * m[2])
            * chan * bufb * nbuf
        )

    h1 = buf_bytes(2, 1)   # PHASE2A_MARGIN
    y1 = buf_bytes(4, 1)   # PHASE2B_MARGIN
    y2 = buf_bytes(8, 2)   # PHASE2C_MARGIN (level-2 voxels)
    r1 = buf_bytes(4, 1)   # PHASE3_R1_MARGIN_PACKED
    boxp = cfg.in_chan * (nd + 16) * (nh + 16) * (nw + 16) * dtb
    outs = nbuf * cfg.in_chan * nd * nh * nw * outb

    c1 = _LIVE_P1[compute_vel] * mid_chan * dtb  # bytes / in-flight voxel
    c3 = _LIVE_P3[compute_vel] * mid_chan * dtb

    sh = cfg.slab_h or nh
    p1_tmp = (cfg.slab + 8) * (sh + 8) * (nw + 8) * c1
    td, th, tw = cfg.tile
    p3_tmp = (td + 16) * (th + 16) * (tw + 16) * c3
    # phase-2 tiles live at level 1 (mid channels over (tile1 + halo)^3
    # windows); +16 over-covers the 2c y2 window's level-2 margin
    p2_tmp = (cfg.tile1 + 16) ** 3 * c3

    peaks = (
        boxp + h1 + p1_tmp,                 # phase 1
        boxp + h1 + y1 + p2_tmp,            # phase 2a
        boxp + y1 + y2 + p2_tmp,            # phase 2b
        boxp + y1 + y2 + r1 + p2_tmp,       # phase 2c
        boxp + r1 + outs + p3_tmp,          # phase 3
    )
    return int(max(peaks))


def _monolithic_config(size, dtype, compute_vel, output_dtype, in_chan,
                       hbm_bytes, mid_chan=MID_CHAN) -> HierarchicalConfig:
    """The measured v5e geometry rules, generalized to divisible extents."""
    f32 = jnp.dtype(dtype) == jnp.float32
    n = min(size)
    t = _largest_divisor(n, 128, 2)

    def ax(i, cap, mult=2):
        return _largest_divisor(size[i], cap, mult)

    if compute_vel:
        # bf16 vel: 128^3 tiles measure best with the Winograd conv path
        # (11.6 s at 512^3; (128,128,256) OOMs on its padded windows).
        wcap = max(t // 2, 4) if f32 else t
        tile = (ax(0, t), ax(1, t), ax(2, wcap, mult=4))
    else:
        tile = (ax(0, t), ax(1, t if f32 else 2 * t), ax(2, 2 * t, mult=4))
    cfg = HierarchicalConfig(
        size=size,
        # f32 vel: slab 32 (the Winograd path's padded windows push the
        # 64-slab phase 1 past the allocator at 512^3 — measured round 4)
        slab=_largest_divisor(
            size[0], 32 if (compute_vel and f32) else (64 if compute_vel else 32), 2
        ),
        slab_h=(
            _largest_divisor(size[1], max(size[1] // 4, 8), 2) if f32
            else (size[1] // 2 if compute_vel and size[1] >= 256 else None)
        ),
        tile=tile,
        tile1=_tile1_for(size, 64 if compute_vel else 128),
        dtype=jnp.dtype(dtype),
        output_dtype=np.dtype(output_dtype),
        in_chan=in_chan,
        buf_dtype=jnp.bfloat16 if f32 else None,
    )
    # Shrink the phase-3 tile (largest axis first) while over budget —
    # transients scale with tile volume, buffers don't move.
    budget = hbm_bytes * _HEADROOM
    while estimate_peak_bytes(cfg, compute_vel, mid_chan) > budget:
        order = sorted(range(3), key=lambda i: -cfg.tile[i])
        for ax in order:
            cur = cfg.tile[ax]
            mult = 4 if ax == 2 else 2
            nxt = _largest_divisor(size[ax], cur // 2, mult)
            if nxt < cur:
                tile = list(cfg.tile)
                tile[ax] = nxt
                cfg = HierarchicalConfig(
                    size=size, slab=cfg.slab, slab_h=cfg.slab_h,
                    tile=tuple(tile), tile1=cfg.tile1, dtype=cfg.dtype,
                    output_dtype=cfg.output_dtype, in_chan=cfg.in_chan,
                    buf_dtype=cfg.buf_dtype,
                )
                break
        else:
            break  # tile floor reached; buffers themselves are the problem
    return cfg


def fallback_ladder(cfg: HierarchicalConfig, compute_vel: bool = True,
                    mid_chan: int = MID_CHAN):
    """Yield progressively slimmer geometries to retry after an OOM.

    ``RESOURCE_EXHAUSTED`` on a geometry that *estimates* as fitting is an
    allocator-fragmentation event (measured round 4: the 512^3 bf16-vel
    default audited under budget yet crashed the driver's one-shot run);
    the recovery is a strictly smaller working set, not a recompile of the
    same one.  Rungs:

    1. ``"slim"``  — halve the phase-1 slab / H-split, the phase-2 level-1
       tile, and cap the phase-3 tile: every per-phase transient drops
       ~2x while the inter-phase buffers (fixed by ``size``) stay put.
    2. ``"slim2"`` — halve those knobs again.
    3. ``"chunked(cx,cy,cz)"`` — the chunked-hierarchical runtime: the box
       is split into receptive-padded chunks, each an independent inner
       run with its own (slim-rung) geometry; inter-phase buffers now
       scale with the chunk, the one decomposition that always fits.

    Every yielded config is estimate-checked smaller than its predecessor
    (pinned in ``tests/test_fallback.py``).  Consumed by ``bench.py`` and
    usable around any ``HierarchicalProcessor`` rebuild.
    """
    from .chunked import ChunkedHierarchicalConfig

    size = cfg.size
    cur = cfg

    def down(v, floor):  # halve toward a floor, never grow
        return max(v // 2, min(floor, v))

    for rung in ("slim", "slim2"):
        tile = (
            _largest_divisor(size[0], down(cur.tile[0], 32), 2),
            _largest_divisor(size[1], down(cur.tile[1], 32), 2),
            _largest_divisor(size[2], down(cur.tile[2], 32), 4),
        )
        sh0 = cur.slab_h or size[1]
        cur = HierarchicalConfig(
            size=size,
            slab=_largest_divisor(size[0], down(cur.slab, 16), 2),
            slab_h=_largest_divisor(size[1], down(sh0, 16), 2),
            tile=tile,
            tile1=_tile1_for(size, down(cur.tile1, 8)),
            dtype=cfg.dtype,
            output_dtype=cfg.output_dtype,
            in_chan=cfg.in_chan,
            packed=cfg.packed,
            wino=cfg.wino,
            buf_dtype=cfg.buf_dtype,
        )
        yield rung, cur
    for chunks in ((2, 1, 1), (2, 2, 1), (2, 2, 2)):
        align = 16 if cfg.packed else 8
        if not all(
            s % c == 0 and (s // c) % align == 0 and s // c >= 64
            for s, c in zip(size, chunks)
        ):
            continue
        yield f"chunked{chunks}", ChunkedHierarchicalConfig(
            size=size,
            chunks=chunks,
            pad=48,
            dtype=cfg.dtype,
            output_dtype=cfg.output_dtype,
            in_chan=cfg.in_chan,
            packed=cfg.packed,
            buf_dtype=cfg.buf_dtype,
        )


def is_oom_error(e: BaseException) -> bool:
    """True for XLA device out-of-memory failures (any backend).

    Matched textually: the tunneled-PJRT path raises
    ``jax.errors.JaxRuntimeError`` whose message carries the
    ``RESOURCE_EXHAUSTED`` status; other backends spell it
    ``Out of memory`` / ``Allocator ... OOM``.
    """
    s = f"{type(e).__name__}: {e}"
    return any(
        m in s
        for m in (
            "RESOURCE_EXHAUSTED",
            "Out of memory",
            "out of memory",
            "OOM when allocating",
        )
    )


def auto_hierarchical_config(
    size,
    dtype=jnp.bfloat16,
    compute_vel: bool = True,
    output_dtype=np.float16,
    in_chan: int = 3,
    hbm_bytes: int = 16 << 30,
    mid_chan: int = MID_CHAN,
):
    """Plan a measured-fitting geometry for one chip.

    Returns a :class:`HierarchicalConfig` when the monolithic phase
    buffers fit ``hbm_bytes``, else a :class:`ChunkedHierarchicalConfig`
    whose inner run fits (growing the chunk grid axis-by-axis).  Either
    return value is accepted by ``create_emulator(processor_config=...)``.

    Args:
        size: box extent, int or (D, H, W); each must be divisible by 16
            (packed-execution alignment).
        dtype: compute dtype (bfloat16 or float32; float32 runs get
            bfloat16 inter-phase buffers, see ``HierarchicalConfig``).
        compute_vel: plan for the displacement+velocity models.
        hbm_bytes: per-chip HBM budget (default: a 16 GB v5e).
        mid_chan: the model's interior channel width — the per-voxel
            transient estimate scales with it (default: the shipped 64).
    """
    if isinstance(size, (int, np.integer)):
        size = (int(size),) * 3
    size = tuple(int(s) for s in size)
    if any(s % 16 for s in size):
        raise ValueError(
            f"auto geometry plans packed execution, which needs every box "
            f"extent divisible by 16; got {size}.  Build a "
            f"HierarchicalConfig(packed=False, ...) manually for other "
            f"extents."
        )
    cfg = _monolithic_config(size, dtype, compute_vel, output_dtype,
                             in_chan, hbm_bytes, mid_chan)
    if estimate_peak_bytes(cfg, compute_vel, mid_chan) <= hbm_bytes * _HEADROOM:
        return cfg

    from .chunked import ChunkedHierarchicalConfig  # circular-safe

    chunks = [1, 1, 1]
    while True:
        # split the axis with the largest chunk extent that can still split
        order = sorted(range(3), key=lambda i: -(size[i] // chunks[i]))
        for ax in order:
            c = chunks[ax] * 2
            if size[ax] % c == 0 and (size[ax] // c) % 16 == 0 \
                    and size[ax] // c >= 64:
                chunks[ax] = c
                break
        else:
            raise ValueError(
                f"no chunk decomposition of {size} fits {hbm_bytes} bytes"
            )
        ccfg = ChunkedHierarchicalConfig(
            size=size,
            chunks=tuple(chunks),
            pad=64,  # keeps 2^k chunk extents on 2^k-friendly inner grids
            dtype=jnp.dtype(dtype),
            output_dtype=np.dtype(output_dtype),
            in_chan=in_chan,
            buf_dtype=jnp.bfloat16 if jnp.dtype(dtype) == jnp.float32 else None,
        )
        inner = _monolithic_config(
            ccfg.inner_size, dtype, compute_vel, output_dtype, in_chan,
            hbm_bytes, mid_chan,
        )
        # The chunked runtime prefetches the NEXT padded input chunk while
        # the current one computes (chunked.py host-assembly pipeline), so
        # one extra inner-size input box is resident at peak.  Inputs are
        # staged in the host dtype, which the planner cannot see; budget
        # float32 (the common case, and conservative for f16/bf16 inputs).
        prefetch = in_chan * int(np.prod(ccfg.inner_size)) * 4
        fit = estimate_peak_bytes(inner, compute_vel, mid_chan) + prefetch
        if fit <= hbm_bytes * _HEADROOM:
            return ChunkedHierarchicalConfig(
                size=size,
                chunks=tuple(chunks),
                pad=64,
                slab=inner.slab,
                slab_h=inner.slab_h,
                tile=inner.tile,
                tile1=inner.tile1,
                dtype=jnp.dtype(dtype),
                output_dtype=np.dtype(output_dtype),
                in_chan=in_chan,
                buf_dtype=inner.buf_dtype,
            )
