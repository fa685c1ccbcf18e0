"""Flagship benchmark: full-box emulation throughput on one chip.

Headline config (the north-star metric): 512^3, bf16 compute, premodulated
displacement+velocity model through the hierarchical (overlap-minimal)
runtime on one TPU chip.  Compared against the reference's published A100
fp16 numbers (README.md:245-249): disp+vel 25.8 s, disp-only 10.9 s
(``--no-vel``).  Timing uses a readback barrier (``force_sync``)
because ``block_until_ready`` is a no-op on tunneled PJRT backends.

Prints ONE JSON line:
  {"metric": "voxels_per_sec_chip_512_disp", "value": ..., "unit":
   "voxel/s", "vs_baseline": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

import numpy as np

# (The input-donation "not usable" warning is silenced at its source in
# hierarchical.process_box, where the free-early intent is documented.)

# Reference A100 numbers at 512^3 (README.md:245-252), keyed by
# (style, vel, f32).  bf16 rows compare against the reference's fp16 rows.
BASELINE_SECONDS = {
    (False, False, False): 10.9,
    (True, False, False): 11.1,
    (False, False, True): 15.6,
    (True, False, True): 15.8,
    (False, True, False): 25.8,
    (True, True, False): 25.9,
    (False, True, True): 44.7,
    (True, True, True): 44.9,
}


def _git_sha():
    """Measurement provenance: the commit the record was taken at."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except Exception:
        return None


def geometry_desc(cfg):
    """Compact JSON-able description of an execution geometry."""
    from jax_nbody_emulator_with_dj_tpu.chunked import ChunkedHierarchicalConfig
    from jax_nbody_emulator_with_dj_tpu.hierarchical import HierarchicalConfig

    if isinstance(cfg, ChunkedHierarchicalConfig):
        return {"runtime": "chunked", "chunks": list(cfg.chunks), "pad": cfg.pad}
    if isinstance(cfg, HierarchicalConfig):
        return {
            "runtime": "hierarchical", "slab": cfg.slab, "slab_h": cfg.slab_h,
            "tile": list(cfg.tile), "tile1": cfg.tile1,
        }
    return {"runtime": "subbox", "ndiv": list(cfg.ndiv)}


def run_with_fallback(measure, proc, chunked, model, params, compute_vel):
    """Run ``measure(proc, chunked)``; on device OOM rebuild down the ladder.

    The driver gets ONE bench run per round, and a geometry at the HBM
    allocator edge can RESOURCE_EXHAUST on fragmentation even when its
    audit fits (round 4's official record was exactly that crash).  Every
    OOM here is answered with a strictly smaller working set from
    ``geometry.fallback_ladder`` — slimmer phase transients first, then the
    chunked decomposition — so a degraded-but-finished record always beats
    a crash.  Returns ``(times, trail, proc)``; ``times is None`` means
    every rung OOM'd, and ``trail`` lists each failed geometry with its
    error (a degraded run is *visible*, never silent).
    """
    import gc

    from jax_nbody_emulator_with_dj_tpu.chunked import (
        ChunkedHierarchicalConfig,
        ChunkedHierarchicalProcessor,
    )
    from jax_nbody_emulator_with_dj_tpu.geometry import (
        fallback_ladder,
        is_oom_error,
    )
    from jax_nbody_emulator_with_dj_tpu.hierarchical import (
        HierarchicalConfig,
        HierarchicalProcessor,
    )
    from jax_nbody_emulator_with_dj_tpu.subbox import (
        SubboxConfig,
        SubboxProcessor,
    )

    def ladder(cfg):
        if isinstance(cfg, ChunkedHierarchicalConfig):
            # Already chunked: the only slimmer shape is deeper chunking.
            cur = int(np.prod(cfg.chunks))
            for chunks in ((2, 1, 1), (2, 2, 1), (2, 2, 2), (4, 2, 2)):
                if int(np.prod(chunks)) <= cur:
                    continue
                align = 16 if cfg.packed else 8
                if not all(
                    s % c == 0 and (s // c) % align == 0 and s // c >= 64
                    for s, c in zip(cfg.size, chunks)
                ):
                    continue
                yield f"chunked{chunks}", ChunkedHierarchicalConfig(
                    size=cfg.size, chunks=chunks, pad=cfg.pad,
                    dtype=cfg.dtype, output_dtype=cfg.output_dtype,
                    in_chan=cfg.in_chan, packed=cfg.packed,
                    buf_dtype=cfg.buf_dtype,
                )
        elif isinstance(cfg, HierarchicalConfig):
            yield from fallback_ladder(cfg, compute_vel)
        else:  # subbox: finer decomposition, largest subbox axis first
            ndiv = list(cfg.ndiv)
            for _ in range(4):
                order = sorted(
                    range(3), key=lambda i: -(cfg.size[i] // ndiv[i])
                )
                for ax in order:
                    n = ndiv[ax] * 2
                    if cfg.size[ax] % n == 0 and (cfg.size[ax] // n) % 8 == 0:
                        ndiv[ax] = n
                        break
                else:
                    return
                yield f"subbox{tuple(ndiv)}", SubboxConfig(
                    size=cfg.size, ndiv=tuple(ndiv), dtype=cfg.dtype,
                    output_dtype=cfg.output_dtype,
                )

    def rebuild(cfg):
        if isinstance(cfg, ChunkedHierarchicalConfig):
            return ChunkedHierarchicalProcessor(model, params, cfg), True
        if isinstance(cfg, HierarchicalConfig):
            return HierarchicalProcessor(model, params, cfg), False
        return SubboxProcessor(model, params, cfg), False

    trail = []
    rungs = ladder(proc.config)
    while True:
        try:
            times = measure(proc, chunked)
            if trail:
                trail[-1]["recovered_with"] = geometry_desc(proc.config)
            return times, trail, proc
        except Exception as e:
            if not is_oom_error(e):
                raise
            trail.append({
                "geometry": geometry_desc(proc.config),
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            })
            nxt = next(rungs, None)
            if nxt is None:
                return None, trail, None
            name, cfg = nxt
            print(
                f"# OOM on {geometry_desc(proc.config)} -> retrying at "
                f"fallback rung '{name}': {geometry_desc(cfg)}",
                file=sys.stderr,
            )
            del proc
            gc.collect()
            proc, chunked = rebuild(cfg)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--ndiv", type=int, nargs=3, default=(4, 4, 8))
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--vel", action=argparse.BooleanOptionalAction, default=True,
                   help="emulate velocities too — the north-star metric is disp+vel "
                        "(baseline: 25.8 s vs 10.9 s disp-only)")
    p.add_argument("--style", action="store_true", help="runtime-style model (no premodulation)")
    p.add_argument("--runtime", choices=("hierarchical", "subbox", "auto"),
                   default="hierarchical",
                   help="hierarchical = overlap-minimal phase runtime with the "
                        "measured geometry table below; auto = the same runtime "
                        "under geometry.auto_hierarchical_config's planner "
                        "(chunked fallback when the monolithic buffers cannot "
                        "fit); subbox = classic halo-recompute tiles")
    p.add_argument("--mid-chan", type=int, default=64)
    p.add_argument("--tile1", type=int, default=None,
                   help="hierarchical phase-2 level-1 tile (default: 128 disp / 64 vel)")
    p.add_argument("--tile", type=int, nargs=3, default=None,
                   help="hierarchical phase-3 output tile")
    p.add_argument("--slab", type=int, default=None,
                   help="hierarchical phase-1 D-slab thickness")
    p.add_argument("--slab-h", type=int, default=None,
                   help="hierarchical phase-1 H split (default: size/2 for vel)")
    p.add_argument("--chunks", type=int, nargs=3, default=None,
                   help="run the chunked-hierarchical runtime with this "
                        "decomposition (for boxes whose phase buffers "
                        "overflow one chip, e.g. single-chip >= 1024^3)")
    p.add_argument("--buf-dtype", default=None,
                   help="inter-phase buffer storage dtype (default: bfloat16 "
                        "for f32 compute — the consumers round conv operands "
                        "to bf16 anyway; see HierarchicalConfig.buf_dtype)")
    p.add_argument("--pad", type=int, default=48,
                   help="chunked-runtime receptive pad per split-axis side")
    p.add_argument("--host-input", action="store_true",
                   help="keep the global box (and assembled outputs) in host "
                        "RAM — required when box + outputs + working set "
                        "exceed HBM (e.g. 1024^3 on one 16 GB chip via "
                        "--chunks); timing then includes the host<->device "
                        "chunk transfers")
    p.add_argument("--profile", action="store_true",
                   help="sync between hierarchical phases and print per-phase times")
    p.add_argument("--audit", action="store_true",
                   help="AOT memory-audit the phase programs "
                        "(HierarchicalProcessor.memory_audit) before running; "
                        "prints per-phase HBM peaks to stderr and records "
                        "hbm_peak_bytes / hbm_headroom_frac (vs the v5e's "
                        "15.75 GiB usable)")
    p.add_argument("--donate-input", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="regenerate the input box on device before each run and "
                        "donate it into process_box — frees ~1 GB during the "
                        "phases, affording the widest phase-3 tiles (production "
                        "pipelines consume device-resident LPT fields the same "
                        "way)")
    args = p.parse_args()

    import jax

    from jax_nbody_emulator_with_dj_tpu.utils.platform import (
        apply_jax_platforms_env,
    )

    apply_jax_platforms_env()

    # Dead-tunnel watchdog: when the tunneled TPU backend is unreachable,
    # backend init hangs FOREVER inside the PJRT client constructor (no
    # timeout anywhere in the stack).  A healthy backend initializes in
    # seconds; if the first device contact hasn't completed after 10
    # minutes, emit an explicit failure record instead of hanging the
    # harness silently.
    import os
    import threading

    backend_up = threading.Event()
    wd_timeout = float(os.environ.get("BENCH_BACKEND_TIMEOUT", "600"))

    def _watchdog():
        if not backend_up.wait(wd_timeout):
            print(json.dumps({
                "metric": "voxels_per_sec_chip_512_dispvel",
                "value": 0.0,
                "unit": "voxel/s",
                "vs_baseline": 0.0,
                "error": f"backend init timed out after {wd_timeout:.0f} s "
                         "(accelerator tunnel unreachable)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Persistent compile cache: geometry sweeps re-run this script many
    # times; unchanged phase programs then reload instead of recompiling
    # (each full-pipeline compile is minutes on the tunneled backend).
    try:
        from pathlib import Path

        cache = Path("~/.cache/jax_nbody_bench").expanduser()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from jax_nbody_emulator_with_dj_tpu import (
        NBodyEmulatorCore,
        NBodyEmulatorVelCore,
        StyleNBodyEmulatorCore,
        StyleNBodyEmulatorVelCore,
        SubboxConfig,
        SubboxProcessor,
        modulate_emulator_parameters,
        modulate_emulator_parameters_vel,
    )

    dev = jax.devices()[0]
    backend_up.set()
    key = jax.random.key(0)
    style_params = StyleNBodyEmulatorVelCore(mid_chan=args.mid_chan).init(key)
    compute_vel = args.vel
    if args.style:
        params = style_params
        cls = StyleNBodyEmulatorVelCore if compute_vel else StyleNBodyEmulatorCore
        model = cls(mid_chan=args.mid_chan)
    elif compute_vel:
        params = modulate_emulator_parameters_vel(style_params, z=0.0, Om=0.3175)
        model = NBodyEmulatorVelCore(mid_chan=args.mid_chan)
    else:
        params = modulate_emulator_parameters(style_params, z=0.0, Om=0.3175)
        model = NBodyEmulatorCore(mid_chan=args.mid_chan)

    size = (args.size,) * 3
    # Style models ride the hierarchical runtime too (per-call style fold).
    use_hier = args.runtime in ("hierarchical", "auto")
    if args.runtime == "auto":
        from jax_nbody_emulator_with_dj_tpu.chunked import (
            ChunkedHierarchicalConfig,
            ChunkedHierarchicalProcessor,
        )
        from jax_nbody_emulator_with_dj_tpu.geometry import (
            auto_hierarchical_config,
        )
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalProcessor,
        )

        acfg = auto_hierarchical_config(
            size, dtype=jnp.dtype(args.dtype), compute_vel=compute_vel,
            mid_chan=args.mid_chan,
        )
        chunked_auto = isinstance(acfg, ChunkedHierarchicalConfig)
        chunks = args.chunks = list(acfg.chunks) if chunked_auto else None
        if chunked_auto and not args.host_input:
            # The planner certifies only the INNER run against HBM; a
            # device-resident global box + output buffers come on top.
            # When they don't leave room, fall back to host staging (the
            # chunked runtime's raison d'etre is exactly these sizes).
            from jax_nbody_emulator_with_dj_tpu.geometry import (
                estimate_peak_bytes,
            )

            nbuf = 2 if compute_vel else 1
            resident = (
                3 * int(np.prod(size)) * jnp.dtype(args.dtype).itemsize
                + nbuf * 3 * int(np.prod(size)) * 2  # fp16 outputs
            )
            inner_peak = estimate_peak_bytes(
                acfg.inner_config(), compute_vel, args.mid_chan
            )
            if resident + inner_peak > int(0.88 * (16 << 30)):
                args.host_input = True
                print(
                    "# auto: device-resident box+outputs "
                    f"({resident / 2**30:.1f} GiB) + inner working set "
                    "exceed HBM -> --host-input enabled",
                    file=sys.stderr,
                )
        proc = (
            ChunkedHierarchicalProcessor(model, params, acfg)
            if chunked_auto
            else HierarchicalProcessor(model, params, acfg)
        )
        print(f"# auto geometry: {acfg}", file=sys.stderr)
    elif use_hier:
        from jax_nbody_emulator_with_dj_tpu.hierarchical import (
            HierarchicalConfig,
            HierarchicalProcessor,
        )

        # The velocity path threads (x, dx) pairs -> ~2x working sets, and
        # f32 doubles every buffer again; use measured-fitting geometry on
        # 16 GB chips.
        f32 = jnp.dtype(args.dtype) == jnp.float32
        buf_dtype = (
            jnp.dtype(args.buf_dtype) if args.buf_dtype
            else (jnp.bfloat16 if f32 else None)
        )
        t = min(128, args.size)
        if args.tile:
            tile = tuple(args.tile)
        elif compute_vel:
            # bf16 vel: with the Winograd conv path (round 4) the padded
            # per-conv transients make (128, 128, 256) OOM; 128^3 tiles
            # measure best (11.6 s at 512^3, vs 15.9 s round 3).  f32 vel
            # (bf16 buffers): (128, 128, 64) executes — 22.0 s round 3.
            tile = (t, t, max(t // 2, 4)) if f32 else (t, t, t)
        else:
            t2 = min(2 * t, args.size)
            tile = (t, t, t2) if f32 else (t, t2, t2)
        tile1 = args.tile1 if args.tile1 else min(64 if compute_vel else 128, args.size // 2)
        # f32 vel sits at the allocator edge; the Winograd path's padded
        # windows need the slimmer 32-slab phase 1 (measured: slab 64
        # RESOURCE_EXHAUSTs, slab 32 runs 18.8 s at 512^3 — round 4).
        slab = args.slab or min(32 if (compute_vel and f32) else (64 if compute_vel else 32), args.size)
        slab_h_default = (
            max(args.size // 4, 8) if f32
            else (args.size // 2 if compute_vel and args.size >= 256 else None)
        )
        chunks = args.chunks
        if chunks and any(c > 1 for c in chunks):
            from jax_nbody_emulator_with_dj_tpu.chunked import (
                ChunkedHierarchicalConfig,
                ChunkedHierarchicalProcessor,
            )

            ccfg = ChunkedHierarchicalConfig(
                size=size,
                chunks=tuple(chunks),
                pad=args.pad,
                slab=args.slab,
                slab_h=args.slab_h,
                tile=tuple(args.tile) if args.tile else None,
                tile1=args.tile1,
                dtype=jnp.dtype(args.dtype),
                output_dtype=np.float16,
                buf_dtype=buf_dtype,
            )
            proc = ChunkedHierarchicalProcessor(model, params, ccfg)
        else:
            hcfg = HierarchicalConfig(
                size=size,
                slab=slab,
                # vel: splitting H halves the slab working set, affording
                # D-slab 32 (halo 1.25x) instead of 16 (1.5x) on 16 GB
                slab_h=args.slab_h or slab_h_default,
                tile=tile,
                tile1=tile1,
                dtype=jnp.dtype(args.dtype),
                output_dtype=np.float16,
                buf_dtype=buf_dtype,
            )
            proc = HierarchicalProcessor(model, params, hcfg)
    else:
        cfg = SubboxConfig(
            size=size,
            ndiv=tuple(args.ndiv),
            dtype=jnp.dtype(args.dtype),
            output_dtype=np.float16,
        )
        proc = SubboxProcessor(model, params, cfg)

    from jax_nbody_emulator_with_dj_tpu.utils.timing import force_sync

    chunked = bool(use_hier and chunks and any(c > 1 for c in chunks))

    def measure(proc, chunked):
        """Stage input, warm up, run the timed loop.  Raises on OOM."""
        # Stage the input on device: emulation consumes on-device fields in
        # production (the IC/LPT pipeline runs on the same chip), and the
        # tunneled test environment's H2D path is slow enough to dominate
        # otherwise.
        # The chunked runtime keeps the global box alive across chunks (each
        # chunk is donated into its inner run instead).
        donate = bool(args.donate_input and use_hier and not chunked)
        if args.host_input:
            box_host = (
                np.random.default_rng(1)
                .normal(size=(3,) + size)
                .astype(np.dtype(args.dtype))
            )

            def make_box(i):
                return box_host
        elif donate or chunked:
            # Donating mode consumes the input each run; regenerate it on
            # device (outside the timed region) instead of re-uploading
            # through the tunnel.  The chunked runtime reuses one
            # device-resident box.
            gen = jax.jit(
                lambda k: jax.random.normal(k, (3,) + size, jnp.dtype(args.dtype))
            )
            if chunked:
                box0 = gen(jax.random.key(1))
                force_sync(box0)

                def make_box(i):
                    return box0
            else:

                def make_box(i):
                    b = gen(jax.random.key(i))
                    force_sync(b)
                    return b
        else:
            box_host = (
                np.random.default_rng(1).normal(size=(3,) + size).astype(np.float32)
            )
            box = jax.device_put(jnp.asarray(box_host.astype(jnp.dtype(args.dtype))))
            del box_host

            def make_box(i):
                return box

        kw = {"profile": True} if (args.profile and use_hier) else {}
        if donate:
            kw["donate_input"] = True

        # Warmup / compile (excluded, as in the reference's published
        # numbers).  NB: block_until_ready is a no-op on some remote
        # backends; force_sync reads back one element per output, a true
        # completion barrier.
        as_numpy = bool(args.host_input)  # host mode: assemble outputs in RAM
        if args.host_input and chunked:
            # Warm the inner phase programs with a device-generated chunk:
            # warming through process_box would push the full box through
            # the host<->device link a second time (the link is the reason
            # host mode exists, and in this sandbox it runs at ~5 MB/s).
            warm = jax.jit(
                lambda: jnp.zeros(
                    (3,) + proc.config.inner_size, jnp.dtype(args.dtype)
                )
            )()
            force_sync(warm)
            res = proc.inner.process_box(
                warm, z=0.0, Om=0.3175, as_numpy=False, donate_input=True
            )
            for t in res if isinstance(res, tuple) else (res,):
                force_sync(proc._crop(t, np.dtype(proc.config.output_dtype)))
        else:
            out = proc.process_box(
                make_box(0), z=0.0, Om=0.3175, as_numpy=as_numpy,
                **({"donate_input": True} if donate else {}),
            )
            force_sync(out)

        times = []
        for r in range(args.runs):
            out = None  # free the previous outputs — two full 512^3 output
            # sets alive at once would crowd the 16 GB chip in vel mode
            b = make_box(r + 1)
            t0 = time.perf_counter()
            out = proc.process_box(b, z=0.0, Om=0.3175, as_numpy=as_numpy, **kw)
            force_sync(out)
            times.append(time.perf_counter() - t0)
            del b
            if args.profile and use_hier:
                print({k: round(v, 3) for k, v in proc.last_timings.items()},
                      file=sys.stderr)
        return times

    audit = None
    if args.audit and hasattr(proc, "memory_audit"):
        audit = proc.memory_audit()
        for name, ph in audit["phases"].items():
            print(f"# audit {name}: peak {ph['peak'] / 2**30:.2f} GiB "
                  f"(+{ph['extra_live'] / 2**30:.2f} live) = "
                  f"{ph['total'] / 2**30:.2f} GiB", file=sys.stderr)
        print(f"# audit max: {audit['max_phase']} "
              f"{audit['max_total'] / 2**30:.2f} GiB", file=sys.stderr)

    # ---- OOM-resilient measurement --------------------------------------
    times, fallback_trail, proc = run_with_fallback(
        measure, proc, chunked, model, params, compute_vel
    )
    if times is None:
        print(json.dumps({
            "metric": f"voxels_per_sec_chip_{args.size}_"
                      + ("dispvel" if compute_vel else "disp"),
            "value": 0.0,
            "unit": "voxel/s",
            "vs_baseline": 0.0,
            "error": "RESOURCE_EXHAUSTED on every fallback geometry",
            "fallback": fallback_trail,
        }), flush=True)
        return
    if fallback_trail:
        from jax_nbody_emulator_with_dj_tpu.chunked import (
            ChunkedHierarchicalConfig,
        )

        chunked = isinstance(proc.config, ChunkedHierarchicalConfig)
        chunks = list(proc.config.chunks) if chunked else None

    best = min(times)
    voxels = float(np.prod(size))
    value = voxels / best
    f32 = jnp.dtype(args.dtype) == jnp.float32
    base = BASELINE_SECONDS[(bool(args.style), bool(compute_vel), f32)]
    baseline_vps = 512**3 / base
    variant = (
        ("style_" if args.style else "")
        + ("dispvel" if compute_vel else "disp")
        + ("_f32" if f32 else "")
    )
    record = {
        "metric": f"voxels_per_sec_chip_{args.size}_{variant}",
        "value": round(value, 1),
        "unit": "voxel/s",
        "vs_baseline": round(value / baseline_vps, 3),
        "wall_s": round(best, 3),
        "all_runs_s": [round(t, 3) for t in times],
        "device": str(dev),
        "dtype": args.dtype,
        "runtime": (
            ("chunked" if chunked else "hierarchical")
            if use_hier
            else "subbox"
        ),
        "geometry": "auto" if args.runtime == "auto" else "manual",
        "geometry_used": geometry_desc(proc.config),
        "fallback": fallback_trail or None,
        "commit": _git_sha(),
        "chunks": list(chunks) if chunked else None,
        "ndiv": None if use_hier else list(args.ndiv),
    }
    if audit is not None:
        # Usable HBM on a 16 GB v5e is ~15.75 GiB (PJRT reserves the rest).
        usable = 15.75 * 2**30
        record["hbm_peak_bytes"] = audit["max_total"]
        record["hbm_peak_phase"] = audit["max_phase"]
        record["hbm_headroom_frac"] = round(1.0 - audit["max_total"] / usable, 4)
    if args.profile and use_hier and getattr(proc, "last_timings", None):
        # device-side phase split of the last run; in --host-input mode the
        # wall-vs-phase-sum gap is the host<->device transfer time
        record["phases_s"] = {k: round(v, 3) for k, v in proc.last_timings.items()}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
