"""Quantify the f32-rows' bfloat16 inter-phase-buffer approximation.

The f32 bench rows run f32 in-tile math with bf16 inter-phase buffers
(``HierarchicalConfig.buf_dtype`` — monolithic true-f32 buffers do not fit
a 16 GB chip at 512^3).  The README argues the rounding is the same single
rounding every buffer consumer (a conv, whose TPU operands round to bf16
anyway) would apply.  This script replaces that argument with a number:
it runs the SAME box through

  A. the standard f32 row       (hierarchical, buf_dtype=bfloat16)
  B. a true-f32 reference row   (chunked runtime, buf_dtype=float32 —
                                 the per-chunk working set fits HBM)

on identical seeded weights and reports the spectral deltas between the
two outputs: T(k) = sqrt(P_A/P_B), C(k) = P_AB/sqrt(P_A P_B), and RMS
relative field error — the same diagnostics the validation pipeline uses
(reference ``utils.py:1402-1603``).

Usage: python scripts/compare_f32_buffers.py [--size 512] [--vel]
Writes docs/f32_buffer_delta_<size>.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--vel", action="store_true", default=True)
    p.add_argument("--no-vel", dest="vel", action="store_false")
    p.add_argument("--chunks", type=int, nargs=3, default=(2, 2, 2))
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        cache = Path("~/.cache/jax_nbody_bench").expanduser()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from jax_nbody_emulator_with_dj_tpu import (
        NBodyEmulatorCore,
        NBodyEmulatorVelCore,
        StyleNBodyEmulatorVelCore,
        modulate_emulator_parameters,
        modulate_emulator_parameters_vel,
    )
    from jax_nbody_emulator_with_dj_tpu.chunked import (
        ChunkedHierarchicalConfig,
        ChunkedHierarchicalProcessor,
    )
    from jax_nbody_emulator_with_dj_tpu.hierarchical import (
        HierarchicalConfig,
        HierarchicalProcessor,
    )
    from jax_nbody_emulator_with_dj_tpu.science.powerspec import power_spectrum

    n = args.size
    boxsize = 1000.0
    style = StyleNBodyEmulatorVelCore().init(jax.random.key(0))
    if args.vel:
        params = modulate_emulator_parameters_vel(style, z=0.0, Om=0.3175)
        model = NBodyEmulatorVelCore()
    else:
        params = modulate_emulator_parameters(style, z=0.0, Om=0.3175)
        model = NBodyEmulatorCore()

    rng = np.random.RandomState(7)
    # smooth displacement-like input at realistic amplitude
    f1 = np.fft.fftfreq(n).astype(np.float32)
    k2 = (f1[:, None, None] ** 2 + f1[None, :, None] ** 2
          + f1[None, None, :] ** 2)
    filt = np.exp(-k2 / np.float32(2 * 0.03**2))
    box = np.empty((3, n, n, n), np.float32)
    for d in range(3):
        g = np.fft.irfftn(
            np.fft.rfftn(rng.standard_normal((n, n, n)).astype(np.float32))
            * filt[..., : n // 2 + 1], s=(n, n, n))
        box[d] = g / g.std() * 2.0
    del k2, filt

    t = min(128, n)
    f32 = jnp.float32
    cfg_a = HierarchicalConfig(
        size=(n,) * 3, slab=min(64, n), slab_h=min(128, n), tile1=min(64, n // 2),
        tile=(t, t, max(t // 2, 4)) if args.vel else (t, t, min(2 * t, n)),
        dtype=f32, buf_dtype=jnp.bfloat16, output_dtype=np.float32,
    )
    t0 = time.perf_counter()
    out_a = HierarchicalProcessor(model, params, cfg_a).process_box(
        box, 0.0, 0.3175
    )
    ta = time.perf_counter() - t0

    cfg_b = ChunkedHierarchicalConfig(
        size=(n,) * 3, chunks=tuple(args.chunks),
        dtype=f32, buf_dtype=f32, output_dtype=np.float32,
    )
    t0 = time.perf_counter()
    out_b = ChunkedHierarchicalProcessor(model, params, cfg_b).process_box(
        box, 0.0, 0.3175
    )
    tb = time.perf_counter() - t0

    rec = {
        "size": n, "vel": args.vel,
        "row_a": "hierarchical f32 compute + bf16 buffers"
                 f" ({ta:.1f} s)",
        "row_b": "chunked true-f32 buffers"
                 f" (chunks {tuple(args.chunks)}, {tb:.1f} s)",
        "fields": {},
    }
    outs_a = out_a if args.vel else (out_a,)
    outs_b = out_b if args.vel else (out_b,)
    for name, a, b in zip(("disp", "vel"), outs_a, outs_b):
        a64 = np.asarray(a[0], np.float64)  # x-component spectra
        b64 = np.asarray(b[0], np.float64)
        k_a, p_a, _ = power_spectrum(a64, boxsize)
        k_b, p_b, _ = power_spectrum(b64, boxsize)
        # cross spectrum
        fa = np.fft.rfftn(a64)
        fb = np.fft.rfftn(b64)
        cross = (fa * np.conj(fb)).real
        kx = np.fft.fftfreq(n, d=boxsize / n) * 2 * np.pi
        kz = np.fft.rfftfreq(n, d=boxsize / n) * 2 * np.pi
        kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                     + kz[None, None, :] ** 2)
        edges = np.concatenate([[0], 0.5 * (k_a[1:] + k_a[:-1]), [kk.max() + 1]])
        idx = np.digitize(kk.ravel(), edges) - 1
        pxsum = np.bincount(idx, weights=cross.ravel(), minlength=len(k_a) + 1)
        cnt = np.bincount(idx, minlength=len(k_a) + 1)
        px = pxsum[: len(k_a)] / np.maximum(cnt[: len(k_a)], 1)
        # normalize cross like power_spectrum does (volume factors cancel
        # in the C(k) ratio below, so raw rfftn products suffice)
        pa_raw = np.bincount(idx, weights=(np.abs(fa) ** 2).ravel(),
                             minlength=len(k_a) + 1)[: len(k_a)] / np.maximum(
            cnt[: len(k_a)], 1)
        pb_raw = np.bincount(idx, weights=(np.abs(fb) ** 2).ravel(),
                             minlength=len(k_a) + 1)[: len(k_a)] / np.maximum(
            cnt[: len(k_a)], 1)
        good = (cnt[: len(k_a)] > 0) & (pa_raw > 0) & (pb_raw > 0)
        tk = np.sqrt(p_a[good] / p_b[good])
        ck = px[good] / np.sqrt(pa_raw[good] * pb_raw[good])
        diff = a64 - b64
        rec["fields"][name] = {
            "max_abs_T_minus_1": float(np.max(np.abs(tk - 1))),
            "median_abs_T_minus_1": float(np.median(np.abs(tk - 1))),
            "min_C": float(np.min(ck)),
            "rms_rel_field_err": float(diff.std() / b64.std()),
        }
        print(name, json.dumps(rec["fields"][name]), flush=True)

    out = Path(args.out or f"docs/f32_buffer_delta_{n}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rec, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
