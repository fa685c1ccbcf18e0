"""End-to-end science pipeline: IC -> 1LPT -> emulator -> density -> stats.

Functional counterpart of the reference's ``scripts/core.py:127-556``
(``run_lpt_emulator_pipeline``), built entirely on the in-package JAX-native
science layer (EH98 P(k) instead of CLASS, :mod:`science.grf` instead of
DISCO-DJ N-GenIC, :mod:`science.lpt` instead of DISCO-DJ LPT,
:mod:`science.mas` instead of Pylians deposition).

Input convention: the emulator consumes the z=0-normalized Zel'dovich
displacement; growth is applied inside the model via D(z) (this matches the
model's input scaling ``x * Dz/6`` and the velocity path's first-layer
tangent rule).  At z=0 this coincides with the reference pipeline.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from .cosmology import growth_factor
from .emulator import create_emulator
from .subbox import SubboxConfig
from .science.grf import gaussian_random_field
from .science.linear_pk import eisenstein_hu_pk
from .science.lpt import displacement_to_density, zeldovich_displacement
from .science.resize import resize_density_grid
from .utils.timing import force_sync

# Quijote fiducial cosmology (reference scripts/core.py:41-47).
QUIJOTE_FIDUCIAL = {
    "Om": 0.3175,
    "Ob": 0.049,
    "h": 0.6711,
    "ns": 0.9624,
    "sigma8": 0.834,
}


@dataclass
class PipelineResult:
    psi_lpt: np.ndarray | None = None
    psi_emu: np.ndarray | None = None
    vel_emu: np.ndarray | None = None
    delta_lin: np.ndarray | None = None
    delta_lpt: np.ndarray | None = None
    delta_emu: np.ndarray | None = None
    timings: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)


def run_lpt_emulator_pipeline(
    *,
    seed: int | None = None,
    input_delta: np.ndarray | None = None,
    n_part: int = 512,
    boxsize: float = 1000.0,
    z: float = 0.0,
    cosmo: dict | None = None,
    pk_table=None,
    params: dict | None = None,
    load_params: bool = True,
    premodulate: bool = True,
    compute_vel: bool = True,
    ndiv: tuple = (4, 4, 8),
    runtime: str = "subbox",
    precision: str = "bf16",
    output_dtype=np.float32,
    mas_worder: int = 2,
    deconvolve: bool = True,
    density_res: int | None = None,
    num_sims: int = 1,
    out_dir: str | Path | None = None,
    save_fields: bool = False,
    keep_fields: bool = True,
    mid_chan: int = 64,
) -> PipelineResult:
    """Run the full IC -> 1LPT -> emulator -> density pipeline.

    Args:
        seed: draw the linear field as a GRF with this seed (mode A); or
        input_delta: use this (N,N,N) linear density contrast, z=0
            normalization (mode B; resized to ``n_part`` if needed).
        n_part: particle grid per axis (the emulation resolution).
        boxsize: box side [Mpc/h].
        z: output redshift.
        cosmo: dict(Om, Ob, h, ns, sigma8); default Quijote fiducial.
        pk_table: external linear z=0 P(k) replacing the in-package EH98 —
            a path to a CLASS-style table (see
            :func:`science.linear_pk.load_pk_table`) or a (k, P) array pair;
            the reference's CLASS pathway (``scripts/core.py:263-302``).
        params / load_params: emulator weights (see ``create_emulator``).
        premodulate: fold style at (z, Om) (production default).
        compute_vel: also emulate velocities.
        ndiv: subbox decomposition of the emulation run (``runtime="subbox"``).
        runtime: 'subbox' (reference semantics, uses ``ndiv``) or 'auto'
            (the overlap-minimal hierarchical runtime under
            ``geometry.auto_hierarchical_config`` — measured-fitting
            geometry, chunked fallback; ``ndiv`` is ignored).
        precision: 'bf16' | 'f16' | 'f32' compute dtype.
        mas_worder / deconvolve: density deposition settings.
        density_res: density diagnostic mesh (default n_part).
        num_sims: repeat the emulation (timing statistics).
        out_dir / save_fields: persist .npy fields + metadata.json.
        keep_fields: include field arrays in the returned result.
    """
    cosmo = dict(cosmo or QUIJOTE_FIDUCIAL)
    density_res = density_res or n_part
    dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}[precision]
    timings: dict = {}
    result = PipelineResult()

    # --- 1. Linear field -------------------------------------------------
    t0 = time.perf_counter()
    if pk_table is not None:
        if isinstance(pk_table, (str, Path)):
            from .science.linear_pk import load_pk_table

            k_tab, p_tab = load_pk_table(pk_table)
        else:
            k_tab, p_tab = pk_table
        k_tab = jnp.asarray(k_tab, jnp.float32)
        p_tab = jnp.asarray(p_tab, jnp.float32)
    else:
        k_tab = jnp.logspace(-4, 2, 512)
        p_tab = eisenstein_hu_pk(
            k_tab, Om=cosmo["Om"], Ob=cosmo["Ob"], h=cosmo["h"],
            ns=cosmo["ns"], sigma8=cosmo["sigma8"],
        )
    if input_delta is not None:
        delta_lin = jnp.asarray(input_delta, jnp.float32)
        if delta_lin.shape[0] != n_part:
            delta_lin = resize_density_grid(
                delta_lin, n_part, boxsize, k_tab, p_tab,
                key=jax.random.key(seed or 0),
            )
    else:
        if seed is None:
            raise ValueError("provide either seed or input_delta")
        delta_lin = gaussian_random_field(jax.random.key(seed), n_part, boxsize, k_tab, p_tab)
    timings["ic_seconds"] = time.perf_counter() - t0

    # --- 2. 1LPT displacement (z=0 normalization) ------------------------
    t0 = time.perf_counter()
    psi0 = zeldovich_displacement(delta_lin, boxsize)
    force_sync(psi0)
    timings["lpt_seconds"] = time.perf_counter() - t0

    # LPT density diagnostic at the target redshift.
    t0 = time.perf_counter()
    dz = float(growth_factor(z, cosmo["Om"]))
    delta_lpt = displacement_to_density(
        psi0 * dz, boxsize, nmesh=density_res, worder=mas_worder, deconvolve=deconvolve
    )
    force_sync(delta_lpt)
    timings["lpt_density_seconds"] = time.perf_counter() - t0

    # --- 3. Emulator ------------------------------------------------------
    t0 = time.perf_counter()
    if runtime == "auto":
        from .geometry import auto_hierarchical_config

        # mid_chan scales every buffer and transient in the planner's HBM
        # estimate — it must match the model actually built below.
        sb = auto_hierarchical_config(
            (n_part,) * 3, dtype=dtype, compute_vel=compute_vel,
            output_dtype=np.dtype(output_dtype), mid_chan=mid_chan,
        )
    elif runtime == "subbox":
        sb = SubboxConfig(
            size=(n_part,) * 3, ndiv=tuple(ndiv), dtype=dtype,
            output_dtype=output_dtype,
        )
    else:
        raise ValueError(f"runtime must be 'subbox' or 'auto', got {runtime!r}")
    emulator = create_emulator(
        premodulate=premodulate,
        compute_vel=compute_vel,
        load_params=load_params,
        params=params,
        processor_config=sb,
        premodulate_z=z if premodulate else None,
        premodulate_Om=cosmo["Om"] if premodulate else None,
        mid_chan=mid_chan,
    )
    timings["emulator_build_seconds"] = time.perf_counter() - t0

    # The chunked fallback exists precisely because full-size device
    # buffers do not fit next to the phase buffers: stage its input from
    # the host chunk by chunk and assemble outputs in host arrays.  The
    # monolithic runtimes keep the device path (no host bounce).
    from .chunked import ChunkedHierarchicalConfig

    host_io = isinstance(sb, ChunkedHierarchicalConfig)
    if host_io:
        psi0 = np.ascontiguousarray(np.asarray(psi0, np.float32))

    emu_runtimes = []
    psi_emu = vel_emu = None
    for _ in range(num_sims):
        t0 = time.perf_counter()
        out = emulator.process_box(
            psi0, z=z, Om=cosmo["Om"], as_numpy=host_io
        )
        force_sync(out)
        emu_runtimes.append(time.perf_counter() - t0)
        if compute_vel:
            psi_emu, vel_emu = out
        else:
            psi_emu = out
    timings["emulator_runs_seconds"] = emu_runtimes
    timings["emulator_seconds"] = min(emu_runtimes)
    # With one run the timed call includes XLA compilation; bench.py (which
    # warms up first) is the throughput reference in that case.
    timings["emulator_seconds_includes_compile"] = num_sims == 1

    # --- 4. Emulated density ---------------------------------------------
    t0 = time.perf_counter()
    delta_emu = displacement_to_density(
        jnp.asarray(psi_emu, jnp.float32), boxsize,
        nmesh=density_res, worder=mas_worder, deconvolve=deconvolve,
    )
    force_sync(delta_emu)
    timings["emu_density_seconds"] = time.perf_counter() - t0

    metadata = {
        "seed": seed,
        "n_part": n_part,
        "boxsize": boxsize,
        "z": z,
        "cosmology": cosmo,
        "pk_table": str(pk_table) if isinstance(pk_table, (str, Path)) else (
            "external-array" if pk_table is not None else "eh98"
        ),
        "growth_factor": dz,
        "premodulate": premodulate,
        "compute_vel": compute_vel,
        "ndiv": list(ndiv),
        "runtime": runtime,
        "precision": precision,
        "mas_worder": mas_worder,
        "deconvolve": deconvolve,
        "density_res": density_res,
        "num_sims": num_sims,
        "timings": timings,
        "voxels_per_second": n_part**3 / min(emu_runtimes),
        "device": str(jax.devices()[0]),
    }

    if keep_fields:
        result.psi_lpt = np.asarray(psi0, np.float32)
        result.psi_emu = np.asarray(psi_emu, np.float32)
        result.vel_emu = None if vel_emu is None else np.asarray(vel_emu, np.float32)
        result.delta_lin = np.asarray(delta_lin, np.float32)
        result.delta_lpt = np.asarray(delta_lpt, np.float32)
        result.delta_emu = np.asarray(delta_emu, np.float32)
    result.timings = timings
    result.metadata = metadata

    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "metadata.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
        if save_fields:
            np.save(out / "delta_lin.npy", np.asarray(delta_lin, np.float32))
            np.save(out / "delta_lpt.npy", np.asarray(delta_lpt, np.float32))
            np.save(out / "delta_emu.npy", np.asarray(delta_emu, np.float32))
            np.save(out / "psi_emu.npy", np.asarray(psi_emu, np.float32))
            if vel_emu is not None:
                np.save(out / "vel_emu.npy", np.asarray(vel_emu, np.float32))
    return result
