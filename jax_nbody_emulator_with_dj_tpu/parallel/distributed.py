"""Multi-host (pod-slice) bootstrap and process-local sharded I/O.

The reference scales by a sequential host loop on one GPU and ships SLURM
launchers (``examples/run_jax_emulator.slurm``); the TPU-native equivalent is
a multi-controller JAX program: every host in a pod slice runs the same
script, :func:`initialize` wires them into one runtime, and
:func:`make_sharded_box` builds the global input array from *process-local*
pieces so a 2048^3 box (96 GB in fp32) never materializes on any single host.

Typical pod-slice entrypoint (same script on every host, e.g. via
``gcloud compute tpus tpu-vm ssh --worker=all --command="python run.py"``)::

    from jax_nbody_emulator_with_dj_tpu.parallel import (
        initialize, mesh_for_devices, make_sharded_box,
        ShardedBoxConfig, ShardedBoxProcessor,
    )

    initialize()                       # no-op on a single host
    mesh = mesh_for_devices(len(jax.devices()))   # global device count
    cfg = ShardedBoxConfig(size=(2048,) * 3)
    proc = ShardedBoxProcessor(model, params, mesh, cfg)
    box = make_sharded_box(mesh, cfg, load_block)  # local reads only
    dis, vel = proc.process_box(box, z=0.0, Om=0.3175)

See ``docs/RUNBOOK_v5e16.md`` for the full v5e-16 (4-host) runbook.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SPATIAL_AXES


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host JAX runtime (safe no-op for single-process runs).

    On TPU pod VMs all arguments are discovered from the metadata server and
    ``jax.distributed.initialize()`` needs no arguments; on other clusters
    pass them explicitly or via the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``).

    Replaces the reference's SLURM/MPI launch path
    (``examples/run_jax_emulator.slurm``, ``halos.py:705-720``) — after this
    call every host sees the global ``jax.devices()`` and XLA collectives
    ride ICI/DCN with no NCCL/MPI anywhere.
    """
    explicit = coordinator_address or num_processes or process_id is not None
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    on_pod = jax.default_backend() == "tpu" and jax.process_count() == 1
    if not (explicit or env or on_pod):
        return  # single-process run
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized, or single-host TPU VM where the metadata
        # discovery finds exactly one worker — both are fine to run on.
        pass


def box_spec() -> P:
    """PartitionSpec of a (C, X, Y, Z) box over the spatial mesh axes."""
    return P(None, *SPATIAL_AXES)


def make_sharded_box(mesh: Mesh, size, make_block, in_chan: int = 3, dtype=None):
    """Assemble a globally sharded (C, X, Y, Z) box from per-shard callbacks.

    ``make_block(index)`` is called once per *addressable* shard with the
    global index (a tuple of slices into the (C,) + size array) and must
    return the local numpy block — typically a slice read from a
    memory-mapped ``.npy`` or a locally generated IC region.  Each host only
    touches its own shards, so the global box never exists on one host.
    """
    sharding = NamedSharding(mesh, box_spec())
    shape = (in_chan,) + tuple(size)

    def cb(index):
        block = np.asarray(make_block(index))
        if dtype is not None:
            block = block.astype(dtype, copy=False)
        return block

    return jax.make_array_from_callback(shape, sharding, cb)


def process_local_devices(mesh: Mesh):
    """The subset of mesh devices addressable by this process."""
    return [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
