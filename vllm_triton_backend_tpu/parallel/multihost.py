"""Multi-host (DCN) scaffolding: process bootstrap + global meshes.

SURVEY.md §5.8 / north star: ≥85 % scaling at N >= 2 hosts demands a
multi-process story, not just a single-process device mesh.  JAX's model:
every host runs the SAME program, calls :func:`init_distributed` once
(gRPC coordination service), and then sees the GLOBAL device set in
``jax.devices()``; ``shard_map``/``pjit`` over a global mesh insert the
cross-host collectives automatically, riding ICI within a slice and DCN
across slices.

Mesh discipline (the scaling-book recipe): put the REPLICATED axis
(data) across hosts — DCN carries only gradient/throughput-insensitive
traffic — and keep tensor-parallel axes inside a host's ICI domain.
``make_multihost_mesh`` encodes that: the ``data`` axis spans process
boundaries, ``model`` stays within each process's local devices.

Tested without hardware by 2 processes x 4 virtual CPU devices over
loopback (tests/test_multihost.py), the fake-mesh tier the reference
lacks entirely (SURVEY.md §4).
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    Arguments default to the standard env contract
    (``VTB_COORDINATOR`` / ``VTB_NUM_PROCESSES`` / ``VTB_PROCESS_ID``,
    falling back to JAX's own auto-detection on supported platforms).
    Call BEFORE first device use on every host.
    """
    import jax

    if getattr(init_distributed, "_done", False):
        return
    coordinator_address = coordinator_address or os.environ.get(
        "VTB_COORDINATOR"
    )
    if num_processes is None and "VTB_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VTB_NUM_PROCESSES"])
    if process_id is None and "VTB_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VTB_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    init_distributed._done = True


def make_multihost_mesh(model: int | None = None):
    """Global (data, model) mesh: ``model`` within each host's devices,
    ``data`` across hosts.

    ``model`` defaults to the local device count (whole-host TP).  The
    device array is laid out so each mesh row's model axis is one
    process's devices — collectives over ``model`` never cross DCN.
    """
    import numpy as np

    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_local = jax.local_device_count()
    if model is None:
        model = n_local
    assert n_local % model == 0, "model axis must divide local devices"
    # sort by (process_index, id): rows = hosts, cols = local devices
    devices = sorted(
        devices, key=lambda d: (d.process_index, d.id)
    )
    data = len(devices) // model
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def process_local_batch_slice(num_items: int) -> slice:
    """Which slice of a [data]-stacked batch this process owns (for
    feeding per-replica scheduler batches from per-host frontends)."""
    import jax

    per = num_items // jax.process_count()
    lo = jax.process_index() * per
    return slice(lo, lo + per)
