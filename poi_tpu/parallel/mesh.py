"""Device mesh and multi-host initialization.

The whole distributed design rides two named mesh axes (SURVEY.md §2.2 T8):

- ``'data'``  — batch sharding; gradient psum. May span DCN on multi-host
  slices (only the grad all-reduce crosses hosts).
- ``'model'`` — vocab sharding for the POI embedding / output tables;
  all-to-all id/vector exchange and softmax psum ride ICI.

The reference has no parallelism at all (single-process Theano); there is no
NCCL/MPI/Gloo anywhere here either — XLA collectives compiled onto the
interconnect are the entire comms backend.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX multi-host coordination service when configured.

    No-op for single-process runs. Multi-host bring-up (SURVEY.md §3.2c):
    every host calls this with the same coordinator before touching devices.
    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID from
    the environment when args are omitted.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        process_id, num_processes, jax.local_device_count(), jax.device_count(),
    )


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build the ('data', 'model') mesh.

    ``data=-1`` infers the data-parallel degree from the device count. Device
    order is taken from ``jax.devices()`` (on TPU this enumerates with ICI
    locality), and the 'model' axis is placed minor so vocab all-to-all /
    psum map onto neighboring chips.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if model <= 0:
        raise ValueError("model axis size must be >= 1")
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def vocab_sharding(mesh: Mesh) -> NamedSharding:
    """Vocab-dim (row) sharding for embedding tables: [V, D] → V over 'model'."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def local_data_batch(global_batch: int, mesh: Mesh) -> int:
    """Per-host slice of the global batch given this mesh's process layout."""
    return global_batch // jax.process_count()
