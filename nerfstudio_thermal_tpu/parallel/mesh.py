"""Device mesh + sharding helpers: the TPU replacement for the reference's
DDP/NCCL stack.

Behavioral spec being replaced: reference `scripts/train.py:103-223`
(mp.spawn + dist.init_process_group + DistributedDataParallel) and
`utils/comms.py` (rank utilities, barriers). On TPU there is no DDP object:
the train step is one SPMD program over a 1-D `data` mesh; the ray batch is
sharded along `data`, params are replicated, and XLA inserts the gradient
all-reduce (psum) automatically from the sharding annotations — riding ICI
within a slice and DCN across slices.

Multi-host: call `initialize_distributed()` once per process
(jax.distributed.initialize), then every helper here operates on the global
device set. `process_index() == 0` replaces `is_main_process` (reference
utils/decorators.py); `sync_global_devices` replaces barriers.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous (no-op when single-process). Replaces
    dist.init_process_group (reference scripts/train.py:138-144)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_main_process() -> bool:
    return jax.process_index() == 0


def create_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray-batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Build the device batch with the leading dim sharded over `data`.

    Single-process: a plain device_put with the global sharding. Multi-host
    (>1 process): each process holds only its LOCAL slice of the batch (the
    datamanagers sample with per-process seed offsets), so the global array
    must be assembled from per-process shards with
    `jax.make_array_from_process_local_data` — a device_put of a host-global
    array would be wrong there (each host's copy differs). Replaces the
    reference's per-rank DataLoader + DDP implicit sharding
    (scripts/train.py:97, base_datamanager.py)."""
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
