"""Device mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.5); this
module is the TPU-native scaling layer: a named `jax.sharding.Mesh` over the
local (or virtual) device set, with data-parallel batch sharding and
replicated (or FSDP-sharded) parameters. Collectives are inserted by XLA from
the sharding annotations — no explicit communication code.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.logger import logger


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    data_parallel == -1 uses every device not claimed by model_parallel.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel < 1:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    total = data_parallel * model_parallel
    if total > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {total} devices, have {n}"
        )
    grid = np.asarray(devices[:total]).reshape(data_parallel, model_parallel)
    mesh = Mesh(grid, (data_axis, model_axis))
    logger.debug(f"mesh: {data_parallel} {data_axis} x {model_parallel} {model_axis}")
    return mesh


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, params: Dict[str, Any],
                        data_axis: str = "data") -> Any:
    """ZeRO-style parameter sharding: shard the largest dimension of each
    ≥2D parameter across the data axis when divisible; replicate the rest."""
    n_shards = mesh.shape[data_axis]

    def spec_for(leaf):
        if leaf.ndim < 2:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        axis = int(np.argmax(dims))
        if dims[axis] % n_shards == 0:
            spec = [None] * leaf.ndim
            spec[axis] = data_axis
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                data_axis: str = "data") -> Dict[str, jax.Array]:
    """Device-put a host batch with its leading dim sharded over the mesh."""
    sharding = batch_sharding(mesh, data_axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


# ------------------------------------------------------------- multi-host
def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host (DCN) JAX cluster; returns True when distributed.

    On TPU pods the arguments come from the environment and
    `jax.distributed.initialize()` autodetects everything; pass them
    explicitly for CPU/GPU clusters or tests. Call before first backend use.
    After initialization `jax.devices()` is the GLOBAL device list, so
    make_mesh() builds a DCN-spanning mesh with no further changes — lay
    the data axis across hosts and keep model axes inside a host so
    parameter collectives ride ICI, not DCN.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        # Already initialized (idempotent callers) — keep going.
        if "already" not in str(exc).lower():
            raise
    logger.info(
        f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} devices"
    )
    return jax.process_count() > 1


def make_global_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, data_axis: str = "data",
    accum: bool = False,
) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from THIS process's local shard.

    Each process passes only its local rows (global_batch / process_count);
    jax.make_array_from_process_local_data stitches the global Array without
    any cross-host data movement. Single-process: plain sharded device_put.
    """
    spec = P(None, data_axis) if accum else P(data_axis)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
