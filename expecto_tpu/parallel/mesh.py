"""Device mesh construction and sharding helpers.

The reference's only parallelism is filesystem data-parallelism over chunked
inputs plus shell-loop mergers (SURVEY §2.2). Here the batch axis
(variant x allele x shift x orientation windows, or genes for training) is
sharded over a 1-D ``jax.sharding.Mesh``; cross-host runs initialize
``jax.distributed`` and use XLA collectives instead of merge scripts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def device_count() -> int:
    return jax.device_count()


def get_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def get_mesh_2d(dp: int, mp: int) -> Mesh:
    """(data, model) mesh for tensor-parallel Beluga dense layers."""
    devs = np.array(jax.devices()[: dp * mp]).reshape(dp, mp)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Zero-pad ``axis`` up to a multiple; returns (padded, original_size)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad), n


def local_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over this process's addressable devices. In multi-host runs
    the engine shards each host's own row range over its local devices
    (parallel/dist.py) — host-local inputs and np fetches require an
    addressable mesh, not the global one."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def maybe_initialize_distributed() -> None:
    """Initialize the multi-host runtime when launched under a multi-process
    coordinator (no-op in single-process runs).

    Decides from the environment alone: calling jax.process_count() (or any
    backend query) first would initialize the local backend and make
    jax.distributed.initialize() raise — it must run before first backend
    use."""
    import os

    try:
        initialized = jax.distributed.is_initialized()  # public since jax 0.4.34
    except AttributeError:  # older jax: fall back to the internal state
        initialized = jax._src.distributed.global_state.client is not None
    if initialized:
        return
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
