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
    use.

    Launch contract (replacing the reference's ssh/shell fan-out,
    scripts/sed_immune_atlas/chromatin_immune_atlas.sh:8-13): every process
    gets ``JAX_COORDINATOR_ADDRESS``; on managed clusters (GKE/SLURM) that is
    enough and jax auto-detects the rest, while hand-launched runs (and the
    2-process CPU tests) also set ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID``.
    On the CPU backend cross-process collectives need the gloo implementation
    — selected here before backend init (the default 'none' silently yields
    per-process single-host worlds)."""
    import os

    try:
        initialized = jax.distributed.is_initialized()  # public since jax 0.4.34
    except AttributeError:  # older jax: fall back to the internal state
        initialized = jax._src.distributed.global_state.client is not None
    if initialized:
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return
    # CPU cross-process collectives need gloo (the default 'none' silently
    # yields per-process single-host worlds). Enable it whenever the platform
    # is cpu OR unconfigured: on an accelerator machine the unused CPU
    # backend ignores it, while a CPU-only coordinator run without
    # JAX_PLATFORMS=cpu would otherwise hit the silent-worlds failure.
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] in ("", "cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc), process_id=int(pid)
        )
    else:
        jax.distributed.initialize()
