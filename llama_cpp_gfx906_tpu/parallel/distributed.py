"""Multi-host entry point (SURVEY Phase 5; replaces the reference's RPC
backend, ``tools/rpc`` — the coordinator/worker roles disappear into the
JAX runtime: one SPMD program spans all hosts, collectives ride ICI
within a slice and DCN between hosts).

Usage on each host::

    from llama_cpp_gfx906_tpu.parallel import distributed
    distributed.initialize()          # env-driven, or pass explicit args
    mesh = make_mesh(n_model=...)     # global mesh over all hosts' devices
    params = load_llama_params(reader, cfg,
                               device_put_fn=distributed.make_multihost_put_fn(mesh, cfg))

Environment variables mirror ``jax.distributed``'s own:
``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from .sharding import param_pspecs

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` wrapper with env fallbacks.

    Must run before any other JAX call on every host.  No-ops when the
    run is single-process (no coordinator configured)."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process run
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def make_multihost_put_fn(mesh: Mesh, cfg: ModelConfig):
    """``device_put_fn`` for the weight loaders in a multi-process run.

    Each process only materializes and uploads its **addressable** shards
    of every tensor (``jax.make_array_from_callback`` slices the host
    array per shard — with memmap-backed sources only the local byte
    ranges are paged in).  This is the per-host shard read the reference
    approximates with gguf-split files."""
    specs = param_pspecs(cfg, mesh.shape["model"])

    def put(arr, name: str):
        if name.startswith("layers."):
            spec = specs["layers"].get(name.split(".", 1)[1], P())
        else:
            spec = specs.get(name, P())
        sharding = NamedSharding(mesh, spec)
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    return put


def allgather(x):
    """Gather a (possibly multi-host-sharded) array onto every process."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)
