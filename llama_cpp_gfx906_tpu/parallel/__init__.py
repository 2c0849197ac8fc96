"""Multi-chip / multi-host parallelism (mesh, GSPMD shardings)."""

from .sharding import (  # noqa: F401
    kv_pspec,
    make_device_put_fn,
    make_mesh,
    param_pspecs,
    shard_params,
)
