"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Each process initializes jax.distributed over localhost, builds a global
(2 procs × 4 cpu devices) mesh, shards a deterministic tiny llama model
with the standard TP specs, runs one forward, and process 0 writes the
gathered logits to OUT."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU harness overrides JAX_PLATFORMS at plugin discovery; only
# jax.config wins (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

from llama_cpp_gfx906_tpu.parallel import distributed  # noqa: E402

coord, n_proc, pid, out_path = sys.argv[1:5]
distributed.initialize(coord, int(n_proc), int(pid))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from llama_cpp_gfx906_tpu.models.config import ModelConfig  # noqa: E402
from llama_cpp_gfx906_tpu.models.llama import KVCache, forward  # noqa: E402
from llama_cpp_gfx906_tpu.parallel import make_mesh  # noqa: E402
from llama_cpp_gfx906_tpu.parallel.sharding import kv_pspec  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

assert jax.process_count() == int(n_proc), jax.process_count()
assert len(jax.devices()) == 4 * int(n_proc)

# deterministic tiny model (same on every process)
cfg = ModelConfig(
    arch="llama", n_layers=2, n_embd=32, n_heads=4, n_kv_heads=4,
    head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=128,
)
rng = np.random.default_rng(0)


def w(*shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


host_params = {
    "tok_emb": w(64, 32),
    "out_norm": np.ones(32, np.float32),
    "lm_head": w(32, 64),
    "layers": {
        "attn_norm": np.ones((2, 32), np.float32),
        "ffn_norm": np.ones((2, 32), np.float32),
        "wq": w(2, 32, 32), "wk": w(2, 32, 32), "wv": w(2, 32, 32),
        "wo": w(2, 32, 32), "w_gate": w(2, 32, 64), "w_up": w(2, 32, 64),
        "w_down": w(2, 64, 32),
    },
}

mesh = make_mesh(n_model=4, n_data=int(n_proc))
put = distributed.make_multihost_put_fn(mesh, cfg)


def shard_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = shard_tree(v, prefix + k + ".")
        else:
            out[k] = put(v, prefix + k)
    return out


params = shard_tree(host_params)

B = int(n_proc)  # one sequence per data-mesh row
toks = np.tile(np.asarray([[3, 7, 11, 2]], np.int32), (B, 1))
kv_sh = NamedSharding(mesh, kv_pspec(cfg, 4))
kv0 = KVCache.create(cfg, B, 16, jnp.float32)
kv0 = KVCache(
    k=jax.make_array_from_callback(kv0.k.shape, kv_sh, lambda i: np.zeros(kv0.k[i].shape, np.float32)),
    v=jax.make_array_from_callback(kv0.v.shape, kv_sh, lambda i: np.zeros(kv0.v[i].shape, np.float32)),
    n_past=jax.make_array_from_callback(
        (B,), NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        lambda i: np.zeros((np.zeros((B,))[i].shape), np.int32),
    ),
)

fwd = jax.jit(forward, static_argnames=("cfg", "return_hidden"))
toks_sh = jax.make_array_from_callback(
    toks.shape, NamedSharding(mesh, jax.sharding.PartitionSpec("data", None)),
    lambda i: toks[i],
)
logits, _ = fwd(params, cfg, toks_sh, kv0)
gathered = distributed.allgather(logits)

if int(pid) == 0:
    np.save(out_path, np.asarray(gathered, np.float32))
print(f"proc {pid} done", flush=True)
