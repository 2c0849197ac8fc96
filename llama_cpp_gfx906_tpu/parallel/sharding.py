"""Mesh construction + GSPMD sharding rules.

The TPU-native replacement for the reference's multi-device machinery —
layer/row splits (``LLAMA_SPLIT_MODE_LAYER/ROW``, ``llama-model.cpp:
1917-1975``), the ggml backend scheduler's pipeline parallelism
(``llama-context.cpp:255-285``) and the TCP RPC backend (``tools/rpc``) —
expressed instead as one SPMD program over a ``Mesh``:

- "model" axis = tensor parallelism: attention heads + FFN columns are
  column-sharded, output projections row-sharded; XLA inserts the
  all-reduce (the analog of ROW mode's partial-result reduction) on ICI.
- "data" axis = batch/sequence parallelism across chips or hosts.

Multi-host runs use ``jax.distributed.initialize`` + the same program —
the RPC server role disappears into the JAX runtime.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig


def make_mesh(
    n_model: int | None = None,
    n_data: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def param_pspecs(cfg: ModelConfig, n_model: int) -> dict:
    """PartitionSpecs matching the ``load_llama_params`` pytree.

    Column-parallel: wq/wk/wv/w_gate/w_up (out dim on "model").
    Row-parallel:    wo/w_down (in dim on "model" → XLA all-reduces).
    Vocab-parallel:  tok_emb rows, lm_head columns.
    Replicated:      norms and (if head count doesn't divide) everything kv.
    """

    def div(n: int) -> bool:
        return n_model > 0 and n % n_model == 0

    heads_ok = div(cfg.n_heads * cfg.head_dim)
    kv_ok = div(cfg.n_kv_heads * cfg.head_dim)
    ff_ok = div(cfg.n_ff)
    vocab_ok = div(cfg.n_vocab)

    col = lambda ok: P(None, None, "model") if ok else P()
    row = lambda ok: P(None, "model", None) if ok else P()

    layers = {
        "attn_norm": P(),
        "ffn_norm": P(),
        "q_norm": P(),
        "k_norm": P(),
        "post_attn_norm": P(),
        "post_ffn_norm": P(),
        "wq": col(heads_ok),
        "wk": col(kv_ok),
        "wv": col(kv_ok),
        "bq": P(None, "model") if heads_ok else P(),
        "bk": P(None, "model") if kv_ok else P(),
        "bv": P(None, "model") if kv_ok else P(),
        "wo": row(heads_ok),
        "w_gate": col(ff_ok),
        "w_up": col(ff_ok),
        "w_down": row(ff_ok),
    }
    # expert parallelism: shard the expert axis of stacked MoE tensors over
    # "model" (the reference has no cross-device EP — SURVEY §2.3; here the
    # routed einsum's combine step becomes a GSPMD all-reduce over ICI)
    ep_ok = cfg.n_experts > 0 and div(cfg.n_experts)
    exp_spec = P(None, "model", None, None) if ep_ok else P()
    layers.update({
        "moe_gate_inp": P(),
        "moe_gate": exp_spec,
        "moe_up": exp_spec,
        "moe_down": exp_spec,
    })
    return {
        "tok_emb": P("model", None) if vocab_ok else P(),
        "out_norm": P(),
        "lm_head": P(None, "model") if vocab_ok else P(),
        "layers": layers,
    }


def kv_pspec(cfg: ModelConfig, n_model: int, shard_batch: bool = True) -> P:
    """KV cache (L, B, S, Hkv, Dh): heads on "model", batch on "data"."""
    heads = "model" if cfg.n_kv_heads % max(n_model, 1) == 0 and n_model > 1 else None
    batch = "data" if shard_batch else None
    return P(None, batch, None, heads, None)


def shard_params(params: dict, mesh: Mesh, cfg: ModelConfig) -> dict:
    """device_put an (unsharded) param pytree with TP/DP shardings."""
    specs = param_pspecs(cfg, mesh.shape["model"])

    def put(tree, spec_tree):
        out = {}
        for key, val in tree.items():
            if isinstance(val, dict):
                out[key] = put(val, spec_tree[key])
            else:
                out[key] = jax.device_put(val, NamedSharding(mesh, spec_tree.get(key, P())))
        return out

    return put(params, specs)


def _fit_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Adapt a dense-weight PartitionSpec to one array of a QuantTensor.

    Quantized planes share the dense tensor's axis order with scaled-down
    axis sizes (packed q rows = K/2, scale rows = K/group), so the dense
    spec applies verbatim — except that a mesh axis must divide the plane
    dimension it shards.  Axes that don't divide fall back to replicated
    (correct under GSPMD: specs are layout, not semantics), and specs
    longer than the array rank are right-aligned onto it (a stacked
    (L, K, N) spec onto an unstacked (K, N) head plane)."""
    entries = list(spec)
    if len(entries) > len(shape):
        entries = entries[len(entries) - len(shape):]
    entries += [None] * (len(shape) - len(entries))
    fitted = []
    for dim, ax in zip(shape, entries):
        if ax is None:
            fitted.append(None)
            continue
        n = int(np.prod([mesh.shape[a] for a in
                         (ax if isinstance(ax, tuple) else (ax,))]))
        fitted.append(ax if dim % n == 0 else None)
    return P(*fitted)


_QT_PLANES = ("q", "s", "m", "sd", "md")


def make_device_put_fn(mesh: Mesh, cfg: ModelConfig):
    """``device_put_fn`` for runtime.weights loaders: streams each host
    tensor straight into its sharded device buffers (no full-model
    replicated staging — the analog of mmap→sharded upload,
    llama-model-loader.cpp:919).

    QuantTensor planes arrive as ``<name>.q/.s/.m/.sd/.md``
    (runtime/weights.py ``_put_qt``); every plane keeps the dense
    tensor's N-last / K-second axis order, so the dense spec is fitted
    per plane (``_fit_spec``).  The fn exposes ``mesh`` so callers can
    mark the loaded QuantTensors ``xla_only`` when n_model > 1."""
    specs = param_pspecs(cfg, mesh.shape["model"])

    def put(arr, name: str):
        parts = name.split(".")
        if parts[-1] in _QT_PLANES and len(parts) > 1:
            parts = parts[:-1]  # QuantTensor plane → dense weight's spec
        if parts[0] == "layers" and len(parts) > 1:
            spec = specs["layers"].get(parts[1], P())
        else:
            spec = specs.get(parts[0], P())
        spec = _fit_spec(spec, np.shape(arr), mesh)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    put.mesh = mesh
    return put
