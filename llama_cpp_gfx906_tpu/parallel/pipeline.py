"""Pipeline parallelism: GPipe-style stages over a "stage" mesh axis.

The TPU-native analog of the reference's backend-scheduler pipeline
parallelism (``llama-context.cpp:255-285`` — graph splits executed
asynchronously across devices with events): layers are sharded over a
``("stage",)`` mesh axis, the batch is split into microbatches, and a
``shard_map`` program runs the classic GPipe schedule — at tick ``t``
stage ``s`` processes microbatch ``t - s`` and hands its activations to
stage ``s+1`` over ICI via ``ppermute``.  Fill + drain cost the usual
``S - 1`` bubble ticks; each stage reuses the SAME ``models.llama.forward``
(with ``return_hidden="raw"``) on its local layer slice, so every model
option the dense forward supports pipelines for free.

Composability: the "stage" axis is orthogonal to the TP/DP axes in
parallel/sharding.py — a ("data", "stage") or ("stage", "model") mesh
nests this schedule inside the GSPMD shardings.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward


def _layer_specs(layers: dict):
    """P("stage", None, ...) on every stacked (L, ...) layer leaf —
    QuantTensor pytrees included (their q/s/m leaves all carry the layer
    axis first, so PP composes with quantized weights)."""
    return jax.tree_util.tree_map(
        lambda v: P(*(["stage"] + [None] * (v.ndim - 1))), layers
    )


def shard_for_pipeline(params: dict, kv: KVCache, mesh: Mesh):
    """device_put params/kv with the stage shardings this module expects:
    layer stacks and KV split on the layer axis, the rest replicated."""
    from jax.sharding import NamedSharding

    ns = lambda spec: NamedSharding(mesh, spec)
    out = {
        k: jax.tree_util.tree_map(lambda a: jax.device_put(a, ns(P())), v)
        for k, v in params.items() if k != "layers"
    }
    out["layers"] = jax.tree_util.tree_map(
        lambda a, spec: jax.device_put(a, ns(spec)),
        params["layers"], _layer_specs(params["layers"]),
    )
    kv2 = KVCache(
        k=jax.device_put(kv.k, ns(P("stage"))),
        v=jax.device_put(kv.v, ns(P("stage"))),
        n_past=jax.device_put(kv.n_past, ns(P())),
    )
    return out, kv2


def make_pipeline_forward(cfg: ModelConfig, mesh: Mesh, n_micro: int):
    """Build a jitted pipelined forward: (params, tokens, kv) → (logits, kv).

    ``params["layers"]`` leaves and ``kv.k/v`` must be sharded with
    P("stage", ...) on the layer axis (see :func:`pipeline_specs`);
    everything else replicated.  ``tokens`` (B, T) with B divisible by
    ``n_micro``."""
    S = mesh.shape["stage"]
    if cfg.n_layers % S:
        raise ValueError(f"n_layers {cfg.n_layers} not divisible by {S} stages")
    stage_cfg = cfg.with_(n_layers=cfg.n_layers // S)

    def spmd(params, tokens, k, v, n_past):
        from ..ops.quant_matmul import QuantTensor, linear

        sidx = jax.lax.axis_index("stage")
        B, T = tokens.shape
        mb = B // n_micro
        head = params["lm_head"]
        V = head.shape[-1] if not isinstance(head, QuantTensor) else head.N
        D = params["tok_emb"].shape[-1]

        logits = jnp.zeros((B, T, V), jnp.float32)
        x_recv = jnp.zeros((mb, T, D), params["tok_emb"].dtype)

        for t in range(n_micro + S - 1):
            m = t - sidx  # microbatch index this stage works on at tick t
            active = (m >= 0) & (m < n_micro)
            ms = jnp.clip(m, 0, n_micro - 1) * mb

            toks_m = jax.lax.dynamic_slice_in_dim(tokens, ms, mb, axis=0)
            k_m = jax.lax.dynamic_slice_in_dim(k, ms, mb, axis=1)
            v_m = jax.lax.dynamic_slice_in_dim(v, ms, mb, axis=1)
            np_m = jax.lax.dynamic_slice_in_dim(n_past, ms, mb, axis=0)

            # stage 0 embeds fresh tokens; later stages consume the
            # activations ppermute'd in from the previous stage
            emb = params["tok_emb"][toks_m].astype(x_recv.dtype)
            x_in = jnp.where(sidx == 0, emb, x_recv)

            y, kv_m = forward(
                params, stage_cfg, toks_m,
                KVCache(k=k_m, v=v_m, n_past=np_m),
                embeds=x_in, return_hidden="raw",
            )
            y = y.astype(x_recv.dtype)

            # masked write-back of this microbatch's KV rows
            k = jax.lax.dynamic_update_slice_in_dim(
                k, jnp.where(active, kv_m.k, k_m), ms, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(
                v, jnp.where(active, kv_m.v, v_m), ms, axis=1)

            # last stage: final norm + head into the logits buffer
            from ..ops.norms import rms_norm

            h = rms_norm(y, params["out_norm"], cfg.rms_eps)
            lg = linear(h, params["lm_head"]).astype(jnp.float32)
            take = active & (sidx == S - 1)
            lg_old = jax.lax.dynamic_slice_in_dim(logits, ms, mb, axis=0)
            logits = jax.lax.dynamic_update_slice_in_dim(
                logits, jnp.where(take, lg, lg_old), ms, axis=0)

            # hand activations to the next stage (ICI neighbor exchange)
            x_recv = jax.lax.ppermute(
                y, "stage", [(i, i + 1) for i in range(S - 1)])

        # logits live on the last stage only — replicate for the caller
        logits = jax.lax.psum(
            jnp.where(sidx == S - 1, logits, jnp.zeros_like(logits)), "stage")
        return logits, k, v, n_past + T

    def run(params, tokens, kv):
        p_in = {
            k: jax.tree_util.tree_map(lambda _: P(), v)
            for k, v in params.items() if k != "layers"
        }
        p_in["layers"] = _layer_specs(params["layers"])
        fn = jax.jit(
            jax.shard_map(
                spmd, mesh=mesh,
                in_specs=(p_in, P(), P("stage"), P("stage"), P()),
                out_specs=(P(), P("stage"), P("stage"), P()),
                check_vma=False,
            )
        )
        logits, k, v, n_past = fn(params, tokens, kv.k, kv.v, kv.n_past)
        return logits, KVCache(k=k, v=v, n_past=n_past)

    return run
