"""BERT-family bidirectional encoder (embeddings / rerank).

TPU-native re-design of the reference's ``llm_build_bert``
(``src/llama-model.cpp`` — covers LLM_ARCH_BERT / NOMIC_BERT / JINA_BERT_V2)
and ``build_pooling`` (``src/llama-graph.cpp:1802``): post-norm encoder
blocks run under ``lax.scan`` over stacked weights, attention is
bidirectional with a padding mask (no KV cache, no causal mask), and
pooling (CLS / mean / last) plus the optional rank head
(``cls`` + ``cls.output`` tensors — the cross-encoder scorer used by
rerank models) happen on the pooled vector.

Variants steered by ModelConfig:
- bert:        learned positions + token-type embeddings, gelu MLP
- nomic-bert:  NEOX rope, swiglu gated MLP, no position table
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig

NEG_INF = -1e30


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # (B, T) int32
    n_tokens: jnp.ndarray,  # (B,) valid lengths (padding mask)
    token_types: jnp.ndarray | None = None,  # (B, T) segment ids
) -> jnp.ndarray:
    """Returns final hidden states (B, T, D) float32."""
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if "type_emb" in params:
        tt = token_types if token_types is not None else jnp.zeros_like(tokens)
        x = x + params["type_emb"][tt]
    if cfg.pos_emb == "learned":
        x = x + params["pos_emb"][jnp.arange(T)][None]
    x = layer_norm(x, params["emb_norm"], params.get("emb_norm_b"), cfg.rms_eps)

    valid = jnp.arange(T)[None, :] < n_tokens[:, None]  # (B, T)
    attn_bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]  # (B,1,1,T)
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    if cfg.pos_emb == "rope":
        inv_freq = jnp.asarray(rope_frequencies(cfg))
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    def layer_step(x, p):
        h = x
        q = h @ p["wq"]
        k = h @ p["wk"]
        v = h @ p["wv"]
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if cfg.pos_emb == "rope":
            q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
            k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhts,bshd->bthd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, cfg.n_heads * cfg.head_dim).astype(x.dtype)
        attn = attn @ p["wo"]
        if "bo" in p:
            attn = attn + p["bo"]
        # post-norm: residual then LayerNorm (attn_output_norm)
        x = layer_norm(x + attn, p["attn_out_norm"], p.get("attn_out_norm_b"), cfg.rms_eps)

        if cfg.ffn_gated:
            hf = jax.nn.silu((x @ p["w_gate"]).astype(jnp.float32)).astype(x.dtype) * (x @ p["w_up"])
        else:
            hf = x @ p["w_up"]
            if "b_up" in p:
                hf = hf + p["b_up"]
            hf = jax.nn.gelu(hf.astype(jnp.float32), approximate=False).astype(x.dtype)
        hf = hf @ p["w_down"]
        if "b_down" in p:
            hf = hf + p["b_down"]
        x = layer_norm(x + hf, p["ffn_out_norm"], p.get("ffn_out_norm_b"), cfg.rms_eps)
        return x, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    return x.astype(jnp.float32)


def pool(hidden: jnp.ndarray, n_tokens: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
    """build_pooling analog: (B, T, D) → (B, D)."""
    B, T, D = hidden.shape
    if mode == "cls":
        return hidden[:, 0]
    if mode == "last":
        return hidden[jnp.arange(B), n_tokens - 1]
    valid = (jnp.arange(T)[None, :] < n_tokens[:, None]).astype(jnp.float32)
    return (hidden * valid[:, :, None]).sum(1) / jnp.maximum(
        valid.sum(1)[:, None], 1.0
    )


def rank_score(params: dict, hidden: jnp.ndarray, n_tokens: jnp.ndarray) -> jnp.ndarray:
    """Cross-encoder relevance score via the rank head (reference: the
    ``cls`` / ``cls.output`` tensors consumed by server rerank,
    server.cpp:4810).  Returns (B,) float32."""
    x = pool(hidden, n_tokens, "cls")
    if "cls_w" in params:
        x = jnp.tanh(x @ params["cls_w"] + params.get("cls_b", 0.0))
    if "cls_out_w" in params:
        x = x @ params["cls_out_w"] + params.get("cls_out_b", 0.0)
    return x.reshape(x.shape[0], -1)[:, 0].astype(jnp.float32)


# -- loading -----------------------------------------------------------------

_LAYER_NAMES = {
    "wq": "attn_q.weight",
    "wk": "attn_k.weight",
    "wv": "attn_v.weight",
    "wo": "attn_output.weight",
    "bq": "attn_q.bias",
    "bk": "attn_k.bias",
    "bv": "attn_v.bias",
    "bo": "attn_output.bias",
    "attn_out_norm": "attn_output_norm.weight",
    "attn_out_norm_b": "attn_output_norm.bias",
    "w_gate": "ffn_gate.weight",
    "w_up": "ffn_up.weight",
    "b_up": "ffn_up.bias",
    "w_down": "ffn_down.weight",
    "b_down": "ffn_down.bias",
    "ffn_out_norm": "layer_output_norm.weight",
    "ffn_out_norm_b": "layer_output_norm.bias",
}

_TRANSPOSED = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}


def load_params(reader, cfg: ModelConfig, dtype=jnp.float32, device_put_fn=None) -> dict:
    """GGUF tensors → stacked parameter pytree (bert naming tables,
    reference src/llama-arch.cpp LLM_TENSOR_NAMES for LLM_ARCH_BERT)."""
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    tensors = dict(reader.tensors)

    def fetch(name, transpose=False):
        arr = tensors[name].to_f32()
        if transpose:
            arr = np.ascontiguousarray(arr.T)
        return arr.astype(dtype) if transpose or arr.ndim > 1 else arr

    params: dict = {
        "tok_emb": put(fetch("token_embd.weight").astype(dtype), "tok_emb"),
        "emb_norm": put(fetch("token_embd_norm.weight"), "emb_norm"),
    }
    if "token_embd_norm.bias" in tensors:
        params["emb_norm_b"] = put(fetch("token_embd_norm.bias"), "emb_norm_b")
    if "token_types.weight" in tensors:
        params["type_emb"] = put(fetch("token_types.weight").astype(dtype), "type_emb")
    if "position_embd.weight" in tensors:
        params["pos_emb"] = put(fetch("position_embd.weight").astype(dtype), "pos_emb")
    # rank head (rerank cross-encoders)
    for pk, name, t in (
        ("cls_w", "cls.weight", True),
        ("cls_b", "cls.bias", False),
        ("cls_out_w", "cls.output.weight", True),
        ("cls_out_b", "cls.output.bias", False),
    ):
        if name in tensors:
            params[pk] = put(fetch(name, t), pk)

    stacked: dict[str, list] = {}
    for i in range(cfg.n_layers):
        for key, suffix in _LAYER_NAMES.items():
            name = f"blk.{i}.{suffix}"
            if name not in tensors:
                continue
            stacked.setdefault(key, []).append(fetch(name, key in _TRANSPOSED))
    layers = {}
    for key, arrs in stacked.items():
        if len(arrs) != cfg.n_layers:
            raise ValueError(f"{key}: {len(arrs)}/{cfg.n_layers} layer tensors")
        layers[key] = put(np.stack(arrs), f"layers.{key}")
    params["layers"] = layers
    return params
