"""Attention with an in-place (donated) KV cache — jnp reference path.

Covers the semantics of the reference's ``build_attn_mha``
(``src/llama-graph.cpp:1220``): GQA broadcast, causal masking, optional
sliding window and logit softcap, KV insertion (``ggml_set_rows`` analog,
``llama-kv-cache-unified.cpp:1108``).  The Pallas flash/paged kernels in
``ops/flash_attention.py`` replace the score materialization on the hot
path; this version is the golden oracle they are tested against.

Shapes (all static under jit):
  q:        (B, T, Hq, Dh)      new queries
  k/v new:  (B, T, Hkv, Dh)
  k/v cache:(B, S, Hkv, Dh)     ring buffer in HBM
  n_past:   (B,)                tokens already in cache per sequence
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def insert_kv(
    cache: jnp.ndarray, new: jnp.ndarray, n_past: jnp.ndarray
) -> jnp.ndarray:
    """Scatter new K or V rows at each sequence's write offset."""

    def one(c, x, start):
        return jax.lax.dynamic_update_slice(c, x, (start, 0, 0))

    return jax.vmap(one)(cache, new.astype(cache.dtype), n_past)


def mha_with_cache(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    n_past: jnp.ndarray,
    scale: float,
    sliding_window=0,  # int or traced int32 scalar; <= 0 disables
    logit_softcap: float = 0.0,
    sinks: jnp.ndarray | None = None,  # (Hq,) attention-sink logits (gpt-oss)
    kv_pos: jnp.ndarray | None = None,  # (B, S) logical positions (self-extend)
    q_pos: jnp.ndarray | None = None,  # (B, T) query positions when kv_pos set
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (attn_out (B,T,Hq,Dh), k_cache', v_cache').

    ``k_cache``/``v_cache`` may be plain arrays or ops.kv_quant.QuantKV
    (q8 KV storage, llama.h type_k/type_v analog) — quantized caches
    update in int8 and dequantize into the compute below."""
    from .kv_quant import QuantKV, dequantize_rows, insert_quant

    B, T, Hq, Dh = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = Hq // Hkv

    quantized = isinstance(k_cache, QuantKV)
    if quantized:
        k_store = insert_quant(k_cache, k_new, n_past)
        v_store = insert_quant(v_cache, v_new, n_past)
        k_cache = dequantize_rows(k_store, q.dtype)
        v_cache = dequantize_rows(v_store, q.dtype)
    else:
        k_cache = insert_kv(k_cache, k_new, n_past)
        v_cache = insert_kv(v_cache, v_new, n_past)
        k_store, v_store = k_cache, v_cache

    # long-enough prefill on TPU → blockwise flash kernel (never builds the
    # (T, S) score matrix); decode and CPU runs use the einsum path below
    # (sinks/explicit positions change masking — einsum handles them)
    if T >= 64 and sinks is None and kv_pos is None and jax.default_backend() == "tpu":
        from .flash_attention import flash_attention

        out = flash_attention(
            q, k_cache, v_cache, n_past, scale,
            sliding_window=sliding_window, logit_softcap=logit_softcap,
        )
        return out.astype(q.dtype), k_store, v_store

    # scores: group the query heads over their shared KV head
    qg = q.reshape(B, T, Hkv, G, Dh)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    # causal mask: row index == position in the default layout; with
    # explicit kv_pos (self-extend) mask on logical positions and hide
    # rows beyond the fill level
    if kv_pos is not None:
        qp = q_pos  # (B, T)
        sp = kv_pos  # (B, S)
        mask = sp[:, None, :] <= qp[:, :, None]
        row_live = jnp.arange(S)[None, :] < (n_past[:, None] + T)
        mask &= row_live[:, None, :]
        window = jnp.asarray(sliding_window, jnp.int32)
        mask &= jnp.logical_or(window <= 0, sp[:, None, :] > qp[:, :, None] - window)
    else:
        q_pos = n_past[:, None] + jnp.arange(T)[None, :]  # (B, T)
        s_pos = jnp.arange(S)[None, :]  # (1, S)
        mask = s_pos[:, None, :] <= q_pos[:, :, None]  # (B, T, S)
        window = jnp.asarray(sliding_window, jnp.int32)
        mask &= jnp.logical_or(window <= 0, s_pos[:, None, :] > q_pos[:, :, None] - window)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    if sinks is not None:
        # gpt-oss attention sinks (soft_max_ext_add_sinks analog): one extra
        # per-head logit joins the softmax denominator, its probability mass
        # is discarded (llm_build_openai_moe_iswa path)
        sk = sinks.reshape(Hkv, G).astype(jnp.float32)  # (Hkv, G)
        m = jnp.maximum(scores.max(axis=-1), sk[None, :, :, None])  # (B,Hkv,G,T)
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(axis=-1) + jnp.exp(sk[None, :, :, None] - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, Hq, Dh).astype(q.dtype), k_store, v_store
