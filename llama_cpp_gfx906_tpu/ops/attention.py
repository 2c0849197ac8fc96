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

import contextlib

import jax
import jax.numpy as jnp

import os

NEG_INF = -1e30

# trace-time switch: Pallas kernels have no JVP rule, so anything that
# differentiates through attention (runtime/training.py) traces inside
# this context to pin the einsum path
_FORCE_EINSUM = False

# Platform workaround switch (see dispatch comment in mha_with_cache):
# quant-weights + int8-KV + Pallas attention miscompiled on the axon TPU
# runtime as of early 2026-08.  Re-tested 2026-08-17 with a teacher-forced
# per-process repro: flash vs einsum per-row |Δlogit| ≤ 0.009 (int8 tile
# dequant rounding), argmax agreement 1.0, flash path bit-deterministic
# across 3 processes — the runtime bug is gone, so the fast kernels are ON
# by default.  LCG_QUANT_COMBO_BROKEN=1 restores the einsum fallback.
QUANT_COMBO_BROKEN = os.environ.get("LCG_QUANT_COMBO_BROKEN", "0") == "1"


@contextlib.contextmanager
def force_einsum():
    global _FORCE_EINSUM
    prev = _FORCE_EINSUM
    _FORCE_EINSUM = True
    try:
        yield
    finally:
        _FORCE_EINSUM = prev


def insert_kv(
    cache: jnp.ndarray, new: jnp.ndarray, n_past: jnp.ndarray
) -> jnp.ndarray:
    """Scatter new K or V rows at each sequence's write offset."""

    def one(c, x, start):
        return jax.lax.dynamic_update_slice(c, x, (start, 0, 0))

    return jax.vmap(one)(cache, new.astype(cache.dtype), n_past)


def alibi_slopes_for(n_heads: int) -> "jnp.ndarray":
    """Per-head ALiBi slopes (HF build_alibi_tensor formula: nearest
    power-of-two geometric ladder, odd-interleaved tail for non-pow2)."""
    import math

    n = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
    slopes = [base ** (i + 1) for i in range(n)]
    if n < n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * n) - 3)))
        slopes += [extra_base ** (2 * i + 1) for i in range(n_heads - n)]
    return jnp.asarray(slopes, jnp.float32)


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
    quant_weights: bool = False,  # True when the model's matmuls run Pallas qmm
    alibi_slopes: jnp.ndarray | None = None,  # (Hq,) ALiBi per-head slopes
    shared_k: jnp.ndarray | None = None,  # (1, S0, Hkv, Dh) shared-prefix rows
    shared_v: jnp.ndarray | None = None,
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
    on_tpu = jax.default_backend() == "tpu"
    if shared_k is not None and kv_pos is not None:
        raise NotImplementedError("shared-prefix KV + self-extend positions")
    if quantized:
        k_store = insert_quant(k_cache, k_new, n_past)
        v_store = insert_quant(v_cache, v_new, n_past)
    else:
        k_cache = insert_kv(k_cache, k_new, n_past)
        v_cache = insert_kv(v_cache, v_new, n_past)
        k_store, v_store = k_cache, v_cache

    # Pallas dispatch on TPU:
    # - prefill (T >= 64): blockwise flash, never builds the (T, S) score
    #   matrix; consumes int8 KV + per-row scales directly when quantized.
    #   ALiBi / self-extend / shared-prefix prefill stays on the einsum
    #   path (one-time cost); their *decode* runs the kernel below.
    # - decode / short verify chunks: flash_decode — reads only live KV
    #   blocks, dequantizes int8 tiles in-kernel, folds sinks into the
    #   softmax denominator, applies ALiBi bias from the mask iotas,
    #   streams self-extend logical positions with the K blocks, and
    #   walks shared-prefix rows as extra grid steps — so those features
    #   keep n_past-proportional cost at long context.
    #
    # Platform workaround (OFF by default since 2026-08-17 — see the
    # QUANT_COMBO_BROKEN note above): quant weights + int8 KV + Pallas
    # attention miscompiled on an earlier axon runtime; setting
    # LCG_QUANT_COMBO_BROKEN=1 drops that combo to the einsum path again.
    quant_combo_broken = quantized and quant_weights and QUANT_COMBO_BROKEN
    if on_tpu and not quant_combo_broken and not _FORCE_EINSUM:
        if (T >= 64 and kv_pos is None and alibi_slopes is None
                and shared_k is None):
            from .flash_attention import flash_attention

            if quantized:
                out = flash_attention(
                    q, k_store.q, v_store.q, n_past, scale,
                    sliding_window=sliding_window, logit_softcap=logit_softcap,
                    sinks=sinks,
                    k_scales=k_store.s[..., 0], v_scales=v_store.s[..., 0],
                )
            else:
                out = flash_attention(
                    q, k_cache, v_cache, n_past, scale,
                    sliding_window=sliding_window, logit_softcap=logit_softcap,
                    sinks=sinks,
                )
            return out.astype(q.dtype), k_store, v_store
        if T * G <= 128 and (quantized or S >= 4096):
            # int8 KV: the decode kernel dequantizes tiles in place — the
            # whole-cache bf16 materialization below is exactly what it
            # avoids.  bf16 caches switch to the same kernel once max_seq
            # is large: its live-block index maps make decode cost follow
            # n_past instead of max_seq (the einsum reads the whole
            # allocation — fine at 2k, wrong asymptotics at 32k).
            from .flash_decode import flash_decode

            # larger blocks at long max_seq amortize the dead-grid steps
            # (the live-block index maps elide their DMA, but each grid
            # step still costs bookkeeping); VMEM caps the block at
            # ~2 MB of K per step
            bk = 512
            if S > 8192 and Hkv * Dh <= 1024:
                bk = 1024
            out = flash_decode(
                q, k_store, v_store, n_past, scale,
                sliding_window=sliding_window, logit_softcap=logit_softcap,
                sinks=sinks, alibi_slopes=alibi_slopes,
                kv_pos=kv_pos, q_pos=q_pos,
                shared_k=shared_k, shared_v=shared_v, block_k=bk,
            )
            return out.astype(q.dtype), k_store, v_store

    if quantized:
        k_cache = dequantize_rows(k_store, q.dtype)
        v_cache = dequantize_rows(v_store, q.dtype)

    # scores: group the query heads over their shared KV head
    qg = q.reshape(B, T, Hkv, G, Dh)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k_cache, preferred_element_type=jnp.float32
    )
    n_shared = 0
    if shared_k is not None:
        # shared-prefix rows (stored ONCE, batch dim 1): scores computed
        # without materializing a per-slot broadcast copy
        n_shared = shared_k.shape[1]
        sh_scores = jnp.einsum(
            "bthgd,shd->bhgts", qg, shared_k[0].astype(qg.dtype),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.concatenate([sh_scores, scores], axis=-1)
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
        # logical positions: shared rows occupy 0..n_shared-1, own rows
        # follow at n_shared + row — one arange covers the concatenated axis
        q_pos = n_shared + n_past[:, None] + jnp.arange(T)[None, :]  # (B, T)
        s_pos = jnp.arange(n_shared + S)[None, :]  # (1, S0+S)
        mask = s_pos[:, None, :] <= q_pos[:, :, None]  # (B, T, S0+S)
        window = jnp.asarray(sliding_window, jnp.int32)
        mask &= jnp.logical_or(window <= 0, s_pos[:, None, :] > q_pos[:, :, None] - window)
    if alibi_slopes is not None:
        # ALiBi (ggml soft_max_ext positional bias; mpt/bloom/baichuan-13b):
        # score(i, j) -= slope_h · (pos_i − pos_j)
        qp_f = (q_pos if kv_pos is None else q_pos).astype(jnp.float32)
        sp_f = (jnp.broadcast_to(jnp.arange(n_shared + S)[None, :], (B, n_shared + S))
                if kv_pos is None else kv_pos).astype(jnp.float32)
        dist = qp_f[:, :, None] - sp_f[:, None, :]  # (B, T, S)
        sl = alibi_slopes.reshape(Hkv, G).astype(jnp.float32)
        scores = scores - sl[None, :, :, None, None] * dist[:, None, None, :, :]
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
    if shared_k is not None:
        out = jnp.einsum(
            "bhgts,shd->bthgd", probs[..., :n_shared].astype(shared_v.dtype),
            shared_v[0], preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bhgts,bshd->bthgd", probs[..., n_shared:].astype(v_cache.dtype),
            v_cache, preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum(
            "bhgts,bshd->bthgd", probs.astype(v_cache.dtype), v_cache,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(B, T, Hq, Dh).astype(q.dtype), k_store, v_store
