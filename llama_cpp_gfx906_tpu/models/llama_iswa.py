"""Memory-saving iSWA forward: sliding-window layers keep a ring buffer of
``window + chunk`` rows instead of ``max_seq``.

The analog of the reference's two-tier iSWA cache
(``llama-kv-cache-unified-iswa.cpp:1-133`` — a small ring for SWA layers
beside the full cache for global-attention layers).  The repo's default
scanned forward allocates ``max_seq`` rows for every layer (correct, but
no memory saving); this variant unrolls the layer loop so SWA layers can
carry a small ring:

- ring row ``r`` holds the token whose position ``p ≡ r (mod W_ring)``;
  per-row logical positions drive the causal + window masks, so results
  are exactly those of the full cache under the same window;
- ``W_ring ≥ window + max_chunk`` guarantees a prefill chunk never
  overwrites rows that are still inside some query's window.

Covers the generalized llama feature set used by the iSWA archs
(gemma2/3: post norms, qk norms, local rope base, softcaps; mistral-SWA;
gpt-oss sinks are NOT covered here — that arch keeps the full cache).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig

NEG_INF = -1e30


@dataclass
class ISWACache:
    """Full-attention layers: (L_full, B, S, H, D); SWA layers:
    (L_swa, B, W_ring, H, D) rings + per-row logical positions."""

    k_full: jnp.ndarray
    v_full: jnp.ndarray
    k_swa: jnp.ndarray
    v_swa: jnp.ndarray
    swa_pos: jnp.ndarray  # (L_swa, B, W_ring) int32 logical pos, -1 = empty
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16, max_chunk: int = 512):
        swa = cfg.swa_layers
        L_full = sum(1 for s in swa if not s)
        L_swa = sum(1 for s in swa if s)
        W = -(-(cfg.sliding_window + max_chunk) // 128) * 128
        W = min(W, max_seq)
        return cls(
            k_full=jnp.zeros((max(L_full, 1), batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v_full=jnp.zeros((max(L_full, 1), batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            k_swa=jnp.zeros((max(L_swa, 1), batch, W, cfg.n_kv_heads, cfg.head_dim), dtype),
            v_swa=jnp.zeros((max(L_swa, 1), batch, W, cfg.n_kv_heads, cfg.head_dim), dtype),
            swa_pos=jnp.full((max(L_swa, 1), batch, W), -1, jnp.int32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k_full.shape[2]

    def memory_bytes(self) -> int:
        return (self.k_full.nbytes + self.v_full.nbytes
                + self.k_swa.nbytes + self.v_swa.nbytes)


jax.tree_util.register_dataclass(
    ISWACache, ["k_full", "v_full", "k_swa", "v_swa", "swa_pos", "n_past"], []
)


def _attn_full(q, k_new, v_new, kc, vc, n_past, scale, softcap):
    from ..ops.attention import insert_kv

    B, T, Hkv, Dh = k_new.shape
    Hq = q.shape[2]
    G = Hq // Hkv
    kc = insert_kv(kc, k_new, n_past)
    vc = insert_kv(vc, v_new, n_past)
    S = kc.shape[1]
    qg = q.reshape(B, T, Hkv, G, Dh)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, kc,
                        preferred_element_type=jnp.float32) * scale
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    q_pos = n_past[:, None] + jnp.arange(T)[None, :]
    mask = jnp.arange(S)[None, None, :] <= q_pos[:, :, None]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(vc.dtype), vc,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, Dh).astype(q.dtype), kc, vc


def _attn_ring(q, k_new, v_new, kc, vc, pos_rows, n_past, scale, window, softcap):
    """SWA attention over the ring: rows carry logical positions."""
    B, T, Hkv, Dh = k_new.shape
    Hq = q.shape[2]
    G = Hq // Hkv
    W = kc.shape[1]
    new_pos = n_past[:, None] + jnp.arange(T)[None, :]  # (B, T)
    rows = new_pos % W

    def scatter(c, x, r):
        return c.at[r].set(x)

    kc = jax.vmap(scatter)(kc, k_new.astype(kc.dtype), rows)
    vc = jax.vmap(scatter)(vc, v_new.astype(vc.dtype), rows)
    pos_rows = jax.vmap(lambda p, r, np_: p.at[r].set(np_))(pos_rows, rows, new_pos)

    qg = q.reshape(B, T, Hkv, G, Dh)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, kc,
                        preferred_element_type=jnp.float32) * scale
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    sp = pos_rows  # (B, W) logical positions (-1 = never written)
    q_pos = new_pos  # (B, T)
    mask = (sp[:, None, :] >= 0) & (sp[:, None, :] <= q_pos[:, :, None])
    mask &= sp[:, None, :] > q_pos[:, :, None] - window
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs.astype(vc.dtype), vc,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, Dh).astype(q.dtype), kc, vc, pos_rows


def forward_iswa(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: ISWACache,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, ISWACache]:
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)

    inv_freq_g = jnp.asarray(rope_frequencies(cfg))
    if cfg.rope_local_base > 0:
        from ..gguf.constants import RopeScalingType

        inv_freq_l = jnp.asarray(rope_frequencies(
            cfg.with_(rope_base=cfg.rope_local_base,
                      rope_scaling=RopeScalingType.NONE)))
    else:
        inv_freq_l = inv_freq_g
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    swa = cfg.swa_layers

    def get_layer(i):
        return jax.tree_util.tree_map(lambda a: a[i], params["layers"])

    kf, vf = list(kv.k_full), list(kv.v_full)
    ks, vs, ps = list(kv.k_swa), list(kv.v_swa), list(kv.swa_pos)
    i_full = i_swa = 0
    for il in range(cfg.n_layers):
        p = get_layer(il)
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "wqkv_fused" in p:
            Dq = cfg.n_heads * cfg.head_dim
            Dkv = cfg.n_kv_heads * cfg.head_dim
            qkv = linear(h, p["wqkv_fused"])
            q, k, v = qkv[..., :Dq], qkv[..., Dq:Dq + Dkv], qkv[..., Dq + Dkv:]
        elif "wqk_fused" in p:
            Dq = cfg.n_heads * cfg.head_dim
            qk = linear(h, p["wqk_fused"])
            q, k, v = qk[..., :Dq], qk[..., Dq:], linear(h, p["wv"])
        else:
            q, k, v = linear(h, p["wq"]), linear(h, p["wk"]), linear(h, p["wv"])
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
        inv_freq = inv_freq_l if swa[il] else inv_freq_g
        q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
        k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)

        if swa[il]:
            attn, ks[i_swa], vs[i_swa], ps[i_swa] = _attn_ring(
                q, k, v, ks[i_swa], vs[i_swa], ps[i_swa], kv.n_past, scale,
                cfg.sliding_window, cfg.attn_logit_softcap)
            i_swa += 1
        else:
            attn, kf[i_full], vf[i_full] = _attn_full(
                q, k, v, kf[i_full], vf[i_full], kv.n_past, scale,
                cfg.attn_logit_softcap)
            i_full += 1
        attn = linear(attn.reshape(B, T, cfg.n_heads * cfg.head_dim), p["wo"])
        if cfg.post_attn_norm and "post_attn_norm" in p:
            attn = rms_norm(attn, p["post_attn_norm"], cfg.rms_eps)
        x = x + attn
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        if "wgateup_fused" in p:
            gu = linear(h, p["wgateup_fused"])
            g, u = gu[..., :cfg.n_ff], gu[..., cfg.n_ff:]
        else:
            g, u = linear(h, p["w_gate"]), linear(h, p["w_up"])
        if cfg.act_fn in ("gelu", "gelu_tanh"):
            act = jax.nn.gelu(g.astype(jnp.float32), approximate=True)
        else:
            act = jax.nn.silu(g.astype(jnp.float32))
        mlp = linear((act.astype(h.dtype) * u), p["w_down"])
        if cfg.post_ffn_norm and "post_ffn_norm" in p:
            mlp = rms_norm(mlp, p["post_ffn_norm"], cfg.rms_eps)
        x = x + mlp

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_kv = ISWACache(
        k_full=jnp.stack(kf), v_full=jnp.stack(vf),
        k_swa=jnp.stack(ks), v_swa=jnp.stack(vs), swa_pos=jnp.stack(ps),
        n_past=kv.n_past + advance,
    )
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    if cfg.final_logit_softcap > 0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits, new_kv
