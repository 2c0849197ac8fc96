"""DeepSeek-V2/V3 family: Multi-head Latent Attention + fine-grained MoE.

Reference: ``llm_build_deepseek2`` (src/llama-model.cpp:12691) with the MLA
absorption optimization — attention runs as MQA over the compressed latent
(kv_lora_rank + rope dims per token), and per-head decompression happens
via ``wk_b``/``wv_b`` absorbed into Q and the attention output
(reference build_attn v_mla path, llama-graph.cpp:1220).

TPU design notes:
- the KV cache stores only the latent: K = [k_pe(rope) ‖ kv_cmpr(rank)]
  (Hkv=1), V = kv_cmpr — the MLA memory win is native here;
- the first ``n_layer_dense_lead`` layers (dense FFN) and the remaining
  MoE layers run as two consecutive ``lax.scan``s, keeping each scan's
  pytree homogeneous (the TPU analog of per-layer graph dispatch);
- rope on the pe dims is interleaved-pair (matches the HF checkpoint
  layout this framework converts from; the reference permutes instead).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig


@dataclass
class MLACache:
    """Latent KV cache: k (L,B,S,1,rank+rope), v (L,B,S,1,rank)."""

    k: jnp.ndarray
    v: jnp.ndarray
    n_past: jnp.ndarray  # (B,) int32

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        dk = cfg.kv_lora_rank + cfg.rope_dim
        dv = cfg.kv_lora_rank
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, 1, dk), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, 1, dv), dtype),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(MLACache, ["k", "v", "n_past"], [])

NEG_INF = -1e30


def _mla_attention(x, p, cfg: ModelConfig, k_cache, v_cache, n_past, positions, inv_freq):
    """One MLA attention block; returns (out, k_cache', v_cache')."""
    from ..ops.attention import insert_kv

    B, T, _ = x.shape
    H = cfg.n_heads
    rope_d = cfg.rope_dim
    nope_d = cfg.qk_nope_head_dim
    rank = cfg.kv_lora_rank

    h = rms_norm(x, p["attn_norm"], cfg.rms_eps)

    if "wq_a" in p:  # non-lite: low-rank Q projection with inner rmsnorm
        q = linear(rms_norm(linear(h, p["wq_a"]), p["q_a_norm"], cfg.rms_eps), p["wq_b"])
    else:
        q = linear(h, p["wq"])
    q = q.reshape(B, T, H, nope_d + rope_d)
    q_nope, q_pe = q[..., :nope_d], q[..., nope_d:]
    q_pe = apply_rope(q_pe, positions, inv_freq, True)

    kv_pe = linear(h, p["wkv_a"])  # (B, T, rank + rope_d)
    kv_cmpr = rms_norm(kv_pe[..., :rank], p["kv_a_norm"], cfg.rms_eps)
    k_pe = apply_rope(kv_pe[..., None, rank:], positions, inv_freq, True)  # (B,T,1,rope)

    # absorb wk_b into Q: per-head (nope_d -> rank)
    q_abs = jnp.einsum(
        "bthn,hrn->bthr", q_nope.astype(jnp.float32), p["wk_b"].astype(jnp.float32)
    ).astype(x.dtype)
    Q = jnp.concatenate([q_pe, q_abs], axis=-1)  # (B, T, H, rope+rank)
    K = jnp.concatenate([k_pe, kv_cmpr[:, :, None, :]], axis=-1)  # (B, T, 1, rope+rank)
    V = kv_cmpr[:, :, None, :]  # (B, T, 1, rank)

    k_cache = insert_kv(k_cache, K, n_past)
    v_cache = insert_kv(v_cache, V, n_past)
    S = k_cache.shape[1]

    # the absorbed dot product equals the decompressed qk_head_dim one, so
    # the scale uses the MLA head size (reference kq_scale, llama-model.cpp)
    scale = cfg.attn_scale or float(nope_d + rope_d) ** -0.5
    scores = jnp.einsum(
        "bthd,bsod->bhts", Q, k_cache, preferred_element_type=jnp.float32
    ) * scale  # o = 1 kv head
    q_pos = n_past[:, None] + jnp.arange(T)[None, :]
    mask = jnp.arange(S)[None, None, :] <= q_pos[:, :, None]  # (B, T, S)
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "bhts,bsor->bthr", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )  # (B, T, H, rank)
    # decompress per head: rank -> v_head_dim via wv_b (H, v, rank)
    out = jnp.einsum("bthr,hvr->bthv", ctx, p["wv_b"].astype(jnp.float32)).astype(x.dtype)
    out = out.reshape(B, T, H * cfg.v_head_dim)
    return linear(out, p["wo"]), k_cache, v_cache


def _dense_ffn(h, p, cfg):
    if not cfg.ffn_gated:  # plm: ungated relu² (llm_build_plm LLM_FFN_RELU_SQR)
        up = linear(h, p["w_up"]).astype(jnp.float32)
        act = jnp.square(jax.nn.relu(up)) if cfg.act_fn == "relu2" else jax.nn.silu(up)
        return linear(act.astype(h.dtype), p["w_down"])
    gate = jax.nn.silu(linear(h, p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
    return linear(gate * linear(h, p["w_up"]), p["w_down"])


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: MLACache,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, MLACache]:
    from ..ops.moe import moe_ffn

    B, T = tokens.shape
    inv_freq = jnp.asarray(rope_frequencies(cfg))
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    x = params["tok_emb"][tokens]
    if cfg.embedding_scale != 1.0:  # minicpm3 scale_emb (llm_build_minicpm3)
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    nd = cfg.n_layer_dense_lead

    rs = cfg.residual_scale  # minicpm3: scale_depth/sqrt(n_layers); 1.0 else

    def dense_step(carry, layer):
        (x,) = carry
        p, kc, vc = layer
        attn, kc, vc = _mla_attention(x, p, cfg, kc, vc, kv.n_past, positions, inv_freq)
        x = x + (attn * rs if rs != 1.0 else attn)
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        mlp = _dense_ffn(h, p, cfg)
        x = x + (mlp * rs if rs != 1.0 else mlp)
        return (x,), (kc, vc)

    def moe_step(carry, layer):
        (x,) = carry
        p, kc, vc = layer
        attn, kc, vc = _mla_attention(x, p, cfg, kc, vc, kv.n_past, positions, inv_freq)
        x = x + (attn * rs if rs != 1.0 else attn)
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        mlp = moe_ffn(
            h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg,
            probs_bias=p.get("exp_probs_b"),
        )
        if "w_gate" in p:  # shared experts
            mlp = mlp + _dense_ffn(h, p, cfg)
        x = x + (mlp * rs if rs != 1.0 else mlp)
        return (x,), (kc, vc)

    k_parts, v_parts = [], []
    if nd > 0 and "dense_layers" in params:
        (x,), (k_new, v_new) = jax.lax.scan(
            dense_step, (x,), (params["dense_layers"], kv.k[:nd], kv.v[:nd])
        )
        k_parts.append(k_new)
        v_parts.append(v_new)
    if "moe_layers" in params:
        (x,), (k_new, v_new) = jax.lax.scan(
            moe_step, (x,), (params["moe_layers"], kv.k[nd:], kv.v[nd:])
        )
        k_parts.append(k_new)
        v_parts.append(v_new)

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_kv = MLACache(
        k=jnp.concatenate(k_parts, axis=0),
        v=jnp.concatenate(v_parts, axis=0),
        n_past=kv.n_past + advance,
    )
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    if cfg.logit_scale != 1.0:  # minicpm3: 1/(n_embd/n_embd_base)
        logits = logits * cfg.logit_scale
    return logits, new_kv


# ---------------------------------------------------------------------------
# loading (GGUF names: llama-arch.cpp deepseek2 table :917-930)
# ---------------------------------------------------------------------------

_ATTN_KEYS = {
    "attn_norm": ("attn_norm.weight", False, "f32"),
    "ffn_norm": ("ffn_norm.weight", False, "f32"),
    "wq": ("attn_q.weight", True, "w"),
    "wq_a": ("attn_q_a.weight", True, "w"),
    "wq_b": ("attn_q_b.weight", True, "w"),
    "q_a_norm": ("attn_q_a_norm.weight", False, "f32"),
    "wkv_a": ("attn_kv_a_mqa.weight", True, "w"),
    "kv_a_norm": ("attn_kv_a_norm.weight", False, "f32"),
    "wk_b": ("attn_k_b.weight", False, "w"),  # (H, rank, nope) as stored
    "wv_b": ("attn_v_b.weight", False, "w"),  # (H, v, rank) as stored
    "wo": ("attn_output.weight", True, "w"),
}
_DENSE_FFN_KEYS = {
    "w_gate": ("ffn_gate.weight", True, "w"),
    "w_up": ("ffn_up.weight", True, "w"),
    "w_down": ("ffn_down.weight", True, "w"),
}
_MOE_KEYS = {
    "moe_gate_inp": ("ffn_gate_inp.weight", True, "f32"),
    "moe_gate": ("ffn_gate_exps.weight", False, "moe"),
    "moe_up": ("ffn_up_exps.weight", False, "moe"),
    "moe_down": ("ffn_down_exps.weight", False, "moe"),
    "exp_probs_b": ("exp_probs_b.bias", False, "f32"),
    # shared experts reuse the dense-ffn keys
    "w_gate": ("ffn_gate_shexp.weight", True, "w"),
    "w_up": ("ffn_up_shexp.weight", True, "w"),
    "w_down": ("ffn_down_shexp.weight", True, "w"),
}


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors

    def conv(arr, kind):
        if kind == "f32":
            return arr.astype(np.float32)
        if kind == "moe":  # (E, out, in) -> (E, in, out)
            return np.ascontiguousarray(arr.transpose(0, 2, 1)).astype(dtype)
        return arr.astype(dtype)

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(dtype), "tok_emb")
    params["out_norm"] = put(t["output_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = put(
            np.ascontiguousarray(t["output.weight"].to_f32().T).astype(dtype), "lm_head"
        )
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    def load_group(layer_ids, keysets, group_name):
        stacked: dict[str, list] = {}
        for i in layer_ids:
            for keyset in keysets:
                for key, (suffix, transpose, kind) in keyset.items():
                    name = f"blk.{i}.{suffix}"
                    if name not in t:
                        continue
                    arr = t[name].to_f32()
                    if transpose:
                        arr = np.ascontiguousarray(arr.T)
                    stacked.setdefault(key, []).append(conv(arr, kind))
        return {k: put(np.stack(v), f"{group_name}.{k}") for k, v in stacked.items()}

    nd = cfg.n_layer_dense_lead
    if nd > 0:
        params["dense_layers"] = load_group(range(nd), [_ATTN_KEYS, _DENSE_FFN_KEYS], "dense_layers")
    if nd < cfg.n_layers:
        params["moe_layers"] = load_group(range(nd, cfg.n_layers), [_ATTN_KEYS, _MOE_KEYS], "moe_layers")
    return params
