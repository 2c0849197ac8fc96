"""Llama-family transformer as a pure JAX function.

The TPU-native re-design of the reference's per-arch graph builder
``llm_build_llama`` (``src/llama-model.cpp:5969-6123``): instead of
assembling a ggml graph node-by-node each ubatch, the whole forward pass is
one traced function — layers run under ``lax.scan`` over stacked weights
(compile time is O(1) in depth, XLA pipelines the HBM weight streams), the
KV cache is a donated carry, and sharding annotations (parallel/) partition
the same program over a device mesh.

Also covers: Mistral (sliding window), Qwen2 (attn bias, NEOX rope), Qwen3
(qk-norm), Gemma-ish options via ModelConfig flags, and TinyLlama/Llama-2/3.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.attention import mha_with_cache
from ..ops.norms import layer_norm, rms_norm
from ..ops.quant_matmul import linear
from ..ops.rope import apply_mrope, apply_rope, rope_frequencies
from .config import ModelConfig


@dataclass
class KVCache:
    """Static ring-buffer KV cache: (L, B, S, Hkv, Dh) + per-seq fill level.

    ``pos``/``pos_next`` (optional) decouple logical token positions from
    row indices — the analog of the reference's per-cell pos bookkeeping
    (llama-kv-cells.h) used by self-extend/grouped attention
    (llama_memory_seq_div, examples/passkey.cpp:138)."""

    k: jnp.ndarray
    v: jnp.ndarray
    n_past: jnp.ndarray  # (B,) int32 — row fill level
    pos: jnp.ndarray | None = None  # (B, S) int32 logical positions per row
    pos_next: jnp.ndarray | None = None  # (B,) next query position
    # shared-prefix segment (cross-slot KV sharing: one system prompt's
    # rows stored once and attended by every slot — the analog of the
    # reference's multi-seq KV cells, llama-kv-cache-unified.cpp:752-951)
    shared_k: jnp.ndarray | None = None  # (L, 1, S0, Hkv, Dh)
    shared_v: jnp.ndarray | None = None

    @classmethod
    def create(
        cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
        if dtype in ("q8", "q8_0"):  # quantized KV (llama.h type_k/type_v)
            from ..ops.kv_quant import QuantKV

            return cls(
                k=QuantKV.zeros(shape),
                v=QuantKV.zeros(shape),
                n_past=jnp.zeros((batch,), jnp.int32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(
    KVCache, ["k", "v", "n_past", "pos", "pos_next", "shared_k", "shared_v"], []
)


def _act(x, act_fn: str):
    xf = x.astype(jnp.float32)
    if act_fn in ("gelu", "gelu_tanh"):
        out = jax.nn.gelu(xf, approximate=True)
    elif act_fn == "gelu_erf":
        out = jax.nn.gelu(xf, approximate=False)
    elif act_fn == "relu":
        out = jax.nn.relu(xf)
    elif act_fn == "relu2":
        out = jnp.square(jax.nn.relu(xf))
    else:
        out = jax.nn.silu(xf)
    return out.astype(x.dtype)


def _mlp(x, gate_w, up_w, down_w, act_fn: str):
    return linear(_act(linear(x, gate_w), act_fn) * linear(x, up_w), down_w)


def _mlp_p(x, p: dict, act_fn: str, gain=None, rms_eps: float = 1e-5):
    g = _lin(x, p, "w_gate", gain)
    if "w_gate_scale" in p:  # bitnet ternary-weight scales
        g = g * p["w_gate_scale"]
    if "b_gate" in p:  # jais: gated FFN with biases (llm_build_jais)
        g = g + p["b_gate"]
    u = _lin(x, p, "w_up", gain)
    if "w_up_scale" in p:
        u = u * p["w_up_scale"]
    if "b_up" in p:
        u = u + p["b_up"]
    y = _act(g, act_fn) * u
    if "ffn_sub_norm" in p:  # bitnet: inner norm before the down-proj
        y = rms_norm(y, p["ffn_sub_norm"], rms_eps)
    y = _lin(y, p, "w_down", gain)
    if "w_down_scale" in p:
        y = y * p["w_down_scale"]
    if "b_down" in p:
        y = y + p["b_down"]
    return y


def _mlp_plain(x, up_w, up_b, down_w, down_b, act_fn: str):
    """Ungated 2-matrix MLP (gpt2/phi/bert lineage)."""
    h = linear(x, up_w)
    if up_b is not None:
        h = h + up_b
    h = linear(_act(h, act_fn), down_w)
    if down_b is not None:
        h = h + down_b
    return h


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_type == "layer":
        return layer_norm(x, w, b, cfg.rms_eps)
    return rms_norm(x, w, cfg.rms_eps)


def _lin(x, p: dict, key: str, gain=None):
    """Matmul with optional LoRA low-rank add (build_lora_mm analog,
    llama-graph.cpp:543): y = xW + (x·A)·B, scale folded into A.

    ``gain`` (B, R) scales the rank channels per batch row — the
    per-request adapter-scale mechanism (reference server: per-slot
    ``lora`` field, task.params.lora): each attached adapter owns a rank
    slice, so row-wise gains select/blend adapters per slot with one
    shared compiled program."""
    y = linear(x, p[key])
    a = p.get(f"{key}_lora_a")
    if a is not None:
        za = x.astype(a.dtype) @ a
        if gain is not None:
            za = za * gain[:, None, :].astype(za.dtype)
        # cast back: a f32 adapter on a bf16 base must not promote the
        # residual stream (lax.scan carries require a fixed dtype)
        y = y + (za @ p[f"{key}_lora_b"]).astype(y.dtype)
    return y


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # (B, T) int32
    kv: KVCache,
    n_tokens: jnp.ndarray | None = None,  # (B,) valid length within T (padding)
    return_hidden: bool = False,  # return final-norm hidden states, not logits
    embeds: jnp.ndarray | None = None,  # (B, T, D) input embeddings (mtmd path)
    lora_gain: jnp.ndarray | None = None,  # (B, R) per-row rank-channel scales
    mrope_pos: jnp.ndarray | None = None,  # (B, T, S) M-RoPE position streams
) -> tuple[jnp.ndarray, KVCache]:
    """One forward step (prefill or decode). Returns (logits (B,T,V), kv')."""
    B, T = tokens.shape
    inv_freq_global = rope_frequencies(cfg)
    if cfg.rope_local_base > 0:
        # gemma3: SWA layers rotate with the local base, full-attention
        # layers with the (possibly scaled) global base
        from ..gguf.constants import RopeScalingType

        local_cfg = cfg.with_(rope_base=cfg.rope_local_base,
                              rope_scaling=RopeScalingType.NONE)
        inv_freq_local = rope_frequencies(local_cfg)
        inv_freq_layers = jnp.asarray(
            [inv_freq_local if swa else inv_freq_global for swa in cfg.swa_layers]
        )
    else:
        inv_freq_layers = jnp.broadcast_to(
            jnp.asarray(inv_freq_global), (cfg.n_layers, len(inv_freq_global))
        )
    q_start = kv.pos_next if kv.pos_next is not None else kv.n_past
    # shared-prefix segment shifts every logical position by its length
    n_shared = kv.shared_k.shape[2] if kv.shared_k is not None else 0
    positions = n_shared + q_start[:, None] + jnp.arange(T)[None, :]

    # multimodal prefill passes pre-built embeddings (image features spliced
    # into token embeddings — the mtmd chunk-injection analog)
    x = embeds.astype(params["tok_emb"].dtype) if embeds is not None else params["tok_emb"][tokens]
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    if "tok_norm" in params:  # bloom: LayerNorm right after the embedding
        x = _norm(x, params["tok_norm"], params.get("tok_norm_b"), cfg)
    if cfg.pos_emb == "learned":
        x = x + params["pos_emb"][positions].astype(x.dtype)

    if cfg.mrope_sections:
        # default text positions: every stream equals the token index
        mpos = mrope_pos if mrope_pos is not None else jnp.broadcast_to(
            positions[:, :, None], (B, T, len(cfg.mrope_sections))
        )
    else:
        mpos = None

    scale = cfg.attn_scale or cfg.head_dim**-0.5
    # per-layer sliding window (iSWA: gemma2/3, llama4, gpt-oss) rides the
    # scan as a traced scalar — one compiled program for both layer kinds
    windows = jnp.asarray(
        [cfg.sliding_window if swa else 0 for swa in cfg.swa_layers], jnp.int32
    )
    # per-layer rope flags (NoPE layers: llama4/smollm3/cohere2)
    rope_on = jnp.asarray(cfg.rope_layers, jnp.bool_)
    # deci "linear attention" layers: the block is wo(norm(x)) — the normed
    # input (zero-padded to the attention width) bypasses attention
    linear_attn = (jnp.asarray(cfg.attn_linear_layers, jnp.bool_)
                   if cfg.attn_linear_layers else
                   jnp.zeros((cfg.n_layers,), jnp.bool_))
    if cfg.alibi:
        from ..ops.attention import alibi_slopes_for

        alibi_slopes = alibi_slopes_for(cfg.n_heads)
    else:
        alibi_slopes = None

    has_shared = kv.shared_k is not None

    def layer_step(carry, layer):
        x, = carry
        if has_shared:
            (p, k_cache_l, v_cache_l, window_l, inv_freq, rope_l, linear_l,
             shared_k_l, shared_v_l) = layer
        else:
            p, k_cache_l, v_cache_l, window_l, inv_freq, rope_l, linear_l = layer
            shared_k_l = shared_v_l = None
        x_in = x  # layer input (arctic parallel-MoE / smallthinker router)

        h = _norm(x, p["attn_norm"], p.get("attn_norm_b"), cfg) if cfg.pre_norm else x
        Dq = cfg.n_heads * cfg.head_dim
        Dkv = cfg.n_kv_heads * cfg.head_dim
        if "wqkv_fused" in p:
            # one launch for q/k/v (loader-fused; decode is launch-bound)
            qkv = linear(h, p["wqkv_fused"])
            if "bqkv_fused" in p:
                qkv = qkv + p["bqkv_fused"]
            q = qkv[..., :Dq]
            k = qkv[..., Dq : Dq + Dkv]
            v = qkv[..., Dq + Dkv :]
        elif "wqk_fused" in p:
            # q|k fused, v separate: the Q4_K_M disposition puts Q6_K on
            # attn_v — keeping v out of the fuse lets q/k stay 4-bit
            # packed instead of repacking everything to int8 (2× bytes)
            qk = linear(h, p["wqk_fused"])
            v = linear(h, p["wv"])
            q = qk[..., :Dq]
            k = qk[..., Dq:]
        else:
            q = _lin(h, p, "wq", lora_gain)
            k = _lin(h, p, "wk", lora_gain)
            v = _lin(h, p, "wv", lora_gain)
            if "wq_scale" in p:  # bitnet: per-tensor ternary-weight scales
                q = q * p["wq_scale"]
                k = k * p["wk_scale"]
                v = v * p["wv_scale"]
            if "bq" in p:
                q = q + p["bq"]
                k = k + p["bk"]
                v = v + p["bv"]
        if cfg.clamp_kqv > 0.0:  # dbrx clip_qkv
            q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
            k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
            v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
        if cfg.qk_norm_full:  # olmo2: norm the whole projection pre-reshape
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm and not cfg.qk_norm_after_rope:
            if cfg.qk_norm_layer:  # chameleon: per-head LayerNorm (+bias)
                q = layer_norm(q, p["q_norm"], p.get("q_norm_b"), cfg.rms_eps)
                k = layer_norm(k, p["k_norm"], p.get("k_norm_b"), cfg.rms_eps)
            else:
                q = rms_norm(q, p["q_norm"], cfg.rms_eps)
                k = rms_norm(k, p["k_norm"], cfg.rms_eps)
        if cfg.pos_emb == "rope":
            if cfg.mrope_sections:
                # qwen2vl multimodal rope: per-dimension position streams
                # (text-only input degenerates to plain NEOX rope)
                qr = apply_mrope(q, mpos, inv_freq, cfg.mrope_sections)
                kr = apply_mrope(k, mpos, inv_freq, cfg.mrope_sections)
            else:
                qr = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
                kr = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            # NoPE layers keep the unrotated projections; the flag rides the
            # scan so one compiled program serves both layer kinds
            q = jnp.where(rope_l, qr, q)
            k = jnp.where(rope_l, kr, k)
            if cfg.qk_norm_l2:  # llama4: weightless L2 norm on rope layers
                ql = rms_norm(q, jnp.ones(cfg.head_dim, q.dtype), cfg.rms_eps)
                kl = rms_norm(k, jnp.ones(cfg.head_dim, k.dtype), cfg.rms_eps)
                q = jnp.where(rope_l, ql, q)
                k = jnp.where(rope_l, kl, k)
            if cfg.attn_temp_scale > 0.0:
                # llama4 attn_temperature_tuning — NoPE layers scale q by a
                # position-dependent temperature (llm_build_llama_iswa)
                att = (
                    jnp.log1p(jnp.floor(
                        (positions.astype(jnp.float32) + 1.0) / cfg.attn_temp_floor
                    )) * cfg.attn_temp_scale + 1.0
                )
                q = jnp.where(
                    rope_l, q, (q.astype(jnp.float32) * att[:, :, None, None]).astype(q.dtype)
                )

        if cfg.qk_norm and cfg.qk_norm_after_rope:
            # hunyuan: per-head q/k norms AFTER rotation (llm_build_hunyuan_moe)
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)

        from ..ops.quant_matmul import QuantTensor

        attn, k_cache_l, v_cache_l = mha_with_cache(
            q, k, v, k_cache_l, v_cache_l, kv.n_past, scale,
            sliding_window=window_l,
            logit_softcap=cfg.attn_logit_softcap,
            sinks=p.get("sinks"),
            kv_pos=kv.pos, q_pos=positions if kv.pos is not None else None,
            alibi_slopes=alibi_slopes,
            quant_weights=isinstance(
                p.get("wq", p.get("wqkv_fused", p.get("wqk_fused"))),
                QuantTensor),
            shared_k=shared_k_l, shared_v=shared_v_l,
        )
        attn = attn.reshape(B, T, cfg.n_heads * cfg.head_dim)
        if cfg.attn_linear_layers:
            # deci linear-attention layers feed the normed input straight
            # into wo (whose in-dim is zero-padded D → Hq·Dh at load)
            h_wide = jnp.pad(h, ((0, 0), (0, 0), (0, attn.shape[-1] - h.shape[-1])))
            attn = jnp.where(linear_l, h_wide, attn)
        if "attn_sub_norm" in p:  # bitnet: inner norm before the out-proj
            attn = rms_norm(attn, p["attn_sub_norm"], cfg.rms_eps)
        attn = _lin(attn, p, "wo", lora_gain)
        if "wo_scale" in p:
            attn = attn * p["wo_scale"]
        if "bo" in p:
            attn = attn + p["bo"]
        if cfg.post_attn_norm and "post_attn_norm" in p:
            attn = rms_norm(attn, p["post_attn_norm"], cfg.rms_eps)

        ffn_in = x if cfg.parallel_residual else None
        if not cfg.parallel_residual:
            x = x + attn * cfg.residual_scale if cfg.residual_scale != 1.0 else x + attn
            h = _norm(x, p["ffn_norm"], p.get("ffn_norm_b"), cfg) if cfg.pre_norm else x
        else:
            # phi2/gpt-j: attention and FFN both read the attn_norm output
            h = _norm(ffn_in, p["attn_norm"], p.get("attn_norm_b"), cfg) \
                if "ffn_norm" not in p else _norm(ffn_in, p["ffn_norm"], p.get("ffn_norm_b"), cfg)

        if "ffn_norm_exps" in p:
            # arctic: dense FFN on the usual residual + a parallel MoE branch
            # reading the *layer input* through its own norm (ffn_norm_exps)
            # (llm_build_arctic, src/llama-model.cpp:12391)
            from ..ops.moe import moe_ffn

            mlp = _mlp_p(h, p, cfg.act_fn, lora_gain, cfg.rms_eps)
            moe = moe_ffn(
                rms_norm(x_in, p["ffn_norm_exps"], cfg.rms_eps),
                p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg,
            )
            mlp = mlp + moe
        elif "moe_gate_inp" in p:
            from ..ops.moe import moe_ffn

            mlp = moe_ffn(
                h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg,
                router_b=p.get("moe_gate_inp_b"),
                gate_b=p.get("moe_gate_b"), up_b=p.get("moe_up_b"),
                down_b=p.get("moe_down_b"),
                # smallthinker: the router reads the raw layer input
                gate_x=x_in if cfg.moe_gate_prenorm else None,
            )
            if "shexp_gateup_fused" in p:  # shared expert, gate|up fused
                gu = linear(h, p["shexp_gateup_fused"])
                SF = gu.shape[-1] // 2
                shexp = linear(
                    _act(gu[..., :SF], cfg.act_fn) * gu[..., SF:],
                    p["shexp_down"])
                if "shexp_gate_inp" in p:
                    gate = jax.nn.sigmoid(
                        (h @ p["shexp_gate_inp"]).astype(jnp.float32))
                    shexp = shexp * gate.astype(shexp.dtype)
                mlp = mlp + shexp
            elif "shexp_gate" in p:  # shared expert (qwen2moe: sigmoid-gated)
                shexp = _mlp(h, p["shexp_gate"], p["shexp_up"], p["shexp_down"], cfg.act_fn)
                if "shexp_gate_inp" in p:
                    gate = jax.nn.sigmoid((h @ p["shexp_gate_inp"]).astype(jnp.float32))
                    shexp = shexp * gate.astype(shexp.dtype)
                mlp = mlp + shexp
            elif "w_gate" in p:  # shared expert alongside routed experts
                mlp = mlp + _mlp(h, p["w_gate"], p["w_up"], p["w_down"], cfg.act_fn)
        elif "wgateup_fused" in p:
            gu = linear(h, p["wgateup_fused"])
            g = gu[..., : cfg.n_ff]
            u = gu[..., cfg.n_ff :]
            mlp = _lin(_act(g, cfg.act_fn) * u, p, "w_down")
        elif cfg.ffn_gated:
            mlp = _mlp_p(h, p, cfg.act_fn, lora_gain, cfg.rms_eps)
        else:
            mlp = _mlp_plain(h, p["w_up"], p.get("b_up"), p["w_down"], p.get("b_down"), cfg.act_fn)
        if cfg.post_ffn_norm and "post_ffn_norm" in p:
            mlp = rms_norm(mlp, p["post_ffn_norm"], cfg.rms_eps)
        if cfg.parallel_residual:
            x = x + (attn + mlp) * cfg.residual_scale if cfg.residual_scale != 1.0 else x + attn + mlp
        else:
            x = x + mlp * cfg.residual_scale if cfg.residual_scale != 1.0 else x + mlp
        if "cvec" in p:  # control vector (llama_apply_adapter_cvec analog)
            x = x + p["cvec"].astype(x.dtype)
        return (x,), (k_cache_l, v_cache_l)

    # single-token decode on supported configs: ONE Pallas kernel for the
    # whole layer stack (ops/decode_step.py) instead of ~6 launches/layer;
    # covers batched server decode up to 8 slots
    fused = None
    if (T == 1 and embeds is None and lora_gain is None
            and mrope_pos is None and jax.default_backend() == "tpu"):
        from ..ops.decode_step import _fused_ok, fused_decode_step
        from ..ops.quant_matmul import QuantTensor

        # v1 pipelines whole per-layer weight blocks through VMEM —
        # only for layers that fit (≤6 MB double-buffers inside 16 MB
        # v5e VMEM next to the dequant temps); bigger layers stream
        # chunks from HBM (ops/decode_stream.py)
        layer_bytes = sum(
            (t.q.nbytes + t.s.nbytes) // max(t.q.shape[0], 1)
            for t in params["layers"].values()
            if isinstance(t, QuantTensor) and t.q.ndim == 3)
        if layer_bytes <= 6 * 2**20 and _fused_ok(params, cfg, kv, B, T):
            fused = fused_decode_step(params, cfg, x, kv)
        elif layer_bytes > 6 * 2**20:
            from ..ops.decode_stream import _stream_ok, fused_decode_step_streamed

            if _stream_ok(params, cfg, kv, B, T):
                fused = fused_decode_step_streamed(params, cfg, x, kv)
    if fused is not None:
        x, k_new, v_new = fused
    else:
        scan_xs = (params["layers"], kv.k, kv.v, windows, inv_freq_layers,
                   rope_on, linear_attn)
        if has_shared:
            scan_xs = scan_xs + (kv.shared_k, kv.shared_v)
        (x,), (k_new, v_new) = jax.lax.scan(layer_step, (x,), scan_xs)

    if return_hidden != "raw":  # "raw": pipeline mid-stage — no final norm
        x = _norm(x, params["out_norm"], params.get("out_norm_b"), cfg)

    if n_tokens is None:
        advance = jnp.full((B,), T, jnp.int32)
    else:
        advance = n_tokens.astype(jnp.int32)
    if kv.pos is not None:
        # record the logical positions of the freshly written rows; padded
        # rows get a +inf sentinel so the causal mask never attends them
        def write_pos(pos_row, start, vals):
            return jax.lax.dynamic_update_slice(pos_row, vals, (start,))

        pos_vals = jnp.where(
            jnp.arange(T)[None, :] < advance[:, None], positions, 1 << 30
        ).astype(jnp.int32)
        new_pos = jax.vmap(write_pos)(kv.pos, kv.n_past, pos_vals)
        new_kv = KVCache(k=k_new, v=v_new, n_past=kv.n_past + advance,
                         pos=new_pos, pos_next=q_start + advance,
                         shared_k=kv.shared_k, shared_v=kv.shared_v)
    else:
        new_kv = KVCache(k=k_new, v=v_new, n_past=kv.n_past + advance,
                         shared_k=kv.shared_k, shared_v=kv.shared_v)

    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    if "lm_head_b" in params:
        logits = logits + params["lm_head_b"].astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits, new_kv


@partial(jax.jit, static_argnames=("cfg", "return_hidden"), donate_argnames=("kv",))
def forward_jit(params, cfg: ModelConfig, tokens, kv: KVCache, n_tokens=None, return_hidden=False):
    return forward(params, cfg, tokens, kv, n_tokens, return_hidden)
