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
- bert:            learned positions + token-type embeddings, gelu MLP
- nomic-bert:      NEOX rope, swiglu gated MLP, no position table
- nomic-bert-moe:  + qkv biases and ungated-GELU MoE FFN on layers with
                   il % moe_every_n == 1 (llm_build_bert MoE branch,
                   src/llama-model.cpp:7438-7452) — unrolled layer list
- neo-bert:        pre-norm RMS blocks, fused qkv, interleaved (NORM)
                   rope, split-swiglu FFN (llm_build_neo_bert,
                   src/llama-model.cpp:7502)
- jina-bert-v2:    bidirectional ALiBi (max_bias=8, no position inputs),
                   gated-GELU FFN (split gate or fused GEGLU), optional
                   full-width q/k LayerNorms and attn_norm_2
                   (src/llama-model.cpp:760-766, :7465-7471)
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
    from ..ops.norms import rms_norm

    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if "type_emb" in params:
        tt = token_types if token_types is not None else jnp.zeros_like(tokens)
        x = x + params["type_emb"][tt]
    if cfg.pos_emb == "learned":
        x = x + params["pos_emb"][jnp.arange(T)][None]
    if "emb_norm" in params:
        x = layer_norm(x, params["emb_norm"], params.get("emb_norm_b"), cfg.rms_eps)

    valid = jnp.arange(T)[None, :] < n_tokens[:, None]  # (B, T)
    attn_bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]  # (B,1,1,T)
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    if cfg.alibi:
        # jina-bert-v2: bidirectional ALiBi — slope_h * -|i-j| added to the
        # scores (reference builds the mask as -fabs(p1-p0) and soft_max_ext
        # scales per head; llama-kv-cache set_input_kq_mask + max_bias=8)
        from ..ops.attention import alibi_slopes_for

        slopes = alibi_slopes_for(cfg.n_heads)  # (Hq,)
        dist = -jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
        alibi_bias = (
            slopes.reshape(cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads)[
                :, :, None, None]
            * dist[None, None].astype(jnp.float32)
        )  # (Hkv, G, T, T)
    if cfg.pos_emb == "rope":
        inv_freq = jnp.asarray(rope_frequencies(cfg))
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    def layer_step(x, p):
        # pre-norm rms variant (neo-bert) vs post-norm LayerNorm (bert):
        # steered by which norm tensors the layer carries
        pre = "attn_norm" in p
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps) if pre else x
        q = h @ p["wq"]
        k = h @ p["wk"]
        v = h @ p["wv"]
        if "bq" in p:
            q = q + p["bq"]
            k = k + p["bk"]
            v = v + p["bv"]
        # jina-bert-v2 optional full-width q/k LayerNorms (applied on the
        # flat projection before the head reshape, llm_build_bert :7380)
        if "q_norm" in p:
            q = layer_norm(q, p["q_norm"], p.get("q_norm_b"), cfg.rms_eps)
        if "k_norm" in p:
            k = layer_norm(k, p["k_norm"], p.get("k_norm_b"), cfg.rms_eps)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if cfg.pos_emb == "rope":
            q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
            k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
        Hkv, G = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads
        qg = q.reshape(B, T, Hkv, G, cfg.head_dim)
        scores = jnp.einsum(
            "bthgd,bshd->bhgts", qg, k, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + attn_bias[:, :, None]
        if cfg.alibi:
            scores = scores + alibi_bias[None]
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(B, T, cfg.n_heads * cfg.head_dim).astype(x.dtype)
        attn = attn @ p["wo"]
        if "bo" in p:
            attn = attn + p["bo"]
        if pre:
            x = x + attn
            hf_in = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        else:
            # post-norm: residual then LayerNorm (attn_output_norm)
            inp = x
            x = layer_norm(x + attn, p["attn_out_norm"], p.get("attn_out_norm_b"), cfg.rms_eps)
            if "attn_norm_2" in p:
                # jina-v2-code: re-add the layer input, second LayerNorm
                # (llm_build_bert attn_norm_2 branch :7434)
                x = layer_norm(x + inp, p["attn_norm_2"], p.get("attn_norm_2_b"), cfg.rms_eps)
            hf_in = x

        if "moe_gate_inp" in p:
            # nomic-bert-moe: ungated GELU experts, softmax router, no
            # weight norm (llm_build_bert MoE branch :7438)
            xt = hf_in.reshape(B * T, -1)
            router = xt.astype(jnp.float32) @ p["moe_gate_inp"].astype(jnp.float32)
            topv, topi = jax.lax.top_k(jax.nn.softmax(router, axis=-1),
                                       cfg.n_experts_used)
            out = jnp.zeros_like(xt, dtype=jnp.float32)
            for j in range(cfg.n_experts_used):
                sel = topi[:, j]
                u = jnp.einsum("nd,ndf->nf", xt.astype(jnp.float32),
                               p["moe_up"][sel].astype(jnp.float32))
                a = jax.nn.gelu(u, approximate=True)
                d = jnp.einsum("nf,nfd->nd", a, p["moe_down"][sel].astype(jnp.float32))
                out = out + topv[:, j:j + 1] * d
            hf = out.reshape(B, T, -1).astype(x.dtype)
        elif cfg.ffn_gated and "w_gate" in p:
            # nomic-bert swiglu / jina-bert-v2 gated gelu (split gate)
            def act(a):
                if cfg.act_fn.startswith("gelu"):
                    return jax.nn.gelu(a, approximate=False)
                return jax.nn.silu(a)

            hf = act((hf_in @ p["w_gate"]).astype(jnp.float32)).astype(x.dtype) * (hf_in @ p["w_up"])
            hf = hf @ p["w_down"]
        elif pre:
            # neo-bert split-swiglu: one up matrix holds [gate|up]
            gu = hf_in @ p["w_up"]
            F = gu.shape[-1] // 2
            hf = (jax.nn.silu(gu[..., :F].astype(jnp.float32)).astype(x.dtype)
                  * gu[..., F:]) @ p["w_down"]
        elif cfg.ffn_gated:
            # jina-bert-v2 fused GEGLU: w_up holds [act-half | linear-half]
            # (ffn_up is {n_embd, 2*n_ff} when ffn_gate is absent,
            # src/llama-model.cpp:2741-2742)
            gu = hf_in @ p["w_up"]
            F = gu.shape[-1] // 2
            hf = (jax.nn.gelu(gu[..., :F].astype(jnp.float32), approximate=False)
                  .astype(x.dtype) * gu[..., F:]) @ p["w_down"]
        else:
            hf = hf_in @ p["w_up"]
            if "b_up" in p:
                hf = hf + p["b_up"]
            hf = jax.nn.gelu(hf.astype(jnp.float32), approximate=False).astype(x.dtype)
            hf = hf @ p["w_down"]
        if "b_down" in p:
            hf = hf + p["b_down"]
        if pre:
            x = x + hf
        else:
            x = layer_norm(x + hf, p["ffn_out_norm"], p.get("ffn_out_norm_b"), cfg.rms_eps)
        return x, None

    if isinstance(params["layers"], (list, tuple)):
        # heterogeneous layers (nomic-bert-moe): unrolled loop
        for p in params["layers"]:
            x, _ = layer_step(x, p)
    else:
        x, _ = jax.lax.scan(layer_step, x, params["layers"])
    if "out_norm" in params:  # neo-bert final rms norm
        x = rms_norm(x, params["out_norm"], cfg.rms_eps)
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
    "attn_norm": "attn_norm.weight",  # neo-bert pre-norm rms
    # jina-bert-v2 optional tensors (full-width q/k LayerNorms and the
    # jina-v2-code second post-attention norm)
    "q_norm": "attn_q_norm.weight",
    "q_norm_b": "attn_q_norm.bias",
    "k_norm": "attn_k_norm.weight",
    "k_norm_b": "attn_k_norm.bias",
    "attn_norm_2": "attn_norm_2.weight",
    "attn_norm_2_b": "attn_norm_2.bias",
    "ffn_norm": "ffn_norm.weight",
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
    }
    if "token_embd_norm.weight" in tensors:
        params["emb_norm"] = put(fetch("token_embd_norm.weight"), "emb_norm")
    if "output_norm.weight" in tensors:  # neo-bert final rms
        params["out_norm"] = put(fetch("output_norm.weight"), "out_norm")
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

    # split fused qkv (neo-bert) into canonical names
    Dq = cfg.n_heads * cfg.head_dim
    Dkv = cfg.n_kv_heads * cfg.head_dim
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        if b + "attn_qkv.weight" in tensors and b + "attn_q.weight" not in tensors:
            qkv = tensors[b + "attn_qkv.weight"].to_f32()
            from ..gguf.reader import TensorInfo
            from ..gguf.constants import GGMLType as _GT

            def mk(name, arr):
                raw = np.ascontiguousarray(arr.astype("<f4")).view(np.uint8)
                tensors[name] = TensorInfo(name=name, shape=tuple(arr.shape),
                                           ne=tuple(arr.shape[::-1]),
                                           ggml_type=_GT.F32, offset=-1, data=raw)

            mk(b + "attn_q.weight", qkv[:Dq])
            mk(b + "attn_k.weight", qkv[Dq:Dq + Dkv])
            mk(b + "attn_v.weight", qkv[Dq + Dkv:Dq + 2 * Dkv])
            if b + "attn_qkv.bias" in tensors:  # nomic-bert-moe fused bias
                qkv_b = tensors[b + "attn_qkv.bias"].to_f32()
                mk(b + "attn_q.bias", qkv_b[:Dq])
                mk(b + "attn_k.bias", qkv_b[Dq:Dq + Dkv])
                mk(b + "attn_v.bias", qkv_b[Dq + Dkv:Dq + 2 * Dkv])

    has_moe = any(f"blk.{i}.ffn_gate_inp.weight" in tensors
                  for i in range(cfg.n_layers))
    if has_moe:
        # heterogeneous per-layer dicts (nomic-bert-moe)
        layer_list = []
        for i in range(cfg.n_layers):
            b = f"blk.{i}."
            p = {}
            for key, suffix in _LAYER_NAMES.items():
                name = b + suffix
                if name in tensors:
                    p[key] = put(fetch(name, key in _TRANSPOSED), name)
            if b + "ffn_gate_inp.weight" in tensors:
                p["moe_gate_inp"] = put(
                    np.ascontiguousarray(tensors[b + "ffn_gate_inp.weight"].to_f32().T),
                    b + "gate_inp")
                for gg, key in (("ffn_up_exps", "moe_up"), ("ffn_down_exps", "moe_down")):
                    a = tensors[b + gg + ".weight"].to_f32().transpose(0, 2, 1)
                    p[key] = put(np.ascontiguousarray(a).astype(dtype), b + gg)
                for drop in ("w_up", "w_down", "b_up", "b_down"):
                    p.pop(drop, None)
            layer_list.append(p)
        params["layers"] = layer_list
        return params

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
