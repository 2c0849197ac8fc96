"""Dense-lead MoE families with standard GQA attention: glm4moe + dots1.

Reference: ``llm_build_glm4_moe`` (src/llama-model.cpp, GLM-4.5 — NEOX
rope, optional qkv bias + per-head qk norms, ``n_layer_dense_lead`` dense
layers then sigmoid-routed MoE with expert-probs bias and an always-on
shared expert) and ``llm_build_dots1`` (deepseek-V3-shaped routing with an
optionally sigmoid-gated shared expert).

TPU design: like models/deepseek2.py — two ``lax.scan``s (dense prefix,
MoE suffix) over stacked per-kind weights, sharing the llama KVCache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_with_cache
from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig
from .llama import KVCache


def _attn_step(x, p, cfg: ModelConfig, kc, vc, n_past, positions, inv_freq):
    B, T, _ = x.shape
    h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
    q = linear(h, p["wq"])
    k = linear(h, p["wk"])
    v = linear(h, p["wv"])
    if "bq" in p:
        q, k, v = q + p["bq"], k + p["bk"], v + p["bv"]
    q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    if "q_norm" in p:
        q = rms_norm(q, p["q_norm"], cfg.rms_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_eps)
    q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
    k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    attn, kc, vc = mha_with_cache(q, k, v, kc, vc, n_past, scale)
    out = linear(attn.reshape(B, T, cfg.n_heads * cfg.head_dim), p["wo"])
    return out, kc, vc


def _dense_ffn(h, p):
    gate = jax.nn.silu(linear(h, p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
    return linear(gate * linear(h, p["w_up"]), p["w_down"])


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: KVCache,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    from ..ops.moe import moe_ffn

    B, T = tokens.shape
    inv_freq = jnp.asarray(rope_frequencies(cfg))
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    x = params["tok_emb"][tokens]
    nd = cfg.n_layer_dense_lead

    def dense_step(carry, layer):
        (x,) = carry
        p, kc, vc = layer
        attn, kc, vc = _attn_step(x, p, cfg, kc, vc, kv.n_past, positions, inv_freq)
        x = x + attn
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        x = x + _dense_ffn(h, p)
        return (x,), (kc, vc)

    def moe_step(carry, layer):
        (x,) = carry
        p, kc, vc = layer
        attn, kc, vc = _attn_step(x, p, cfg, kc, vc, kv.n_past, positions, inv_freq)
        x = x + attn
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        mlp = moe_ffn(
            h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg,
            probs_bias=p.get("exp_probs_b"),
        )
        if "shexp_gate" in p:
            shexp = _dense_ffn(h, {"w_gate": p["shexp_gate"], "w_up": p["shexp_up"],
                                   "w_down": p["shexp_down"]})
            if "shexp_gate_inp" in p:  # dots1: sigmoid-gated shared expert
                g = jax.nn.sigmoid((h @ p["shexp_gate_inp"]).astype(jnp.float32))
                shexp = shexp * g.astype(shexp.dtype)
            mlp = mlp + shexp
        x = x + mlp
        return (x,), (kc, vc)

    k_parts, v_parts = [], []
    if nd > 0 and "dense_layers" in params:
        (x,), (k_new, v_new) = jax.lax.scan(
            dense_step, (x,), (params["dense_layers"], kv.k[:nd], kv.v[:nd])
        )
        k_parts.append(k_new)
        v_parts.append(v_new)
    (x,), (k_new, v_new) = jax.lax.scan(
        moe_step, (x,), (params["moe_layers"], kv.k[nd:], kv.v[nd:])
    )
    k_parts.append(k_new)
    v_parts.append(v_new)

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_kv = KVCache(
        k=jnp.concatenate(k_parts, axis=0),
        v=jnp.concatenate(v_parts, axis=0),
        n_past=kv.n_past + advance,
    )
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """GGUF glm4moe/dots1 tensors → {dense_layers, moe_layers} pytree.

    glm4moe names its FFN pre-norm ``post_attention_norm``
    (LLM_ARCH_GLM4_MOE table); dots1 uses plain ``ffn_norm``.  NextN
    speculative layers (glm4moe nextn.*) are not loaded — the reference
    graph skips them too (n_layer - nextn_predict_layers)."""
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors

    def w(name, transpose=True, f32=False):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return put(a.astype(np.float32 if f32 else dtype), name)

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(dtype), "tok_emb")
    params["out_norm"] = put(t["output_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = w("output.weight")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    nd = cfg.n_layer_dense_lead

    def layer(i):
        b = f"blk.{i}."
        ffn_norm = b + ("ffn_norm.weight" if b + "ffn_norm.weight" in t
                        else "post_attention_norm.weight")
        p = {
            "attn_norm": w(b + "attn_norm.weight", False, f32=True),
            "ffn_norm": w(ffn_norm, False, f32=True),
            "wq": w(b + "attn_q.weight"), "wk": w(b + "attn_k.weight"),
            "wv": w(b + "attn_v.weight"), "wo": w(b + "attn_output.weight"),
        }
        for gg, key in [("attn_q.bias", "bq"), ("attn_k.bias", "bk"),
                        ("attn_v.bias", "bv"),
                        ("attn_q_norm.weight", "q_norm"),
                        ("attn_k_norm.weight", "k_norm")]:
            if b + gg in t:
                p[key] = w(b + gg, False, f32=True)
        if b + "ffn_gate_exps.weight" in t:
            for gg, key in [("ffn_gate_exps", "moe_gate"), ("ffn_up_exps", "moe_up"),
                            ("ffn_down_exps", "moe_down")]:
                a = t[b + gg + ".weight"].to_f32().transpose(0, 2, 1)
                p[key] = put(np.ascontiguousarray(a).astype(dtype), b + gg)
            p["moe_gate_inp"] = w(b + "ffn_gate_inp.weight")
            if b + "exp_probs_b.bias" in t:
                p["exp_probs_b"] = w(b + "exp_probs_b.bias", False, f32=True)
            p["shexp_gate"] = w(b + "ffn_gate_shexp.weight")
            p["shexp_up"] = w(b + "ffn_up_shexp.weight")
            p["shexp_down"] = w(b + "ffn_down_shexp.weight")
            if b + "ffn_gate_inp_shexp.weight" in t:
                p["shexp_gate_inp"] = w(b + "ffn_gate_inp_shexp.weight")
        else:
            p["w_gate"] = w(b + "ffn_gate.weight")
            p["w_up"] = w(b + "ffn_up.weight")
            p["w_down"] = w(b + "ffn_down.weight")
        return p

    def stack(ilist):
        out: dict = {}
        per = [layer(i) for i in ilist]
        for key in per[0]:
            out[key] = jnp.stack([pl[key] for pl in per])
        return out

    if nd > 0:
        params["dense_layers"] = stack(range(nd))
    params["moe_layers"] = stack(range(nd, cfg.n_layers))
    return params
