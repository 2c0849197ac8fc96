"""Granite 4.0 hybrid: interleaved mamba2 and attention layers with
granite scaling and (optional) MoE + shared-expert FFN.

Reference: ``llm_build_granite_hybrid`` (src/llama-model.cpp, over the
hybrid memory) — a layer is recurrent iff its per-layer ``head_count_kv``
is 0; attention layers are NoPE unless ``rope.scaling.finetuned``;
embedding/residual/attention/logit multipliers follow llm_build_granite.

TPU design: jamba-style unrolled layer loop (heterogeneous per-layer
structure), sharing models/mamba2.mamba2_block for the SSM side.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_with_cache
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig
from .mamba2 import mamba2_block


@dataclass
class GraniteHybridState:
    """Hybrid memory: KV rows (zeros on mamba layers) + mamba2 states."""

    k: jnp.ndarray  # (L, B, S, Hkv, Dh)
    v: jnp.ndarray
    conv: jnp.ndarray  # (L, B, K-1, d_inner + 2·G·N)
    ssm: jnp.ndarray  # (L, B, H, P, N)
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        H = cfg.ssm_dt_rank
        P = cfg.ssm_d_inner // H
        conv_dim = cfg.ssm_d_inner + 2 * cfg.ssm_n_group * cfg.ssm_d_state
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            conv=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_conv - 1, conv_dim), jnp.float32),
            ssm=jnp.zeros((cfg.n_layers, batch, H, P, cfg.ssm_d_state), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(
    GraniteHybridState, ["k", "v", "conv", "ssm", "n_past"], []
)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: GraniteHybridState,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, GraniteHybridState]:
    from ..ops.moe import moe_ffn

    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    if n_tokens is None:
        valid = jnp.ones((B, T, 1), jnp.float32)
        nt = None
    else:
        nt = n_tokens.astype(jnp.int32)
        valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = (x.astype(jnp.float32) * valid).astype(x.dtype)

    rope_on = cfg.pos_emb == "rope"
    inv_freq = jnp.asarray(rope_frequencies(cfg)) if rope_on else None
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    rs = cfg.residual_scale

    ks, vs, convs, ssms = [], [], [], []
    for il, p in enumerate(params["layers"]):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "ssm_in" in p:  # mamba2 layer
            out, conv_l, ssm_l = mamba2_block(h, p, cfg, kv.conv[il], kv.ssm[il], valid, nt)
            ks.append(kv.k[il]); vs.append(kv.v[il])
            convs.append(conv_l); ssms.append(ssm_l)
        else:  # attention layer (NoPE unless rope_finetuned)
            q = (h @ p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = (h @ p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = (h @ p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            if rope_on:
                q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
                k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            attn, k_l, v_l = mha_with_cache(q, k, v, kv.k[il], kv.v[il], kv.n_past, scale)
            out = attn.reshape(B, T, cfg.n_heads * cfg.head_dim) @ p["wo"]
            ks.append(k_l); vs.append(v_l)
            convs.append(kv.conv[il]); ssms.append(kv.ssm[il])
        x = x + (out * rs if rs != 1.0 else out)

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        if "moe_gate_inp" in p:
            mlp = moe_ffn(h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg)
            if "shexp_gate" in p:
                gate = jax.nn.silu((h @ p["shexp_gate"]).astype(jnp.float32)).astype(h.dtype)
                mlp = mlp + (gate * (h @ p["shexp_up"])) @ p["shexp_down"]
        else:
            gate = jax.nn.silu((h @ p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
            mlp = (gate * (h @ p["w_up"])) @ p["w_down"]
        x = x + (mlp * rs if rs != 1.0 else mlp)

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else nt
    new_kv = GraniteHybridState(
        k=jnp.stack(ks), v=jnp.stack(vs), conv=jnp.stack(convs), ssm=jnp.stack(ssms),
        n_past=kv.n_past + advance,
    )
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """Per-layer heterogeneous load (LLM_ARCH_GRANITE_HYBRID table)."""
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

    G = cfg.ssm_n_group
    layers = []
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        p = {"attn_norm": w(b + "attn_norm.weight", False, f32=True),
             "ffn_norm": w(b + "ffn_norm.weight", False, f32=True)}
        if b + "ssm_in.weight" in t:
            p.update(
                ssm_in=w(b + "ssm_in.weight"),
                conv_w=w(b + "ssm_conv1d.weight", False, f32=True),
                ssm_dt_b=w(b + "ssm_dt.bias", False, f32=True),
                ssm_a=put(t[b + "ssm_a"].to_f32().reshape(-1), "ssm_a"),
                ssm_d=put(t[b + "ssm_d"].to_f32().reshape(-1), "ssm_d"),
                ssm_out=w(b + "ssm_out.weight"),
            )
            if b + "ssm_conv1d.bias" in t:
                p["conv_b"] = w(b + "ssm_conv1d.bias", False, f32=True)
            if b + "ssm_norm.weight" in t:
                p["ssm_norm"] = put(t[b + "ssm_norm.weight"].to_f32().reshape(G, -1), "ssm_norm")
        else:
            p.update(
                wq=w(b + "attn_q.weight"), wk=w(b + "attn_k.weight"),
                wv=w(b + "attn_v.weight"), wo=w(b + "attn_output.weight"),
            )
        if b + "ffn_gate_inp.weight" in t:
            p["moe_gate_inp"] = w(b + "ffn_gate_inp.weight")
            for gg, key in [("ffn_gate_exps", "moe_gate"), ("ffn_up_exps", "moe_up"),
                            ("ffn_down_exps", "moe_down")]:
                a = t[b + gg + ".weight"].to_f32().transpose(0, 2, 1)
                p[key] = put(np.ascontiguousarray(a).astype(dtype), b + gg)
            if b + "ffn_gate_shexp.weight" in t:
                p["shexp_gate"] = w(b + "ffn_gate_shexp.weight")
                p["shexp_up"] = w(b + "ffn_up_shexp.weight")
                p["shexp_down"] = w(b + "ffn_down_shexp.weight")
        else:
            p["w_gate"] = w(b + "ffn_gate.weight")
            p["w_up"] = w(b + "ffn_up.weight")
            p["w_down"] = w(b + "ffn_down.weight")
        layers.append(p)
    params["layers"] = layers
    return params
