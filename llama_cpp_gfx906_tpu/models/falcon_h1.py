"""Falcon-H1: parallel attention + mamba2 in every layer.

Reference: ``llm_build_falcon_h1`` (src/llama-model.cpp:16600) over the
hybrid memory (llama_memory_hybrid with both filters always-true —
src/llama-model.cpp:18088).  Per layer: one shared attn_norm feeds BOTH a
rope'd attention block and a mamba2 mixer; their outputs are summed into
the residual, then a gated-silu FFN.  Rope is NEOX
(LLM_ARCH_FALCON_H1 → LLAMA_ROPE_TYPE_NEOX, src/llama-model.cpp:18666).
All Falcon-H1 per-branch multipliers are baked into the weights at
convert time (reference convert_hf_to_gguf.py FalconH1Model).

TPU design: layers are homogeneous, so the whole stack runs as one
``lax.scan`` over stacked weights with a hybrid carry (KV rows + conv/ssm
states per layer), like models/llama.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_with_cache
from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.rope import apply_rope, rope_frequencies
from .config import ModelConfig
from .mamba2 import mamba2_block


@dataclass
class FalconH1State:
    """Hybrid memory: every layer holds KV rows AND mamba2 state."""

    k: jnp.ndarray  # (L, B, S, Hkv, Dh)
    v: jnp.ndarray
    conv: jnp.ndarray  # (L, B, K-1, d_inner + 2·G·N)
    ssm: jnp.ndarray  # (L, B, H, P, N)
    n_past: jnp.ndarray  # (B,)

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


jax.tree_util.register_dataclass(FalconH1State, ["k", "v", "conv", "ssm", "n_past"], [])


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # (B, T)
    kv: FalconH1State,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, FalconH1State]:
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if n_tokens is None:
        valid = jnp.ones((B, T, 1), jnp.float32)
        nt = None
    else:
        nt = n_tokens.astype(jnp.int32)
        valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = (x.astype(jnp.float32) * valid).astype(x.dtype)

    inv_freq = jnp.asarray(rope_frequencies(cfg))
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    def layer_step(carry, layer):
        (x,) = carry
        p, k_cache, v_cache, conv_state, ssm_state = layer

        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)

        # attention branch (NEOX rope)
        q = linear(h, p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = linear(h, p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = linear(h, p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, positions, inv_freq, interleaved=False)
        k = apply_rope(k, positions, inv_freq, interleaved=False)
        attn, k_cache, v_cache = mha_with_cache(q, k, v, k_cache, v_cache, kv.n_past, scale)
        attn_out = linear(attn.reshape(B, T, cfg.n_heads * cfg.head_dim), p["wo"])

        # mamba2 branch on the SAME normed input (reference: attn_norm twice)
        ssm_out, conv_state, ssm_state = mamba2_block(h, p, cfg, conv_state, ssm_state, valid, nt)

        x = x + attn_out + ssm_out

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        gate = jax.nn.silu(linear(h, p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
        x = x + linear(gate * linear(h, p["w_up"]), p["w_down"])
        return (x,), (k_cache, v_cache, conv_state, ssm_state)

    (x,), (k_new, v_new, conv_new, ssm_new) = jax.lax.scan(
        layer_step, (x,), (params["layers"], kv.k, kv.v, kv.conv, kv.ssm)
    )

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else nt
    new_kv = FalconH1State(k=k_new, v=v_new, conv=conv_new, ssm=ssm_new,
                           n_past=kv.n_past + advance)
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """GGUF falcon-h1 tensors → stacked pytree (names: llama-arch.cpp
    LLM_ARCH_FALCON_H1 table)."""
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(dtype), "tok_emb")
    params["out_norm"] = put(t["output_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = put(np.ascontiguousarray(t["output.weight"].to_f32().T).astype(dtype), "lm_head")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    G = cfg.ssm_n_group
    keys = {
        "attn_norm": ("attn_norm.weight", None, np.float32),
        "ffn_norm": ("ffn_norm.weight", None, np.float32),
        "wq": ("attn_q.weight", "T", dtype),
        "wk": ("attn_k.weight", "T", dtype),
        "wv": ("attn_v.weight", "T", dtype),
        "wo": ("attn_output.weight", "T", dtype),
        "w_gate": ("ffn_gate.weight", "T", dtype),
        "w_up": ("ffn_up.weight", "T", dtype),
        "w_down": ("ffn_down.weight", "T", dtype),
        "ssm_in": ("ssm_in.weight", "T", dtype),
        "conv_w": ("ssm_conv1d.weight", None, np.float32),
        "conv_b": ("ssm_conv1d.bias", None, np.float32),
        "ssm_dt_b": ("ssm_dt.bias", None, np.float32),
        "ssm_a": ("ssm_a", "squeeze", np.float32),
        "ssm_d": ("ssm_d", "squeeze", np.float32),
        "ssm_norm": ("ssm_norm.weight", "group", np.float32),
        "ssm_out": ("ssm_out.weight", "T", dtype),
    }
    layers: dict = {}
    for key, (suffix, mode, kdtype) in keys.items():
        names = [f"blk.{i}.{suffix}" for i in range(cfg.n_layers)]
        if names[0] not in t:
            continue
        arrs = []
        for n in names:
            a = t[n].to_f32()
            if mode == "T":
                a = np.ascontiguousarray(a.T)
            elif mode == "squeeze":
                a = a.reshape(-1)
            elif mode == "group":
                a = a.reshape(G, -1)
            arrs.append(a.astype(kdtype))
        layers[key] = put(np.stack(arrs), f"layers.{key}")
    params["layers"] = layers
    return params
