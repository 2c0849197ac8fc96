"""LFM2 (Liquid) hybrid: gated short-convolution layers interleaved with
GQA attention (qk-norm + NEOX rope), tied/untied head behind a
token-embedding-norm final norm.

Reference: ``llm_build_lfm2`` (src/llama-model.cpp:17740) — a layer is
recurrent iff its per-layer ``head_count_kv`` is 0; the shortconv block is
``out_proj(c · causal_conv(b · x))`` with an (L_cache−1)-row conv state
(:17812-17901), hparams at :1839.

TPU design: granite-hybrid-style unrolled layer loop (heterogeneous
per-layer structure); the causal conv is a tiny static matmul over the
kernel taps, the conv state rides the cache pytree.
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


@dataclass
class LFM2State:
    """Hybrid memory: KV rows (zeros on conv layers) + conv tails."""

    k: jnp.ndarray  # (L, B, S, Hkv, Dh)
    v: jnp.ndarray
    conv: jnp.ndarray  # (L, B, d_conv, D) — last d_conv b·x columns
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        d_conv = max(cfg.ssm_d_conv - 1, 1)  # L_cache − 1 state rows
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            conv=jnp.zeros((cfg.n_layers, batch, d_conv, cfg.n_embd), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(LFM2State, ["k", "v", "conv", "n_past"], [])


def shortconv_block(h, p, cfg: ModelConfig, conv_state, valid):
    """b·x gated causal conv (build_shortconv_block): returns (out, state')."""
    B, T, D = h.shape
    d_conv = conv_state.shape[1]  # L_cache − 1
    bcx = (h @ p["conv_in"]).astype(jnp.float32)  # (B, T, 3D)
    b, c, x = bcx[..., :D], bcx[..., D:2 * D], bcx[..., 2 * D:]
    bx = b * x * valid  # padded rows must not pollute the conv state
    seq = jnp.concatenate([conv_state, bx], axis=1)  # (B, d_conv+T, D)
    # causal conv over time, kernel length L_cache = d_conv + 1 (ssm_conv)
    kern = p["conv_w"].astype(jnp.float32)  # (L_cache, D)
    out = jnp.zeros_like(bx)
    L = d_conv + 1
    for tap in range(L):
        out = out + seq[:, tap:tap + T] * kern[tap][None, None, :]
    y = c * out
    new_state = seq[:, T:T + d_conv]
    return (y.astype(h.dtype) @ p["conv_out"]), new_state


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: LFM2State,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, LFM2State]:
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if n_tokens is None:
        valid = jnp.ones((B, T, 1), jnp.float32)
        nt = None
    else:
        nt = n_tokens.astype(jnp.int32)
        valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]

    inv_freq = jnp.asarray(rope_frequencies(cfg))
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    ks, vs, convs = [], [], []
    for il, p in enumerate(params["layers"]):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "conv_in" in p:  # shortconv layer
            out, conv_l = shortconv_block(h, p, cfg, kv.conv[il], valid)
            ks.append(kv.k[il]); vs.append(kv.v[il]); convs.append(conv_l)
        else:
            q = (h @ p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = (h @ p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = (h @ p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
            q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
            k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            attn, k_l, v_l = mha_with_cache(q, k, v, kv.k[il], kv.v[il], kv.n_past, scale)
            out = attn.reshape(B, T, cfg.n_heads * cfg.head_dim) @ p["wo"]
            ks.append(k_l); vs.append(v_l); convs.append(kv.conv[il])
        x = x + out

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        gate = jax.nn.silu((h @ p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
        x = x + (gate * (h @ p["w_up"])) @ p["w_down"]

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else nt
    new_kv = LFM2State(k=jnp.stack(ks), v=jnp.stack(vs), conv=jnp.stack(convs),
                       n_past=kv.n_past + advance)
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """Per-layer heterogeneous load (llama-arch.cpp lfm2 table :1997-2012)."""
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
    # lfm2 final norm is stored as token_embd_norm; head tied to embeddings
    params["out_norm"] = put(t["token_embd_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = w("output.weight")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    layers = []
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        p = {"attn_norm": w(b + "attn_norm.weight", False, f32=True),
             "ffn_norm": w(b + "ffn_norm.weight", False, f32=True)}
        if b + "shortconv.in_proj.weight" in t:
            conv = t[b + "shortconv.conv.weight"].to_f32()  # (D, L) or (D,1,L)
            conv = conv.reshape(cfg.n_embd, -1).T  # (L_cache, D)
            p.update(
                conv_in=w(b + "shortconv.in_proj.weight"),
                conv_w=put(np.ascontiguousarray(conv, np.float32), b + "conv_w"),
                conv_out=w(b + "shortconv.out_proj.weight"),
            )
        else:
            p.update(
                wq=w(b + "attn_q.weight"), wk=w(b + "attn_k.weight"),
                wv=w(b + "attn_v.weight"), wo=w(b + "attn_output.weight"),
                q_norm=w(b + "attn_q_norm.weight", False, f32=True),
                k_norm=w(b + "attn_k_norm.weight", False, f32=True),
            )
        p["w_gate"] = w(b + "ffn_gate.weight")
        p["w_up"] = w(b + "ffn_up.weight")
        p["w_down"] = w(b + "ffn_down.weight")
        layers.append(p)
    params["layers"] = layers
    return params
