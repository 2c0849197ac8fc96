"""Jamba: hybrid attention + Mamba layers with interleaved MoE.

Reference: ``llm_build_jamba`` (src/llama-model.cpp, hybrid memory path —
``llama_memory_hybrid``, src/llama-memory-hybrid.cpp): some layers are
Mamba blocks (with extra dt/B/C RMS norms vs plain mamba), some are
rope-less attention; FFN is dense or MoE per layer.

TPU design: the hybrid cache carries BOTH memory kinds (attention KV rows
AND conv/ssm state) for every layer index — unused halves stay zero; the
layer loop is unrolled in Python inside jit since the per-layer structure
is heterogeneous (the analog of per-layer graph dispatch).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_with_cache
from ..ops.norms import rms_norm
from ..ops.ssm import causal_conv1d, selective_scan
from .config import ModelConfig


@dataclass
class HybridState:
    """llama_memory_hybrid analog: KV rows + recurrent state, per layer."""

    k: jnp.ndarray  # (L, B, S, Hkv, Dh) — zero rows on mamba layers
    v: jnp.ndarray
    conv: jnp.ndarray  # (L, B, K-1, d_inner) — zero on attention layers
    ssm: jnp.ndarray  # (L, B, d_inner, d_state)
    n_past: jnp.ndarray  # (B,)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            conv=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), jnp.float32),
            ssm=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(HybridState, ["k", "v", "conv", "ssm", "n_past"], [])


def _mamba_block(x, p, cfg: ModelConfig, conv_state, ssm_state, valid, nt):
    xz = x @ p["ssm_in"]
    xi, z = jnp.split(xz, 2, axis=-1)
    xi, conv_state = causal_conv1d(xi, conv_state, p["conv_w"], p.get("conv_b"), nt)
    xi = jax.nn.silu(xi.astype(jnp.float32)).astype(x.dtype)
    dbc = xi @ p["ssm_x"]
    dt = dbc[..., : cfg.ssm_dt_rank]
    Bm = dbc[..., cfg.ssm_dt_rank : cfg.ssm_dt_rank + cfg.ssm_d_state]
    Cm = dbc[..., cfg.ssm_dt_rank + cfg.ssm_d_state :]
    # jamba: RMS norms on dt, B, C before the scan (ssm_dt_norm/b_norm/c_norm)
    dt = rms_norm(dt, p["dt_norm"], cfg.rms_eps)
    Bm = rms_norm(Bm, p["b_norm"], cfg.rms_eps)
    Cm = rms_norm(Cm, p["c_norm"], cfg.rms_eps)
    dt = dt @ p["ssm_dt"] + p["ssm_dt_b"]
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    dt = (dt * valid).astype(x.dtype)
    y, ssm_state = selective_scan(xi, dt, p["ssm_a"], Bm, Cm, p["ssm_d"], ssm_state)
    y = y * jax.nn.silu(z.astype(jnp.float32)).astype(x.dtype)
    return y @ p["ssm_out"], conv_state, ssm_state


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: HybridState,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, HybridState]:
    from ..ops.moe import moe_ffn

    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    if n_tokens is None:
        valid = jnp.ones((B, T, 1), jnp.float32)
        nt = None
    else:
        nt = n_tokens.astype(jnp.int32)
        valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = (x.astype(jnp.float32) * valid).astype(x.dtype)

    ks, vs, convs, ssms = [], [], [], []
    scale = cfg.attn_scale or cfg.head_dim**-0.5
    for il, p in enumerate(params["layers"]):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "ssm_in" in p:  # mamba layer
            out, conv_l, ssm_l = _mamba_block(h, p, cfg, kv.conv[il], kv.ssm[il], valid, nt)
            ks.append(kv.k[il])
            vs.append(kv.v[il])
            convs.append(conv_l)
            ssms.append(ssm_l)
        else:  # rope-less attention layer (jamba uses no positional encoding)
            q = (h @ p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = (h @ p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = (h @ p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            attn, k_l, v_l = mha_with_cache(q, k, v, kv.k[il], kv.v[il], kv.n_past, scale)
            out = attn.reshape(B, T, cfg.n_heads * cfg.head_dim) @ p["wo"]
            ks.append(k_l)
            vs.append(v_l)
            convs.append(kv.conv[il])
            ssms.append(kv.ssm[il])
        x = x + out

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        if "moe_gate_inp" in p:
            mlp = moe_ffn(h, p["moe_gate_inp"], p["moe_gate"], p["moe_up"], p["moe_down"], cfg)
        else:
            gate = jax.nn.silu((h @ p["w_gate"]).astype(jnp.float32)).astype(h.dtype)
            mlp = (gate * (h @ p["w_up"])) @ p["w_down"]
        x = x + mlp

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else nt
    new_kv = HybridState(
        k=jnp.stack(ks), v=jnp.stack(vs), conv=jnp.stack(convs), ssm=jnp.stack(ssms),
        n_past=kv.n_past + advance,
    )
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """Per-layer heterogeneous load (names: llama-arch.cpp jamba table
    :1075-1100)."""
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

    layers = []
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        p = {"attn_norm": w(b + "attn_norm.weight", False, f32=True),
             "ffn_norm": w(b + "ffn_norm.weight", False, f32=True)}
        if b + "ssm_in.weight" in t:
            p.update(
                ssm_in=w(b + "ssm_in.weight"),
                conv_w=w(b + "ssm_conv1d.weight", False, f32=True),
                ssm_x=w(b + "ssm_x.weight"),
                ssm_dt=w(b + "ssm_dt.weight"),
                ssm_dt_b=w(b + "ssm_dt.bias", False, f32=True),
                ssm_a=w(b + "ssm_a", False, f32=True),
                ssm_d=w(b + "ssm_d", False, f32=True),
                ssm_out=w(b + "ssm_out.weight"),
                dt_norm=w(b + "ssm_dt_norm.weight", False, f32=True),
                b_norm=w(b + "ssm_b_norm.weight", False, f32=True),
                c_norm=w(b + "ssm_c_norm.weight", False, f32=True),
            )
            if b + "ssm_conv1d.bias" in t:
                p["conv_b"] = w(b + "ssm_conv1d.bias", False, f32=True)
        else:
            p.update(
                wq=w(b + "attn_q.weight"), wk=w(b + "attn_k.weight"),
                wv=w(b + "attn_v.weight"), wo=w(b + "attn_output.weight"),
            )
        if b + "ffn_gate_inp.weight" in t:
            p.update(
                moe_gate_inp=w(b + "ffn_gate_inp.weight"),
                moe_gate=put(np.ascontiguousarray(t[b + "ffn_gate_exps.weight"].to_f32().transpose(0, 2, 1)).astype(dtype), "moe_gate"),
                moe_up=put(np.ascontiguousarray(t[b + "ffn_up_exps.weight"].to_f32().transpose(0, 2, 1)).astype(dtype), "moe_up"),
                moe_down=put(np.ascontiguousarray(t[b + "ffn_down_exps.weight"].to_f32().transpose(0, 2, 1)).astype(dtype), "moe_down"),
            )
        else:
            p.update(
                w_gate=w(b + "ffn_gate.weight"),
                w_up=w(b + "ffn_up.weight"),
                w_down=w(b + "ffn_down.weight"),
            )
        layers.append(p)
    params["layers"] = layers
    return params
