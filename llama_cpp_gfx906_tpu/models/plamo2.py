"""PLaMo-2 hybrid: mamba2-style SSD layers interleaved with qk-normed
attention, double-norm blocks (pre + post norms on both mixer and FFN),
split-swiglu FFN.

Reference: ``llm_build_plamo2`` (src/llama-model.cpp:16726) — a layer is
recurrent iff its per-layer ``head_count_kv`` is 0; the mamba layer's
in_proj emits per-head-interleaved [z|x], conv covers only the x half,
and B/C/dt come from a second ``ssm_x`` projection with their own RMS
norms (:16860-16930); hparams at :988.

TPU design: granite-hybrid-style unrolled layer loop, reusing
ops/ssm.causal_conv1d + ssd_scan (the ggml_ssm_conv / ggml_ssm_scan
analogs).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import mha_with_cache
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_frequencies
from ..ops.ssm import causal_conv1d, ssd_scan
from .config import ModelConfig


@dataclass
class PLaMo2State:
    k: jnp.ndarray  # (L, B, S, Hkv, Dh) — zeros on mamba layers
    v: jnp.ndarray
    conv: jnp.ndarray  # (L, B, K-1, d_inner)
    ssm: jnp.ndarray  # (L, B, H, P, N)
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        H = cfg.ssm_dt_rank
        P = cfg.ssm_d_inner // H
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            conv=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), jnp.float32),
            ssm=jnp.zeros((cfg.n_layers, batch, H, P, cfg.ssm_d_state), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(PLaMo2State, ["k", "v", "conv", "ssm", "n_past"], [])


def plamo2_mamba_block(h, p, cfg: ModelConfig, conv_state, ssm_state, valid, nt):
    """build_plamo2_mamba_layer: per-head [z|x] in_proj, conv on x,
    normed B/C/dt from ssm_x, SSD scan, silu(z)·y gating."""
    B, T, _ = h.shape
    d_inner = cfg.ssm_d_inner
    H = cfg.ssm_dt_rank
    P = d_inner // H
    N = cfg.ssm_d_state

    zx = (h @ p["ssm_in"]).reshape(B, T, H, 2 * P)
    z = zx[..., :P].reshape(B, T, d_inner)
    x = zx[..., P:].reshape(B, T, d_inner)

    x, conv_state = causal_conv1d(x, conv_state, p["conv_w"], p.get("conv_b"), nt)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(h.dtype)

    bcdt = x @ p["ssm_x"]  # (B, T, 2N + dt_dim), order [B | C | dt]
    Bm = rms_norm(bcdt[..., :N], p["b_norm"], cfg.rms_eps)
    Cm = rms_norm(bcdt[..., N:2 * N], p["c_norm"], cfg.rms_eps)
    dt = rms_norm(bcdt[..., 2 * N:], p["dt_norm"], cfg.rms_eps)
    dt = dt @ p["ssm_dt"] + p["ssm_dt_b"]  # (B, T, H)
    dt = jax.nn.softplus(dt.astype(jnp.float32)) * valid

    xs = x.reshape(B, T, H, P)
    y, ssm_state = ssd_scan(xs, dt.astype(h.dtype), p["ssm_a"],
                            Bm[:, :, None, :], Cm[:, :, None, :], ssm_state)
    y = y.astype(jnp.float32) + p["ssm_d"].astype(jnp.float32)[None, None, :, None] * xs.astype(jnp.float32)
    y = y.reshape(B, T, d_inner) * jax.nn.silu(z.astype(jnp.float32))
    return (y.astype(h.dtype) @ p["ssm_out"]), conv_state, ssm_state


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: PLaMo2State,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, PLaMo2State]:
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
    Dq = cfg.n_heads * cfg.head_dim
    Dkv = cfg.n_kv_heads * cfg.head_dim

    ks, vs, convs, ssms = [], [], [], []
    for il, p in enumerate(params["layers"]):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        if "ssm_in" in p:
            out, conv_l, ssm_l = plamo2_mamba_block(
                h, p, cfg, kv.conv[il], kv.ssm[il], valid, nt)
            ks.append(kv.k[il]); vs.append(kv.v[il])
            convs.append(conv_l); ssms.append(ssm_l)
        else:
            qkv = h @ p["wqkv"]
            q = qkv[..., :Dq].reshape(B, T, cfg.n_heads, cfg.head_dim)
            k = qkv[..., Dq:Dq + Dkv].reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = qkv[..., Dq + Dkv:].reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            q = rms_norm(q, p["q_norm"], cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
            q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
            k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            attn, k_l, v_l = mha_with_cache(q, k, v, kv.k[il], kv.v[il], kv.n_past, scale)
            out = attn.reshape(B, T, Dq) @ p["wo"]
            ks.append(k_l); vs.append(v_l)
            convs.append(kv.conv[il]); ssms.append(kv.ssm[il])
        # post-mixer norm, then residual (plamo2 double-norm block)
        x = x + rms_norm(out, p["post_attn_norm"], cfg.rms_eps)

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        gu = h @ p["w_up"]  # split swiglu: [gate | up]
        F = gu.shape[-1] // 2
        mlp = (jax.nn.silu(gu[..., :F].astype(jnp.float32)).astype(h.dtype)
               * gu[..., F:]) @ p["w_down"]
        x = x + rms_norm(mlp, p["post_ffn_norm"], cfg.rms_eps)

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else nt
    new_kv = PLaMo2State(k=jnp.stack(ks), v=jnp.stack(vs), conv=jnp.stack(convs),
                         ssm=jnp.stack(ssms), n_past=kv.n_past + advance)
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """Per-layer heterogeneous load (llama-arch.cpp plamo2 table :800-824)."""
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
        p = {
            "attn_norm": w(b + "attn_norm.weight", False, f32=True),
            "post_attn_norm": w(b + "post_attention_norm.weight", False, f32=True),
            "ffn_norm": w(b + "ffn_norm.weight", False, f32=True),
            "post_ffn_norm": w(b + "post_ffw_norm.weight", False, f32=True),
            "w_up": w(b + "ffn_up.weight"),
            "w_down": w(b + "ffn_down.weight"),
        }
        if b + "ssm_in.weight" in t:
            p.update(
                ssm_in=w(b + "ssm_in.weight"),
                conv_w=put(t[b + "ssm_conv1d.weight"].to_f32().reshape(
                    cfg.ssm_d_inner, cfg.ssm_d_conv).astype(np.float32),
                    b + "conv_w"),
                ssm_x=w(b + "ssm_x.weight"),
                ssm_dt=w(b + "ssm_dt.weight"),
                ssm_dt_b=w(b + "ssm_dt.bias", False, f32=True),
                ssm_a=put(t[b + "ssm_a"].to_f32().reshape(-1), b + "ssm_a"),
                ssm_d=put(t[b + "ssm_d"].to_f32().reshape(-1), b + "ssm_d"),
                ssm_out=w(b + "ssm_out.weight"),
                dt_norm=w(b + "ssm_dt_norm.weight", False, f32=True),
                b_norm=w(b + "ssm_b_norm.weight", False, f32=True),
                c_norm=w(b + "ssm_c_norm.weight", False, f32=True),
            )
        else:
            p.update(
                wqkv=w(b + "attn_qkv.weight"),
                wo=w(b + "attn_output.weight"),
                q_norm=w(b + "attn_q_norm.weight", False, f32=True),
                k_norm=w(b + "attn_k_norm.weight", False, f32=True),
            )
        layers.append(p)
    params["layers"] = layers
    return params
