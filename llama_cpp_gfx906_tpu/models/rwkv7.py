"""RWKV7 (Goose) — DPLR linear-attention RNN.

Reference: ``llm_build_rwkv7`` + ``build_rwkv7_time_mix`` /
``build_rwkv7_channel_mix`` (src/llama-model.cpp:14715-14978) over the
recurrent-state memory; wkv7 recurrence = ``ggml_rwkv_wkv7`` with the
diagonal-plus-low-rank state transition:

    sa[j]   = Σ_i a[i]·S[i,j]          (a = −k̂, the L2-normed key)
    S[i,j] ← S[i,j]·w[i] + k[i]·v[j] + b[i]·sa[j]   (b = k̂·a_gate)
    out[j]  = Σ_i r[i]·S[i,j]

TPU notes: identical structure to models/rwkv6.py — the recurrence runs
as a ``lax.scan`` over time with the (H, S, S) state as carry; all
projections batch over (B·T) outside the scan; token-shift rows are the
second recurrent carry.  Shares RWKVState with rwkv6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from .config import ModelConfig
from .rwkv6 import GROUP_NORM_EPS, RWKVState, _shift_prev

EXP_HALF = -0.606531  # −e^(−1/2): w = exp(−e^{−1/2}·sigmoid(·)) per reference


def wkv7(r, w, k, v, a, b, state):
    """ggml_rwkv_wkv7 semantics.  r/w/k/v/a/b: (B, T, H, S);
    state: (B, H, S, S) laid out [key i, value j].  Returns (out, state')."""
    rf, wf, kf, vf, af, bf = (x.astype(jnp.float32) for x in (r, w, k, v, a, b))

    def step(s, inputs):
        r_t, w_t, k_t, v_t, a_t, b_t = inputs  # (B, H, S)
        sa = jnp.einsum("bhi,bhij->bhj", a_t, s)  # (B, H, S_v)
        s = (
            s * w_t[..., :, None]
            + k_t[..., :, None] * v_t[..., None, :]
            + b_t[..., :, None] * sa[..., None, :]
        )
        out = jnp.einsum("bhi,bhij->bhj", r_t, s)
        return s, out

    xs = tuple(x.transpose(1, 0, 2, 3) for x in (rf, wf, kf, vf, af, bf))
    final, outs = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3), final


def _time_mix(x, x_prev, p, cfg: ModelConfig, wkv_state, valid, v_first):
    B, T, D = x.shape
    S = cfg.wkv_head_size
    H = D // S
    sx = x_prev - x
    # fused lerp: 6 components in reference order [r, w, k, v, a, g]
    mixed = x[:, :, None, :] + p["lerp_fused"] * sx[:, :, None, :]
    has_g = "g1" in p
    comps = [mixed[:, :, i] for i in range(6 if has_g else 5)]
    xr, xw, xk, xv, xa = comps[:5]
    xg = comps[5] if has_g else None

    r = xr @ p["wr"]
    w = jnp.tanh(xw @ p["w1"]) @ p["w2"] + p["w0"]
    w = jnp.exp(EXP_HALF * jax.nn.sigmoid(w.astype(jnp.float32)))
    k = xk @ p["wk"]
    v = xv @ p["wv"]
    if v_first is None:
        v_first = v
    else:
        vg = jax.nn.sigmoid(((xv @ p["v1"]) @ p["v2"] + p["v0"]).astype(jnp.float32))
        v = v + (v_first - v) * vg.astype(v.dtype)
    a = jax.nn.sigmoid(((xa @ p["a1"]) @ p["a2"] + p["a0"]).astype(jnp.float32)).astype(x.dtype)

    kk = (k * p["k_k"]).reshape(B, T, H, S)
    kk = kk / jnp.maximum(
        jnp.linalg.norm(kk.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
    ).astype(kk.dtype)
    ka = k * p["k_a"]
    k = k + (a * ka - ka)

    rh = r.reshape(B, T, H, S)
    wh = w.reshape(B, T, H, S)
    kh = k.reshape(B, T, H, S)
    vh = v.reshape(B, T, H, S)
    ah = a.reshape(B, T, H, S)
    # padded steps must be state no-ops: w=1 and zero k/a inputs
    wh = jnp.where(valid[..., None] > 0, wh, 1.0)
    vmask = valid[..., None]
    out, wkv_state = wkv7(
        rh, wh, kh * vmask, vh, (-kk) * vmask, (kk * ah) * vmask, wkv_state
    )

    # per-head group norm (no affine) then ln scale/bias
    of = out.astype(jnp.float32)
    mu = of.mean(-1, keepdims=True)
    var = ((of - mu) ** 2).mean(-1, keepdims=True)
    of = (of - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
    cur = of.reshape(B, T, D)
    if "ln_w" in p:
        cur = cur * p["ln_w"] + p["ln_b"]

    # bonus: cur += v · Σ_s(k·r·r_k) per head
    rk = (kh * rh * p["r_k"].reshape(H, S)).sum(-1, keepdims=True)  # (B,T,H,1)
    cur = cur + (vh * rk).reshape(B, T, D)

    if has_g:
        g = jax.nn.sigmoid((xg @ p["g1"]).astype(jnp.float32)).astype(x.dtype) @ p["g2"]
        cur = cur.astype(x.dtype) * g
    return cur.astype(x.dtype) @ p["wo"], wkv_state, v_first


def _channel_mix(x, x_prev, p):
    sx = x_prev - x
    xk = x + sx * p["cm_lerp_k"]
    k = jnp.square(jax.nn.relu((xk @ p["cm_k"]).astype(jnp.float32))).astype(x.dtype)
    return k @ p["cm_v"]


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: RWKVState,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, RWKVState]:
    B, T = tokens.shape
    x = params["tok_emb"][tokens].astype(jnp.float32)
    x = layer_norm(x, params["emb_norm"], params.get("emb_norm_b"), cfg.rms_eps)
    nt = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = x * valid

    shifts, wkvs = [], []
    last_idx = jnp.maximum(nt - 1, 0)
    v_first = None

    def take_last(seq):
        return jnp.take_along_axis(
            seq, last_idx[:, None, None].repeat(seq.shape[-1], -1), axis=1
        )[:, 0]

    for il, p in enumerate(params["layers"]):
        att_in = layer_norm(x, p["attn_norm"], p["attn_norm_b"], cfg.rms_eps)
        x_prev = _shift_prev(att_in, kv.shift[il][:, 0])
        out, wkv_new, v_first = _time_mix(
            att_in * valid, x_prev * valid, p, cfg, kv.wkv[il], valid, v_first
        )
        x = x + out * valid

        ffn_in = layer_norm(x, p["attn_norm_2"], p["attn_norm_2_b"], cfg.rms_eps)
        x_prev2 = _shift_prev(ffn_in, kv.shift[il][:, 1])
        x = x + _channel_mix(ffn_in * valid, x_prev2 * valid, p) * valid

        shifts.append(jnp.stack([take_last(att_in), take_last(ffn_in)], axis=1))
        wkvs.append(wkv_new)

    x = layer_norm(x, params["out_norm"], params.get("out_norm_b"), cfg.rms_eps)
    new_state = RWKVState(
        shift=jnp.stack(shifts), wkv=jnp.stack(wkvs), n_past=kv.n_past + nt
    )
    if return_hidden:
        return x.astype(jnp.float32), new_state
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_state


# ---------------------------------------------------------------------------
# loading (tensor table: llama-arch.cpp LLM_ARCH_RWKV7)
# ---------------------------------------------------------------------------


def load_params(reader, cfg: ModelConfig, dtype=jnp.float32, device_put_fn=None) -> dict:
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors
    S = cfg.wkv_head_size
    H = cfg.n_embd // S

    def w(name, transpose=True, f32=True):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return put(a.astype(np.float32 if f32 else dtype), name)

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(dtype), "tok_emb")
    params["emb_norm"] = w("token_embd_norm.weight", False)
    params["emb_norm_b"] = w("token_embd_norm.bias", False)
    params["out_norm"] = w("output_norm.weight", False)
    params["out_norm_b"] = w("output_norm.bias", False)
    if "output.weight" in t:
        params["lm_head"] = w("output.weight", True, f32=False)
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    layers = []
    for i in range(cfg.n_layers):
        b = f"blk.{i}."

        def g(suffix, transpose=True, reshape=None, optional=False):
            if b + suffix not in t:
                if optional:
                    return None
                raise KeyError(b + suffix)
            a = t[b + suffix].to_f32()
            if transpose:
                a = np.ascontiguousarray(a.T)
            if reshape is not None:
                a = a.reshape(reshape)
            return put(np.ascontiguousarray(a.astype(np.float32)), b + suffix)

        p = {
            "attn_norm": g("attn_norm.weight", False),
            "attn_norm_b": g("attn_norm.bias", False),
            "attn_norm_2": g("attn_norm_2.weight", False),
            "attn_norm_2_b": g("attn_norm_2.bias", False),
            "lerp_fused": g("time_mix_lerp_fused.weight", False),  # (n, 1?, D)
            "w0": g("time_mix_w0.weight", False, reshape=(-1,)),
            "w1": g("time_mix_w1.weight"),
            "w2": g("time_mix_w2.weight"),
            "a0": g("time_mix_a0.weight", False, reshape=(-1,)),
            "a1": g("time_mix_a1.weight"),
            "a2": g("time_mix_a2.weight"),
            "k_k": g("time_mix_k_k.weight", False, reshape=(-1,)),
            "k_a": g("time_mix_k_a.weight", False, reshape=(-1,)),
            "r_k": g("time_mix_r_k.weight", False, reshape=(-1,)),
            "wr": g("time_mix_receptance.weight"),
            "wk": g("time_mix_key.weight"),
            "wv": g("time_mix_value.weight"),
            "wo": g("time_mix_output.weight"),
            "cm_lerp_k": g("channel_mix_lerp_k.weight", False, reshape=(-1,)),
            "cm_k": g("channel_mix_key.weight"),
            "cm_v": g("channel_mix_value.weight"),
        }
        for key, suffix in (
            ("v0", "time_mix_v0.weight"), ("v1", "time_mix_v1.weight"),
            ("v2", "time_mix_v2.weight"), ("g1", "time_mix_g1.weight"),
            ("g2", "time_mix_g2.weight"), ("ln_w", "time_mix_ln.weight"),
            ("ln_b", "time_mix_ln.bias"),
        ):
            v = g(suffix, transpose=key in ("v1", "v2", "g1", "g2"), optional=True)
            if v is not None:
                if key in ("v0",):
                    v = v.reshape(-1)
                if key in ("ln_w", "ln_b"):
                    v = v.reshape(-1)
                p[key] = v
        # lerp_fused arrives as (n_comp, 1, D) or (n_comp, D); normalize
        lf = np.asarray(p["lerp_fused"])
        p["lerp_fused"] = put(np.ascontiguousarray(lf.reshape(lf.shape[0], -1)), b + "lf")
        layers.append(p)
    params["layers"] = layers
    return params
