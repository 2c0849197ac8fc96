"""RWKV6 (Finch) — linear-attention RNN family.

Reference: ``llm_build_rwkv6`` + ``build_rwkv6_time_mix`` /
``build_rwkv6_channel_mix`` (src/llama-model.cpp:14325-14630) over the
recurrent-state memory; wkv6 recurrence = ``ggml_rwkv_wkv6``:

    out_t[h,j] = Σ_i r[h,i]·(S[h,i,j] + u[h,i]·k[h,i]·v[h,j])
    S[h,i,j]  ← S[h,i,j]·w[h,i] + k[h,i]·v[h,j]

TPU notes: the recurrence runs as a ``lax.scan`` over time with the
(H, S, S) state as carry; all projections batch over (B·T) outside the
scan.  Token-shift state (last token's normed activations, 2 per layer)
is the other recurrent carry — together the exact analog of
``llama_memory_recurrent`` for this arch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm
from .config import ModelConfig

GROUP_NORM_EPS = 64e-5  # reference: ggml_norm(cur, 64e-5f) per head


@dataclass
class RWKVState:
    """Recurrent memory: per-layer token-shift rows + wkv matrix state."""

    shift: jnp.ndarray  # (L, B, 2, D)  [att_shift, ffn_shift]
    wkv: jnp.ndarray  # (L, B, H, S, S) f32
    n_past: jnp.ndarray  # (B,)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int = 0, dtype=jnp.float32):
        H = cfg.n_embd // cfg.wkv_head_size
        S = cfg.wkv_head_size
        return cls(
            shift=jnp.zeros((cfg.n_layers, batch, 2, cfg.n_embd), jnp.float32),
            wkv=jnp.zeros((cfg.n_layers, batch, H, S, S), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return 1 << 30


jax.tree_util.register_dataclass(RWKVState, ["shift", "wkv", "n_past"], [])


def wkv6(r, k, v, w, u, state):
    """The wkv6 recurrence (ggml_rwkv_wkv6 semantics).

    r/k/v/w: (B, T, H, S); u: (H, S); state: (B, H, S, S).
    Returns (out (B, T, H, S), final state)."""
    rf, kf, vf, wf = (a.astype(jnp.float32) for a in (r, k, v, w))
    uf = u.astype(jnp.float32)

    def step(s, inputs):
        r_t, k_t, v_t, w_t = inputs  # (B, H, S)
        kv = k_t[..., :, None] * v_t[..., None, :]  # (B, H, S, S)
        out = jnp.einsum("bhi,bhij->bhj", r_t, s + uf[None, :, :, None] * kv)
        s = s * w_t[..., :, None] + kv
        return s, out

    xs = tuple(a.transpose(1, 0, 2, 3) for a in (rf, kf, vf, wf))  # (T, B, H, S)
    final, outs = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3), final  # (B, T, H, S)


def _shift_prev(x: jnp.ndarray, carry_row: jnp.ndarray) -> jnp.ndarray:
    """x_prev[t] = x[t-1], with the recurrent carry at t=0 (token shift)."""
    return jnp.concatenate([carry_row[:, None, :], x[:, :-1]], axis=1)


def _time_mix(x, x_prev, p, cfg: ModelConfig, wkv_state, valid):
    B, T, D = x.shape
    S = cfg.wkv_head_size
    H = D // S
    sx = x_prev - x
    base = x + sx * p["lerp_x"]
    extra = p["w1"].shape[1] // 5
    xxx = jnp.tanh(base @ p["w1"]).reshape(B, T, 5, extra)
    # per-component projection back to D: (5, extra, D)
    xxx = jnp.einsum("btce,ced->btcd", xxx, p["w2"])
    mixed = x[:, :, None, :] + (xxx + p["lerp_fused"]) * sx[:, :, None, :]
    xw, xk, xv, xr, xg = (mixed[:, :, i] for i in range(5))

    r = (xr @ p["wr"]).reshape(B, T, H, S)
    k = (xk @ p["wk"]).reshape(B, T, H, S)
    v = (xv @ p["wv"]).reshape(B, T, H, S)
    g = jax.nn.silu((xg @ p["wg"]).astype(jnp.float32)).astype(x.dtype)

    w = jnp.tanh(xw @ p["decay_w1"]) @ p["decay_w2"] + p["decay"]
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32))).reshape(B, T, H, S)
    # padded steps must be state no-ops: w=1 (k is already 0 there)
    w = jnp.where(valid[..., None] > 0, w, 1.0)

    out, wkv_state = wkv6(r, k, v, w, p["first"], wkv_state)
    # per-head group norm (no affine), then time_mix_ln scale/bias
    of = out.astype(jnp.float32)
    mu = of.mean(-1, keepdims=True)
    var = ((of - mu) ** 2).mean(-1, keepdims=True)
    of = (of - mu) * jax.lax.rsqrt(var + GROUP_NORM_EPS)
    of = of.reshape(B, T, D) * p["ln_w"] + p["ln_b"]
    return (of.astype(x.dtype) * g) @ p["wo"], wkv_state


def _channel_mix(x, x_prev, p):
    sx = x_prev - x
    xk = x + sx * p["cm_lerp_k"]
    xr = x + sx * p["cm_lerp_r"]
    r = jax.nn.sigmoid((xr @ p["cm_r"]).astype(jnp.float32)).astype(x.dtype)
    k = jnp.square(jax.nn.relu((xk @ p["cm_k"]).astype(jnp.float32))).astype(x.dtype)
    return r * (k @ p["cm_v"])


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
    if n_tokens is None:
        nt = jnp.full((B,), T, jnp.int32)
    else:
        nt = n_tokens.astype(jnp.int32)
    valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = x * valid

    shifts, wkvs = [], []
    last_idx = jnp.maximum(nt - 1, 0)

    def take_last(seq):  # (B, T, D) -> (B, D) at the last VALID position
        return jnp.take_along_axis(seq, last_idx[:, None, None].repeat(seq.shape[-1], -1), axis=1)[:, 0]

    for il, p in enumerate(params["layers"]):
        att_in = layer_norm(x, p["attn_norm"], p["attn_norm_b"], cfg.rms_eps)
        x_prev = _shift_prev(att_in, kv.shift[il][:, 0])
        # freeze state updates beyond the valid region (bucketed prefill):
        # w=1, k·v=0 keeps the wkv state intact for padded steps
        att_in_m = att_in * valid
        x_prev_m = x_prev * valid
        out, wkv_new = _time_mix(att_in_m, x_prev_m, p, cfg, kv.wkv[il], valid)
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
# loading (tensor names: llama-arch.cpp RWKV6 table :1577-1615)
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

        def g(suffix, transpose=True, reshape=None):
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
            "lerp_x": g("time_mix_lerp_x.weight", False, reshape=(-1,)),
            "lerp_fused": g("time_mix_lerp_fused.weight", False, reshape=(5, -1)),
            "w1": g("time_mix_w1.weight"),  # (D, 5*extra)
            "w2": g("time_mix_w2.weight", False),  # stored (5, n_embd, extra) -> see below
            "decay_w1": g("time_mix_decay_w1.weight"),
            "decay_w2": g("time_mix_decay_w2.weight"),
            "decay": g("time_mix_decay.weight", False, reshape=(-1,)),
            "first": g("time_mix_first.weight", False, reshape=(H, S)),
            "wr": g("time_mix_receptance.weight"),
            "wk": g("time_mix_key.weight"),
            "wv": g("time_mix_value.weight"),
            "wg": g("time_mix_gate.weight"),
            "ln_w": g("time_mix_ln.weight", False),
            "ln_b": g("time_mix_ln.bias", False),
            "wo": g("time_mix_output.weight"),
            "cm_lerp_k": g("channel_mix_lerp_k.weight", False, reshape=(-1,)),
            "cm_lerp_r": g("channel_mix_lerp_r.weight", False, reshape=(-1,)),
            "cm_k": g("channel_mix_key.weight"),
            "cm_r": g("channel_mix_receptance.weight"),
            "cm_v": g("channel_mix_value.weight"),
        }
        # w2: (5, n_embd, extra) in numpy order -> einsum wants (5, extra, D)
        w2 = np.asarray(p["w2"])
        if w2.ndim == 3 and w2.shape[1] == cfg.n_embd:
            p["w2"] = put(np.ascontiguousarray(w2.transpose(0, 2, 1)), b + "w2")
        layers.append(p)
    params["layers"] = layers
    return params
