"""RWKV-in-transformer hybrids: rwkv6qwen2 (QRWKV) and arwkv7 (ARWKV).

Reference: ``llm_build_rwkv6qwen2`` (src/llama-model.cpp:14628) — the
qrwkv variant of ``build_rwkv6_time_mix`` (:14374; no ``time_mix_first``
bonus, sigmoid gate, optional r/k/v biases, k·(1−w) preconditioning,
``ggml_gated_linear_attn`` with head_size^-0.5 scaling, no group norm) —
and ``llm_build_arwkv7`` (:14978) — the rwkv7 time-mix inside a
qwen-style gated-silu FFN shell.  Both keep one token-shift row per
layer (time-mix only, no channel mix).

TPU design follows models/rwkv6.py: projections batch over (B·T), the
(H, S, S) state rides a ``lax.scan`` over time.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from .config import ModelConfig
from .rwkv6 import _shift_prev
from .rwkv7 import _time_mix as rwkv7_time_mix


@dataclass
class RWKVHybridState:
    shift: jnp.ndarray  # (L, B, D) — one token-shift row per layer
    wkv: jnp.ndarray  # (L, B, H, S, S) f32
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int = 0, dtype=jnp.float32):
        H = cfg.n_embd // cfg.wkv_head_size
        S = cfg.wkv_head_size
        return cls(
            shift=jnp.zeros((cfg.n_layers, batch, cfg.n_embd), jnp.float32),
            wkv=jnp.zeros((cfg.n_layers, batch, H, S, S), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return 1 << 30


jax.tree_util.register_dataclass(RWKVHybridState, ["shift", "wkv", "n_past"], [])


def gla(r, k, v, w, state, scale):
    """``ggml_gated_linear_attn``: S ← S·w + k⊗v; out = (r·S)·scale."""
    rf, kf, vf, wf = (x.astype(jnp.float32) for x in (r, k, v, w))

    def step(s, inputs):
        r_t, k_t, v_t, w_t = inputs  # (B, H, S)
        s = s * w_t[..., :, None] + k_t[..., :, None] * v_t[..., None, :]
        out = jnp.einsum("bhi,bhij->bhj", r_t, s) * scale
        return s, out

    xs = tuple(x.transpose(1, 0, 2, 3) for x in (rf, kf, vf, wf))
    final, outs = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3), final


def _qrwkv_time_mix(x, x_prev, p, cfg: ModelConfig, wkv_state, valid):
    """qrwkv branch of build_rwkv6_time_mix (is_qrwkv=true paths)."""
    B, T, D = x.shape
    S = cfg.wkv_head_size
    H = D // S
    sx = x_prev - x
    base = x + sx * p["lerp_x"]
    extra = p["w1"].shape[1] // 5
    xxx = jnp.tanh(base @ p["w1"]).reshape(B, T, 5, extra)
    xxx = jnp.einsum("btce,ced->btcd", xxx, p["w2"])
    mixed = x[:, :, None, :] + (xxx + p["lerp_fused"]) * sx[:, :, None, :]
    xw, xk, xv, xr, xg = (mixed[:, :, i] for i in range(5))

    r = xr @ p["wr"]
    k = xk @ p["wk"]
    v = xv @ p["wv"]
    if "br" in p:
        r = r + p["br"]
    if "bk" in p:
        k = k + p["bk"]
    if "bv" in p:
        v = v + p["bv"]
    g = jax.nn.sigmoid((xg @ p["wg"]).astype(jnp.float32)).astype(x.dtype)

    # GQA-style kv: repeat shared heads (reference ggml_repeat block)
    n_kv = k.shape[-1] // S
    if n_kv != H:
        reps = H // n_kv
        k = jnp.repeat(k.reshape(B, T, n_kv, S), reps, axis=2).reshape(B, T, D)
        v = jnp.repeat(v.reshape(B, T, n_kv, S), reps, axis=2).reshape(B, T, D)

    w = jnp.tanh(xw @ p["decay_w1"]) @ p["decay_w2"] + p["decay"]
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))
    w = jnp.where(valid > 0, w, 1.0)
    k = (k.astype(jnp.float32) * (1.0 - w) * valid).astype(x.dtype)  # qrwkv precondition

    out, wkv_state = gla(
        r.reshape(B, T, H, S), k.reshape(B, T, H, S),
        v.reshape(B, T, H, S), w.reshape(B, T, H, S),
        wkv_state, float(S) ** -0.5,
    )
    cur = out.reshape(B, T, D).astype(x.dtype) * g
    return cur @ p["wo"], wkv_state


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: RWKVHybridState,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, RWKVHybridState]:
    B, T = tokens.shape
    x = params["tok_emb"][tokens].astype(jnp.float32)
    nt = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = x * valid
    last_idx = jnp.maximum(nt - 1, 0)
    is7 = cfg.arch == "arwkv7"
    v_first = None

    def take_last(seq):
        return jnp.take_along_axis(
            seq, last_idx[:, None, None].repeat(seq.shape[-1], -1), axis=1)[:, 0]

    shifts, wkvs = [], []
    for il, p in enumerate(params["layers"]):
        att_in = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        x_prev = _shift_prev(att_in, kv.shift[il])
        att_m, prev_m = att_in * valid, x_prev * valid
        if is7:
            out, wkv_new, v_first = rwkv7_time_mix(
                att_m, prev_m, p, cfg, kv.wkv[il], valid, v_first)
        else:
            out, wkv_new = _qrwkv_time_mix(att_m, prev_m, p, cfg, kv.wkv[il], valid)
        x = x + out * valid
        shifts.append(take_last(att_in))
        wkvs.append(wkv_new)

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        gate = jax.nn.silu((h @ p["w_gate"]).astype(jnp.float32))
        x = x + (gate * (h @ p["w_up"])) @ p["w_down"] * valid

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    new_state = RWKVHybridState(
        shift=jnp.stack(shifts), wkv=jnp.stack(wkvs), n_past=kv.n_past + nt)
    if return_hidden:
        return x.astype(jnp.float32), new_state
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_state


def load_params(reader, cfg: ModelConfig, dtype=jnp.float32, device_put_fn=None) -> dict:
    """rwkv6qwen2 table (llama-arch.cpp:1612-1632) / arwkv7 table."""
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors
    is7 = cfg.arch == "arwkv7"
    S = cfg.wkv_head_size
    H = cfg.n_embd // S

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(np.float32), "tok_emb")
    params["out_norm"] = put(t["output_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = put(
            np.ascontiguousarray(t["output.weight"].to_f32().T, np.float32), "lm_head")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T, np.float32), "lm_head")

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
            "ffn_norm": g("ffn_norm.weight", False),
            "wr": g("time_mix_receptance.weight"),
            "wk": g("time_mix_key.weight"),
            "wv": g("time_mix_value.weight"),
            "wo": g("time_mix_output.weight"),
            "w_gate": g("ffn_gate.weight"),
            "w_up": g("ffn_up.weight"),
            "w_down": g("ffn_down.weight"),
        }
        if is7:
            lf = t[b + "time_mix_lerp_fused.weight"].to_f32()
            p.update(
                # normalize (n,1,1,D)/(n,1,D) → (n,D) like models/rwkv7.py:251
                lerp_fused=put(
                    np.ascontiguousarray(
                        lf.reshape(lf.shape[0], -1).astype(np.float32)),
                    b + "lerp_fused"),
                w0=g("time_mix_w0.weight", False, reshape=(-1,)),
                w1=g("time_mix_w1.weight"),
                w2=g("time_mix_w2.weight"),
                a0=g("time_mix_a0.weight", False, reshape=(-1,)),
                a1=g("time_mix_a1.weight"),
                a2=g("time_mix_a2.weight"),
                v0=g("time_mix_v0.weight", False, reshape=(-1,), optional=True),
                v1=g("time_mix_v1.weight", optional=True),
                v2=g("time_mix_v2.weight", optional=True),
                g1=g("time_mix_g1.weight", optional=True),
                g2=g("time_mix_g2.weight", optional=True),
                k_k=g("time_mix_k_k.weight", False, reshape=(-1,)),
                k_a=g("time_mix_k_a.weight", False, reshape=(-1,)),
                r_k=g("time_mix_r_k.weight", False, reshape=(-1,)),
            )
            p = {k: v for k, v in p.items() if v is not None}
        else:
            p.update(
                lerp_x=g("time_mix_lerp_x.weight", False, reshape=(-1,)),
                lerp_fused=g("time_mix_lerp_fused.weight", False, reshape=(5, -1)),
                w1=g("time_mix_w1.weight"),
                w2=g("time_mix_w2.weight", False),
                decay_w1=g("time_mix_decay_w1.weight"),
                decay_w2=g("time_mix_decay_w2.weight"),
                decay=g("time_mix_decay.weight", False, reshape=(-1,)),
                wg=g("time_mix_gate.weight"),
                br=g("time_mix_receptance.bias", False, reshape=(-1,), optional=True),
                bk=g("time_mix_key.bias", False, reshape=(-1,), optional=True),
                bv=g("time_mix_value.bias", False, reshape=(-1,), optional=True),
            )
            p = {k: v for k, v in p.items() if v is not None}
            w2 = np.asarray(p["w2"])
            if w2.ndim == 3 and w2.shape[1] == cfg.n_embd:
                p["w2"] = put(np.ascontiguousarray(w2.transpose(0, 2, 1)), b + "w2")
            elif w2.ndim == 2:
                extra = w2.shape[0] // 5
                p["w2"] = put(
                    np.ascontiguousarray(
                        w2.reshape(5, extra, -1)), b + "w2")
        layers.append(p)
    params["layers"] = layers
    return params
