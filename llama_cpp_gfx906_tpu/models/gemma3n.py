"""Gemma-3n (E2B/E4B): AltUp multi-stream residuals, LAuReL low-rank
bypass, per-layer input embeddings, activation sparsity, iSWA(5)
attention with KV sharing for the trailing layers.

Reference: ``llm_build_gemma3n_iswa`` (src/llama-model.cpp:10455) —
altup predict/correct (:10960-11010), laurel (:10905), gaussian_topk
activation sparsity (:10915), per-layer input projection (:10680),
KV-shared trailing layers (n_layer_kv, :10462), hparams :1111.

TPU design: unrolled per-layer loop (layers are heterogeneous:
sliding/full rope bases, KV-owner vs KV-shared); the 4-stream AltUp
state rides as an (A, B, T, D) array.
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

SPARSITY_STD_MUL = 1.6448533535003662  # normal icdf(0.95), reference :10463


@dataclass
class Gemma3nState:
    k: jnp.ndarray  # (L, B, S, Hkv, Dh) — zeros on KV-shared layers
    v: jnp.ndarray
    n_past: jnp.ndarray

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16):
        return cls(
            k=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            v=jnp.zeros((cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]


jax.tree_util.register_dataclass(Gemma3nState, ["k", "v", "n_past"], [])


def _magnitude(x):  # (..., D) -> (..., 1)
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))


def _modalities(x, p, cfg):
    """tanh(router(norm(x)/n_embd)) → (B, T, A)."""
    r = rms_norm(x, p["altup_router_norm"], cfg.rms_eps).astype(jnp.float32) / cfg.n_embd
    return jnp.tanh(r @ p["altup_router"].astype(jnp.float32))


def _gaussian_topk(x):
    """relu(x − (mean + icdf(0.95)·std)) per token over the FFN dim."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    std = jnp.sqrt(jnp.square(xf - mu).sum(-1, keepdims=True) / (x.shape[-1] - 1))
    return jax.nn.relu(xf - (mu + SPARSITY_STD_MUL * std)).astype(x.dtype)


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,
    kv: Gemma3nState,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, Gemma3nState]:
    B, T = tokens.shape
    D = cfg.n_embd
    A = cfg.n_altup
    act_i = 0  # altup_active_idx
    Dpl = cfg.n_embd_altup
    L = cfg.n_layers
    n_kv_layers = L - cfg.n_kv_shared

    x0 = params["tok_emb"][tokens].astype(jnp.float32) * float(D) ** 0.5  # (B,T,D)

    # per-layer inputs: embed + model projection (project_per_layer_inputs)
    pli = params["tok_emb_per_layer"][tokens].astype(jnp.float32)  # (B,T,L*Dpl)
    pli = pli.reshape(B, T, L, Dpl) * float(Dpl) ** 0.5
    proj = (x0 @ params["per_layer_model_proj"].astype(jnp.float32)) * float(D) ** -0.5
    proj = proj.reshape(B, T, L, Dpl)
    proj = rms_norm(proj, params["per_layer_proj_norm"], cfg.rms_eps)
    inp_per_layer = (pli + proj) * (2.0 ** -0.5)  # (B, T, L, Dpl)

    # expand to A altup streams with magnitude renormalization
    tgt = _magnitude(x0)
    streams = [x0]
    for i in range(A - 1):
        added = x0 @ params["altup_proj"][i].astype(jnp.float32)
        streams.append(added * tgt / jnp.maximum(_magnitude(added), 1e-30))
    xs = jnp.stack(streams)  # (A, B, T, D)

    inv_freq_g = jnp.asarray(rope_frequencies(cfg))
    local_cfg = cfg.with_(rope_base=cfg.rope_local_base or 10000.0)
    from ..gguf.constants import RopeScalingType

    inv_freq_l = jnp.asarray(rope_frequencies(
        local_cfg.with_(rope_scaling=RopeScalingType.NONE)))
    positions = kv.n_past[:, None] + jnp.arange(T)[None, :]
    swa = cfg.swa_layers

    ks, vs = [], []
    for il, p in enumerate(params["layers"]):
        # altup predict
        mods = _modalities(xs[act_i], p, cfg)  # (B,T,A)
        coefs = (mods @ p["altup_predict_coef"].astype(jnp.float32)).reshape(B, T, A, A)
        coefs = coefs.transpose(0, 1, 3, 2)  # HF permute(0,1,3,2)
        # HF: matmul(hidden.permute(1,2,3,0), coefs).permute(3,0,1,2) + hidden
        preds = jnp.einsum("abtd,btao->obtd", xs, coefs) + xs  # (A,B,T,D)
        active = preds[act_i]  # (B,T,D)

        h = rms_norm(active, p["attn_norm"], cfg.rms_eps)
        # laurel: low-rank bypass + post norm + residual
        lau = (h.astype(jnp.float32) @ p["laurel_l"].astype(jnp.float32)) @ p["laurel_r"].astype(jnp.float32)
        lau = rms_norm(lau, p["laurel_post_norm"], cfg.rms_eps) + h

        inv_freq = inv_freq_l if swa[il] else inv_freq_g
        window = cfg.sliding_window if swa[il] else 0
        q = (h @ p["wq"]).reshape(B, T, cfg.n_heads, cfg.head_dim)
        q = rms_norm(q, p["q_norm"], cfg.rms_eps)
        q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
        if il < n_kv_layers:
            k = (h @ p["wk"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            v = (h @ p["wv"]).reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
            k = rms_norm(k, p["k_norm"], cfg.rms_eps)
            # v norm is scale-free (with_scale=False)
            v = rms_norm(v, jnp.ones((cfg.head_dim,), jnp.float32), cfg.rms_eps)
            k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
            attn, k_l, v_l = mha_with_cache(
                q, k, v, kv.k[il], kv.v[il], kv.n_past, 1.0,
                sliding_window=window)
            ks.append(k_l); vs.append(v_l)
        else:
            # KV-shared layer: attend over the owner layer's (already
            # updated) cache — no writes (llm_build_gemma3n_iswa [KV_REUSE])
            prev = [j for j in range(n_kv_layers) if swa[j] == swa[il]]
            owner = prev[-1]
            kc, vc = ks[owner], vs[owner]
            S = kc.shape[1]
            Hkv = cfg.n_kv_heads
            G = cfg.n_heads // Hkv
            qg = q.reshape(B, T, Hkv, G, cfg.head_dim)
            scores = jnp.einsum("bthgd,bshd->bhgts", qg, kc,
                                preferred_element_type=jnp.float32)
            q_pos = kv.n_past[:, None] + jnp.arange(T)[None, :]
            s_pos = jnp.arange(S)[None, :]
            mask = s_pos[:, None, :] <= q_pos[:, :, None]
            wnd = jnp.asarray(window, jnp.int32)
            mask &= jnp.logical_or(wnd <= 0, s_pos[:, None, :] > q_pos[:, :, None] - wnd)
            scores = jnp.where(mask[:, None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhgts,bshd->bthgd", probs.astype(vc.dtype), vc,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(B, T, cfg.n_heads, cfg.head_dim)
            ks.append(kv.k[il]); vs.append(kv.v[il])
        attn = attn.reshape(B, T, cfg.n_heads * cfg.head_dim).astype(h.dtype) @ p["wo"]
        attn = rms_norm(attn, p["post_attn_norm"], cfg.rms_eps)

        attn_gated = active + attn.astype(jnp.float32)
        attn_laurel = (attn_gated + lau.astype(jnp.float32)) * (2.0 ** -0.5)

        hf_in = rms_norm(attn_laurel, p["ffn_norm"], cfg.rms_eps)
        gate = hf_in @ p["w_gate"]
        if il < cfg.n_sparsity_layers:
            gate = _gaussian_topk(gate)
        gate = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        mlp = (gate.astype(hf_in.dtype) * (hf_in @ p["w_up"])) @ p["w_down"]
        mlp = rms_norm(mlp, p["post_ffn_norm"], cfg.rms_eps)
        gated = attn_laurel + mlp.astype(jnp.float32)

        # altup correct
        mods_c = _modalities(gated, p, cfg)
        innovation = gated - preds[act_i]
        ccoefs = mods_c @ p["altup_correct_coef"].astype(jnp.float32) + 1.0  # (B,T,A)
        corrected = preds + innovation[None] * ccoefs.transpose(2, 0, 1)[..., None]

        # per-layer input injection into streams 1..A-1
        first = corrected[act_i] * p["altup_correct_scale"].astype(jnp.float32)
        first = jax.nn.gelu(first @ p["inp_gate"].astype(jnp.float32), approximate=True)
        first = first * inp_per_layer[:, :, il]
        first = first @ p["per_layer_proj"].astype(jnp.float32)
        first = rms_norm(first, p["per_layer_post_norm"], cfg.rms_eps).astype(jnp.float32)
        xs = jnp.concatenate([corrected[:1], corrected[1:] + first[None]], axis=0)

    # merge altups (mean with unembed projections for streams 1..)
    tgt = _magnitude(xs[act_i])
    merged = xs[0]
    for i in range(A - 1):
        un = xs[i + 1] @ params["altup_unembd_proj"][i].astype(jnp.float32)
        merged = merged + un * tgt / jnp.maximum(_magnitude(un), 1e-30)
    x = merged / float(A)

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_kv = Gemma3nState(k=jnp.stack(ks), v=jnp.stack(vs), n_past=kv.n_past + advance)
    if return_hidden:
        return x.astype(jnp.float32), new_kv
    logits = (x @ params["lm_head"].astype(jnp.float32))
    if cfg.final_logit_softcap > 0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    return logits.astype(jnp.float32), new_kv


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """gemma3n tensor table (llama-arch.cpp :989-1018)."""
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors

    def w(name, transpose=True, f32=True):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return put(a.astype(np.float32 if f32 else dtype), name)

    n_altup = cfg.n_altup
    n_layer_kv = cfg.n_layers - cfg.n_kv_shared

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = put(emb.astype(np.float32), "tok_emb")
    params["tok_emb_per_layer"] = w("per_layer_token_embd.weight", False)
    params["per_layer_model_proj"] = w("per_layer_model_proj.weight")
    params["per_layer_proj_norm"] = w("per_layer_proj_norm.weight", False)
    # stacked (A-1, D, D) projections, stored (A-1)·D rows in GGUF
    ap = t["altup_proj.weight"].to_f32().reshape(n_altup - 1, -1, cfg.n_embd)
    params["altup_proj"] = put(np.ascontiguousarray(ap.transpose(0, 2, 1), np.float32), "altup_proj")
    au = t["altup_unembd_proj.weight"].to_f32().reshape(n_altup - 1, -1, cfg.n_embd)
    params["altup_unembd_proj"] = put(np.ascontiguousarray(au.transpose(0, 2, 1), np.float32), "altup_unembd")
    params["out_norm"] = put(t["output_norm.weight"].to_f32(), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = w("output.weight")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T, np.float32), "lm_head")

    layers = []
    # per-layer KV owner for shared layers: last earlier layer of same type
    swa = cfg.swa_layers
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        p = {
            "attn_norm": w(b + "attn_norm.weight", False),
            "post_attn_norm": w(b + "post_attention_norm.weight", False),
            "ffn_norm": w(b + "ffn_norm.weight", False),
            "post_ffn_norm": w(b + "post_ffw_norm.weight", False),
            "wq": w(b + "attn_q.weight"),
            "q_norm": w(b + "attn_q_norm.weight", False),
            "wo": w(b + "attn_output.weight"),
            "w_gate": w(b + "ffn_gate.weight"),
            "w_up": w(b + "ffn_up.weight"),
            "w_down": w(b + "ffn_down.weight"),
            "laurel_l": w(b + "laurel_l.weight"),
            "laurel_r": w(b + "laurel_r.weight"),
            "laurel_post_norm": w(b + "laurel_post_norm.weight", False),
            "altup_router": w(b + "altup_router.weight"),
            "altup_router_norm": w(b + "altup_router_norm.weight", False),
            "altup_predict_coef": w(b + "altup_predict_coef.weight"),
            "altup_correct_coef": w(b + "altup_correct_coef.weight"),
            "altup_correct_scale": put(t[b + "altup_correct_scale.weight"].to_f32().reshape(-1), b + "acs"),
            "inp_gate": w(b + "inp_gate.weight"),
            "per_layer_proj": w(b + "proj.weight"),
            "per_layer_post_norm": w(b + "post_norm.weight", False),
        }
        if i < n_layer_kv:
            p["wk"] = w(b + "attn_k.weight")
            p["wv"] = w(b + "attn_v.weight")
            p["k_norm"] = w(b + "attn_k_norm.weight", False)
        layers.append(p)
    params["layers"] = layers
    return params
