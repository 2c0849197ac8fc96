"""Mamba-2 (state-space duality) model family.

Reference: ``build_mamba2_layer`` (src/llama-model.cpp:11149) over the
recurrent-state memory, driven by ``llm_build_mamba`` for arch MAMBA2.
Layout facts mirrored from the reference graph:

- ``ssm_in`` projects to [z (d_inner) | xBC (d_inner + 2·G·N) | dt (H)].
- conv1d runs over the full xBC block (x, B and C all convolved).
- ``ssm_a``/``ssm_d`` are per-head scalars stored as (H, 1) in GGUF with A
  pre-negated to ``-exp(A_log)`` (convert_hf_to_gguf.py Mamba2Model).
- the gated RMS norm is *grouped*: ``ssm_norm`` is stored (G, d_inner/G)
  and normalization runs per group (matches mamba_ssm's tensor-parallel
  norm; note HF's MambaRMSNormGated norms the full d_inner instead —
  they agree iff G == 1).

TPU design: same shape as models/mamba.py — per-layer (conv, ssm) states
ride a donated carry under ``lax.scan`` over stacked layer weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.ssm import causal_conv1d, ssd_scan
from .config import ModelConfig


@dataclass
class Mamba2State:
    """Recurrent memory: conv tail + per-head SSD state per layer."""

    conv: jnp.ndarray  # (L, B, K-1, d_inner + 2·G·N)
    ssm: jnp.ndarray  # (L, B, H, P, N)
    n_past: jnp.ndarray  # (B,) int32 — position counter (API parity)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int = 0, dtype=jnp.float32):
        H = cfg.ssm_dt_rank  # head count rides the dt_rank key (reference: :11163)
        P = cfg.ssm_d_inner // H
        conv_dim = cfg.ssm_d_inner + 2 * cfg.ssm_n_group * cfg.ssm_d_state
        return cls(
            conv=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_conv - 1, conv_dim), dtype),
            ssm=jnp.zeros((cfg.n_layers, batch, H, P, cfg.ssm_d_state), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return 1 << 30  # recurrent state never fills up


jax.tree_util.register_dataclass(Mamba2State, ["conv", "ssm", "n_past"], [])


def mamba2_block(h, p, cfg: ModelConfig, conv_state, ssm_state, valid, nt):
    """One mamba2 mixer on pre-normed input ``h`` (B, T, n_embd).

    Shared by the pure-mamba2 stack and hybrid archs (falcon-h1's parallel
    attention+SSM layer, reference llm_build_falcon_h1).  Returns
    (out (B, T, n_embd), conv_state, ssm_state)."""
    B, T, _ = h.shape
    d_inner = cfg.ssm_d_inner
    H = cfg.ssm_dt_rank
    P = d_inner // H
    G = cfg.ssm_n_group
    N = cfg.ssm_d_state

    zxbcdt = linear(h, p["ssm_in"])  # (B, T, 2·d_inner + 2·G·N + H)
    z = zxbcdt[..., :d_inner]
    xBC = zxbcdt[..., d_inner : 2 * d_inner + 2 * G * N]
    dt = zxbcdt[..., 2 * d_inner + 2 * G * N :]  # (B, T, H)

    xBC, conv_state = causal_conv1d(xBC, conv_state, p["conv_w"], p.get("conv_b"), nt)
    xBC = jax.nn.silu(xBC.astype(jnp.float32)).astype(h.dtype)

    xs = xBC[..., :d_inner].reshape(B, T, H, P)
    Bm = xBC[..., d_inner : d_inner + G * N].reshape(B, T, G, N)
    Cm = xBC[..., d_inner + G * N :].reshape(B, T, G, N)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + p["ssm_dt_b"].astype(jnp.float32))
    dt = dt * valid  # dt=0 → exp(dt·A)=1, dt·x·B=0: padded rows are no-ops

    y, ssm_state = ssd_scan(xs, dt.astype(h.dtype), p["ssm_a"], Bm, Cm, ssm_state)
    y = y + p["ssm_d"].astype(jnp.float32)[None, None, :, None] * xs.astype(jnp.float32)
    # gate then grouped RMS norm (ggml_swiglu_split + grouped build_norm);
    # ssm_norm is optional in the reference graph (falcon-h1 with
    # mamba_rms_norm=false ships without it)
    y = y.reshape(B, T, d_inner) * jax.nn.silu(z.astype(jnp.float32))
    if "ssm_norm" in p:
        yg = y.reshape(B, T, G, d_inner // G)
        yg = yg * jax.lax.rsqrt(jnp.mean(yg * yg, axis=-1, keepdims=True) + cfg.rms_eps)
        y = (yg * p["ssm_norm"].astype(jnp.float32)[None, None]).reshape(B, T, d_inner)

    return linear(y.astype(h.dtype), p["ssm_out"]), conv_state, ssm_state


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # (B, T)
    kv: Mamba2State,
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, Mamba2State]:
    cache = kv
    B, T = tokens.shape

    x = params["tok_emb"][tokens]
    if n_tokens is None:
        valid = jnp.ones((B, T, 1), jnp.float32)
        nt = None
    else:
        nt = n_tokens.astype(jnp.int32)
        valid = (jnp.arange(T)[None, :] < nt[:, None]).astype(jnp.float32)[..., None]
    x = (x.astype(jnp.float32) * valid).astype(x.dtype)

    def layer_step(carry, layer):
        (x,) = carry
        p, conv_state, ssm_state = layer
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        out, conv_state, ssm_state = mamba2_block(h, p, cfg, conv_state, ssm_state, valid, nt)
        return (x + out,), (conv_state, ssm_state)

    (x,), (conv_new, ssm_new) = jax.lax.scan(
        layer_step, (x,), (params["layers"], cache.conv, cache.ssm)
    )

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_cache = Mamba2State(conv=conv_new, ssm=ssm_new, n_past=cache.n_past + advance)

    if return_hidden:
        return x.astype(jnp.float32), new_cache
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """GGUF mamba2 tensors → stacked pytree (names: llama-arch.cpp MAMBA2)."""
    import numpy as np

    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    t = reader.tensors

    def f32(name):
        return t[name].to_f32()

    params: dict = {}
    emb = f32("token_embd.weight")
    params["tok_emb"] = put(emb.astype(dtype), "tok_emb")
    params["out_norm"] = put(f32("output_norm.weight"), "out_norm")
    if "output.weight" in t:
        params["lm_head"] = put(np.ascontiguousarray(f32("output.weight").T).astype(dtype), "lm_head")
    else:
        params["lm_head"] = put(np.ascontiguousarray(emb.T).astype(dtype), "lm_head")

    G = cfg.ssm_n_group
    keys = {
        "attn_norm": ("attn_norm.weight", None, np.float32),
        "ssm_in": ("ssm_in.weight", "T", dtype),
        "conv_w": ("ssm_conv1d.weight", None, np.float32),
        "conv_b": ("ssm_conv1d.bias", None, np.float32),
        "ssm_dt_b": ("ssm_dt.bias", None, np.float32),
        # (H, 1) per-head scalars in GGUF (converter unsqueezes) → (H,)
        "ssm_a": ("ssm_a", "squeeze", np.float32),
        "ssm_d": ("ssm_d", "squeeze", np.float32),
        # stored (G, d_inner/G) — grouped-norm layout, kept as-is
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
