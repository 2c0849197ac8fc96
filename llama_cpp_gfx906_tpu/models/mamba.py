"""Mamba (selective SSM) model family.

Reference: ``llm_build_mamba`` + ``build_mamba_layer``
(src/llama-model.cpp:11011, 11282) over the recurrent-state memory
(src/llama-memory-recurrent.cpp).  The TPU design keeps per-layer
(conv_state, ssm_state) as a donated carry — the recurrent analog of the
KV cache — and runs layers under ``lax.scan`` like the attention models.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.quant_matmul import linear
from ..ops.ssm import causal_conv1d, selective_scan
from .config import ModelConfig


@dataclass
class MambaState:
    """Recurrent memory: fixed-size state per layer (llama_memory_recurrent
    analog — one 'cell' per sequence, no ring buffer needed)."""

    conv: jnp.ndarray  # (L, B, K-1, d_inner)
    ssm: jnp.ndarray  # (L, B, d_inner, d_state)
    n_past: jnp.ndarray  # (B,) int32 — position counter (for API parity)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_seq: int = 0, dtype=jnp.float32):
        return cls(
            conv=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), dtype),
            ssm=jnp.zeros((cfg.n_layers, batch, cfg.ssm_d_inner, cfg.ssm_d_state), jnp.float32),
            n_past=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return 1 << 30  # recurrent state never fills up


jax.tree_util.register_dataclass(MambaState, ["conv", "ssm", "n_past"], [])


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # (B, T)
    kv: MambaState,  # param named `kv` for engine uniformity with llama.forward
    n_tokens: jnp.ndarray | None = None,
    return_hidden: bool = False,
) -> tuple[jnp.ndarray, MambaState]:
    cache = kv
    B, T = tokens.shape
    x = params["tok_emb"][tokens]
    # right-padding mask: padded positions must not advance the state
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
        xz = linear(h, p["ssm_in"])  # (B, T, 2*d_inner)
        xi, z = jnp.split(xz, 2, axis=-1)

        xi, conv_state = causal_conv1d(xi, conv_state, p["conv_w"], p.get("conv_b"), nt)
        xi = jax.nn.silu(xi.astype(jnp.float32)).astype(x.dtype)

        dbc = linear(xi, p["ssm_x"])  # (B, T, dt_rank + 2*d_state)
        dt = dbc[..., : cfg.ssm_dt_rank]
        Bm = dbc[..., cfg.ssm_dt_rank : cfg.ssm_dt_rank + cfg.ssm_d_state]
        Cm = dbc[..., cfg.ssm_dt_rank + cfg.ssm_d_state :]
        if cfg.ssm_dt_b_c_rms:
            # falcon-mamba: unweighted rms on the dt/B/C splits
            # (llm_build_mamba, src/llama-model.cpp:11096-11101)
            def urms(a):
                af = a.astype(jnp.float32)
                return (af * jax.lax.rsqrt(
                    (af * af).mean(-1, keepdims=True) + cfg.rms_eps)).astype(a.dtype)

            dt, Bm, Cm = urms(dt), urms(Bm), urms(Cm)
        dt = linear(dt, p["ssm_dt"]) + p["ssm_dt_b"]
        dt = jax.nn.softplus(dt.astype(jnp.float32))
        dt = (dt * valid).astype(x.dtype)  # dt=0 → exp(dt·A)=1, dBx=0: no-op step

        y, ssm_state = selective_scan(xi, dt, p["ssm_a"], Bm, Cm, p["ssm_d"], ssm_state)
        y = y * jax.nn.silu(z.astype(jnp.float32)).astype(x.dtype)
        out = linear(y, p["ssm_out"])
        return (x + out,), (conv_state, ssm_state)

    (x,), (conv_new, ssm_new) = jax.lax.scan(
        layer_step, (x,), (params["layers"], cache.conv, cache.ssm)
    )

    x = rms_norm(x, params["out_norm"], cfg.rms_eps)
    advance = jnp.full((B,), T, jnp.int32) if n_tokens is None else n_tokens.astype(jnp.int32)
    new_cache = MambaState(conv=conv_new, ssm=ssm_new, n_past=cache.n_past + advance)

    if return_hidden:
        return x.astype(jnp.float32), new_cache
    logits = linear(x, params["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def load_params(reader, cfg: ModelConfig, dtype=jnp.bfloat16, device_put_fn=None) -> dict:
    """GGUF mamba tensors → stacked pytree (names: llama-arch.cpp:813-822)."""
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

    keys = {
        "attn_norm": ("attn_norm.weight", False, np.float32),
        "ssm_in": ("ssm_in.weight", True, dtype),
        "conv_w": ("ssm_conv1d.weight", False, np.float32),
        "conv_b": ("ssm_conv1d.bias", False, np.float32),
        "ssm_x": ("ssm_x.weight", True, dtype),
        "ssm_dt": ("ssm_dt.weight", True, dtype),
        "ssm_dt_b": ("ssm_dt.bias", False, np.float32),
        "ssm_a": ("ssm_a", False, np.float32),
        "ssm_d": ("ssm_d", False, np.float32),
        "ssm_out": ("ssm_out.weight", True, dtype),
    }
    layers: dict = {}
    for key, (suffix, transpose, kdtype) in keys.items():
        names = [f"blk.{i}.{suffix}" for i in range(cfg.n_layers)]
        if names[0] not in t:
            continue
        arrs = []
        for n in names:
            a = t[n].to_f32()
            if transpose:
                a = np.ascontiguousarray(a.T)
            arrs.append(a.astype(kdtype))
        layers[key] = put(np.stack(arrs), f"layers.{key}")
    params["layers"] = layers
    return params
