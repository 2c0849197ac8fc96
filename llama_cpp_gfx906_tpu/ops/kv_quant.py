"""Quantized KV-cache storage (reference: type_k/type_v, llama.h:322-323 —
the q8_0 KV option that halves long-context HBM).

TPU design: int8 values + one f32 scale per (position, head) row vector.
The QuantKV pytree drops into the same ``lax.scan`` slots as a plain
array cache (scan slices every leaf's layer axis), and attention
dequantizes rows on the VPU as they stream into the score matmul.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class QuantKV:
    """int8 rows + per-row scales; mirrors a (..., S, H, D) cache array."""

    q: jnp.ndarray  # (..., S, H, D) int8
    s: jnp.ndarray  # (..., S, H, 1) f32

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # duck-typing parity with plain arrays
        return jnp.int8

    @classmethod
    def zeros(cls, shape, _dtype=None) -> "QuantKV":
        return cls(
            q=jnp.zeros(shape, jnp.int8),
            s=jnp.zeros((*shape[:-1], 1), jnp.float32),
        )


jax.tree_util.register_dataclass(QuantKV, ["q", "s"], [])


def quantize_rows(x: jnp.ndarray) -> QuantKV:
    """Per-(pos, head) symmetric int8: scale = absmax/127 along D."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    return QuantKV(q=q, s=scale)


def dequantize_rows(kv: QuantKV, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (kv.q.astype(jnp.float32) * kv.s).astype(dtype)


def take_rows(kv: QuantKV, src: jnp.ndarray, axis: int) -> QuantKV:
    """Row permutation on a quantized cache: int8 payload and scales move
    together, no dequantization needed (used by context shift for V and
    for the pre-rope gather of K)."""
    return QuantKV(q=jnp.take(kv.q, src, axis=axis), s=jnp.take(kv.s, src, axis=axis))


def insert_quant(cache: QuantKV, new: jnp.ndarray, n_past: jnp.ndarray) -> QuantKV:
    """Scatter freshly-quantized rows at each sequence's write offset
    (the quantized analog of ops.attention.insert_kv)."""
    nq = quantize_rows(new)

    def one(c, x, start):
        return jax.lax.dynamic_update_slice(c, x, (start, 0, 0))

    return QuantKV(
        q=jax.vmap(one)(cache.q, nq.q, n_past),
        s=jax.vmap(one)(cache.s, nq.s, n_past),
    )
