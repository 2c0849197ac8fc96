"""Device-side batched sampling.

The reference samples on the host CPU over full-vocab logits
(``src/llama-sampling.cpp``) — cheap over PCIe, ruinous over a network
tunnel and wasteful at batch. Here the hot samplers (greedy, temp, top-k,
top-p, min-p) run on-device over the top-``CAND`` candidates per slot, and
only token ids leave the chip. Exact for top_k ≤ CAND and greedy; the
host ``sampling/samplers.py`` chain remains the exact/feature-complete
path (grammar, mirostat, penalties with long horizons).

Repetition penalties need recent-token state; the engine passes a
``recent_tokens (B, R)`` ring buffer and the penalty is applied on the
candidate set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CAND = 256  # candidates kept per slot — top_k above this falls back to host
NEG_INF = -1e30


@partial(jax.jit, static_argnames=("cand",))
def sample_tokens(
    logits: jnp.ndarray,  # (B, V) f32
    key: jax.Array,
    temp: jnp.ndarray,  # (B,) 0 → greedy
    top_k: jnp.ndarray,  # (B,) int32, 0 → disabled
    top_p: jnp.ndarray,  # (B,) 1.0 → disabled
    min_p: jnp.ndarray,  # (B,) 0.0 → disabled
    penalty_repeat: jnp.ndarray,  # (B,) 1.0 → disabled
    recent_tokens: jnp.ndarray,  # (B, R) int32, -1 padded
    cand: int = CAND,
) -> jnp.ndarray:
    """Returns sampled token ids (B,) int32."""
    B, V = logits.shape
    cand = min(cand, V)
    vals, idx = jax.lax.top_k(logits, cand)  # (B, cand) descending

    # repetition penalty on candidates present in the recent window
    in_recent = (idx[:, :, None] == recent_tokens[:, None, :]).any(-1)  # (B, cand)
    pr = penalty_repeat[:, None]
    penalized = jnp.where(vals <= 0, vals * pr, vals / pr)
    vals = jnp.where(in_recent & (pr != 1.0), penalized, vals)

    ranks = jnp.arange(cand)[None, :]

    # top-k: drop ranks ≥ k
    k = jnp.where(top_k[:, None] > 0, top_k[:, None], cand)
    vals = jnp.where(ranks < k, vals, NEG_INF)

    # min-p: drop candidates below min_p × max-prob (log-space)
    mx = vals.max(axis=-1, keepdims=True)
    vals = jnp.where(
        (min_p[:, None] > 0) & (vals < mx + jnp.log(jnp.maximum(min_p[:, None], 1e-10))),
        NEG_INF,
        vals,
    )

    # top-p over the (already sorted) candidates
    probs = jax.nn.softmax(vals, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep = (csum - probs) < top_p[:, None]  # keep first token exceeding p too
    keep = keep.at[:, 0].set(True)
    vals = jnp.where(keep, vals, NEG_INF)

    # temperature + categorical
    safe_temp = jnp.maximum(temp[:, None], 1e-6)
    scaled = vals / safe_temp
    gumbel = jax.random.gumbel(key, (B, cand), jnp.float32)
    sampled_rank = jnp.argmax(scaled + gumbel, axis=-1)
    greedy_rank = jnp.argmax(vals, axis=-1)
    rank = jnp.where(temp <= 0, greedy_rank, sampled_rank)
    return jnp.take_along_axis(idx, rank[:, None], axis=1)[:, 0].astype(jnp.int32)
