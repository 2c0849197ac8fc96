"""Rotary position embeddings.

Covers the reference's ``ggml_rope_ext`` modes actually used by the model
graphs (``src/llama-graph.cpp``, usage ×131): NORM (interleaved pairs —
llama-family GGUF weights are stored permuted for this mode) and NEOX
(half-split), plus linear / YaRN / Llama-3 frequency scaling.

Pure functions on ``(B, T, H, Dh)`` arrays; everything is static-shape and
fuses into the surrounding jit region — no custom kernel needed, the VPU
handles this at full throughput.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import RopeScalingType
from ..models.config import ModelConfig


def rope_frequencies(cfg: ModelConfig) -> np.ndarray:
    """Per-pair inverse frequencies (host-side, baked into the jit)."""
    rope_dim = cfg.rope_dim or cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_base ** (np.arange(0, rope_dim, 2, dtype=np.float64) / rope_dim)
    )

    if cfg.rope_scaling == RopeScalingType.LINEAR and cfg.rope_scale != 1.0:
        inv_freq = inv_freq / cfg.rope_scale
    elif cfg.rope_scaling == RopeScalingType.YARN and cfg.rope_orig_ctx:
        # llama3-style smooth frequency interpolation between wavelength bands
        low_freq_wavelen = cfg.rope_orig_ctx / cfg.rope_low_freq_factor
        high_freq_wavelen = cfg.rope_orig_ctx / cfg.rope_high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        smooth = np.clip(
            (cfg.rope_orig_ctx / wavelen - cfg.rope_low_freq_factor)
            / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor),
            0.0,
            1.0,
        )
        scaled = inv_freq / cfg.rope_scale
        inv_freq = np.where(
            wavelen > low_freq_wavelen,
            scaled,
            np.where(
                wavelen < high_freq_wavelen,
                inv_freq,
                (1 - smooth) * scaled + smooth * inv_freq,
            ),
        )
    return inv_freq.astype(np.float32)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,
    interleaved: bool = True,
) -> jnp.ndarray:
    """Rotate ``x`` (B, T, H, Dh) by ``positions`` (B, T).

    interleaved=True → ggml NORM mode: pairs are (0,1), (2,3), ...
    interleaved=False → NEOX/HF mode: pairs are (i, i + Dh/2).
    Dims beyond ``2 * len(inv_freq)`` pass through unrotated.
    """
    rope_dim = 2 * inv_freq.shape[0]
    orig_dtype = x.dtype
    rot, rest = x[..., :rope_dim], x[..., rope_dim:]
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq  # (B,T,F)
    cos = jnp.cos(angles)[:, :, None, :]  # (B,T,1,F)
    sin = jnp.sin(angles)[:, :, None, :]

    rot = rot.astype(jnp.float32)
    if interleaved:
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
        out = out.reshape(rot.shape)
    else:
        half = rope_dim // 2
        x0, x1 = rot[..., :half], rot[..., half:]
        out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)

    if rest.shape[-1]:
        return jnp.concatenate([out.astype(orig_dtype), rest], axis=-1)
    return out.astype(orig_dtype)


def apply_mrope(
    x: jnp.ndarray,  # (B, T, H, Dh)
    positions: jnp.ndarray,  # (B, T, S) per-dimension positions (t, h, w[, e])
    inv_freq: jnp.ndarray,
    sections: tuple,  # frequency-pair counts per position stream
) -> jnp.ndarray:
    """Multimodal rotary (``ggml_rope_multi`` with LLAMA_ROPE_TYPE_MROPE,
    qwen2vl: src/llama-model.cpp:8508): frequency pair ``j`` rotates by
    ``positions[..., sec(j)]`` where ``sec`` walks the section ranges
    cyclically over the pair index.  NEOX pairing only (qwen2vl asserts
    full-head rope).  With all position streams equal this reduces exactly
    to :func:`apply_rope` (text-only path)."""
    import numpy as np

    F = inv_freq.shape[0]
    rope_dim = 2 * F
    sect = np.asarray(sections, np.int64)
    sect_dims = int(sect.sum())
    # pair j → section id, cycling like the reference mrope cache init
    bounds = np.cumsum(sect)
    sec_id = np.searchsorted(bounds, (np.arange(F) % max(sect_dims, 1)), side="right")
    sec_id = jnp.asarray(np.minimum(sec_id, len(sections) - 1), jnp.int32)

    orig_dtype = x.dtype
    rot, rest = x[..., :rope_dim], x[..., rope_dim:]
    pos_sel = jnp.take(positions, sec_id, axis=-1).astype(jnp.float32)  # (B,T,F)
    angles = pos_sel * inv_freq
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]

    rot = rot.astype(jnp.float32)
    half = rope_dim // 2
    x0, x1 = rot[..., :half], rot[..., half:]
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    if rest.shape[-1]:
        return jnp.concatenate([out.astype(orig_dtype), rest], axis=-1)
    return out.astype(orig_dtype)


def rope_shift_rows(
    k_cache: jnp.ndarray,  # (L, B, S, H, Dh) cached (already-roped) keys
    deltas: jnp.ndarray,  # (B, S) int32 position deltas (0 = untouched)
    inv_freq: jnp.ndarray,
    interleaved: bool = True,
) -> jnp.ndarray:
    """Re-rotate cached K rows by per-row position deltas.

    Rotation by (p + d) equals rotation by p then by d, so a cached key at
    old position p moves to position p+d by one extra rope application —
    the analog of the reference's ``build_rope_shift`` GPU graph
    (llama-kv-cache-unified.cpp:1416) used for context shift."""
    import jax

    return jax.vmap(lambda k: apply_rope(k, deltas, inv_freq, interleaved))(k_cache)
