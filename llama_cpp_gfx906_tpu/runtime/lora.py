"""LoRA adapters + control vectors.

Reference: src/llama-adapter.{h,cpp} — LoRA GGUF files carry
``<tensor>.lora_a`` (r, K) / ``<tensor>.lora_b`` (out, r) pairs plus
``adapter.lora.alpha`` metadata; applied at matmul time as
``y = Wx + scale · B(Ax)`` (build_lora_mm, llama-graph.cpp:543).
Control-vector GGUFs carry ``direction.<layer>`` F32 vectors added to the
hidden state per layer (llama_apply_adapter_cvec, llama.h:588).

TPU design: the low-rank terms ride the same stacked-layer pytree as the
base weights, so ``lax.scan`` carries them and the per-matmul add fuses
into the surrounding jit program; quantized base weights stay quantized.
"""

from __future__ import annotations

import re

import numpy as np

from ..gguf.reader import GGUFReader

# GGUF tensor suffix → stacked-param key used by models/llama.py
_SUFFIX_TO_KEY = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


class LoraAdapter:
    """Parsed LoRA adapter: per-layer A/B pairs + alpha."""

    def __init__(self, pairs: dict[str, dict[int, tuple[np.ndarray, np.ndarray]]],
                 alpha: float, rank: int, n_layers: int):
        self.pairs = pairs  # key -> {layer: (A (K,r), B (r,out))}
        self.alpha = alpha
        self.rank = rank
        self.n_layers = n_layers

    @classmethod
    def from_gguf(cls, path: str) -> "LoraAdapter":
        r = GGUFReader(path)
        adapter_type = r.get("adapter.type")
        if adapter_type not in (None, "lora"):
            raise ValueError(f"not a lora adapter: {adapter_type}")
        alpha = float(r.get("adapter.lora.alpha") or 0.0)

        pairs: dict[str, dict[int, tuple]] = {}
        rank = 0
        n_layers = 0
        pat = re.compile(r"^blk\.(\d+)\.(.+?)\.lora_([ab])$")
        raw: dict[tuple, dict[str, np.ndarray]] = {}
        for name, t in r.tensors.items():
            m = pat.match(name)
            if not m:
                continue
            il, suffix, ab = int(m.group(1)), m.group(2) + ".weight" if not m.group(2).endswith(".weight") else m.group(2), m.group(3)
            raw.setdefault((il, suffix), {})[ab] = t.to_f32()
        for (il, suffix), ab in raw.items():
            key = _SUFFIX_TO_KEY.get(suffix)
            if key is None or "a" not in ab or "b" not in ab:
                continue
            A = np.ascontiguousarray(ab["a"].T)  # (r, K) -> (K, r)
            B = np.ascontiguousarray(ab["b"].T)  # (out, r) -> (r, out)
            rank = A.shape[1]
            n_layers = max(n_layers, il + 1)
            pairs.setdefault(key, {})[il] = (A, B)
        if not pairs:
            raise ValueError("no lora_a/lora_b tensor pairs found")
        if not alpha:
            alpha = float(rank)
        return cls(pairs, alpha, rank, n_layers)


def apply_lora(params: dict, adapter: LoraAdapter, scale: float = 1.0, dtype=None) -> dict:
    """Return params with stacked ``<key>_lora_a`` / ``<key>_lora_b`` entries.

    The user scale and alpha/rank are folded into A so the forward pass is
    just two small matmuls per hooked weight."""
    import jax.numpy as jnp

    eff = scale * adapter.alpha / max(adapter.rank, 1)
    layers = dict(params["layers"])
    if any(k in layers for k in ("wqkv_fused", "wqk_fused", "wgateup_fused")):
        raise ValueError(
            "LoRA targets per-projection weights; load the model with "
            "fuse=False (load_llama_params_quantized) to attach adapters"
        )
    # number of layers from any stacked entry
    n_layers = None
    for v in layers.values():
        n_layers = (v.q.shape[0] if hasattr(v, "q") else v.shape[0])
        break
    for key, per_layer in adapter.pairs.items():
        if key not in layers:
            continue
        any_A, any_B = next(iter(per_layer.values()))
        K, r = any_A.shape
        out = any_B.shape[1]
        A = np.zeros((n_layers, K, r), np.float32)
        B = np.zeros((n_layers, r, out), np.float32)
        for il, (a, b) in per_layer.items():
            A[il] = a * eff
            B[il] = b
        layers[f"{key}_lora_a"] = jnp.asarray(A, dtype) if dtype else jnp.asarray(A)
        layers[f"{key}_lora_b"] = jnp.asarray(B, dtype) if dtype else jnp.asarray(B)
    out_params = dict(params)
    out_params["layers"] = layers
    return out_params


def apply_lora_set(params: dict, adapters: list[LoraAdapter], dtype=None) -> tuple[dict, list[int]]:
    """Attach several adapters at once for per-request selection.

    Rank channels are CONCATENATED — adapter ``i`` owns the rank slice
    ``[sum(ranks[:i]), sum(ranks[:i+1]))`` in every ``<key>_lora_a/b``
    pair — so a per-row gain vector (see :func:`make_gain`) selects and
    blends adapters per batch slot inside one compiled program (the
    reference server's per-slot ``lora`` scales, task.params.lora).
    alpha/rank is folded into A; user scales come from the gain.
    Returns (params, ranks)."""
    import jax.numpy as jnp

    layers = dict(params["layers"])
    if any(k in layers for k in ("wqkv_fused", "wqk_fused", "wgateup_fused")):
        raise ValueError(
            "LoRA targets per-projection weights; load the model with "
            "fuse=False to attach adapters"
        )
    n_layers = None
    for v in layers.values():
        n_layers = (v.q.shape[0] if hasattr(v, "q") else v.shape[0])
        break
    ranks = [a.rank for a in adapters]
    R = sum(ranks)
    starts = np.cumsum([0] + ranks[:-1])
    all_keys = sorted({k for a in adapters for k in a.pairs})
    for key in all_keys:
        if key not in layers:
            continue
        # dims from any adapter that hooks this key
        K = out = None
        for a in adapters:
            if key in a.pairs:
                A0, B0 = next(iter(a.pairs[key].values()))
                K, out = A0.shape[0], B0.shape[1]
                break
        A = np.zeros((n_layers, K, R), np.float32)
        B = np.zeros((n_layers, R, out), np.float32)
        for a, r0 in zip(adapters, starts):
            if key not in a.pairs:
                continue
            eff = a.alpha / max(a.rank, 1)
            for il, (ai, bi) in a.pairs[key].items():
                A[il, :, r0 : r0 + a.rank] = ai * eff
                B[il, r0 : r0 + a.rank] = bi
        layers[f"{key}_lora_a"] = jnp.asarray(A, dtype) if dtype else jnp.asarray(A)
        layers[f"{key}_lora_b"] = jnp.asarray(B, dtype) if dtype else jnp.asarray(B)
    out_params = dict(params)
    out_params["layers"] = layers
    return out_params, ranks


def make_gain(ranks: list[int], scales: dict[int, float]) -> np.ndarray:
    """Per-adapter scales → (sum(ranks),) rank-channel gain row."""
    g = np.zeros((sum(ranks),), np.float32)
    off = 0
    for i, r in enumerate(ranks):
        g[off : off + r] = float(scales.get(i, 0.0))
        off += r
    return g


def remove_lora(params: dict) -> dict:
    out_params = dict(params)
    out_params["layers"] = {
        k: v for k, v in params["layers"].items() if "_lora_" not in k
    }
    return out_params


# ---------------------------------------------------------------------------
# control vectors
# ---------------------------------------------------------------------------


def load_control_vector(path: str, n_embd: int, n_layers: int) -> np.ndarray:
    """``direction.<il>`` tensors (1-based) → (L, D) array; missing layers
    stay zero (llama_adapter_cvec::init semantics)."""
    r = GGUFReader(path)
    cvec = np.zeros((n_layers, n_embd), np.float32)
    found = False
    for name, t in r.tensors.items():
        m = re.match(r"^direction\.(\d+)$", name)
        if not m:
            continue
        il = int(m.group(1))
        if il < 1 or il > n_layers:
            continue
        cvec[il - 1] = t.to_f32().reshape(-1)[:n_embd]
        found = True
    if not found:
        raise ValueError("no direction.<n> tensors found")
    return cvec


def apply_control_vector(
    params: dict, cvec: np.ndarray, strength: float = 1.0,
    layer_start: int = 0, layer_end: int | None = None,
) -> dict:
    import jax.numpy as jnp

    c = np.asarray(cvec, np.float32) * strength
    if layer_end is None:
        layer_end = c.shape[0]
    masked = np.zeros_like(c)
    masked[layer_start:layer_end] = c[layer_start:layer_end]
    out = dict(params)
    out["layers"] = dict(params["layers"])
    out["layers"]["cvec"] = jnp.asarray(masked)
    return out
