"""GGUF tensors → JAX parameter pytrees.

The TPU-native replacement for the reference's tensor loading + device
placement (``src/llama-model.cpp:1896`` ``load_tensors`` +
``llama-model-loader.cpp:919`` ``load_all_data``): tensors stream from the
memmap, dequantize on host, transpose into ``x @ W`` layout, and stack
across layers so the model can ``lax.scan`` over depth.  Sharded placement
happens in ``parallel/`` by passing ``device_put_fn``.

Keeping weights quantized on device (for the fused Pallas dequant-matmul
path) is handled by ``quantized_weights.py``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModelReader, GGUFReader
from ..models.config import ModelConfig

# GGUF canonical tensor names (reference naming tables: src/llama-arch.cpp:245)
EMBD = "token_embd.weight"
OUT_NORM = "output_norm.weight"
OUTPUT = "output.weight"


def _layer_names(i: int) -> dict[str, str]:
    b = f"blk.{i}."
    return {
        "attn_norm": b + "attn_norm.weight",
        "wq": b + "attn_q.weight",
        "wk": b + "attn_k.weight",
        "wv": b + "attn_v.weight",
        "wo": b + "attn_output.weight",
        "bq": b + "attn_q.bias",
        "bk": b + "attn_k.bias",
        "bv": b + "attn_v.bias",
        "q_norm": b + "attn_q_norm.weight",
        "k_norm": b + "attn_k_norm.weight",
        "post_attn_norm": b + "post_attention_norm.weight",
        "post_ffn_norm": b + "post_ffw_norm.weight",
        "ffn_norm": b + "ffn_norm.weight",
        "w_gate": b + "ffn_gate.weight",
        "w_up": b + "ffn_up.weight",
        "w_down": b + "ffn_down.weight",
    }

# weights consumed as x @ W — GGUF stores (out, in) row-major, so transpose
_TRANSPOSED = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}


def load_llama_params(
    reader: GGUFReader | GGUFModelReader,
    cfg: ModelConfig,
    dtype=jnp.bfloat16,
    device_put_fn: Callable[[np.ndarray, str], jax.Array] | None = None,
) -> dict:
    """Load + stack parameters for models/llama.py.

    ``device_put_fn(host_array, logical_name)`` lets callers control
    placement/sharding; default is plain ``jnp.asarray``.
    """
    put = device_put_fn or (lambda arr, name: jnp.asarray(arr))

    def fetch(name: str, transpose: bool) -> np.ndarray:
        t = reader.tensors[name]
        arr = t.to_f32()
        if transpose:
            arr = arr.T
        return np.ascontiguousarray(arr, dtype=np.float32)

    params: dict = {}
    emb = fetch(EMBD, False)
    params["tok_emb"] = put(emb.astype(_np_dtype(dtype)), "tok_emb")
    params["out_norm"] = put(fetch(OUT_NORM, False), "out_norm")
    if OUTPUT in reader.tensors:
        params["lm_head"] = put(fetch(OUTPUT, True).astype(_np_dtype(dtype)), "lm_head")
    else:  # tied embeddings
        params["lm_head"] = put(emb.T.astype(_np_dtype(dtype)).copy(), "lm_head")

    stacked: dict[str, list[np.ndarray]] = {}
    for i in range(cfg.n_layers):
        for key, gguf_name in _layer_names(i).items():
            if gguf_name not in reader.tensors:
                continue
            arr = fetch(gguf_name, key in _TRANSPOSED)
            if "norm" not in key:
                arr = arr.astype(_np_dtype(dtype))
            stacked.setdefault(key, []).append(arr)

    layers = {}
    for key, arrs in stacked.items():
        if len(arrs) != cfg.n_layers:
            raise ValueError(
                f"{key}: found {len(arrs)} of {cfg.n_layers} layer tensors"
            )
        layers[key] = put(np.stack(arrs), f"layers.{key}")
    params["layers"] = layers
    return params


def _np_dtype(jdtype):
    # numpy handles ml_dtypes (bfloat16) natively via astype
    return jdtype
