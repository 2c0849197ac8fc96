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

from ..gguf.constants import GGML_BLOCK_SIZES, GGMLType
from ..gguf.reader import GGUFModelReader, GGUFReader, TensorInfo
from ..models.config import ModelConfig
from ..ops.quant_matmul import (
    QuantTensor,
    _GRID_DECODERS,
    pack_experts_int8_g16,
    pack_gguf_experts,
    pack_gguf_tensor,
    supported_qmm_types,
)

# GGUF canonical tensor names (reference naming tables: src/llama-arch.cpp:245)
EMBD = "token_embd.weight"
OUT_NORM = "output_norm.weight"
OUTPUT = "output.weight"


def _layer_names(i: int) -> dict[str, str]:
    b = f"blk.{i}."
    return {
        "attn_norm": b + "attn_norm.weight",
        "attn_norm_b": b + "attn_norm.bias",
        "wq": b + "attn_q.weight",
        "wk": b + "attn_k.weight",
        "wv": b + "attn_v.weight",
        "wo": b + "attn_output.weight",
        "bq": b + "attn_q.bias",
        "bk": b + "attn_k.bias",
        "bv": b + "attn_v.bias",
        "bo": b + "attn_output.bias",
        "q_norm": b + "attn_q_norm.weight",
        "k_norm": b + "attn_k_norm.weight",
        "q_norm_b": b + "attn_q_norm.bias",
        "k_norm_b": b + "attn_k_norm.bias",
        # bitnet: inner sub-norms + per-tensor ternary-weight scales
        "attn_sub_norm": b + "attn_sub_norm.weight",
        "ffn_sub_norm": b + "ffn_sub_norm.weight",
        "wq_scale": b + "attn_q.scale",
        "wk_scale": b + "attn_k.scale",
        "wv_scale": b + "attn_v.scale",
        "wo_scale": b + "attn_output.scale",
        "w_gate_scale": b + "ffn_gate.scale",
        "w_up_scale": b + "ffn_up.scale",
        "w_down_scale": b + "ffn_down.scale",
        "post_attn_norm": b + "post_attention_norm.weight",
        "post_ffn_norm": b + "post_ffw_norm.weight",
        "ffn_norm_exps": b + "ffn_norm_exps.weight",
        "ffn_norm": b + "ffn_norm.weight",
        "ffn_norm_b": b + "ffn_norm.bias",
        "w_gate": b + "ffn_gate.weight",
        "w_up": b + "ffn_up.weight",
        "w_down": b + "ffn_down.weight",
        "b_up": b + "ffn_up.bias",
        "b_down": b + "ffn_down.bias",
        "b_gate": b + "ffn_gate.bias",
        # MoE (stacked-expert tensors; reference arch tables LLM_TENSOR_FFN_*_EXPS)
        "moe_gate_inp": b + "ffn_gate_inp.weight",
        "moe_gate_inp_b": b + "ffn_gate_inp.bias",
        "moe_gate": b + "ffn_gate_exps.weight",
        "moe_up": b + "ffn_up_exps.weight",
        "moe_down": b + "ffn_down_exps.weight",
        "moe_gate_b": b + "ffn_gate_exps.bias",
        "moe_up_b": b + "ffn_up_exps.bias",
        "moe_down_b": b + "ffn_down_exps.bias",
        # gpt-oss attention sinks (LLM_TENSOR_ATTN_SINKS)
        "sinks": b + "attn_sinks.weight",
        # shared expert (qwen2moe/deepseek2-style; gate_inp_shexp is the
        # per-token sigmoid gate, llm_build_qwen2moe)
        "shexp_gate_inp": b + "ffn_gate_inp_shexp.weight",
        "shexp_gate": b + "ffn_gate_shexp.weight",
        "shexp_up": b + "ffn_up_shexp.weight",
        "shexp_down": b + "ffn_down_shexp.weight",
    }


def _row_slice(t: TensorInfo, r0: int, r1: int, name: str) -> TensorInfo:
    """View rows [r0, r1) of a 2-D GGUF tensor without dequantizing.

    Quant blocks never straddle rows (each row is a whole number of
    blocks), so fused tensors (attn_qkv, phi3's gate||up ffn_up) split
    into bit-exact quantized sub-tensors."""
    blck, bsize = GGML_BLOCK_SIZES[t.ggml_type]
    K = t.shape[-1]
    rows = int(np.prod(t.shape[:-1]))
    bpr = K // blck * bsize
    data = np.asarray(t.data).reshape(rows, bpr)[r0:r1].reshape(-1)
    return TensorInfo(
        name=name, shape=(r1 - r0, K), ne=(K, r1 - r0),
        ggml_type=t.ggml_type, offset=-1, data=data,
    )


def _const_f32(name: str, arr: np.ndarray) -> TensorInfo:
    raw = np.ascontiguousarray(arr.astype("<f4")).view(np.uint8)
    return TensorInfo(
        name=name, shape=tuple(arr.shape), ne=tuple(arr.shape[::-1]),
        ggml_type=GGMLType.F32, offset=-1, data=raw,
    )


def effective_tensors(reader, cfg: ModelConfig) -> dict:
    """Tensor index with fused tensors split into canonical names.

    Covers: gpt2/phi2/starcoder/neox ``attn_qkv.{weight,bias}`` →
    attn_{q,k,v}; phi3's fused gate||up ``ffn_up`` → ffn_gate + ffn_up
    (split order per ggml_swiglu: first half gates — llama-graph.cpp:728)."""
    src = dict(reader.tensors)
    # per-layer head counts (openelm-style ragged archs store arrays in the
    # GGUF metadata; scalars broadcast)
    from ..gguf.constants import Keys as _K

    def _per_layer(key, default):
        v = reader.get(key, arch=cfg.arch) if hasattr(reader, "get") else None
        if v is None:
            return [default] * cfg.n_layers
        if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0):
            return [int(x) for x in v]
        return [int(v)] * cfg.n_layers

    heads_l = _per_layer(_K.Attention.HEAD_COUNT, cfg.n_heads)
    kv_l = _per_layer(_K.Attention.HEAD_COUNT_KV, cfg.n_kv_heads)
    for i in range(cfg.n_layers):
        b = f"blk.{i}."
        Dq = heads_l[i] * cfg.head_dim
        Dkv = kv_l[i] * cfg.head_dim
        qkv = src.get(b + "attn_qkv.weight")
        if qkv is not None and b + "attn_q.weight" not in src:
            src[b + "attn_q.weight"] = _row_slice(qkv, 0, Dq, b + "attn_q.weight")
            src[b + "attn_k.weight"] = _row_slice(qkv, Dq, Dq + Dkv, b + "attn_k.weight")
            src[b + "attn_v.weight"] = _row_slice(qkv, Dq + Dkv, Dq + 2 * Dkv, b + "attn_v.weight")
        qkvb = src.get(b + "attn_qkv.bias")
        if qkvb is not None and b + "attn_q.bias" not in src:
            arr = qkvb.to_f32().reshape(-1)
            src[b + "attn_q.bias"] = _const_f32(b + "attn_q.bias", arr[:Dq])
            src[b + "attn_k.bias"] = _const_f32(b + "attn_k.bias", arr[Dq : Dq + Dkv])
            src[b + "attn_v.bias"] = _const_f32(b + "attn_v.bias", arr[Dq + Dkv : Dq + 2 * Dkv])
        # gpt-oss GGUFs name the FFN pre-norm "post_attention_norm"
        if b + "ffn_norm.weight" not in src and b + "post_attention_norm.weight" in src \
                and b + "ffn_gate_inp.weight" in src:
            src[b + "ffn_norm.weight"] = src[b + "post_attention_norm.weight"]
        # grok: post-branch norms under their own names
        # (attn_output_norm / layer_output_norm, llama-arch.cpp grok table)
        if b + "attn_output_norm.weight" in src and b + "post_attention_norm.weight" not in src:
            src[b + "post_attention_norm.weight"] = src[b + "attn_output_norm.weight"]
        if b + "layer_output_norm.weight" in src and b + "post_ffw_norm.weight" not in src:
            src[b + "post_ffw_norm.weight"] = src[b + "layer_output_norm.weight"]
        # chameleon swin variant: attn_norm/ffn_norm apply to the branch
        # OUTPUTS (post-norm) — alias them onto the post-norm slots
        if cfg.arch == "chameleon" and not cfg.pre_norm:
            src[b + "post_attention_norm.weight"] = src[b + "attn_norm.weight"]
            src[b + "post_ffw_norm.weight"] = src[b + "ffn_norm.weight"]
        up = src.get(b + "ffn_up.weight")
        if (
            up is not None
            and cfg.ffn_gated
            and b + "ffn_gate.weight" not in src
            and b + "ffn_gate_inp.weight" not in src
            and up.shape[0] == 2 * cfg.n_ff
        ):
            src[b + "ffn_gate.weight"] = _row_slice(up, 0, cfg.n_ff, b + "ffn_gate.weight")
            src[b + "ffn_up.weight"] = _row_slice(up, cfg.n_ff, 2 * cfg.n_ff, b + "ffn_up.weight")
    return src

# weights consumed as x @ W — GGUF stores (out, in) row-major, so transpose
_TRANSPOSED = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "shexp_gate", "shexp_up", "shexp_down", "shexp_gate_inp"}


def _orient(key: str, arr: np.ndarray) -> np.ndarray:
    """Put a GGUF-layout tensor into x @ W orientation for the forward pass."""
    if key in _TRANSPOSED or key == "moe_gate_inp":
        return np.ascontiguousarray(arr.T)
    if key.startswith("moe_") and arr.ndim == 3:  # (E, out, in) → (E, in, out)
        return np.ascontiguousarray(arr.transpose(0, 2, 1))
    return arr


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
    tensors = effective_tensors(reader, cfg)

    def fetch(name: str, transpose: bool, key: str = "") -> np.ndarray:
        t = tensors[name]
        arr = t.to_f32()
        if key:
            arr = _orient(key, arr)
        elif transpose:
            arr = arr.T
        return np.ascontiguousarray(arr, dtype=np.float32)

    params: dict = {}
    emb = fetch(EMBD, False)
    params["tok_emb"] = put(emb.astype(_np_dtype(dtype)), "tok_emb")
    params["out_norm"] = put(fetch(OUT_NORM, False), "out_norm")
    for pkey, pname in (
        ("out_norm_b", "output_norm.bias"),
        ("tok_norm", "token_embd_norm.weight"),
        ("tok_norm_b", "token_embd_norm.bias"),
        ("pos_emb", "position_embd.weight"),
        ("lm_head_b", "output.bias"),
    ):
        if pname in tensors:
            params[pkey] = put(fetch(pname, False), pkey)
    if OUTPUT in tensors:
        params["lm_head"] = put(fetch(OUTPUT, True).astype(_np_dtype(dtype)), "lm_head")
    else:  # tied embeddings
        params["lm_head"] = put(emb.T.astype(_np_dtype(dtype)).copy(), "lm_head")

    heads_l, kv_l = (_per_layer_counts(reader, cfg)
                     if (cfg.kv_expand or cfg.ragged_zero_fill) else (None, None))
    stacked: dict[str, list] = {}
    for i in range(cfg.n_layers):
        for key, gguf_name in _layer_names(i).items():
            if gguf_name not in tensors:
                stacked.setdefault(key, []).append(None)
                continue
            arr = fetch(gguf_name, key in _TRANSPOSED, key=key)
            if cfg.kv_expand and key in ("wk", "wv", "bk", "bv") and kv_l[i] > 0:
                arr = _expand_kv_heads(arr, key, heads_l[i] // kv_l[i], cfg.head_dim)
            if "norm" not in key:
                arr = arr.astype(_np_dtype(dtype))
            stacked.setdefault(key, []).append(arr)

    layers = {}
    for key, arrs in stacked.items():
        present = [a for a in arrs if a is not None]
        if not present:
            continue
        if len(present) != cfg.n_layers:
            if not cfg.ragged_zero_fill:
                raise ValueError(
                    f"{key}: found {len(present)} of {cfg.n_layers} layer tensors"
                )
            # attention-free / FFN-free layers (llm_build_deci): zero blocks
            proto = present[0]
            arrs = [a if a is not None else np.zeros_like(proto) for a in arrs]
        layers[key] = put(np.stack(_pad_ragged(arrs)), f"layers.{key}")
    params["layers"] = layers
    return params


def _per_layer_counts(reader, cfg: ModelConfig):
    """(heads, kv_heads) per layer — scalar metadata broadcasts."""
    from ..gguf.constants import Keys as _K

    def one(key, default):
        v = reader.get(key, arch=cfg.arch) if hasattr(reader, "get") else None
        if v is None:
            return [default] * cfg.n_layers
        if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0):
            return [int(x) for x in v]
        return [int(v)] * cfg.n_layers

    return (one(_K.Attention.HEAD_COUNT, cfg.n_heads),
            one(_K.Attention.HEAD_COUNT_KV, cfg.n_kv_heads))


def _expand_kv_heads(arr: np.ndarray, key: str, reps: int, head_dim: int) -> np.ndarray:
    """Replicate K/V heads ``reps``× — GQA → MHA, numerically exact
    (deci-style varying GQA ratios; llm_build_deci per-layer n_head_kv)."""
    if reps <= 1:
        return arr
    if key in ("wk", "wv"):  # oriented (D_in, nkv*Dh)
        D, NK = arr.shape
        a = arr.reshape(D, NK // head_dim, head_dim)
        return np.repeat(a, reps, axis=1).reshape(D, NK * reps)
    if key in ("bk", "bv"):  # (nkv*Dh,)
        a = arr.reshape(-1, head_dim)
        return np.repeat(a, reps, axis=0).reshape(-1)
    return arr


def _pad_ragged(arrs: list[np.ndarray]) -> list[np.ndarray]:
    """Zero-pad per-layer arrays to their elementwise-max shape.

    Ragged archs (openelm per-layer head counts / FFN widths; the
    reference keeps per-layer shapes, llm_build_openelm
    src/llama-model.cpp:12116) ride the uniform ``lax.scan`` layout with
    zero-padded extra heads/channels: zero K/V rows contribute nothing
    through zero wo columns, zero gate rows keep silu(0)·0 = 0, so the
    padded program is numerically exact."""
    shapes = {a.shape for a in arrs}
    if len(shapes) == 1:
        return arrs
    tgt = tuple(max(s[d] for s in shapes) for d in range(len(arrs[0].shape)))
    out = []
    for a in arrs:
        if a.shape == tgt:
            out.append(a)
        else:
            pad = [(0, t - s) for s, t in zip(a.shape, tgt)]
            out.append(np.pad(a, pad))
    return out


def _np_dtype(jdtype):
    # numpy handles ml_dtypes (bfloat16) natively via astype
    return jdtype


# -- quantized-on-device loading --------------------------------------------

# layer weights that flow through ops.quant_matmul.linear
_QUANTIZABLE = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                "shexp_gate", "shexp_up", "shexp_down")
# stacked-expert weights that flow through ops.quant_matmul.routed_quant_matmul
# (quantized-resident MoE: the capacity + bandwidth fix — a Mixtral-class
# model must NOT balloon to bf16 at load)
_MOE_QUANTIZABLE = ("moe_gate", "moe_up", "moe_down")


def _pack_int8_g16(raw: np.ndarray, ggml_type: GGMLType, shape, put,
                   fold_scales: bool | None = None) -> QuantTensor:
    """Unify any supported quant type to int8 values with group-16 scales.

    Used when layers of one weight mix quant types (e.g. Q4_K_M puts Q6_K on
    some ffn_down layers): values stay bit-exact, only the storage width is
    promoted so the stacked lax.scan layout stays homogeneous.

    ``fold_scales`` (k-quant types only — the caller guarantees every type
    in the mixed set folds, else the stacked planes would be heterogeneous)
    keeps int8 sub-scales + per-256 super-scale planes, harmonized to the
    same g=16 granularity."""
    from ..gguf.constants import GGML_BLOCK_SIZES, QK_K
    from ..ops.quant_matmul import _SCALE_PART_DECODERS

    if fold_scales is None:
        from ..ops import quant_matmul as _qmm

        fold_scales = _qmm.FOLD_KQ_SCALES and ggml_type in _SCALE_PART_DECODERS
    N, K = int(np.prod(shape[:-1])), int(shape[-1])
    blck, bsize = GGML_BLOCK_SIZES[ggml_type]
    blocks = raw.reshape(-1, bsize)
    q, s, m, g = _GRID_DECODERS[ggml_type](blocks)
    q = q.reshape(N, K)
    if fold_scales and ggml_type in _SCALE_PART_DECODERS and K % QK_K == 0:
        sc8, d, m8, dmin, gp = _SCALE_PART_DECODERS[ggml_type](blocks)
        sc8 = sc8.reshape(N, K // gp)
        m8 = (m8.reshape(N, K // gp) if m8 is not None
              else np.zeros_like(sc8))
        if gp != 16:
            sc8 = np.repeat(sc8, gp // 16, axis=1)
            m8 = np.repeat(m8, gp // 16, axis=1)
        # K/128-row super planes (see pack_gguf_tensor: 8-aligned DMA)
        d = np.repeat(d.reshape(N, K // QK_K), 2, axis=1)
        dmin = (np.repeat(dmin.reshape(N, K // QK_K), 2, axis=1)
                if dmin is not None else np.zeros_like(d))
        return QuantTensor(
            q=put(np.ascontiguousarray(q.T)),
            s=put(np.ascontiguousarray(sc8.T)),
            m=put(np.ascontiguousarray(m8.T)),
            fmt="int8", group=16, shape=(K, N),
            sd=put(np.ascontiguousarray(d.T, np.float32)),
            md=put(np.ascontiguousarray(dmin.T, np.float32)),
            sgroup=QK_K // 2,
        )
    s = s.reshape(N, K // g)
    m = m.reshape(N, K // g) if m is not None else np.zeros_like(s)
    if g != 16:
        s = np.repeat(s, g // 16, axis=1)
        m = np.repeat(m, g // 16, axis=1)
    return QuantTensor(
        q=put(np.ascontiguousarray(q.T)),
        s=put(np.ascontiguousarray(s.T, np.float32)),
        m=put(np.ascontiguousarray(m.T, np.float32)),
        fmt="int8",
        group=16,
        shape=(K, N),
    )


def _concat_weights(parts: list, keys: list[str]):
    """Concatenate stacked layer weights along the output dim — fuses
    multiple projections into one matmul (fewer kernel launches per decode
    step; the analog of the reference's fused wqkv fast path)."""
    if all(isinstance(p, QuantTensor) for p in parts):
        if (len({p.fmt for p in parts}) != 1
                and {p.fmt for p in parts} <= {"nib4c", "int8"}
                and len({p.shape[0] for p in parts}) == 1):
            # mixed 4-bit/int8 projections (the Q4_K_M disposition: Q6_K
            # attn_v next to Q4_K q/k): repack the packed-4-bit parts to
            # int8 (lossless) so the fused tensor is homogeneous and the
            # streamed megakernel stays eligible.  Only the fused qkv pays
            # the 2× byte cost (~11% of layer bytes); gate/up/down fuse
            # amongst themselves and stay 4-bit.
            from ..ops.quant_matmul import repack_nib4_to_int8

            parts = [repack_nib4_to_int8(p) if p.fmt == "nib4c" else p
                     for p in parts]
        if len({(p.fmt, p.shape[0]) for p in parts}) != 1:
            return None  # heterogeneous packing — keep separate
        folded = [p.sd is not None for p in parts]
        if any(folded) != all(folded) or len({p.sgroup for p in parts}) != 1:
            return None  # mixed plain/folded scale layouts — keep separate
        folded = folded[0]
        if len({p.group for p in parts}) != 1:
            # int8 groups harmonize by repeating coarser scale/min rows to
            # the finest group (values untouched — dequant is identical).
            # Costs scale-stream bytes on the repeated parts only; nib4
            # can't harmonize (its q rows are split-K packed per group).
            g_t = min(p.group for p in parts)
            if parts[0].fmt != "int8" or any(p.group % g_t for p in parts):
                return None
            parts = [
                p if p.group == g_t else QuantTensor(
                    q=p.q,
                    s=jnp.repeat(p.s, p.group // g_t, axis=-2),
                    m=(jnp.repeat(p.m, p.group // g_t, axis=-2)
                       if p.m is not None else None),
                    fmt=p.fmt, group=g_t, shape=p.shape,
                    sd=p.sd, md=p.md, sgroup=p.sgroup,
                )
                for p in parts
            ]
        has_m = [p.m is not None for p in parts]
        if any(has_m):
            ms = [
                p.m if p.m is not None else jnp.zeros_like(p.s) for p in parts
            ]
            m = jnp.concatenate(ms, axis=-1)
            # folded: a missing min plane zero-fills BOTH factors (m=0·md=0)
            md = (jnp.concatenate(
                [p.md if p.md is not None else jnp.zeros_like(p.sd)
                 for p in parts], axis=-1) if folded else None)
        else:
            m = md = None
        return QuantTensor(
            q=jnp.concatenate([p.q for p in parts], axis=-1),
            s=jnp.concatenate([p.s for p in parts], axis=-1),
            m=m,
            fmt=parts[0].fmt,
            group=parts[0].group,
            shape=(parts[0].shape[0], sum(p.shape[1] for p in parts)),
            sd=(jnp.concatenate([p.sd for p in parts], axis=-1)
                if folded else None),
            md=md,
            sgroup=parts[0].sgroup,
        )
    if all(not isinstance(p, QuantTensor) for p in parts):
        return jnp.concatenate(parts, axis=-1)
    return None


def fuse_projections(layers: dict) -> dict:
    """Fuse q/k/v → wqkv and gate/up → wgateup in a stacked layer dict.

    Skipped for layers with biases handled separately (biases fuse too)."""
    out = dict(layers)
    if "attn_sub_norm" in layers or "wq_scale" in layers:
        return out  # bitnet: per-projection scales/norms preclude fusion
    if all(k in layers for k in ("wq", "wk", "wv")):
        wq, wk, wv = layers["wq"], layers["wk"], layers["wv"]
        # mixed quant disposition (Q4_K_M: Q6_K attn_v next to Q4_K q/k,
        # int8 vs nib4c after packing): fusing all three would repack the
        # 4-bit parts to int8 (2× the streamed qkv bytes).  Fuse q|k only
        # and keep v separate — the streamed megakernel runs v as its own
        # window (split-v path) so q/k stream at native 4-bit width.
        # Biased models (qwen2) keep the full fuse: the kernel blocks on
        # biases anyway and one launch beats two on the scan path.
        qk_only = (
            all(isinstance(p, QuantTensor) for p in (wq, wk, wv))
            and wq.fmt == wk.fmt == "nib4c" and wv.fmt == "int8"
            and "bq" not in layers
        )
        if qk_only:
            fused = _concat_weights([wq, wk], ["wq", "wk"])
            if fused is not None:
                out["wqk_fused"] = fused
                for k in ("wq", "wk"):
                    del out[k]
        else:
            fused = _concat_weights([wq, wk, wv], ["wq", "wk", "wv"])
            if fused is not None:
                out["wqkv_fused"] = fused
                for k in ("wq", "wk", "wv"):
                    del out[k]
                if all(k in layers for k in ("bq", "bk", "bv")):
                    out["bqkv_fused"] = jnp.concatenate(
                        [layers["bq"], layers["bk"], layers["bv"]], axis=-1
                    )
                    for k in ("bq", "bk", "bv"):
                        del out[k]
    if "w_gate" in layers and "w_up" in layers and "moe_gate" not in layers:
        fused = _concat_weights([layers["w_gate"], layers["w_up"]], ["w_gate", "w_up"])
        if fused is not None and "b_up" not in layers and "b_gate" not in layers:
            out["wgateup_fused"] = fused
            del out["w_gate"]
            del out["w_up"]
    if "shexp_gate" in layers and "shexp_up" in layers:
        # shared expert (qwen2moe/deepseek): one launch for gate|up
        fused = _concat_weights([layers["shexp_gate"], layers["shexp_up"]],
                                ["shexp_gate", "shexp_up"])
        if fused is not None:
            out["shexp_gateup_fused"] = fused
            del out["shexp_gate"]
            del out["shexp_up"]
    return out


def _split_weight(w, sizes: list[int]):
    """Inverse of _concat_weights: slice the output dim back apart."""
    outs = []
    off = 0
    for n in sizes:
        if isinstance(w, QuantTensor):
            outs.append(QuantTensor(
                q=w.q[..., off : off + n],
                s=w.s[..., off : off + n],
                m=w.m[..., off : off + n] if w.m is not None else None,
                fmt=w.fmt, group=w.group, shape=(w.shape[0], n),
                sd=w.sd[..., off : off + n] if w.sd is not None else None,
                md=w.md[..., off : off + n] if w.md is not None else None,
                sgroup=w.sgroup,
            ))
        else:
            outs.append(w[..., off : off + n])
        off += n
    return outs


def unfuse_projections(layers: dict, cfg: ModelConfig) -> dict:
    """Split wqkv_fused / wgateup_fused back into per-projection weights
    (needed before attaching LoRA adapters, which target them by name)."""
    out = dict(layers)
    if "wqkv_fused" in out:
        Dq = cfg.n_heads * cfg.head_dim
        Dkv = cfg.n_kv_heads * cfg.head_dim
        out["wq"], out["wk"], out["wv"] = _split_weight(
            out.pop("wqkv_fused"), [Dq, Dkv, Dkv]
        )
        if "bqkv_fused" in out:
            b = out.pop("bqkv_fused")
            out["bq"], out["bk"], out["bv"] = (
                b[..., :Dq], b[..., Dq : Dq + Dkv], b[..., Dq + Dkv :]
            )
    if "wqk_fused" in out:
        Dq = cfg.n_heads * cfg.head_dim
        Dkv = cfg.n_kv_heads * cfg.head_dim
        out["wq"], out["wk"] = _split_weight(out.pop("wqk_fused"), [Dq, Dkv])
    if "wgateup_fused" in out:
        out["w_gate"], out["w_up"] = _split_weight(
            out.pop("wgateup_fused"), [cfg.n_ff, cfg.n_ff]
        )
    if "shexp_gateup_fused" in out:
        w = out.pop("shexp_gateup_fused")
        n = (w.shape[1] if isinstance(w, QuantTensor) else w.shape[-1]) // 2
        out["shexp_gate"], out["shexp_up"] = _split_weight(w, [n, n])
    return out


def load_llama_params_quantized(
    reader: GGUFReader | GGUFModelReader,
    cfg: ModelConfig,
    dtype=jnp.bfloat16,
    device_put_fn: Callable[[np.ndarray, str], jax.Array] | None = None,
    fuse: bool | None = None,
) -> dict:
    """Like :func:`load_llama_params` but keeps matmul weights block-
    quantized on device (fused dequant happens inside ops/quant_matmul).

    Embeddings/norms dequantize to ``dtype`` (gather needs materialized
    rows); unsupported tensor types fall back to dequantized arrays.
    ``fuse`` concatenates q/k/v and gate/up projections into single
    matmuls (default: on for single-device loads — sharded loads keep
    per-projection tensors so TP specs stay simple).
    """
    put_named = device_put_fn or (lambda arr, name: jnp.asarray(arr))
    qmm_ok = set(supported_qmm_types())
    tensors = effective_tensors(reader, cfg)

    params: dict = {}
    emb = tensors[EMBD].to_f32().astype(_np_dtype(dtype))
    params["tok_emb"] = put_named(emb, "tok_emb")
    params["out_norm"] = put_named(tensors[OUT_NORM].to_f32(), "out_norm")
    for pkey, pname in (
        ("out_norm_b", "output_norm.bias"),
        ("tok_norm", "token_embd_norm.weight"),
        ("tok_norm_b", "token_embd_norm.bias"),
        ("pos_emb", "position_embd.weight"),
        ("lm_head_b", "output.bias"),
    ):
        if pname in tensors:
            params[pkey] = put_named(tensors[pname].to_f32(), pkey)

    if OUTPUT in tensors:
        t = tensors[OUTPUT]
        if t.ggml_type in qmm_ok and t.shape[-1] % 32 == 0:
            # k-quant heads fold by default: the decode-shape streamed GEMV
            # kernel consumes folded planes natively (−12% head bytes/token
            # on a Q6_K head); prefill (M > 8) takes the XLA dequant-dot,
            # where the unfold fuses
            qt = pack_gguf_tensor(np.asarray(t.data), t.ggml_type, t.shape)
            if qt.shape[1] >= 8192 and qt.shape[1] % 2048:
                # zero-pad the vocab dim so the Pallas kernel gets wide N
                # tiles (measured +70% head bandwidth at 128256 vocab)
                from ..ops.quant_matmul import pad_qt_n

                qt = pad_qt_n(qt)
            params["lm_head"] = _put_qt(qt, "lm_head", put_named)
        else:
            arr = np.ascontiguousarray(t.to_f32().T).astype(_np_dtype(dtype))
            params["lm_head"] = put_named(arr, "lm_head")
    else:
        params["lm_head"] = put_named(emb.T.copy(), "lm_head")

    # group layer tensors by logical name, detect heterogeneous quant types
    heads_l, kv_l = (_per_layer_counts(reader, cfg)
                     if (cfg.kv_expand or cfg.ragged_zero_fill) else (None, None))
    layers: dict = {}
    # one fold decision per MODEL: the streamed kernel requires every
    # projection to share one scale layout (folded int8 sub-planes vs
    # plain f32), and folded layouts only stream when each K's chunk keeps
    # the super-scale DMA 8-sublane aligned (quant_matmul._fold_streams —
    # llama-2's 11008 FFN fails it).  One non-foldable or non-k-quant
    # projection therefore keeps the whole model on plain scale planes.
    from ..ops import quant_matmul as _qmm

    fold_model = _qmm.FOLD_KQ_SCALES
    for key in list(_layer_names(0)):
        per_layer = [_layer_names(i)[key] for i in range(cfg.n_layers)]
        infos = [tensors[n] for n in per_layer if n in tensors]
        if (not infos or key not in _QUANTIZABLE
                or len(infos[0].shape) != 2
                or len({t.shape for t in infos}) > 1):
            continue
        for t in infos:
            if not (t.ggml_type in _qmm._SCALE_PART_DECODERS
                    and _qmm._fold_streams(int(t.shape[-1]), t.ggml_type)):
                fold_model = False
    for key in list(_layer_names(0)):
        per_layer = [_layer_names(i)[key] for i in range(cfg.n_layers)]
        names = [n for n in per_layer if n in tensors]
        if not names:
            continue
        missing = len(names) != cfg.n_layers
        if missing and not cfg.ragged_zero_fill:
            raise ValueError(f"{key}: found {len(names)}/{cfg.n_layers} tensors")
        infos = [tensors.get(n) for n in per_layer] if missing else [tensors[n] for n in names]
        types = {t.ggml_type for t in infos if t is not None}
        # ragged per-layer shapes (openelm/deci): zero-pad on the f32 path —
        # the packed nib4 split-K layout can't be row-padded in place
        ragged = (len({t.shape for t in infos if t is not None}) > 1
                  or missing
                  or (cfg.kv_expand and key in ("wk", "wv", "bk", "bv")))
        first = next(t for t in infos if t is not None)
        quantizable_2d = key in _QUANTIZABLE and len(first.shape) == 2
        quantizable_moe = key in _MOE_QUANTIZABLE and len(first.shape) == 3
        if (
            (quantizable_2d or quantizable_moe)
            and not ragged
            and types <= qmm_ok
            and first.shape[-1] % 32 == 0
        ):
            if quantizable_moe:
                # pad the expert-FF dim to the streamed chunk grid (512):
                # gate/up out-dim and down in-dim round to the same EFp, so
                # the FFN stays consistent; pad slices dequant to exact
                # zeros (see pack_gguf_experts)
                pad = dict(pad_n=key in ("moe_gate", "moe_up"),
                           pad_k=key == "moe_down")
                if len(types) == 1:
                    qts = [
                        pack_gguf_experts(np.asarray(t.data), t.ggml_type,
                                          t.shape, **pad)
                        for t in infos
                    ]
                else:  # mixed types across layers: unify to int8/g16
                    qts = [
                        pack_experts_int8_g16(np.asarray(t.data), t.ggml_type,
                                              t.shape, **pad)
                        for t in infos
                    ]
            elif len(types) == 1:
                qts = [
                    pack_gguf_tensor(np.asarray(t.data), t.ggml_type, t.shape,
                                     fold_scales=fold_model)
                    for t in infos
                ]
            else:  # mixed types (e.g. Q4_K_M): unify to int8/g16
                qts = [
                    _pack_int8_g16(np.asarray(t.data), t.ggml_type, t.shape,
                                   jnp.asarray, fold_scales=fold_model)
                    for t in infos
                ]
            proto = qts[0]
            stacked = QuantTensor(
                q=jnp.stack([qt.q for qt in qts]),
                s=jnp.stack([qt.s for qt in qts]),
                m=jnp.stack([qt.m for qt in qts]) if proto.m is not None else None,
                fmt=proto.fmt,
                group=proto.group,
                shape=proto.shape,
                sd=(jnp.stack([qt.sd for qt in qts])
                    if proto.sd is not None else None),
                md=(jnp.stack([qt.md for qt in qts])
                    if proto.md is not None else None),
                sgroup=proto.sgroup,
            )
            layers[key] = _put_qt(stacked, f"layers.{key}", put_named)
        else:
            arrs = []
            for i, t in enumerate(infos):
                if t is None:
                    arrs.append(None)
                    continue
                arr = _orient(key, t.to_f32())
                if cfg.kv_expand and key in ("wk", "wv", "bk", "bv") and kv_l[i] > 0:
                    arr = _expand_kv_heads(arr, key, heads_l[i] // kv_l[i], cfg.head_dim)
                if "norm" not in key:
                    arr = arr.astype(_np_dtype(dtype))
                arrs.append(arr)
            present = [a for a in arrs if a is not None]
            arrs = [a if a is not None else np.zeros_like(present[0]) for a in arrs]
            layers[key] = put_named(np.stack(_pad_ragged(arrs)), f"layers.{key}")
    if fuse is None:
        # sharding loaders place per-projection shards (fusion would break
        # their pspecs); progress-only wrappers mark keep_fused
        fuse = device_put_fn is None or getattr(device_put_fn, "keep_fused", False)
    if fuse:
        layers = fuse_projections(layers)
    params["layers"] = layers
    return params


def _put_qt(qt: QuantTensor, logical: str, put_named) -> QuantTensor:
    """Route QuantTensor components through the (sharding) placement fn."""
    return QuantTensor(
        q=put_named(np.asarray(qt.q), f"{logical}.q"),
        s=put_named(np.asarray(qt.s), f"{logical}.s"),
        m=put_named(np.asarray(qt.m), f"{logical}.m") if qt.m is not None else None,
        fmt=qt.fmt,
        group=qt.group,
        shape=qt.shape,
        sd=(put_named(np.asarray(qt.sd), f"{logical}.sd")
            if qt.sd is not None else None),
        md=(put_named(np.asarray(qt.md), f"{logical}.md")
            if qt.md is not None else None),
        sgroup=qt.sgroup,
    )


def check_params_finite(params) -> None:
    """--check-tensors analog (reference llama_model_loader check_tensors:
    validate tensor data while loading).  Raises ValueError naming the
    first non-finite float tensor; quantized tensors validate their
    scale/min planes (the payload ints are finite by construction)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.quant_matmul import QuantTensor

    def leaf_arrays(path, leaf):
        if isinstance(leaf, QuantTensor):
            out = [(path + ".s", leaf.s)]
            if leaf.m is not None:
                out.append((path + ".m", leaf.m))
            return out
        if hasattr(leaf, "dtype") and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            return [(path, leaf)]
        return []

    flat, _ = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QuantTensor))
    for key_path, leaf in flat:
        name = jax.tree_util.keystr(key_path)
        for sub, arr in leaf_arrays(name, leaf):
            if not bool(jnp.isfinite(arr).all()):
                bad = int(np.argmax(~np.asarray(jnp.isfinite(arr).reshape(-1))))
                raise ValueError(
                    f"--check-tensors: non-finite value in {sub} "
                    f"(flat index {bad})")
