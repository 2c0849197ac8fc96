"""Quantized weights on device + fused dequant-matmul.

The TPU-native analog of the reference fork's fused dequant+GEMM HIP
kernels (``docs/gfx906/implementation_guide.md:12-287`` — V_DOT4_I32_I8
per quant type, tiled LDS GEMM): weights stay block-quantized in HBM and
are dequantized on the VPU inside the matmul kernel, so HBM traffic per
token is the *quantized* byte count.  Decode is bandwidth-bound, so this
is the core speedup over a bf16-dequantized load.

Device layout (decoded exactly from the GGUF block bytes — bit-identical
values to the reference's dequant, so perplexity parity is preserved):

- ``int8``  : q int8 (K, N);          w[k,n] = q[k,n]·s[k//g, n] − m[k//g, n]
- ``nib4``  : packed uint8 (K/2, N):  low nibble = k even, high = k odd
              (two half-K planes — no interleave needed in-kernel)

with per-group scales ``s`` (K/g, N) f32 and optional subtractive ``m``
(asymmetric formats; for Q4_0 the −8 offset folds into m = 8·s).

The matmul computes  out = x @ w  =  Σ_g s_g ⊙ (x_g @ q_g) − xsum_g ⊙ m_g,
realized as in-kernel dequant → MXU dot per (TM, TN, TK) tile.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGML_BLOCK_SIZES, QK_K, GGMLType
from ..gguf import quants as Q

# ---------------------------------------------------------------------------
# QuantTensor pytree
# ---------------------------------------------------------------------------


@dataclass
class QuantTensor:
    """Block-quantized weight resident on device, used as ``x @ qt``.

    Two scale representations:

    - plain (``sd is None``): ``s``/``m`` are f32 per-group planes and
      dequant is ``q·s − m`` (repeat per ``group`` along K);
    - folded (``sd is not None``): the k-quant superblock structure is
      kept on device — ``s``/``m`` are **int8** sub-scale planes and
      ``sd``/``md`` are f32 per-superblock (``K/sgroup`` rows) planes,
      with group-scale = ``s · repeat(sd)`` (exact: the GGUF sub-scales
      are ≤8-bit ints and ``d`` is f16-valued, so the f32 product is the
      same f32 the plain path stores).  Folding cuts the decode scale
      stream ~4× (int8 + 1/16th-rate f32 instead of f32 per group) —
      the ggml analog is reading ``block_q4_K.scales`` raw instead of
      expanding to float (reference `ggml/src/ggml-quants.c` dequant).
    """

    q: jnp.ndarray  # int8 (K, N) or uint8 (K/2, N) packed nibbles
    s: jnp.ndarray  # f32 (K/g, N) scales — int8 sub-scales when folded
    m: jnp.ndarray | None  # f32 (K/g, N) subtractive term, or None
    fmt: str  # "int8" | "nib4" | "nib4c"
    group: int  # quant group size g along K
    shape: tuple[int, int]  # logical (K, N)
    sd: jnp.ndarray | None = None  # folded: f32 (K/sgroup, N) super-scales
    md: jnp.ndarray | None = None  # folded: f32 (K/sgroup, N) min super-scales
    sgroup: int = 0  # folded: K elements per super-row (QK_K = 256)
    xla_only: bool = False  # GSPMD-sharded weights (tensor parallelism):
    # route every matmul through the XLA dequant-dot, which GSPMD
    # partitions natively; Pallas kernels/megakernels are single-device
    # programs and would force an all-gather if XLA saw their custom call

    @property
    def K(self) -> int:
        return self.shape[0]

    @property
    def N(self) -> int:
        return self.shape[1]


jax.tree_util.register_dataclass(
    QuantTensor,
    data_fields=["q", "s", "m", "sd", "md"],
    meta_fields=["fmt", "group", "shape", "sgroup", "xla_only"],
)


def mark_xla_only(params):
    """Tag every QuantTensor in a param pytree ``xla_only`` — applied by
    the tensor-parallel loader after sharded placement (see the field's
    comment).  The analog of the reference's ROW-split buffer type
    decision at load (`llama-model.cpp:1911`), inverted: the kernel
    choice follows the placement."""
    import dataclasses

    def mark(t):
        return (dataclasses.replace(t, xla_only=True)
                if isinstance(t, QuantTensor) else t)

    return jax.tree_util.tree_map(
        mark, params, is_leaf=lambda x: isinstance(x, QuantTensor))


def unfold_qt(qt: QuantTensor) -> QuantTensor:
    """Expand a folded QuantTensor's scales back to plain f32 planes.

    Exact (see QuantTensor docstring).  Used by consumers that predate
    the folded layout; inside a jit the expansion fuses into the dequant
    consumer, outside it materializes the f32 planes."""
    if qt.sd is None:
        return qt
    rep = qt.sgroup // qt.group
    ax = qt.s.ndim - 2  # group axis (works for stacked (L, K/g, N) too)
    s = qt.s.astype(jnp.float32) * jnp.repeat(qt.sd, rep, axis=ax)
    m = (qt.m.astype(jnp.float32) * jnp.repeat(qt.md, rep, axis=ax)
         if qt.m is not None else None)
    return QuantTensor(q=qt.q, s=s, m=m, fmt=qt.fmt, group=qt.group,
                       shape=qt.shape)


# ---------------------------------------------------------------------------
# Host-side decode: GGUF raw blocks → (values, scales, mins) grids
# ---------------------------------------------------------------------------
# Each decoder takes (nblocks, block_bytes) uint8 for rows of a tensor laid
# out GGUF-style (quantized along the last/contiguous axis) and returns
#   values int8 (n, blck), scales f32 (n, blck//g), mins or None
# such that dequant == values*repeat(scales) - repeat(mins).  These reuse the
# bit-layout logic of gguf/quants.py and are tested against it exactly.


def _grid_q8_0(b):
    d = Q._f16(b[:, 0:2])
    q = b[:, 2:34].copy().view(np.int8)
    return q, d, None, 32


def _grid_q4_0(b):
    d = Q._f16(b[:, 0:2])
    lo, hi = b[:, 2:18] & 0x0F, b[:, 2:18] >> 4
    q = np.concatenate([lo, hi], 1).astype(np.int8)
    return q, d, 8.0 * d, 32


def _grid_q4_1(b):
    d = Q._f16(b[:, 0:2])
    mn = Q._f16(b[:, 2:4])
    lo, hi = b[:, 4:20] & 0x0F, b[:, 4:20] >> 4
    q = np.concatenate([lo, hi], 1).astype(np.int8)
    return q, d, -mn, 32


def _grid_q5_0(b):
    d = Q._f16(b[:, 0:2])
    hbit = Q._qh_bits(b[:, 2:6])
    lo, hi = b[:, 6:22] & 0x0F, b[:, 6:22] >> 4
    q = (np.concatenate([lo, hi], 1) | (hbit << 4)).astype(np.int16) - 16
    return q.astype(np.int8), d, None, 32


def _grid_q5_1(b):
    d = Q._f16(b[:, 0:2])
    mn = Q._f16(b[:, 2:4])
    hbit = Q._qh_bits(b[:, 4:8])
    lo, hi = b[:, 8:24] & 0x0F, b[:, 8:24] >> 4
    q = (np.concatenate([lo, hi], 1) | (hbit << 4)).astype(np.int8)
    return q, d, -mn, 32


def _grid_q4_k(b):
    d = Q._f16(b[:, 0:2])
    dmin = Q._f16(b[:, 2:4])
    sc, m = Q._unpack_k4_scales(b[:, 4:16])
    qs = b[:, 16:144]
    n = b.shape[0]
    q = np.empty((n, QK_K), np.int8)
    for j in range(4):
        byte = qs[:, 32 * j : 32 * (j + 1)]
        q[:, 64 * j : 64 * j + 32] = (byte & 0x0F).astype(np.int8)
        q[:, 64 * j + 32 : 64 * (j + 1)] = (byte >> 4).astype(np.int8)
    scales = d * sc.astype(np.float32)  # (n, 8) per 32 elems
    mins = dmin * m.astype(np.float32)
    return q, scales, mins, 32


def _grid_q5_k(b):
    d = Q._f16(b[:, 0:2])
    dmin = Q._f16(b[:, 2:4])
    sc, m = Q._unpack_k4_scales(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    n = b.shape[0]
    q = np.empty((n, QK_K), np.int8)
    for j in range(4):
        byte = qs[:, 32 * j : 32 * (j + 1)]
        h1 = ((qh >> (2 * j)) & 1) << 4
        h2 = ((qh >> (2 * j + 1)) & 1) << 4
        q[:, 64 * j : 64 * j + 32] = ((byte & 0x0F) | h1).astype(np.int8)
        q[:, 64 * j + 32 : 64 * (j + 1)] = ((byte >> 4) | h2).astype(np.int8)
    return q, d * sc.astype(np.float32), dmin * m.astype(np.float32), 32


def _grid_q6_k(b):
    n = b.shape[0]
    ql, qh = b[:, 0:128], b[:, 128:192]
    sc = b[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = Q._f16(b[:, 208:210])
    q = np.empty((n, QK_K), np.int8)
    for half in range(2):
        lq = ql[:, 64 * half : 64 * half + 64]
        hq = qh[:, 32 * half : 32 * half + 32]
        q[:, 128 * half : 128 * half + 32] = (
            ((lq[:, :32] & 0x0F) | (((hq >> 0) & 3) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        q[:, 128 * half + 32 : 128 * half + 64] = (
            ((lq[:, 32:] & 0x0F) | (((hq >> 2) & 3) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        q[:, 128 * half + 64 : 128 * half + 96] = (
            ((lq[:, :32] >> 4) | (((hq >> 4) & 3) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        q[:, 128 * half + 96 : 128 * half + 128] = (
            ((lq[:, 32:] >> 4) | (((hq >> 6) & 3) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
    return q, d * sc, None, 16


def _grid_q3_k(b):
    n = b.shape[0]
    hmask, qs = b[:, 0:32], b[:, 32:96]
    sc = Q._unpack_q3k_scales(b[:, 96:108]).astype(np.float32)
    d = Q._f16(b[:, 108:110])
    q = np.empty((n, QK_K), np.int8)
    for half in range(2):
        byte = qs[:, 32 * half : 32 * half + 32]
        for j in range(4):
            bit = 4 * half + j
            q2 = ((byte >> (2 * j)) & 3).astype(np.int16)
            hi = ((hmask >> bit) & 1).astype(np.int16)
            q[:, 128 * half + 32 * j : 128 * half + 32 * (j + 1)] = (
                q2 - np.where(hi != 0, 0, 4)
            ).astype(np.int8)
    return q, d * sc, None, 16


def _grid_q2_k(b):
    n = b.shape[0]
    scales, qs = b[:, 0:16], b[:, 16:80]
    d = Q._f16(b[:, 80:82])
    dmin = Q._f16(b[:, 82:84])
    q = np.empty((n, QK_K), np.int8)
    for half in range(2):
        byte = qs[:, 32 * half : 32 * half + 32]
        for j in range(4):
            q[:, 128 * half + 32 * j : 128 * half + 32 * (j + 1)] = (
                (byte >> (2 * j)) & 3
            ).astype(np.int8)
    return q, d * (scales & 0x0F).astype(np.float32), dmin * (scales >> 4).astype(np.float32), 16


def _grid_mxfp4(b):
    e = b[:, 0:1].astype(np.int32)
    s = np.exp2((e - 127).astype(np.float32) - 1.0)
    lo, hi = b[:, 1:17] & 0x0F, b[:, 1:17] >> 4
    q = Q.MXFP4_KVALUES[np.concatenate([lo, hi], 1)].astype(np.int8)
    return q, s, None, 32


def _grid_iq4_nl(b):
    d = Q._f16(b[:, 0:2])
    lo, hi = b[:, 2:18] & 0x0F, b[:, 2:18] >> 4
    q = Q.IQ4_NL_KVALUES[np.concatenate([lo, hi], 1)].astype(np.int8)
    return q, d, None, 32


_GRID_DECODERS = {
    GGMLType.Q8_0: _grid_q8_0,
    GGMLType.Q4_0: _grid_q4_0,
    GGMLType.Q4_1: _grid_q4_1,
    GGMLType.Q5_0: _grid_q5_0,
    GGMLType.Q5_1: _grid_q5_1,
    GGMLType.Q4_K: _grid_q4_k,
    GGMLType.Q5_K: _grid_q5_k,
    GGMLType.Q6_K: _grid_q6_k,
    GGMLType.Q3_K: _grid_q3_k,
    GGMLType.Q2_K: _grid_q2_k,
    GGMLType.MXFP4: _grid_mxfp4,
    GGMLType.IQ4_NL: _grid_iq4_nl,
}

# formats whose values fit unsigned nibbles → can stay 4-bit packed on device
_NIB4_TYPES = {GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K}

# chunk-local BIASED 4-bit packing ("nib4c"): within each TK-row kernel
# chunk, logical row k pairs with k + TK/2 in one byte, stored XOR 0x80:
#
#     byte b = (lo | hi<<4) ^ 0x80   ⇒   int8(b) = lo + 16·hi − 128
#
# Every streamed chunk needs only CONTIGUOUS slices of q, scales and x
# (unlike the legacy split-K packing), and the bias makes the packed
# byte DIRECTLY usable as a signed bf16 value: the kernels dot the raw
# bytes on the MXU and recover the hi-plane dot by difference
#     y_hi = (x·b − x·lo + 128·Σx) / 16
# with the lo plane a single int8 mask away (b & 0x0F is bias-invariant).
# Measured on the 8B lm_head shape this streams packed bytes at ~693 GB/s
# — the int8 kernel's byte rate at HALF the bytes per weight
# (scripts/exp_nib4.py, variant nib4xi8).  TK must match between pack
# time and kernel, so it is a pure function of K.  The top cap bounds the
# streamed chunk (packed bytes per DMA = CK/2 · TN); LCG_NIB4C_CK tunes
# it — bigger chunks amortize DMA issue overhead in the megakernel.
# default 2048: measured 462 GB/s packed through the streamed megakernel
# vs 392 at 1024 (DMA-issue amortization); 4096 blew the compile budget
_NIB4C_CAPS = tuple(
    c for c in (4096, 2048, 1024, 512, 256)
    if c <= int(os.environ.get("LCG_NIB4C_CK", "2048")))


def nib4c_chunk(K: int) -> int | None:
    """Chunk size (logical K rows) of the chunk-local 4-bit packing."""
    return next((t for t in _NIB4C_CAPS if K % t == 0), None)


def _pack_nib4c(qT: np.ndarray, ck: int) -> np.ndarray:
    """(K, N) uint8 nibble values → (K/2, N) chunk-local biased int8."""
    K, N = qT.shape
    v = qT.reshape(K // ck, 2, ck // 2, N)
    return np.ascontiguousarray(
        ((v[:, 0] | (v[:, 1] << 4)) ^ 0x80).reshape(K // 2, N).view(np.int8))


def _unpack4_jnp(q, fmt: str, K: int):
    """Packed nibble planes → int8 values in logical row order (any lead
    dims).  Oracle/fallback path; in-kernel unpack lives in the kernels."""
    p32 = q.astype(jnp.int32) & 255
    if fmt == "nib4c":
        p32 = p32 ^ 0x80  # undo the bias (flips bit 7 only)
    lo = (p32 & 0x0F).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    lead = q.shape[:-2]
    N = q.shape[-1]
    if fmt == "nib4":
        return jnp.concatenate([lo, hi], axis=-2)
    ck = nib4c_chunk(K)
    sh = (*lead, K // ck, ck // 2, N)
    return jnp.concatenate([lo.reshape(sh), hi.reshape(sh)],
                           axis=-2).reshape(*lead, K, N)


def supported_qmm_types() -> list[GGMLType]:
    return sorted(_GRID_DECODERS)


def pack_gguf_experts(
    raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, int, int],
    put=jnp.asarray, pad_k: bool = False, pad_n: bool = False,
) -> QuantTensor:
    """Decode a stacked-expert GGUF tensor (E, N, K) into a QuantTensor whose
    leaves carry a leading expert axis: q (E, K, N) int8 or (E, K/2, N)
    chunk-local 4-bit (nib4c) packed, s/m (E, K/g, N).

    This is the storage side of the ``ggml_mul_mat_id`` analog (reference
    ``build_moe_ffn``, src/llama-graph.cpp:776-1024): experts stay
    block-quantized in HBM; decode gathers only the selected slices —
    inside the MoE megakernel (ops/decode_stream, expert ids resolved
    in-kernel) or via the XLA quantized gather.

    ``pad_k``/``pad_n`` zero-pad that dim up to a multiple of 512 so every
    expert slice factors into the streamed chunk grid (512-row nib4c
    chunks, ≥512-lane windows).  The loader pads the expert-FF dim only
    (gate/up ``pad_n``, down ``pad_k`` — consistent by construction since
    both round the same EF up): pad rows/cols carry zero scales (and
    mins), so dequantized values are exactly zero — gate/up emit zero
    activations on pad lanes, down consumes zero rows — numerically
    exact.  Expert FF dims like qwen's 1408 otherwise force 128-lane
    tiles (narrow DMA).  The model dim stays untouched (it feeds/receives
    the residual stream).
    """
    E, N, K = int(shape[0]), int(shape[1]), int(shape[2])
    ggml_type = GGMLType(ggml_type)
    blck, bsize = GGML_BLOCK_SIZES[ggml_type]
    q, s, m, g = _GRID_DECODERS[ggml_type](raw.reshape(-1, bsize))
    q = q.reshape(E, N, K).transpose(0, 2, 1)  # (E, K, N)
    s = s.reshape(E, N, K // g).transpose(0, 2, 1)
    m = m.reshape(E, N, K // g).transpose(0, 2, 1) if m is not None else None

    Kp = -(-K // 512) * 512 if pad_k else K
    Np = -(-N // 512) * 512 if pad_n else N
    if (Kp, Np) != (K, N):
        pk, pn = Kp - K, Np - N
        q = np.pad(q, ((0, 0), (0, pk), (0, pn)))
        s = np.pad(s, ((0, 0), (0, pk // g), (0, pn)))
        if m is not None:
            m = np.pad(m, ((0, 0), (0, pk // g), (0, pn)))
        K, N = Kp, Np

    is4 = ggml_type in _NIB4_TYPES and K % (2 * g) == 0
    ck = nib4c_chunk(K) if is4 else None
    if is4 and ck is not None and ck % (2 * g) == 0:
        qu = q.astype(np.uint8).reshape(E * K, N)
        packed = _pack_nib4c(qu, ck).reshape(E, K // 2, N)
        return QuantTensor(
            q=put(np.ascontiguousarray(packed)),
            s=put(np.ascontiguousarray(s, np.float32)),
            m=put(np.ascontiguousarray(m, np.float32)) if m is not None else None,
            fmt="nib4c",
            group=g,
            shape=(K, N),
        )
    if is4:
        qu = q.astype(np.uint8)
        packed = (qu[:, : K // 2] | (qu[:, K // 2 :] << 4)).view(np.int8)
        return QuantTensor(
            q=put(np.ascontiguousarray(packed)),
            s=put(np.ascontiguousarray(s, np.float32)),
            m=put(np.ascontiguousarray(m, np.float32)) if m is not None else None,
            fmt="nib4",
            group=g,
            shape=(K, N),
        )
    return QuantTensor(
        q=put(np.ascontiguousarray(q)),
        s=put(np.ascontiguousarray(s, np.float32)),
        m=put(np.ascontiguousarray(m, np.float32)) if m is not None else None,
        fmt="int8",
        group=g,
        shape=(K, N),
    )


def pack_experts_int8_g16(
    raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, int, int],
    put=jnp.asarray, pad_k: bool = False, pad_n: bool = False,
) -> QuantTensor:
    """Stacked-expert analog of ``_pack_int8_g16`` (runtime/weights.py):
    unify mixed per-layer quant types to int8 values + group-16 scales so
    stacked ``lax.scan`` layouts stay homogeneous."""
    E, N, K = int(shape[0]), int(shape[1]), int(shape[2])
    blck, bsize = GGML_BLOCK_SIZES[GGMLType(ggml_type)]
    q, s, m, g = _GRID_DECODERS[GGMLType(ggml_type)](raw.reshape(-1, bsize))
    q = q.reshape(E, N, K).transpose(0, 2, 1)
    s = s.reshape(E, N, K // g).transpose(0, 2, 1)
    m = (
        m.reshape(E, N, K // g).transpose(0, 2, 1)
        if m is not None
        else np.zeros_like(s)
    )
    if g != 16:
        s = np.repeat(s, g // 16, axis=1)
        m = np.repeat(m, g // 16, axis=1)
    # pad to the streamed chunk grid like pack_gguf_experts (zero scales
    # keep pad rows/cols dequant-exact zeros)
    Kp = -(-K // 512) * 512 if pad_k else K
    Np = -(-N // 512) * 512 if pad_n else N
    if (Kp, Np) != (K, N):
        pk, pn = Kp - K, Np - N
        q = np.pad(q, ((0, 0), (0, pk), (0, pn)))
        s = np.pad(s, ((0, 0), (0, pk // 16), (0, pn)))
        m = np.pad(m, ((0, 0), (0, pk // 16), (0, pn)))
        K, N = Kp, Np
    return QuantTensor(
        q=put(np.ascontiguousarray(q)),
        s=put(np.ascontiguousarray(s, np.float32)),
        m=put(np.ascontiguousarray(m, np.float32)),
        fmt="int8",
        group=16,
        shape=(K, N),
    )


# k-quant scale-part re-parsers: (sc int8, d f32/block, m int8|None,
# dmin f32/block|None, g).  Only the 12-16 scale bytes per 256-weight
# block are re-read; the q unpacking stays with the main decoder.
# Folding stores these RAW superblock parts on device instead of the
# f32 per-group product — exact (see QuantTensor docstring).


def _parts_q4_k(b):
    d, dmin = Q._f16(b[:, 0:2]), Q._f16(b[:, 2:4])
    sc, m = Q._unpack_k4_scales(b[:, 4:16])
    return sc.astype(np.int8), d, m.astype(np.int8), dmin, 32


def _parts_q5_k(b):
    return _parts_q4_k(b)  # same scale header layout


def _parts_q6_k(b):
    sc = b[:, 192:208].copy().view(np.int8)
    return sc, Q._f16(b[:, 208:210]), None, None, 16


def _parts_q3_k(b):
    sc = Q._unpack_q3k_scales(b[:, 96:108]).astype(np.int8)
    return sc, Q._f16(b[:, 108:110]), None, None, 16


def _parts_q2_k(b):
    scales = b[:, 0:16]
    d, dmin = Q._f16(b[:, 80:82]), Q._f16(b[:, 82:84])
    return ((scales & 0x0F).astype(np.int8), d,
            (scales >> 4).astype(np.int8), dmin, 16)


_SCALE_PART_DECODERS = {
    GGMLType.Q4_K: _parts_q4_k,
    GGMLType.Q5_K: _parts_q5_k,
    GGMLType.Q6_K: _parts_q6_k,
    GGMLType.Q3_K: _parts_q3_k,
    GGMLType.Q2_K: _parts_q2_k,
}


# process-wide default for k-quant scale folding at pack time.  The RAW
# pack function defaults off (oracle/tooling paths expect plain f32
# scale planes); the PRODUCT loaders (Engine.from_gguf, llama-server)
# default it ON since round 4 — the streamed megakernel + GEMV kernel
# consume folded scales natively in int8 and nib4c, and every other
# path unfolds inline in XLA, exactly.  LCG_KQ_FOLD=1 forces on
# process-wide; Engine.from_gguf(kq_fold=False) / LCG_KQ_FOLD=0 opt the
# loaders out.
FOLD_KQ_SCALES = os.environ.get("LCG_KQ_FOLD", "0") == "1"
LOADER_KQ_FOLD_DEFAULT = os.environ.get("LCG_KQ_FOLD", "1") == "1"


def _fold_streams(K: int, ggml_type) -> bool:
    """True when a folded (int8 sub-scale + per-128 f32 super-plane)
    layout of a K-row weight still dispatches to the streamed kernels.

    Mirrors decode_stream._stream_qt / _gemv_tiles: the super-scale DMA
    chunk is (TK/128, TN) and Mosaic needs its sublane offset 8-aligned,
    so either the K-chunk covers the whole plane (TK == K) or
    TK/128 ≡ 0 (mod 8) → TK a 1024-multiple."""
    if ggml_type in _NIB4_TYPES:
        ck = nib4c_chunk(K)
        return ck is not None and (ck == K or (ck // 128) % 8 == 0)
    tk = next((t for t in (1024, 512, 256) if K % t == 0), None)
    return tk is not None and (tk == K or tk % 1024 == 0)


def pack_gguf_tensor(
    raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...], put=jnp.asarray,
    fold_scales: bool | None = None,
) -> QuantTensor:
    """Decode GGUF block bytes of a (N, K) weight into a device QuantTensor.

    GGUF stores weights (out=N, in=K) row-major with K contiguous; the
    matmul consumes (K, N), so grids are transposed here on the host.

    ``fold_scales`` keeps the k-quant superblock scale structure on device
    (int8 sub-scales + per-256 f32 d) instead of expanding to f32 per
    group — exactly the same dequantized values, ~4× fewer scale bytes to
    stream at decode.  Non-k-quant types ignore the flag.
    """
    N, K = int(np.prod(shape[:-1])), int(shape[-1])
    ggml_type = GGMLType(ggml_type)
    if fold_scales is None:
        # fold only when the folded layout can actually STREAM: the decode
        # kernels DMA (TK/128, TN) super-scale chunks whose HBM sublane
        # offsets must be 8-aligned, i.e. TK a 1024-multiple or a single
        # full-K chunk.  K like llama-2's 11008 (chunk 512) would fold
        # into a layout every kernel rejects — and then silently ride the
        # scan path; keep such tensors on plain f32 scale planes instead.
        fold_scales = FOLD_KQ_SCALES and _fold_streams(K, ggml_type)
    blck, bsize = GGML_BLOCK_SIZES[ggml_type]
    decode = _GRID_DECODERS[ggml_type]
    blocks = raw.reshape(-1, bsize)
    q, s, m, g = decode(blocks)
    # (N*K/blck, blck) → (N, K); scales (N*K/blck, blck/g) → (N, K/g)
    q = q.reshape(N, K)
    s = s.reshape(N, K // g)
    m = m.reshape(N, K // g) if m is not None else None
    fold = None
    if fold_scales and ggml_type in _SCALE_PART_DECODERS and K % QK_K == 0:
        sc8, d, m8, dmin, gp = _SCALE_PART_DECODERS[ggml_type](blocks)
        assert gp == g
        # super-scale planes are stored at K/128 rows (each per-256 d row
        # repeated 2x): the streamed kernel DMAs (TK/128, TN) chunks whose
        # sublane offsets are then 8-aligned at TK=1024 (Mosaic requires
        # 8-aligned HBM sublane slices); costs 1/64 byte/weight over the
        # ideal per-256 layout
        rep2 = lambda a: np.repeat(a.reshape(N, K // QK_K), 2, axis=1)
        fold = dict(
            s=np.ascontiguousarray(sc8.reshape(N, K // g).T),
            sd=np.ascontiguousarray(rep2(d).T, np.float32),
            m=(np.ascontiguousarray(m8.reshape(N, K // g).T)
               if m8 is not None else None),
            md=(np.ascontiguousarray(rep2(dmin).T, np.float32)
                if dmin is not None else None),
        )

    ck = nib4c_chunk(K)
    if ggml_type in _NIB4_TYPES and ck is not None:
        # chunk-local packing (see _NIB4C_CAPS comment).  Stored as an int8
        # *view* (Mosaic has no uint8 compute path; the kernels widen to
        # int32 and mask).
        packed = _pack_nib4c(q.T.astype(np.uint8), ck)  # (K/2, N)
        if fold is not None:
            return QuantTensor(
                q=put(packed), s=put(fold["s"]),
                m=put(fold["m"]) if fold["m"] is not None else None,
                fmt="nib4c", group=g, shape=(K, N),
                sd=put(fold["sd"]),
                md=put(fold["md"]) if fold["md"] is not None else None,
                sgroup=QK_K // 2,
            )
        return QuantTensor(
            q=put(packed),
            s=put(np.ascontiguousarray(s.T, np.float32)),
            m=put(np.ascontiguousarray(m.T, np.float32)) if m is not None else None,
            fmt="nib4c",
            group=g,
            shape=(K, N),
        )
    if fold is not None:
        return QuantTensor(
            q=put(np.ascontiguousarray(q.T)), s=put(fold["s"]),
            m=put(fold["m"]) if fold["m"] is not None else None,
            fmt="int8", group=g, shape=(K, N),
            sd=put(fold["sd"]),
            md=put(fold["md"]) if fold["md"] is not None else None,
            sgroup=QK_K // 2,
        )
    return QuantTensor(
        q=put(np.ascontiguousarray(q.T)),
        s=put(np.ascontiguousarray(s.T, np.float32)),
        m=put(np.ascontiguousarray(m.T, np.float32)) if m is not None else None,
        fmt="int8",
        group=g,
        shape=(K, N),
    )


def repack_nib4_to_int8(qt: QuantTensor) -> QuantTensor:
    """EXACTLY re-express a 4-bit (nib4) tensor in the int8 format.

    Unpacks the split-K nibbles to int8 values (0..15) and keeps the same
    per-group scales/mins, so every dequantized value is bit-identical —
    quality is unchanged.  Costs 2× the weight bytes but switches the
    decode GEMV from the VPU-dequant-bound nib4 kernel (~110-160 GB/s on
    this chip) to the DMA-bound int8 kernel (~600-690 GB/s); a
    memory-for-bandwidth trade for serving (docs/perf.md round-3 table).
    The analog of a load-time requant, except lossless."""
    if qt.fmt not in ("nib4", "nib4c"):
        return qt
    return QuantTensor(
        q=_unpack_nib4(qt.q, qt.fmt, qt.shape[0]), s=qt.s, m=qt.m,
        fmt="int8", group=qt.group, shape=qt.shape,
        sd=qt.sd, md=qt.md, sgroup=qt.sgroup,
    )


@functools.partial(jax.jit, static_argnames=("fmt", "K"))
def _unpack_nib4(q, fmt="nib4", K=0):
    # int8-native bitwise unpack, jitted so XLA fuses the mask/shift into
    # the concat's output writes — eager ops would materialize lo/hi temps
    # (multi-GB transients on an 8B stack; the &0x0F after >>4 kills the
    # arithmetic-shift sign extension)
    if fmt == "nib4c":
        return _unpack4_jnp(q, fmt, K or 2 * q.shape[-2])
    lo = q & 0x0F  # k rows [0, K/2), values 0..15
    hi = (q >> 4) & 0x0F  # k rows [K/2, K)
    return jnp.concatenate([lo, hi], axis=-2)


def repack_params_int8(params):
    """Apply repack_nib4_to_int8 over every weight in a param tree."""
    return jax.tree_util.tree_map(
        lambda t: repack_nib4_to_int8(t) if isinstance(t, QuantTensor) else t,
        params, is_leaf=lambda t: isinstance(t, QuantTensor),
    )


# ---------------------------------------------------------------------------
# XLA fallback path (CPU tests, golden oracle for the Pallas kernel)
# ---------------------------------------------------------------------------


def dequantize_qt(qt: QuantTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the (K, N) weight (oracle / non-TPU fallback)."""
    if qt.sd is not None:
        qt = unfold_qt(qt)
    if qt.fmt in ("nib4", "nib4c"):
        vals = _unpack4_jnp(qt.q, qt.fmt, qt.shape[0])
    else:
        vals = qt.q
    s = jnp.repeat(qt.s, qt.group, axis=0)
    w = vals.astype(jnp.float32) * s
    if qt.m is not None:
        w = w - jnp.repeat(qt.m, qt.group, axis=0)
    return w[:, : qt.shape[1]].astype(dtype)  # drop pad_qt_n columns


def quant_matmul_xla(x: jnp.ndarray, qt: QuantTensor) -> jnp.ndarray:
    """x (..., K) @ qt (K, N) via dequantize-then-dot (XLA fuses the scale
    broadcast into the dot's operand stream)."""
    w = dequantize_qt(qt, jnp.bfloat16)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _qmm_int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, group, n_k):
    """int8 format: one (TM, TN) tile, grid dim 2 accumulates over K tiles."""
    from jax.experimental import pallas as pl

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sg = jnp.repeat(s_ref[:], group, axis=0)  # (TK, TN) f32
    w = (q_ref[:].astype(jnp.float32) * sg).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm_int8_gemv_kernel(x_ref, q_ref, s_ref, *rest, group, sgroup, tkc):
    """Decode-shape (M ≤ 8) int8 GEMV: full-K weight windows, grid over N.

    The dense `_qmm_int8_kernel`'s (TM, TN, TK) k-grid revisits the
    output tile K/TK× and can only stream f32 per-group scale planes
    (25% extra bytes at group=16; folded k-quant scales must be
    unfolded first).  This variant
    carries the streamed decode megakernel's proven schedule
    (`ops/decode_stream.py` gemv_stream) into a standalone kernel: one
    grid dimension over N windows, each program consumes a full-K
    (K, TN) int8 block that Pallas double-buffers from HBM while the
    previous window computes, and the dequant runs in (≤1024, ≤512)
    sub-slices so f32 temps stay ~2 MB.  Folded k-quant scales
    (int8 sub-scales × f32 per-superblock planes, `sgroup > 0`) stream
    natively — ~4× fewer scale bytes than the f32 planes the dense
    kernel requires.  Measured on the 8B Q6_K lm_head shape
    (4096×129024, scripts/microbench_gemv.py two-length slope): dense
    0.93 ms (712 GB/s) → GEMV 0.90 ms (731 GB/s) → folded GEMV 0.85 ms
    (578 MB vs 661 MB streamed).  Reference analog: the fork's lm_head
    GEMV rides the same fused dequant kernels as the layers
    (docs/gfx906/implementation_guide.md:170-287)."""
    if sgroup:
        sd_ref, o_ref = rest
    else:
        (o_ref,) = rest
    K, TN = q_ref.shape
    TKc = tkc
    outs = []
    for n0 in range(0, TN, 512):
        nn = min(512, TN - n0)
        acc = jnp.zeros((x_ref.shape[0], nn), jnp.float32)
        for k0 in range(0, K, TKc):
            qs = q_ref[k0:k0 + TKc, n0:n0 + nn]
            sg_g = s_ref[k0 // group:(k0 + TKc) // group, n0:n0 + nn]
            if sgroup:
                sd = sd_ref[k0 // sgroup:(k0 + TKc) // sgroup, n0:n0 + nn]
                sg_g = sg_g.astype(jnp.float32) * jnp.repeat(
                    sd, sgroup // group, axis=0)
            sg = jnp.repeat(sg_g, group, axis=0)
            w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot(
                x_ref[:, k0:k0 + TKc], w, preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _gemv_tiles(qt: QuantTensor) -> tuple[int, int] | None:
    """(TKc, TN) for the streamed GEMV kernel, or None if ineligible.

    Eligibility: int8 or nib4c format; K divisible by a sub-chunk that
    keeps the per-group scale slice 8-row aligned (TKc ≥ 8·group int8;
    nib4c slices the chunk's scale rows in half, so TKc ≥ 16·group);
    folded scales additionally need TKc = 1024 so the super-scale slice
    lands on 8-aligned sublanes; the full-K weight window (packed bytes)
    must fit a ≤4 MB double-buffered VMEM block."""
    K, Np = qt.shape[0], qt.q.shape[-1]
    if qt.fmt == "int8":
        if qt.sd is not None:
            tkc = 1024 if K % 1024 == 0 and 1024 >= 8 * qt.group else 0
            if tkc and K % qt.sgroup:
                tkc = 0
        else:
            tkc = next((t for t in (1024, 512, 256)
                        if K % t == 0 and t >= 8 * qt.group), 0)
        k_bytes = K
    elif qt.fmt == "nib4c":
        tkc = nib4c_chunk(K) or 0
        if tkc < 16 * qt.group or tkc % (16 * qt.group):
            tkc = 0
        # folded: super-scale slice must land on 8-aligned sublanes
        if qt.sd is not None and (tkc % qt.sgroup or (tkc // qt.sgroup) % 8
                                  or K % qt.sgroup):
            tkc = 0
        k_bytes = K // 2
    else:
        return None
    if not tkc:
        return None
    tn = next((t for t in (1024, 512, 256, 128)
               if Np % t == 0 and k_bytes * t <= (4 << 20)), 0)
    if not tn:
        return None
    return tkc, tn


_NO_GEMV_KERNEL = os.environ.get("LCG_NO_GEMV_KERNEL", "0") == "1"


def _qmm_nib4c_gemv_kernel(x_ref, q_ref, s_ref, *rest, group, sgroup, tkc):
    """nib4c variant of the streamed full-K GEMV: half the weight bytes of
    int8 stream through the window, consumed by the groupdot-diff
    schedule (see the _NIB4C_CAPS comment): per 8-row x block, a
    block-diagonal x expansion dots RAW bytes on the MXU — the biased
    byte casts straight to bf16, the lo plane is one int8 mask away, and
    the hi-plane dot is recovered by difference — then per-group scales
    apply on the tiny (rows·K/g, TN) dot outputs instead of per element.
    Measured ~693 GB/s of packed bytes on the 8B lm_head shape — the
    int8 kernel's byte rate at HALF the bytes (scripts/exp_nib4.py)."""
    if sgroup:
        sd_ref, o_ref = rest
    else:
        (o_ref,) = rest
    Kh, TN = q_ref.shape
    K = 2 * Kh
    M = x_ref.shape[0]  # 8 (sublane-padded)
    TKh = tkc // 2
    gh = TKh // group  # groups per half-chunk
    # block-diagonal expansion of each x row: xg[(m·gh+g), k] = x[m, k]·[k∈g]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (M * gh, TKh), 0) % gh
    colg = jax.lax.broadcasted_iota(jnp.int32, (M * gh, TKh), 1) // group
    gmask = (rowg == colg).astype(jnp.bfloat16)  # (M·gh, TKh)
    # grouped row-sum as a 2D dot: summat[m, m·gh+g] = 1
    srow = jax.lax.broadcasted_iota(jnp.int32, (M, M * gh), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (M, M * gh), 1) // gh
    summat = (srow == scol).astype(jnp.float32)  # (M, M·gh)

    outs = []
    for n0 in range(0, TN, 512):
        nn = min(512, TN - n0)
        acc = jnp.zeros((M, nn), jnp.float32)
        for k0 in range(0, K, tkc):
            q8 = q_ref[k0 // 2:k0 // 2 + TKh, n0:n0 + nn]
            b_bf = q8.astype(jnp.bfloat16)           # lo + 16·hi − 128
            l_bf = (q8 & jnp.int8(0x0F)).astype(jnp.bfloat16)
            sg_g = s_ref[k0 // group:(k0 + tkc) // group, n0:n0 + nn]
            if sgroup:
                sd = sd_ref[k0 // sgroup:(k0 + tkc) // sgroup, n0:n0 + nn]
                sg_g = sg_g.astype(jnp.float32) * jnp.repeat(
                    sd, sgroup // group, axis=0)
            # x slices for the two logical halves of this chunk
            x_lo = jnp.repeat(x_ref[:, k0:k0 + TKh], gh, axis=0)
            x_hi = jnp.repeat(x_ref[:, k0 + TKh:k0 + tkc], gh, axis=0)
            xg_lo = gmask * x_lo                      # (M·gh, TKh)
            xg_hi = gmask * x_hi
            xsum_hi = jnp.sum(xg_hi.astype(jnp.float32), 1, keepdims=True)
            y_l_lo = jax.lax.dot(xg_lo, l_bf,
                                 preferred_element_type=jnp.float32)
            y_b_hi = jax.lax.dot(xg_hi, b_bf,
                                 preferred_element_type=jnp.float32)
            y_l_hi = jax.lax.dot(xg_hi, l_bf,
                                 preferred_element_type=jnp.float32)
            y_h_hi = (y_b_hi - y_l_hi + 128.0 * xsum_hi) * (1.0 / 16.0)
            # per-(row, group) outputs × group scales, summed over groups
            # with a 0/1 dot (2D end to end — no 3D reshapes for Mosaic);
            # y rows are (m, g)-ordered, so scales TILE (concatenate),
            # they don't repeat
            sl = sg_g[:gh, :].astype(jnp.float32)
            sh = sg_g[gh:, :].astype(jnp.float32)
            sl_t = jnp.concatenate([sl] * M, axis=0)  # (M·gh, nn)
            sh_t = jnp.concatenate([sh] * M, axis=0)
            y = y_l_lo * sl_t + y_h_hi * sh_t
            acc = acc + jax.lax.dot(summat, y,
                                    preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "sgroup",
                                             "shape", "interpret"))
def _quant_gemv_pallas(x, q, s, m, sd, md, *, fmt, group, sgroup, shape,
                       interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N = shape
    Np = q.shape[-1]
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K)
    if M != 8:
        x2 = jnp.pad(x2, ((0, 8 - M), (0, 0)))
    x2 = x2.astype(jnp.bfloat16)
    tiles = _gemv_tiles(QuantTensor(q=q, s=s, m=None, fmt=fmt, group=group,
                                    shape=shape, sd=sd, sgroup=sgroup))
    assert tiles is not None
    TKc, TN = tiles

    folded = sd is not None
    k_rows = K // 2 if fmt == "nib4c" else K
    in_specs = [
        pl.BlockSpec((8, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k_rows, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((K // group, TN), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, q, s]
    if folded:
        in_specs.append(pl.BlockSpec((K // sgroup, TN), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(sd)
    kernel = (_qmm_nib4c_gemv_kernel if fmt == "nib4c"
              else _qmm_int8_gemv_kernel)
    out = pl.pallas_call(
        functools.partial(kernel, group=group,
                          sgroup=sgroup if folded else 0, tkc=TKc),
        grid=(Np // TN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * Np * K,
            bytes_accessed=8 * K * 2 + k_rows * Np
            + K // group * Np * (1 if folded else 4)
            + (K // sgroup * Np * 4 if folded else 0),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if m is not None:
        # subtractive term outside the kernel (reads the m plane once as a
        # small (8, K/g) @ (K/g, Np) XLA matmul; the folded unfold fuses in)
        mg = m.astype(jnp.float32)
        if md is not None:
            mg = mg * jnp.repeat(md, sgroup // group, axis=0)
        xs = x2.astype(jnp.float32).reshape(8, K // group, group).sum(-1)
        out = out - xs @ mg
    return out[:M, :N].reshape(*lead, N).astype(x.dtype)


def _qmm_nib4_kernel(
    xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref, *, group, n_k
):
    """nib4 split-K format: low nibbles are K-half 0, high nibbles K-half 1;
    two dots per tile against the two x column tiles."""
    from jax.experimental import pallas as pl

    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = q_ref[:].astype(jnp.int32) & 255  # (TKh, TN) int8 view of bytes
    lo = (p32 & 0x0F).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    wlo = (lo * jnp.repeat(slo_ref[:], group, axis=0)).astype(jnp.bfloat16)
    whi = (hi * jnp.repeat(shi_ref[:], group, axis=0)).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot(xlo_ref[:], wlo, preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot(xhi_ref[:], whi, preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_tiles(M: int, K: int, N: int, group: int) -> tuple[int, int, int]:
    """Mosaic constraint: every block dim must be divisible by (8, 128) or
    span the full array — so the scales tile (TK/group rows) needs TK ≥
    8·group unless TK == K."""
    TM = min(256, max(8, M))
    # decode (tiny M): widen N tiles so each grid step streams more weight
    # bytes per fixed overhead; prefill (large M) favors squarer tiles
    TN = next((t for t in ((2048, 1024, 512, 256, 128) if M <= 8 else (256, 128)) if N % t == 0), 128)
    TK = next(
        (t for t in (512, 256) if K % t == 0 and t >= 8 * group), K
    )
    if TK == K and K > 8192:
        raise ValueError(f"quant_matmul: no valid K tiling for K={K}, group={group}")
    return TM, TN, TK


def _pallas_tileable(fmt: str, group: int, shape: tuple, n_packed: int) -> bool:
    """Can the Pallas kernels cover this weight exactly?  The grids floor-
    divide, so a padded-N not divisible by the smallest N tile would leave
    the tail columns UNWRITTEN (uninitialized output) — such shapes take
    the XLA dequant-dot instead."""
    K = shape[0]
    if fmt == "nib4c":
        # no dense k-grid kernel for the chunk-local packing: big-M matmuls
        # (prefill) take the XLA dequant-dot, which fuses the unpack and is
        # MXU-bound at those shapes anyway; decode rides the GEMV/megakernel
        return False
    if n_packed % 128 != 0:
        return False
    K_eff = K // 2 if fmt == "nib4" else K  # nib4 kernels tile the halves
    tk = next((t for t in (512, 256) if K_eff % t == 0 and t >= 8 * group), K_eff)
    return tk != K_eff or K_eff <= 8192


def pad_qt_n(qt: QuantTensor, multiple: int = 2048) -> QuantTensor:
    """Zero-pad the output dim to ``multiple`` so the kernel gets wide
    (2048-lane) N tiles.  128256-vocab heads otherwise fall back to
    TN=256, which measured 180 GB/s vs 304 GB/s padded on the 8B shape.
    ``shape`` keeps the logical N; the matmul slices the pad off."""
    K, N = qt.shape
    Np = -(-N // multiple) * multiple
    if Np == qt.q.shape[-1]:
        return qt
    padn = Np - qt.q.shape[-1]

    def pad(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, padn)]) if a is not None else None

    return QuantTensor(q=pad(qt.q), s=pad(qt.s), m=pad(qt.m),
                       fmt=qt.fmt, group=qt.group, shape=qt.shape,
                       sd=pad(qt.sd), md=pad(qt.md), sgroup=qt.sgroup)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "shape", "interpret"))
def _quant_matmul_pallas(x, q, s, m, *, fmt, group, shape, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if fmt not in ("int8", "nib4"):
        raise ValueError(f"dense quant_matmul kernel: unsupported fmt {fmt!r}"
                         " (nib4c rides the GEMV/megakernel or XLA)")
    K, N = shape
    Np = q.shape[-1]  # may exceed the logical N (pad_qt_n)
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K)

    TM, TN, TK = _pick_tiles(M, K, Np, group)
    Mp = -(-M // TM) * TM
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    x2 = x2.astype(jnp.bfloat16)

    params = dict(
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=Mp * K * 2
            + (K * Np if fmt == "int8" else K * Np // 2)
            + K // group * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if fmt == "nib4":
        Kh = K // 2
        TKh = next(
            (t for t in (512, 256) if Kh % t == 0 and t >= 8 * group), Kh
        )
        if TKh == Kh and Kh > 8192:
            raise ValueError(
                f"quant_matmul: no valid K tiling for nib4 Kh={Kh}, group={group}")
        n_k = Kh // TKh
        # pre-split x columns and scale rows so every kernel operand block is
        # either (8,128)-aligned or spans its full array
        x_lo, x_hi = x2[:, :Kh], x2[:, Kh:]
        s_lo, s_hi = s[: Kh // group], s[Kh // group :]
        out = pl.pallas_call(
            functools.partial(_qmm_nib4_kernel, group=group, n_k=n_k),
            grid=(Mp // TM, Np // TN, n_k),
            in_specs=[
                pl.BlockSpec((TM, TKh), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, TKh), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((TKh, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (max(TKh // group, 1), TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (max(TKh // group, 1), TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
            ],
            **params,
        )(x_lo, x_hi, q, s_lo, s_hi)
    else:
        n_k = K // TK
        out = pl.pallas_call(
            functools.partial(_qmm_int8_kernel, group=group, n_k=n_k),
            grid=(Mp // TM, Np // TN, n_k),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((TK, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (TK // group, TN), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
            ],
            **params,
        )(x2, q, s)

    if m is not None:
        # subtractive term: out -= xsum @ m, xsum (M, K/g) group sums of x
        xs = x2.astype(jnp.float32).reshape(Mp, K // group, group).sum(-1)
        out = out - xs @ m
    out = out[:M, :N].reshape(*lead, N)
    return out.astype(x.dtype)


def quant_matmul(x: jnp.ndarray, qt: QuantTensor, use_pallas: bool | None = None) -> jnp.ndarray:
    """x (..., K) @ quantized (K, N) — Pallas on TPU, XLA fallback elsewhere.

    Decode heuristic (measured on-chip): for tiny M and small weights the
    Pallas launch + short grids dominate (~137 GB/s effective), while
    XLA's fused dequant-dot pipelines better; big weights (lm_head-class)
    stream near peak through the Pallas kernel (~690 GB/s)."""
    M = int(np.prod(x.shape[:-1])) if x.shape[:-1] else 1
    if qt.xla_only:  # GSPMD-sharded weight (TP): see the field's comment
        return quant_matmul_xla(x, qt)
    if (use_pallas is not False and not _NO_GEMV_KERNEL
            and M <= 8 and qt.shape[0] * qt.shape[1] >= (1 << 23)
            and jax.default_backend() not in ("cpu",)
            and _gemv_tiles(qt) is not None):
        # decode-shape big weights (lm_head-class): streamed full-K GEMV
        # kernel — no k-grid, folded scales stream natively, nib4c streams
        # the packed 4-bit bytes directly
        return _quant_gemv_pallas(
            x, qt.q, qt.s, qt.m, qt.sd, qt.md, fmt=qt.fmt,
            group=qt.group, sgroup=qt.sgroup or 0, shape=qt.shape)
    if use_pallas is None:
        if jax.default_backend() in ("cpu",):
            use_pallas = False
        else:
            use_pallas = M > 8 or qt.shape[0] * qt.shape[1] >= (1 << 23)
    if use_pallas and not _pallas_tileable(qt.fmt, qt.group, qt.shape,
                                           qt.q.shape[-1]):
        use_pallas = False
    if qt.sd is not None and use_pallas:
        # folded scales: the generic Pallas kernels take f32 scale planes;
        # unfolding would materialize them per call.  Folded tensors are
        # meant for the streamed decode megakernel — everything else takes
        # the XLA path, where the unfold fuses into the dequant-dot.
        use_pallas = False
    if not use_pallas:
        return quant_matmul_xla(x, qt)
    return _quant_matmul_pallas(
        x, qt.q, qt.s, qt.m, fmt=qt.fmt, group=qt.group, shape=qt.shape
    )


def linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """Dispatch: plain array or QuantTensor."""
    if isinstance(w, QuantTensor):
        return quant_matmul(x, w)
    return x @ w


# ---------------------------------------------------------------------------
# Routed (expert-indexed) quantized matmul — the ggml_mul_mat_id analog
# ---------------------------------------------------------------------------
# Experts stay block-quantized in HBM; each (token, expert) pair streams only
# its selected expert's quantized bytes through VMEM (reference:
# build_moe_ffn over quantized experts, src/llama-graph.cpp:776-1024).


def qt_expert(qt: QuantTensor, e) -> QuantTensor:
    """Select one expert from a stacked QuantTensor (leading E axis)."""
    take = lambda a: jax.lax.dynamic_index_in_dim(a, e, 0, keepdims=False)
    return QuantTensor(
        q=take(qt.q), s=take(qt.s), m=take(qt.m) if qt.m is not None else None,
        fmt=qt.fmt, group=qt.group, shape=qt.shape,
        sd=take(qt.sd) if qt.sd is not None else None,
        md=take(qt.md) if qt.md is not None else None,
        sgroup=qt.sgroup,
    )


def dequantize_qt_experts(qt: QuantTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize all experts (E, K, N) — oracle / load-time fallback."""
    if qt.sd is not None:
        qt = unfold_qt(qt)
    if qt.fmt in ("nib4", "nib4c"):
        vals = _unpack4_jnp(qt.q, qt.fmt, qt.shape[0])
    else:
        vals = qt.q
    s = jnp.repeat(qt.s, qt.group, axis=1)
    w = vals.astype(jnp.float32) * s
    if qt.m is not None:
        w = w - jnp.repeat(qt.m, qt.group, axis=1)
    return w.astype(dtype)


def routed_quant_matmul_xla(
    x: jnp.ndarray, qt: QuantTensor, idx: jnp.ndarray
) -> jnp.ndarray:
    """Oracle: out[p] = x[p] @ dequant(experts[idx[p]]).

    Gathers *quantized* expert slices (int8 / packed nibbles) so HBM reads
    stay at quantized width, then dequantizes per pair.  Used on CPU and as
    the golden reference for the Pallas kernel."""
    if qt.sd is not None:
        qt = unfold_qt(qt)
    K, N = qt.shape
    q_sel = qt.q[idx]  # (P, Kq, N) quantized gather
    s_sel = qt.s[idx]  # (P, K/g, N)
    if qt.fmt in ("nib4", "nib4c"):
        vals = _unpack4_jnp(q_sel, qt.fmt, K)
    else:
        vals = q_sel
    w = vals.astype(jnp.float32) * jnp.repeat(s_sel, qt.group, axis=1)
    if qt.m is not None:
        w = w - jnp.repeat(qt.m[idx], qt.group, axis=1)
    out = jnp.einsum(
        "pk,pkn->pn", x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    )
    return out.astype(x.dtype)


def _rqmm_int8_kernel(idx_ref, *refs, group, n_k, has_m):
    """One (pair, N-tile) output block; grid dim 2 accumulates over K tiles.
    x rows are replicated 8× (sublane alignment) — row 0 is the token.
    The subtractive term folds into the dequantized tile (w = q·s − m)."""
    from jax.experimental import pallas as pl

    if has_m:
        x_ref, q_ref, s_ref, m_ref, o_ref, acc_ref = refs
    else:
        x_ref, q_ref, s_ref, o_ref, acc_ref = refs
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(jnp.float32) * jnp.repeat(s_ref[0], group, axis=0)
    if has_m:
        w = w - jnp.repeat(m_ref[0], group, axis=0)
    acc_ref[:] += jax.lax.dot(
        x_ref[0], w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _rqmm_nib4_kernel(idx_ref, *refs, group, n_k, has_m):
    """nib4 split-K: low nibbles = K-half 0, high nibbles = K-half 1."""
    from jax.experimental import pallas as pl

    if has_m:
        (xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref,
         mlo_ref, mhi_ref, o_ref, acc_ref) = refs
    else:
        xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref, o_ref, acc_ref = refs
        mlo_ref = mhi_ref = None
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = q_ref[0].astype(jnp.int32) & 255
    wlo = (p32 & 0x0F).astype(jnp.float32) * jnp.repeat(slo_ref[0], group, axis=0)
    whi = (p32 >> 4).astype(jnp.float32) * jnp.repeat(shi_ref[0], group, axis=0)
    if has_m:
        wlo = wlo - jnp.repeat(mlo_ref[0], group, axis=0)
        whi = whi - jnp.repeat(mhi_ref[0], group, axis=0)
    acc_ref[:] += jax.lax.dot(
        xlo_ref[0], wlo.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    acc_ref[:] += jax.lax.dot(
        xhi_ref[0], whi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("fmt", "group", "shape", "has_m", "interpret")
)
def _routed_qmm_pallas(x, q, s, m, idx, *, fmt, group, shape, has_m, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if fmt == "nib4c":
        raise ValueError(
            "routed kernel: nib4c experts decode through the MoE megakernel"
            " (ops/decode_stream) or the XLA gather path, not this kernel")

    K, N = shape
    P = x.shape[0]
    # replicate each pair's activation row to an (8, K) tile: Mosaic wants
    # sublane-aligned blocks; the 8× redundant FLOPs are free (bandwidth-bound)
    x8 = jnp.broadcast_to(x.astype(jnp.bfloat16)[:, None, :], (P, 8, K))
    TN = next((t for t in (2048, 1024, 512, 256, 128) if N % t == 0), 128)
    idx = idx.astype(jnp.int32)

    def spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((P, 8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    out_spec = spec((1, 8, TN), lambda p, j, k, idx_ref: (p, 0, j))

    if fmt == "nib4":
        Kh = K // 2
        TKh = next((t for t in (512, 256) if Kh % t == 0 and t >= 8 * group), Kh)
        n_k = Kh // TKh
        Gh = Kh // group
        TG = max(TKh // group, 1)
        x_lo, x_hi = x8[:, :, :Kh], x8[:, :, Kh:]
        s_lo, s_hi = s[:, :Gh], s[:, Gh:]
        x_spec = spec((1, 8, TKh), lambda p, j, k, idx_ref: (p, 0, k))
        q_spec = spec((1, TKh, TN), lambda p, j, k, idx_ref: (idx_ref[p], k, j))
        s_spec = spec((1, TG, TN), lambda p, j, k, idx_ref: (idx_ref[p], k, j))
        operands = [x_lo, x_hi, q, s_lo, s_hi]
        in_specs = [x_spec, x_spec, q_spec, s_spec, s_spec]
        if has_m:
            operands += [m[:, :Gh], m[:, Gh:]]
            in_specs += [s_spec, s_spec]
        kernel = _rqmm_nib4_kernel
    else:
        TK = next((t for t in (512, 256) if K % t == 0 and t >= 8 * group), K)
        n_k = K // TK
        TG = max(TK // group, 1)
        x_spec = spec((1, 8, TK), lambda p, j, k, idx_ref: (p, 0, k))
        q_spec = spec((1, TK, TN), lambda p, j, k, idx_ref: (idx_ref[p], k, j))
        s_spec = spec((1, TG, TN), lambda p, j, k, idx_ref: (idx_ref[p], k, j))
        operands = [x8, q, s]
        in_specs = [x_spec, q_spec, s_spec]
        if has_m:
            operands.append(m)
            in_specs.append(s_spec)
        kernel = _rqmm_int8_kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, N // TN, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=common.pop("scratch_shapes"),
    )
    out = pl.pallas_call(
        functools.partial(kernel, group=group, n_k=n_k, has_m=has_m),
        grid_spec=grid_spec,
        **common,
    )(idx, *operands)
    return out[:, 0, :].astype(x.dtype)


def routed_quant_matmul(
    x: jnp.ndarray,  # (P, K) one activation row per (token, expert) pair
    qt: QuantTensor,  # stacked experts: q (E, K[/2], N), s/m (E, K/g, N)
    idx: jnp.ndarray,  # (P,) int32 expert ids
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """out[p] = x[p] @ experts[idx[p]] with experts resident in quantized
    form — Pallas on TPU (scalar-prefetched expert indices drive the weight
    block DMAs), gather-dequant XLA path elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas and not _pallas_tileable(qt.fmt, qt.group, qt.shape,
                                           qt.q.shape[-1]):
        use_pallas = False  # grid would floor away the N tail (see helper)
    if not use_pallas or qt.sd is not None or qt.xla_only:
        return routed_quant_matmul_xla(x, qt, idx)
    return _routed_qmm_pallas(
        x, qt.q, qt.s, qt.m, idx,
        fmt=qt.fmt, group=qt.group, shape=qt.shape, has_m=qt.m is not None,
    )
