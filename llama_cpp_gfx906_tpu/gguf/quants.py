"""Numpy reference codecs for GGUF block-quantization formats.

These are the golden encode/decode implementations every Pallas kernel is
tested against (the TPU analog of the reference's ``test-backend-ops`` CPU
oracle).  The *bit layouts* are fixed by the GGUF format (reference numpy
codecs: ``gguf-py/gguf/quants.py``; layout summary in SURVEY.md §2.5); the
vectorized implementations here are original.

Conventions
-----------
- ``dequant_*`` takes raw block bytes ``(nblocks, block_bytes) uint8`` and
  returns ``(nblocks, block_size) float32``.
- ``quant_*`` takes ``(nblocks, block_size) float32`` and returns raw bytes.
- The public entry points :func:`dequantize` / :func:`quantize` operate on
  arbitrary-shaped arrays whose last axis is the contiguous quantized axis
  (matching ggml's row-major block layout).

Quantizer note: the encoders use straightforward min/max (asymmetric) or
absmax (symmetric) grid fitting.  ggml's encoders additionally run small
weighted searches (``make_qx_quants``); decoding is bit-identical either
way, so GGUF files produced by llama.cpp round-trip exactly, while files
*we* quantize have slightly different (but comparable-quality) codes.
"""

from __future__ import annotations

import numpy as np

from .constants import GGML_BLOCK_SIZES, QK_K, GGMLType

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _f16(view: np.ndarray) -> np.ndarray:
    """Reinterpret a (nblocks, 2) uint8 slice as little-endian float16 → f32."""
    return view.copy().view(np.dtype("<f2")).astype(np.float32)


def _to_f16_bytes(x: np.ndarray) -> np.ndarray:
    """float32 (n, 1) → raw f16 bytes (n, 2)."""
    return x.astype(np.dtype("<f2")).view(np.uint8)


def _nibbles_lo_hi(qs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return qs & 0x0F, qs >> 4


def _safe_inv(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, 1.0 / np.where(d != 0.0, d, 1.0), 0.0)
    return inv


# ---------------------------------------------------------------------------
# Q4_0 / Q4_1 / Q5_0 / Q5_1 / Q8_0  (32-element blocks)
# ---------------------------------------------------------------------------


def dequant_q4_0(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    lo, hi = _nibbles_lo_hi(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1).astype(np.int8) - 8
    return q.astype(np.float32) * d


def quant_q4_0(x: np.ndarray) -> np.ndarray:
    # signed max-magnitude value maps to -8 (ggml convention)
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idx]
    d = mx / -8.0
    q = np.floor(x * _safe_inv(d)[:, None] + 8.5).clip(0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    return np.concatenate([_to_f16_bytes(d[:, None]), lo | (hi << 4)], axis=1)


def dequant_q4_1(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    m = _f16(blocks[:, 2:4])
    lo, hi = _nibbles_lo_hi(blocks[:, 4:20])
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return q * d + m


def quant_q4_1(x: np.ndarray) -> np.ndarray:
    mn = x.min(axis=1)
    d = (x.max(axis=1) - mn) / 15.0
    q = (
        np.floor((x - mn[:, None]) * _safe_inv(d)[:, None] + 0.5)
        .clip(0, 15)
        .astype(np.uint8)
    )
    lo, hi = q[:, :16], q[:, 16:]
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), _to_f16_bytes(mn[:, None]), lo | (hi << 4)],
        axis=1,
    )


def _qh_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """(n, 4) uint8 → (n, 32) single bits, bit i of the packed uint32."""
    qh = qh_bytes.copy().view(np.dtype("<u4"))  # (n, 1)
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh >> shifts) & 1).astype(np.uint8)


def _pack_qh(bits: np.ndarray) -> np.ndarray:
    """(n, 32) bits → (n, 4) uint8 little-endian uint32."""
    shifts = np.arange(32, dtype=np.uint32)
    packed = (bits.astype(np.uint32) << shifts).sum(axis=1, dtype=np.uint32)
    return packed[:, None].view(np.uint8).reshape(-1, 4)


def dequant_q5_0(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    hbit = _qh_bits(blocks[:, 2:6])
    lo, hi = _nibbles_lo_hi(blocks[:, 6:22])
    q4 = np.concatenate([lo, hi], axis=1)
    q = (q4 | (hbit << 4)).astype(np.int16) - 16
    return q.astype(np.float32) * d


def quant_q5_0(x: np.ndarray) -> np.ndarray:
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(x.shape[0]), idx]
    d = mx / -16.0
    q = np.floor(x * _safe_inv(d)[:, None] + 16.5).clip(0, 31).astype(np.uint8)
    qh = _pack_qh(q >> 4)
    q4 = q & 0x0F
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qh, q4[:, :16] | (q4[:, 16:] << 4)], axis=1
    )


def dequant_q5_1(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    m = _f16(blocks[:, 2:4])
    hbit = _qh_bits(blocks[:, 4:8])
    lo, hi = _nibbles_lo_hi(blocks[:, 8:24])
    q = (np.concatenate([lo, hi], axis=1) | (hbit << 4)).astype(np.float32)
    return q * d + m


def quant_q5_1(x: np.ndarray) -> np.ndarray:
    mn = x.min(axis=1)
    d = (x.max(axis=1) - mn) / 31.0
    q = (
        np.floor((x - mn[:, None]) * _safe_inv(d)[:, None] + 0.5)
        .clip(0, 31)
        .astype(np.uint8)
    )
    qh = _pack_qh(q >> 4)
    q4 = q & 0x0F
    return np.concatenate(
        [
            _to_f16_bytes(d[:, None]),
            _to_f16_bytes(mn[:, None]),
            qh,
            q4[:, :16] | (q4[:, 16:] << 4),
        ],
        axis=1,
    )


def dequant_q8_0(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    q = blocks[:, 2:34].copy().view(np.int8).astype(np.float32)
    return q * d


def quant_q8_0(x: np.ndarray) -> np.ndarray:
    d = np.abs(x).max(axis=1) / 127.0
    q = np.rint(x * _safe_inv(d)[:, None]).clip(-127, 127).astype(np.int8)
    return np.concatenate([_to_f16_bytes(d[:, None]), q.view(np.uint8)], axis=1)


# ---------------------------------------------------------------------------
# K-quants (256-element superblocks)
# ---------------------------------------------------------------------------


def _unpack_k4_scales(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the Q4_K/Q5_K 12-byte 6-bit scale/min fields.

    Returns (sc, m) each (n, 8) for the 8 sub-blocks, per the packed layout:
    sub-blocks 0-3: sc = b[j] & 63, m = b[j+4] & 63
    sub-blocks 4-7: sc = (b[j+4] & 0xF) | ((b[j-4] >> 6) << 4),
                    m  = (b[j+4] >> 4)  | ((b[j]   >> 6) << 4)
    (layout cf. reference gguf-py/gguf/quants.py:479-501)
    """
    b = scales.astype(np.uint8)
    sc = np.empty(b.shape[:1] + (8,), np.uint8)
    m = np.empty_like(sc)
    sc[:, :4] = b[:, :4] & 63
    m[:, :4] = b[:, 4:8] & 63
    sc[:, 4:] = (b[:, 8:12] & 0x0F) | ((b[:, 0:4] >> 6) << 4)
    m[:, 4:] = (b[:, 8:12] >> 4) | ((b[:, 4:8] >> 6) << 4)
    return sc, m


def _pack_k4_scales(sc: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_unpack_k4_scales`; sc/m are (n, 8) values in [0, 63]."""
    b = np.zeros(sc.shape[:1] + (12,), np.uint8)
    b[:, 0:4] = (sc[:, :4] & 63) | ((sc[:, 4:] >> 4) << 6)
    b[:, 4:8] = (m[:, :4] & 63) | ((m[:, 4:] >> 4) << 6)
    b[:, 8:12] = (sc[:, 4:] & 0x0F) | ((m[:, 4:] & 0x0F) << 4)
    return b


def dequant_q4_k(blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    d = _f16(blocks[:, 0:2])
    dmin = _f16(blocks[:, 2:4])
    sc, m = _unpack_k4_scales(blocks[:, 4:16])
    qs = blocks[:, 16:144]  # (n, 128)
    out = np.empty((n, QK_K), np.float32)
    dl = d * sc.astype(np.float32)  # (n, 8)
    ml = dmin * m.astype(np.float32)
    for j in range(4):  # 4 chunks of 64 elements = 32 bytes
        byte = qs[:, 32 * j : 32 * (j + 1)]
        out[:, 64 * j : 64 * j + 32] = (
            (byte & 0x0F).astype(np.float32) * dl[:, 2 * j : 2 * j + 1]
            - ml[:, 2 * j : 2 * j + 1]
        )
        out[:, 64 * j + 32 : 64 * j + 64] = (
            (byte >> 4).astype(np.float32) * dl[:, 2 * j + 1 : 2 * j + 2]
            - ml[:, 2 * j + 1 : 2 * j + 2]
        )
    return out


def _fit_asym(x32: np.ndarray, qmax: int, smax: int):
    """Asymmetric sub-block fit shared by Q4_K/Q5_K/Q2_K.

    x32: (n, nsub, sub) → (d, dmin, sc, m, q) with value ≈ d*sc*q - dmin*m.
    """
    mn = np.minimum(x32.min(axis=2), 0.0)  # (n, nsub)
    mx = np.maximum(x32.max(axis=2), 0.0)
    sub_scale = (mx - mn) / qmax
    d = sub_scale.max(axis=1) / smax  # (n,)
    dmin = (-mn).max(axis=1) / smax
    sc = np.rint(sub_scale * _safe_inv(d)[:, None]).clip(0, smax).astype(np.uint8)
    m = np.rint(-mn * _safe_inv(dmin)[:, None]).clip(0, smax).astype(np.uint8)
    dl = d[:, None] * sc  # effective per-sub-block scale
    ml = dmin[:, None] * m
    q = (
        np.rint((x32 + ml[:, :, None]) * _safe_inv(dl)[:, :, None])
        .clip(0, qmax)
        .astype(np.uint8)
    )
    return d, dmin, sc, m, q


def quant_q4_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x32 = x.reshape(n, 8, 32)
    d, dmin, sc, m, q = _fit_asym(x32, 15, 63)
    qs = np.empty((n, 128), np.uint8)
    for j in range(4):
        qs[:, 32 * j : 32 * (j + 1)] = q[:, 2 * j] | (q[:, 2 * j + 1] << 4)
    return np.concatenate(
        [
            _to_f16_bytes(d[:, None]),
            _to_f16_bytes(dmin[:, None]),
            _pack_k4_scales(sc, m),
            qs,
        ],
        axis=1,
    )


def dequant_q5_k(blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    d = _f16(blocks[:, 0:2])
    dmin = _f16(blocks[:, 2:4])
    sc, m = _unpack_k4_scales(blocks[:, 4:16])
    qh = blocks[:, 16:48]  # (n, 32): bit 2j → low-nibble half of 64-chunk j
    qs = blocks[:, 48:176]  # (n, 128)
    out = np.empty((n, QK_K), np.float32)
    dl = d * sc.astype(np.float32)
    ml = dmin * m.astype(np.float32)
    for j in range(4):
        byte = qs[:, 32 * j : 32 * (j + 1)]
        h1 = ((qh >> (2 * j)) & 1) << 4
        h2 = ((qh >> (2 * j + 1)) & 1) << 4
        out[:, 64 * j : 64 * j + 32] = (
            ((byte & 0x0F) | h1).astype(np.float32) * dl[:, 2 * j : 2 * j + 1]
            - ml[:, 2 * j : 2 * j + 1]
        )
        out[:, 64 * j + 32 : 64 * j + 64] = (
            ((byte >> 4) | h2).astype(np.float32) * dl[:, 2 * j + 1 : 2 * j + 2]
            - ml[:, 2 * j + 1 : 2 * j + 2]
        )
    return out


def quant_q5_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x32 = x.reshape(n, 8, 32)
    d, dmin, sc, m, q = _fit_asym(x32, 31, 63)
    qs = np.empty((n, 128), np.uint8)
    qh = np.zeros((n, 32), np.uint8)
    for j in range(4):
        lo, hi = q[:, 2 * j], q[:, 2 * j + 1]
        qs[:, 32 * j : 32 * (j + 1)] = (lo & 0x0F) | ((hi & 0x0F) << 4)
        qh |= ((lo >> 4) << (2 * j)) | ((hi >> 4) << (2 * j + 1))
    return np.concatenate(
        [
            _to_f16_bytes(d[:, None]),
            _to_f16_bytes(dmin[:, None]),
            _pack_k4_scales(sc, m),
            qh,
            qs,
        ],
        axis=1,
    )


def dequant_q6_k(blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    sc = blocks[:, 192:208].copy().view(np.int8).astype(np.float32)  # (n, 16)
    d = _f16(blocks[:, 208:210])
    out = np.empty((n, QK_K), np.float32)
    for half in range(2):  # two 128-element halves
        lq = ql[:, 64 * half : 64 * half + 64]
        hq = qh[:, 32 * half : 32 * half + 32]
        s = sc[:, 8 * half : 8 * half + 8]
        q1 = ((lq[:, :32] & 0x0F) | (((hq >> 0) & 3) << 4)).astype(np.int16) - 32
        q2 = ((lq[:, 32:] & 0x0F) | (((hq >> 2) & 3) << 4)).astype(np.int16) - 32
        q3 = ((lq[:, :32] >> 4) | (((hq >> 4) & 3) << 4)).astype(np.int16) - 32
        q4 = ((lq[:, 32:] >> 4) | (((hq >> 6) & 3) << 4)).astype(np.int16) - 32
        for i, q in enumerate([q1, q2, q3, q4]):
            # scale index: sub-blocks of 16 within this 32-element strip
            ss = np.repeat(s[:, 2 * i : 2 * i + 2], 16, axis=1)
            out[:, 128 * half + 32 * i : 128 * half + 32 * (i + 1)] = (
                q.astype(np.float32) * ss * d
            )
    return out


def quant_q6_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x16 = x.reshape(n, 16, 16)
    sub_scale = np.abs(x16).max(axis=2) / 31.0  # (n, 16)
    d = sub_scale.max(axis=1) / 127.0
    sc = np.rint(sub_scale * _safe_inv(d)[:, None]).clip(-128, 127).astype(np.int8)
    dl = d[:, None] * sc.astype(np.float32)  # (n, 16)
    q = (
        np.rint(x16 * _safe_inv(dl)[:, :, None])
        .clip(-32, 31)
        .astype(np.int16)
        .reshape(n, QK_K)
        + 32
    ).astype(np.uint8)
    ql = np.empty((n, 128), np.uint8)
    qh = np.zeros((n, 64), np.uint8)
    for half in range(2):
        qq = q[:, 128 * half : 128 * (half + 1)]
        s1, s2, s3, s4 = qq[:, :32], qq[:, 32:64], qq[:, 64:96], qq[:, 96:]
        ql[:, 64 * half : 64 * half + 32] = (s1 & 0x0F) | ((s3 & 0x0F) << 4)
        ql[:, 64 * half + 32 : 64 * half + 64] = (s2 & 0x0F) | ((s4 & 0x0F) << 4)
        qh[:, 32 * half : 32 * half + 32] = (
            (s1 >> 4) | ((s2 >> 4) << 2) | ((s3 >> 4) << 4) | ((s4 >> 4) << 6)
        )
    return np.concatenate(
        [ql, qh, sc.view(np.uint8), _to_f16_bytes(d[:, None])], axis=1
    )


def dequant_q2_k(blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    scales = blocks[:, 0:16]  # per-16-elem sub-block: lo nibble=scale, hi=min
    qs = blocks[:, 16:80]
    d = _f16(blocks[:, 80:82])
    dmin = _f16(blocks[:, 82:84])
    dl = d * (scales & 0x0F).astype(np.float32)  # (n, 16)
    ml = dmin * (scales >> 4).astype(np.float32)
    out = np.empty((n, QK_K), np.float32)
    for half in range(2):  # 128 elements per half, 32 bytes each
        byte = qs[:, 32 * half : 32 * half + 32]
        for j in range(4):
            q = ((byte >> (2 * j)) & 3).astype(np.float32)  # (n, 32)
            sidx = 8 * half + 2 * j
            out[:, 128 * half + 32 * j : 128 * half + 32 * j + 16] = (
                q[:, :16] * dl[:, sidx : sidx + 1] - ml[:, sidx : sidx + 1]
            )
            out[:, 128 * half + 32 * j + 16 : 128 * half + 32 * (j + 1)] = (
                q[:, 16:] * dl[:, sidx + 1 : sidx + 2] - ml[:, sidx + 1 : sidx + 2]
            )
    return out


def quant_q2_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x16 = x.reshape(n, 16, 16)
    d, dmin, sc, m, q = _fit_asym(x16, 3, 15)
    scales = (sc & 0x0F) | (m << 4)
    q = q.reshape(n, QK_K)
    qs = np.zeros((n, 64), np.uint8)
    for half in range(2):
        for j in range(4):
            strip = q[:, 128 * half + 32 * j : 128 * half + 32 * (j + 1)]
            qs[:, 32 * half : 32 * half + 32] |= strip << (2 * j)
    return np.concatenate(
        [scales, qs, _to_f16_bytes(d[:, None]), _to_f16_bytes(dmin[:, None])],
        axis=1,
    )


def _unpack_q3k_scales(b: np.ndarray) -> np.ndarray:
    """12 packed bytes → 16 signed 6-bit scales (already −32-offset)."""
    s = np.empty(b.shape[:1] + (16,), np.int16)
    s[:, 0:4] = (b[:, 0:4] & 0x0F) | (((b[:, 8:12] >> 0) & 3) << 4)
    s[:, 4:8] = (b[:, 4:8] & 0x0F) | (((b[:, 8:12] >> 2) & 3) << 4)
    s[:, 8:12] = (b[:, 0:4] >> 4) | (((b[:, 8:12] >> 4) & 3) << 4)
    s[:, 12:16] = (b[:, 4:8] >> 4) | (((b[:, 8:12] >> 6) & 3) << 4)
    return s - 32


def _pack_q3k_scales(s: np.ndarray) -> np.ndarray:
    """16 values in [0, 63] (biased by +32) → 12 packed bytes."""
    b = np.zeros(s.shape[:1] + (12,), np.uint8)
    b[:, 0:4] = (s[:, 0:4] & 0x0F) | ((s[:, 8:12] & 0x0F) << 4)
    b[:, 4:8] = (s[:, 4:8] & 0x0F) | ((s[:, 12:16] & 0x0F) << 4)
    b[:, 8:12] = (
        ((s[:, 0:4] >> 4) << 0)
        | ((s[:, 4:8] >> 4) << 2)
        | ((s[:, 8:12] >> 4) << 4)
        | ((s[:, 12:16] >> 4) << 6)
    )
    return b


def dequant_q3_k(blocks: np.ndarray) -> np.ndarray:
    n = blocks.shape[0]
    hmask = blocks[:, 0:32]
    qs = blocks[:, 32:96]
    sc = _unpack_q3k_scales(blocks[:, 96:108]).astype(np.float32)  # (n, 16)
    d = _f16(blocks[:, 108:110])
    dl = d * sc  # (n, 16)
    out = np.empty((n, QK_K), np.float32)
    for half in range(2):
        byte = qs[:, 32 * half : 32 * half + 32]
        for j in range(4):
            bit = 4 * half + j
            q2 = ((byte >> (2 * j)) & 3).astype(np.int16)
            hi = ((hmask >> bit) & 1).astype(np.int16)
            q = q2 - np.where(hi != 0, 0, 4)  # (n, 32)
            sidx = 8 * half + 2 * j
            out[:, 128 * half + 32 * j : 128 * half + 32 * j + 16] = (
                q[:, :16].astype(np.float32) * dl[:, sidx : sidx + 1]
            )
            out[:, 128 * half + 32 * j + 16 : 128 * half + 32 * (j + 1)] = (
                q[:, 16:].astype(np.float32) * dl[:, sidx + 1 : sidx + 2]
            )
    return out


def quant_q3_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x16 = x.reshape(n, 16, 16)
    sub_scale = np.abs(x16).max(axis=2) / 4.0
    d = sub_scale.max(axis=1) / 31.0
    sc = np.rint(sub_scale * _safe_inv(d)[:, None]).clip(-32, 31).astype(np.int16)
    dl = d[:, None] * sc.astype(np.float32)
    q = (
        np.rint(x16 * _safe_inv(dl)[:, :, None]).clip(-4, 3).astype(np.int16)
        + 4
    ).reshape(n, QK_K).astype(np.uint8)  # biased to [0, 7]
    qs = np.zeros((n, 64), np.uint8)
    hmask = np.zeros((n, 32), np.uint8)
    for half in range(2):
        for j in range(4):
            bit = 4 * half + j
            strip = q[:, 128 * half + 32 * j : 128 * half + 32 * (j + 1)]
            hbit = (strip >> 2) & 1  # 1 ⇔ value in [0,3] unbiased (no −4)
            q2 = np.where(hbit != 0, strip - 4, strip)
            qs[:, 32 * half : 32 * half + 32] |= q2 << (2 * j)
            hmask |= hbit << bit
    return np.concatenate(
        [hmask, qs, _pack_q3k_scales((sc + 32).astype(np.uint8)), _to_f16_bytes(d[:, None])],
        axis=1,
    )


def dequant_q8_k(blocks: np.ndarray) -> np.ndarray:
    d = blocks[:, 0:4].copy().view(np.dtype("<f4")).astype(np.float32)
    q = blocks[:, 4 : 4 + QK_K].copy().view(np.int8).astype(np.float32)
    return q * d


def quant_q8_k(x: np.ndarray) -> np.ndarray:
    d = np.abs(x).max(axis=1) / 127.0
    q = np.rint(x * _safe_inv(d)[:, None]).clip(-127, 127).astype(np.int8)
    bsums = q.reshape(-1, 16, 16).sum(axis=2).astype(np.dtype("<i2"))
    return np.concatenate(
        [
            d[:, None].astype(np.dtype("<f4")).view(np.uint8),
            q.view(np.uint8),
            bsums.view(np.uint8).reshape(-1, 32),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# MXFP4 (gpt-oss native) and IQ4_NL — LUT nibble formats, 32-element blocks
# ---------------------------------------------------------------------------

# 2× the e2m1 values; the ×1/2 is folded into the E8M0 scale (2^(e−128)).
MXFP4_KVALUES = np.array(
    [0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12], dtype=np.float32
)

IQ4_NL_KVALUES = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.float32,
)


def dequant_mxfp4(blocks: np.ndarray) -> np.ndarray:
    e = blocks[:, 0:1].astype(np.int32)
    d = np.exp2((e - 127).astype(np.float32) - 1.0)  # E8M0-to-fp32 half
    lo, hi = _nibbles_lo_hi(blocks[:, 1:17])
    q = np.concatenate([lo, hi], axis=1)
    return MXFP4_KVALUES[q] * d


def quant_mxfp4(x: np.ndarray) -> np.ndarray:
    absmax = np.abs(x).max(axis=1)
    with np.errstate(divide="ignore"):
        e = np.where(
            absmax > 0, np.ceil(np.log2(absmax / 12.0)) + 128.0, 0.0
        ).clip(0, 255)
    d = np.exp2(e - 128.0)
    scaled = x * _safe_inv(d)[:, None]
    # nearest code in the 16-entry LUT
    q = np.abs(scaled[:, :, None] - MXFP4_KVALUES[None, None, :]).argmin(axis=2)
    q = q.astype(np.uint8)
    return np.concatenate(
        [e.astype(np.uint8)[:, None], q[:, :16] | (q[:, 16:] << 4)], axis=1
    )


def dequant_iq4_nl(blocks: np.ndarray) -> np.ndarray:
    d = _f16(blocks[:, 0:2])
    lo, hi = _nibbles_lo_hi(blocks[:, 2:18])
    q = np.concatenate([lo, hi], axis=1)
    return IQ4_NL_KVALUES[q] * d


def quant_iq4_nl(x: np.ndarray) -> np.ndarray:
    # map absmax onto the largest LUT magnitude so the tails stay representable
    d = np.abs(x).max(axis=1) / 113.0
    scaled = x * _safe_inv(d)[:, None]
    q = np.abs(scaled[:, :, None] - IQ4_NL_KVALUES[None, None, :]).argmin(axis=2)
    q = q.astype(np.uint8)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), q[:, :16] | (q[:, 16:] << 4)], axis=1
    )


# ---------------------------------------------------------------------------
# float types
# ---------------------------------------------------------------------------


def _fit_kvalues(x: np.ndarray, w: np.ndarray | None = None,
                 n_iter: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Fit rows of ``x`` (n, m) to ``s · IQ4_NL_KVALUES[q]``.

    The scalar-grid analog of make_qx_quants (llama-quant.cpp): alternate
    nearest-gridpoint assignment with the (optionally importance-weighted)
    least-squares scale.  Returns (s (n,), q (n, m) indices 0..15)."""
    kv = IQ4_NL_KVALUES.astype(np.float32)  # (16,) −127..113
    if w is None:
        w = np.ones_like(x)
    idx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(len(x)), idx]
    s = mx / kv[0]  # max-magnitude value maps to the −127 end (ggml habit)
    q = np.zeros(x.shape, np.int64)
    for _ in range(n_iter):
        inv = _safe_inv(s)
        q = np.abs((x * inv[:, None])[..., None] - kv).argmin(-1)
        kvq = kv[q]
        num = (w * x * kvq).sum(1)
        den = (w * kvq * kvq).sum(1)
        s = np.where(den > 0, num / np.where(den > 0, den, 1.0), s)
    return s.astype(np.float32), q


def quant_iq4_xs(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ4_XS encoder (reference quantize_row_iq4_xs role): per-32 scalar
    grid search over the IQ4_NL kvalues, 6-bit sub-scales under one f16
    superblock scale.  ``w`` (same shape as x) enables imatrix weighting."""
    nb = x.shape[0]
    sub = x.reshape(nb * 8, 32)
    ws = w.reshape(nb * 8, 32).astype(np.float32) + 1e-8 if w is not None else None
    s, _ = _fit_kvalues(sub, ws)
    s = s.reshape(nb, 8)
    d = np.abs(s).max(1) / 31.0  # 6-bit signed scale grid [−32, 31]
    inv_d = _safe_inv(d)
    si = np.rint(s * inv_d[:, None]).clip(-32, 31).astype(np.int32)
    # final assignment against the QUANTIZED scales
    eff = (d[:, None] * si).reshape(nb * 8)
    inv = _safe_inv(eff)
    q = np.abs((sub * inv[:, None])[..., None]
               - IQ4_NL_KVALUES.astype(np.float32)).argmin(-1)
    q = q.reshape(nb, 8, 32).astype(np.uint8)
    su = (si + 32).astype(np.uint8)  # 0..63
    sl = ((su & 0x0F)[:, 0::2] | ((su & 0x0F)[:, 1::2] << 4))  # (nb, 4)
    hi2 = (su >> 4).astype(np.uint16)  # (nb, 8) 2-bit
    sh = np.zeros(nb, np.uint16)
    for i in range(8):
        sh |= hi2[:, i] << np.uint16(2 * i)
    qs = (q[:, :, :16] | (q[:, :, 16:] << 4)).reshape(nb, 128)
    return np.concatenate([
        _to_f16_bytes(d[:, None]),
        sh[:, None].view(np.uint8).reshape(nb, 2),
        sl.astype(np.uint8),
        qs.astype(np.uint8),
    ], axis=1)


def dequant_f32(blocks: np.ndarray) -> np.ndarray:
    return blocks.reshape(blocks.shape[0], -1).copy().view(np.dtype("<f4"))


def dequant_f16(blocks: np.ndarray) -> np.ndarray:
    return (
        blocks.reshape(blocks.shape[0], -1)
        .copy()
        .view(np.dtype("<f2"))
        .astype(np.float32)
    )


def dequant_bf16(blocks: np.ndarray) -> np.ndarray:
    u16 = blocks.reshape(blocks.shape[0], -1).copy().view(np.dtype("<u2"))
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def quant_bf16(x: np.ndarray) -> np.ndarray:
    u32 = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
    # round-to-nearest-even on the dropped 16 bits
    rounded = (u32 + 0x7FFF + ((u32 >> 16) & 1)) >> 16
    return rounded.astype(np.dtype("<u2")).view(np.uint8)


# ---------------------------------------------------------------------------
# codebook i-quants (IQ1/IQ2/IQ3/IQ4_XS) — decode-only, like the reference's
# Python stack.  Codebooks are format-defined data (gguf/iq_grids.py);
# decoding math per the GGUF spec: per-superblock f16 scale, sub-block
# scale nibbles, grid indices into the codebook, packed sign bits.
# ---------------------------------------------------------------------------

from . import iq_grids as _IQG  # noqa: E402


def _iq_grid(name):
    return _IQG.decode_grid(
        getattr(_IQG, f"{name}_HEX"),
        getattr(_IQG, f"{name}_SHAPE"),
        getattr(_IQG, f"{name}_MAP"),
    )


class _IQLazy:
    """Grids decode on first use (import stays cheap)."""

    _cache: dict = {}

    @classmethod
    def get(cls, name):
        if name not in cls._cache:
            cls._cache[name] = _iq_grid(name)
        return cls._cache[name]


# 7-bit sign codes + odd-parity bit 7 (the format's ksigns table, derived)
_KSIGNS = np.asarray(
    [i | ((bin(i).count("1") & 1) << 7) for i in range(128)], np.uint8
)


def _expand_sign_codes(codes):
    """(..., ) 7-bit sign codes → (..., 8) ±1 floats via the parity table."""
    s = _KSIGNS[codes & 0x7F]
    bits = (s[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 0, np.float32(1), np.float32(-1))


def _expand_sign_bytes(raw):
    """(..., ) raw sign bytes → (..., 8) ±1 floats (iq2_s/iq3_s store full bytes)."""
    bits = (raw[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits == 0, np.float32(1), np.float32(-1))


def dequant_iq2_xxs(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    q32 = b[:, 2:].copy().view(np.uint32).reshape(n, -1, 2)  # (n, 8, 2)
    db = d * (0.5 + (q32[..., 1] >> 28).astype(np.float32)) * 0.25  # (n, 8)
    codes = q32[..., 0].copy().view(np.uint8).reshape(n, -1, 4)  # grid idx
    grid = _IQLazy.get("IQ2_XXS")[codes.reshape(n, -1)]  # (n, 32, 8)
    sign_codes = (q32[..., 1][..., None] >> np.asarray([0, 7, 14, 21], np.uint32)) & 0x7F
    signs = _expand_sign_codes(sign_codes.reshape(n, -1).astype(np.uint8))
    return (db[..., None, None] * grid.reshape(n, -1, 4, 8) * signs.reshape(n, -1, 4, 8)).reshape(n, QK_K)


def dequant_iq2_xs(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2 : 2 + QK_K // 4].copy().view(np.uint16)  # (n, 32)
    sc = b[:, 2 + QK_K // 4 :]  # (n, 8) nibble pairs
    sub = ((sc[..., None] >> np.asarray([0, 4], np.uint8)) & 0x0F).reshape(n, -1)
    db = d * (0.5 + sub.astype(np.float32)) * 0.25  # (n, 16)
    grid = _IQLazy.get("IQ2_XS")[qs & 511]  # (n, 32, 8)
    signs = _expand_sign_codes((qs >> 9).astype(np.uint8))  # (n, 32, 8)
    vals = grid * signs
    return (db[..., None, None] * vals.reshape(n, -1, 2, 8)).reshape(n, QK_K)


def dequant_iq2_s(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    o = 2
    qs = b[:, o : o + QK_K // 8]; o += QK_K // 8
    sb = b[:, o : o + QK_K // 8]; o += QK_K // 8
    qh = b[:, o : o + QK_K // 32]; o += QK_K // 32
    sc = b[:, o:]
    sub = ((sc[..., None] >> np.asarray([0, 4], np.uint8)) & 0x0F).reshape(n, -1)
    db = d * (0.5 + sub.astype(np.float32)) * 0.25
    hi = (qh[..., None] >> np.asarray([0, 2, 4, 6], np.uint8)) & 0x03
    idx = qs.astype(np.uint16) | (hi.reshape(n, -1).astype(np.uint16) << 8)
    grid = _IQLazy.get("IQ2_S")[idx]  # (n, 32, 8)
    signs = _expand_sign_bytes(sb)  # (n, 32, 8)
    return (db[..., None, None] * (grid * signs).reshape(n, -1, 2, 8)).reshape(n, QK_K)


def dequant_iq3_xxs(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2 : 2 + QK_K // 4]  # (n, 64) grid byte indices
    sc = b[:, 2 + QK_K // 4 :].copy().view(np.uint32)  # (n, 8)
    db = d * (0.5 + (sc >> 28).astype(np.float32)) * 0.5
    grid = _IQLazy.get("IQ3_XXS")[qs]  # (n, 64, 4)
    sign_codes = (sc[..., None] >> np.asarray([0, 7, 14, 21], np.uint32)) & 0x7F
    signs = _expand_sign_codes(sign_codes.reshape(n, -1).astype(np.uint8))  # (n,32,8)
    return (db[..., None, None] * grid.reshape(n, -1, 4, 8) * signs.reshape(n, -1, 4, 8)).reshape(n, QK_K)


def dequant_iq3_s(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    o = 2
    qs = b[:, o : o + QK_K // 4]; o += QK_K // 4
    qh = b[:, o : o + QK_K // 32]; o += QK_K // 32
    sb = b[:, o : o + QK_K // 8]; o += QK_K // 8
    sc = b[:, o:]
    sub = ((sc[..., None] >> np.asarray([0, 4], np.uint8)) & 0x0F).reshape(n, -1)
    db = d * (1.0 + 2.0 * sub.astype(np.float32))  # (n, 8)
    hi = (qh[..., None] >> np.arange(8, dtype=np.uint8)) & 0x01
    idx = qs.astype(np.uint16) | (hi.reshape(n, -1).astype(np.uint16) << 8)
    grid = _IQLazy.get("IQ3_S")[idx]  # (n, 64, 4)
    signs = _expand_sign_bytes(sb)  # (n, 32, 8)
    return (db[..., None, None] * grid.reshape(n, -1, 4, 8) * signs.reshape(n, -1, 4, 8)).reshape(n, QK_K)


_IQ1_DELTA = np.float32(0.125)


def dequant_iq1_s(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2 : 2 + QK_K // 8]  # (n, 32)
    qh = b[:, 2 + QK_K // 8 :].copy().view(np.uint16)  # (n, 16)
    dl = d * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)  # (n, 16)
    delta = np.where((qh & 0x8000) == 0, _IQ1_DELTA, -_IQ1_DELTA)  # (n, 16)
    hi = (qh[..., None] >> np.asarray([0, 3, 6, 9], np.uint16)) & 7
    idx = qs.astype(np.uint16) | (hi.reshape(n, -1).astype(np.uint16) << 8)
    grid = _IQLazy.get("IQ1_S")[idx]  # (n, 32, 8)
    out = dl[..., None, None] * (grid.reshape(n, -1, 4, 8) + delta[..., None, None])
    return out.reshape(n, QK_K)


def dequant_iq1_m(b):
    n = b.shape[0]
    qs = b[:, : QK_K // 8]
    qh = b[:, QK_K // 8 : QK_K // 8 + QK_K // 16]
    sc = b[:, QK_K // 8 + QK_K // 16 :].copy().view(np.uint16)  # (n, 4)
    # the f16 superblock scale hides in the top nibbles of the 4 scale words
    dbits = (sc & np.uint16(0xF000)) >> np.asarray([12, 8, 4, 0], np.uint16)
    d = (dbits[:, 0] | dbits[:, 1] | dbits[:, 2] | dbits[:, 3]).copy().view(np.float16).astype(np.float32)
    sub = ((sc[..., None] >> np.asarray([0, 3, 6, 9], np.uint16)) & 0x07).reshape(n, -1)
    dl = d[:, None] * (2 * sub.astype(np.float32) + 1)  # (n, 16)
    hi = (qh[..., None] >> np.asarray([0, 4], np.uint8)) & 0x0F
    hi = hi.reshape(n, -1)
    idx = qs.astype(np.uint16) | ((hi & 0x07).astype(np.uint16) << 8)
    delta = np.where((hi & 0x08) == 0, _IQ1_DELTA, -_IQ1_DELTA)  # (n, 32)
    grid = _IQLazy.get("IQ1_M")[idx]  # (n, 32, 8)
    out = dl.reshape(n, -1, 2, 1, 1) * (
        grid.reshape(n, -1, 2, 2, 8) + delta.reshape(n, -1, 2, 2, 1)
    )
    return out.reshape(n, QK_K)


# -- codebook ENCODERS (round-4: the reference quantizes to i-quants with
#    imatrix-guided codebook search, llama-quant.cpp:178; here the same
#    role vectorized in numpy: nearest-codebook-row assignment on the
#    magnitude pattern, signs packed per format, alternating with a
#    weighted-least-squares scale refit).  Quality discipline is the
#    round-trip RMSE + fixture ppl-δ tests, not bit-equality with the
#    reference encoder (encoders are free; DECODE is the format).


def _grid_assign(absx: np.ndarray, s: np.ndarray, grid: np.ndarray,
                 chunk: int = 1 << 16) -> np.ndarray:
    """Nearest codebook row per group: absx (G, m), s (G,) scales,
    grid (N, m) magnitude patterns → (G,) indices.  Chunked so the
    (G, N) distance matrix stays in cache-sized pieces."""
    out = np.empty(absx.shape[0], np.int64)
    target = absx * _safe_inv(s)[:, None]
    g2 = (grid * grid).sum(1)
    for lo in range(0, absx.shape[0], chunk):
        t = target[lo:lo + chunk]
        # argmin ||t − g||² = argmin (g·g − 2 t·g)
        d = g2[None, :] - 2.0 * (t @ grid.T)
        out[lo:lo + chunk] = d.argmin(1)
    return out


def _sign_code7(signs: np.ndarray, absx: np.ndarray) -> np.ndarray:
    """(G, 8) desired sign bits (1 = negative) → 7-bit codes whose
    parity-implied 8th bit matches; when it doesn't, flip the bit of the
    smallest-|x| element among the first 7 vs accepting the 8th-element
    error — whichever costs less."""
    bits = signs.astype(np.uint8)
    code = np.zeros(len(bits), np.uint8)
    for i in range(7):
        code |= bits[:, i] << np.uint8(i)
    parity = np.zeros(len(bits), np.uint8)
    for i in range(7):
        parity ^= (code >> np.uint8(i)) & 1
    mismatch = parity != bits[:, 7]
    if mismatch.any():
        # candidate A: leave code, 8th element sign flips (cost |x8|)
        # candidate B: flip the smallest of the first 7 (cost min |x0..6|)
        small7 = absx[:, :7].argmin(1)
        cost_a = absx[:, 7]
        cost_b = absx[np.arange(len(bits)), small7]
        use_b = mismatch & (cost_b < cost_a)
        idx = np.where(use_b)[0]
        code[idx] ^= (1 << small7[idx]).astype(np.uint8)
    return code


def _fit_subscale_4bit(s: np.ndarray, base: float, step: float):
    """Sub-scales s (nb, k) → (d (nb,), q4 (nb, k) ints 0..15) for the
    iq2/iq3 layout  db = d·(base + q4)·step."""
    d = s.max(1) / ((base + 15.0) * step)
    inv = _safe_inv(d)
    q4 = np.rint(s * inv[:, None] / step - base).clip(0, 15).astype(np.uint32)
    return d.astype(np.float32), q4


def _iq_scale_refit(absx: np.ndarray, g: np.ndarray, w: np.ndarray):
    """Weighted LS scale per row: argmin_s Σ w (|x| − s·g)²."""
    num = (w * absx * g).sum(1)
    den = (w * g * g).sum(1)
    return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)


def quant_iq2_xxs(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ2_XXS encoder: 256-entry 8-value magnitude codebook, 7-bit
    parity sign codes, 4-bit sub-scales under one f16 d."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ2_XXS").astype(np.float32)  # (256, 8)
    absx = np.abs(x).reshape(nb * 32, 8)
    ww = (w.reshape(nb * 32, 8).astype(np.float32) + 1e-8
          if w is not None else np.ones_like(absx))
    # initial per-32 scale from the group absmax against the grid ceiling
    s = np.maximum(absx.reshape(nb * 8, 32).max(1), 1e-12) / grid.max()
    q = None
    for _ in range(3):
        q = _grid_assign(absx, np.repeat(s, 4), grid)
        gsel = grid[q]
        s = _iq_scale_refit(absx.reshape(nb * 8, 32),
                            gsel.reshape(nb * 8, 32),
                            ww.reshape(nb * 8, 32))
        s = np.maximum(s, 1e-12)
    d, q4 = _fit_subscale_4bit(s.reshape(nb, 8), 0.5, 0.25)
    codes = _sign_code7((x < 0).reshape(nb * 32, 8), absx)
    q = q.reshape(nb, 8, 4).astype(np.uint32)
    codes = codes.reshape(nb, 8, 4).astype(np.uint32)
    w0 = (q[:, :, 0] | (q[:, :, 1] << 8) | (q[:, :, 2] << 16)
          | (q[:, :, 3] << 24))
    w1 = (codes[:, :, 0] | (codes[:, :, 1] << 7) | (codes[:, :, 2] << 14)
          | (codes[:, :, 3] << 21) | (q4 << 28))
    data = np.stack([w0, w1], axis=-1).astype("<u4")  # (nb, 8, 2)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), data.reshape(nb, -1).view(np.uint8)],
        axis=1)


def quant_iq3_xxs(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ3_XXS encoder: 256-entry 4-value codebook (byte indices), 7-bit
    parity sign codes per 8, 4-bit sub-scales, db = d·(0.5+q4)·0.5."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ3_XXS").astype(np.float32)  # (256, 4)
    absx4 = np.abs(x).reshape(nb * 64, 4)
    ww = (w.reshape(nb * 64, 4).astype(np.float32) + 1e-8
          if w is not None else np.ones_like(absx4))
    s = np.maximum(np.abs(x).reshape(nb * 8, 32).max(1), 1e-12) / grid.max()
    q = None
    for _ in range(3):
        q = _grid_assign(absx4, np.repeat(s, 8), grid)
        gsel = grid[q]
        s = _iq_scale_refit(np.abs(x).reshape(nb * 8, 32),
                            gsel.reshape(nb * 8, 32),
                            ww.reshape(nb * 8, 32))
        s = np.maximum(s, 1e-12)
    d, q4 = _fit_subscale_4bit(s.reshape(nb, 8), 0.5, 0.5)
    absx8 = np.abs(x).reshape(nb * 32, 8)
    codes = _sign_code7((x < 0).reshape(nb * 32, 8), absx8)
    codes = codes.reshape(nb, 8, 4).astype(np.uint32)
    sc = (codes[:, :, 0] | (codes[:, :, 1] << 7) | (codes[:, :, 2] << 14)
          | (codes[:, :, 3] << 21) | (q4 << 28)).astype("<u4")
    qs = q.reshape(nb, 64).astype(np.uint8)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qs, sc.view(np.uint8).reshape(nb, 32)],
        axis=1)


def quant_iq2_xs(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ2_XS encoder: 512-entry codebook, 9-bit index + 7-bit sign code
    per u16, 4-bit sub-scales per 16 values."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ2_XS").astype(np.float32)  # (512, 8)
    absx = np.abs(x).reshape(nb * 32, 8)
    ww = (w.reshape(nb * 16, 16).astype(np.float32) + 1e-8
          if w is not None else np.ones((nb * 16, 16), np.float32))
    s = np.maximum(np.abs(x).reshape(nb * 16, 16).max(1), 1e-12) / grid.max()
    q = None
    for _ in range(3):
        q = _grid_assign(absx, np.repeat(s, 2), grid)
        gsel = grid[q]
        s = _iq_scale_refit(np.abs(x).reshape(nb * 16, 16),
                            gsel.reshape(nb * 16, 16), ww)
        s = np.maximum(s, 1e-12)
    d, q4 = _fit_subscale_4bit(s.reshape(nb, 16), 0.5, 0.25)
    codes = _sign_code7((x < 0).reshape(nb * 32, 8), absx)
    qs = (q.reshape(nb, 32).astype("<u2")
          | (codes.reshape(nb, 32).astype("<u2") << 9))
    scb = (q4[:, 0::2] | (q4[:, 1::2] << 4)).astype(np.uint8)  # (nb, 8)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qs.view(np.uint8).reshape(nb, 64), scb],
        axis=1)


def quant_iq2_s(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ2_S encoder: 1024-entry codebook (8+2-bit index), FULL sign
    bytes (no parity constraint), 4-bit sub-scales per 16."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ2_S").astype(np.float32)  # (1024, 8)
    absx = np.abs(x).reshape(nb * 32, 8)
    ww = (w.reshape(nb * 16, 16).astype(np.float32) + 1e-8
          if w is not None else np.ones((nb * 16, 16), np.float32))
    s = np.maximum(np.abs(x).reshape(nb * 16, 16).max(1), 1e-12) / grid.max()
    q = None
    for _ in range(3):
        q = _grid_assign(absx, np.repeat(s, 2), grid)
        gsel = grid[q]
        s = _iq_scale_refit(np.abs(x).reshape(nb * 16, 16),
                            gsel.reshape(nb * 16, 16), ww)
        s = np.maximum(s, 1e-12)
    d, q4 = _fit_subscale_4bit(s.reshape(nb, 16), 0.5, 0.25)
    sign_bits = (x < 0).reshape(nb * 32, 8).astype(np.uint8)
    sb = np.zeros(nb * 32, np.uint8)
    for i in range(8):
        sb |= sign_bits[:, i] << np.uint8(i)
    q = q.reshape(nb, 32)
    qs = (q & 0xFF).astype(np.uint8)
    hi = (q >> 8).astype(np.uint8).reshape(nb, 8, 4)  # 2-bit highs
    qh = (hi[:, :, 0] | (hi[:, :, 1] << 2) | (hi[:, :, 2] << 4)
          | (hi[:, :, 3] << 6)).astype(np.uint8)
    scb = (q4[:, 0::2] | (q4[:, 1::2] << 4)).astype(np.uint8)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qs, sb.reshape(nb, 32), qh, scb], axis=1)


def quant_iq3_s(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ3_S encoder: 512-entry 4-value codebook (8+1-bit index), full
    sign bytes, 4-bit sub-scales per 32, db = d·(1+2·q4)."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ3_S").astype(np.float32)  # (512, 4)
    absx4 = np.abs(x).reshape(nb * 64, 4)
    ww = (w.reshape(nb * 8, 32).astype(np.float32) + 1e-8
          if w is not None else np.ones((nb * 8, 32), np.float32))
    s = np.maximum(np.abs(x).reshape(nb * 8, 32).max(1), 1e-12) / grid.max()
    q = None
    for _ in range(3):
        q = _grid_assign(absx4, np.repeat(s, 8), grid)
        gsel = grid[q]
        s = _iq_scale_refit(np.abs(x).reshape(nb * 8, 32),
                            gsel.reshape(nb * 8, 32), ww)
        s = np.maximum(s, 1e-12)
    # db = d·(1 + 2·q4): q4 ∈ 0..15
    d = s.reshape(nb, 8).max(1) / 31.0
    inv = _safe_inv(d)
    q4 = np.rint((s.reshape(nb, 8) * inv[:, None] - 1.0) / 2.0).clip(
        0, 15).astype(np.uint32)
    sign_bits = (x < 0).reshape(nb * 32, 8).astype(np.uint8)
    sb = np.zeros(nb * 32, np.uint8)
    for i in range(8):
        sb |= sign_bits[:, i] << np.uint8(i)
    q = q.reshape(nb, 64)
    qs = (q & 0xFF).astype(np.uint8)
    hi = (q >> 8).astype(np.uint8).reshape(nb, 8, 8)  # 1-bit highs
    qh = np.zeros((nb, 8), np.uint8)
    for i in range(8):
        qh |= hi[:, :, i] << np.uint8(i)
    scb = (q4[:, 0::2] | (q4[:, 1::2] << 4)).astype(np.uint8)  # (nb, 4)
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qs, qh, sb.reshape(nb, 32), scb], axis=1)


def quant_iq1_s(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """IQ1_S encoder: 2048-entry ±1-valued codebook per 8; per 32-value
    sub-block one shared delta sign, one 3-bit scale (db = d·(2·q3+1)),
    dequant value = db · (grid ± 0.125)."""
    nb = x.shape[0]
    grid = _IQLazy.get("IQ1_S").astype(np.float32)  # (2048, 8) signed
    x8 = x.reshape(nb * 32, 8)
    x32 = x.reshape(nb * 8, 32)
    ww = (w.reshape(nb * 8, 32).astype(np.float32) + 1e-8
          if w is not None else np.ones((nb * 8, 32), np.float32))
    s = np.maximum(np.abs(x32).max(1), 1e-12)
    # delta sign per 32: positive when the sub-block leans positive
    delta = np.where(x32.mean(1) >= 0, _IQ1_DELTA,
                     -_IQ1_DELTA).astype(np.float32)
    q = None
    for _ in range(3):
        # assign SIGNED values against grid + delta (grid entries carry
        # the signs for this format)
        target = x8 * _safe_inv(np.repeat(s, 4))[:, None]
        d8 = np.repeat(delta, 4)
        qq = np.empty(len(x8), np.int64)
        step = 1 << 12
        g2 = (grid * grid).sum(1)
        for lo in range(0, len(x8), step):
            t = target[lo:lo + step] - d8[lo:lo + step, None]
            dist = g2[None, :] - 2.0 * (t @ grid.T)
            qq[lo:lo + step] = dist.argmin(1)
        q = qq
        gsel = (grid[q] + np.repeat(delta, 4)[:, None]).reshape(nb * 8, 32)
        s = _iq_scale_refit(x32, gsel, ww)
        s = np.maximum(s, 1e-12)
    d = s.reshape(nb, 8).max(1) / 15.0
    inv = _safe_inv(d)
    q3 = np.rint((s.reshape(nb, 8) * inv[:, None] - 1.0) / 2.0).clip(
        0, 7).astype(np.uint16)
    q = q.reshape(nb, 32)
    qs = (q & 0xFF).astype(np.uint8)
    hi3 = (q >> 8).astype(np.uint16).reshape(nb, 8, 4)
    qh = (hi3[:, :, 0] | (hi3[:, :, 1] << 3) | (hi3[:, :, 2] << 6)
          | (hi3[:, :, 3] << 9)).astype("<u2")
    qh |= q3 << np.uint16(12)
    qh |= (np.where(delta.reshape(nb, 8) < 0, 1, 0) << 15).astype("<u2")
    return np.concatenate(
        [_to_f16_bytes(d[:, None]), qs, qh.view(np.uint8).reshape(nb, 16)],
        axis=1)


def dequant_iq4_xs(b):
    n = b.shape[0]
    d = _f16(b[:, 0:2])
    sh = b[:, 2:4].copy().view(np.uint16)  # (n, 1) scale high bits
    sl = b[:, 4 : 4 + QK_K // 64]  # (n, 4) scale low nibbles
    qs = b[:, 4 + QK_K // 64 :]  # (n, 128) value nibbles
    lo = ((sl[..., None] >> np.asarray([0, 4], np.uint8)) & 0x0F).reshape(n, -1)
    hi = ((sh[..., None] >> np.arange(0, 16, 2, dtype=np.uint16)) & 0x03).reshape(n, -1)
    scales = ((lo | (hi << 4)).astype(np.int8) - 32).astype(np.float32)  # (n, 8)
    db = d * scales  # per 32 values
    qlo = (qs & 0x0F).reshape(n, -1, 16)
    qhi = (qs >> 4).reshape(n, -1, 16)
    q = np.concatenate([qlo, qhi], axis=-1).reshape(n, -1)  # (n, 256)
    vals = IQ4_NL_KVALUES[q].astype(np.float32).reshape(n, -1, 32)
    return (db[..., None] * vals).reshape(n, QK_K)


# ---------------------------------------------------------------------------
# registry + public API
# ---------------------------------------------------------------------------

_DEQUANT = {
    GGMLType.F32: dequant_f32,
    GGMLType.F16: dequant_f16,
    GGMLType.BF16: dequant_bf16,
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q2_K: dequant_q2_k,
    GGMLType.Q3_K: dequant_q3_k,
    GGMLType.Q4_K: dequant_q4_k,
    GGMLType.Q5_K: dequant_q5_k,
    GGMLType.Q6_K: dequant_q6_k,
    GGMLType.Q8_K: dequant_q8_k,
    GGMLType.MXFP4: dequant_mxfp4,
    GGMLType.IQ4_NL: dequant_iq4_nl,
    GGMLType.IQ4_XS: dequant_iq4_xs,
    GGMLType.IQ2_XXS: dequant_iq2_xxs,
    GGMLType.IQ2_XS: dequant_iq2_xs,
    GGMLType.IQ2_S: dequant_iq2_s,
    GGMLType.IQ3_XXS: dequant_iq3_xxs,
    GGMLType.IQ3_S: dequant_iq3_s,
    GGMLType.IQ1_S: dequant_iq1_s,
    GGMLType.IQ1_M: dequant_iq1_m,
}

_QUANT = {
    GGMLType.F32: lambda x: np.ascontiguousarray(x, np.dtype("<f4")).view(np.uint8),
    GGMLType.F16: lambda x: np.ascontiguousarray(x.astype(np.dtype("<f2"))).view(np.uint8),
    GGMLType.BF16: quant_bf16,
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q2_K: quant_q2_k,
    GGMLType.Q3_K: quant_q3_k,
    GGMLType.Q4_K: quant_q4_k,
    GGMLType.Q5_K: quant_q5_k,
    GGMLType.Q6_K: quant_q6_k,
    GGMLType.Q8_K: quant_q8_k,
    GGMLType.MXFP4: quant_mxfp4,
    GGMLType.IQ4_NL: quant_iq4_nl,
    GGMLType.IQ4_XS: quant_iq4_xs,
    GGMLType.IQ2_XXS: quant_iq2_xxs,
    GGMLType.IQ2_XS: quant_iq2_xs,
    GGMLType.IQ2_S: quant_iq2_s,
    GGMLType.IQ3_XXS: quant_iq3_xxs,
    GGMLType.IQ3_S: quant_iq3_s,
    GGMLType.IQ1_S: quant_iq1_s,
}


def supported_dequant_types() -> list[GGMLType]:
    return sorted(_DEQUANT.keys())


def supported_quant_types() -> list[GGMLType]:
    return sorted(_QUANT.keys())


def dequantize(data: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...]) -> np.ndarray:
    """Decode raw GGUF tensor bytes to float32.

    ``data`` is the flat uint8 byte array; ``shape`` is the logical tensor
    shape with the *last* axis contiguous (numpy order — the reverse of the
    GGUF ``ne`` order, which lists the fastest axis first).
    """
    ggml_type = GGMLType(ggml_type)
    if ggml_type not in _DEQUANT:
        raise NotImplementedError(f"dequantize: unsupported type {ggml_type.name}")
    blck, bsize = GGML_BLOCK_SIZES[ggml_type]
    n_elem = int(np.prod(shape)) if shape else 1
    n_blocks = n_elem // blck
    if n_blocks * bsize != data.size:
        raise ValueError(
            f"{ggml_type.name}: got {data.size} bytes for {n_elem} elements "
            f"(expected {n_blocks * bsize})"
        )
    # hot path: the native thread-pool library (native/lcg_dequant.cpp);
    # numpy codecs remain the oracle + fallback
    if n_blocks >= 4096:
        from .native import native_dequantize

        out = native_dequantize(data, int(ggml_type), n_blocks, blck)
        if out is not None:
            return out.reshape(shape)
    out = _DEQUANT[ggml_type](data.reshape(n_blocks, bsize))
    return out.reshape(shape)


def quantize(x: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    """Encode a float32 array into raw GGUF block bytes (flat uint8)."""
    ggml_type = GGMLType(ggml_type)
    if ggml_type not in _QUANT:
        raise NotImplementedError(f"quantize: unsupported type {ggml_type.name}")
    blck, _ = GGML_BLOCK_SIZES[ggml_type]
    n_elem = x.size
    if n_elem % blck:
        raise ValueError(
            f"{ggml_type.name}: {n_elem} elements not divisible by block {blck} "
            f"(tensor shape {x.shape})"
        )
    flat = np.ascontiguousarray(x, np.float32).reshape(n_elem // blck, blck)
    return _QUANT[ggml_type](flat).reshape(-1)


# ---------------------------------------------------------------------------
# importance-weighted quantization (llama-quant.cpp make_qx_quants analog)
# ---------------------------------------------------------------------------


def _weighted_scale_quant(x: np.ndarray, w: np.ndarray, qmin: int, qmax: int,
                          d0: np.ndarray, n_iter: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Alternate quantize-to-grid / weighted-least-squares-scale refinement.

    x, w: (n, blck); d0: (n,) initial scales.  Returns (d, q)."""
    d = d0.copy()
    q = np.zeros_like(x, dtype=np.int32)
    for _ in range(n_iter):
        inv = _safe_inv(d)
        q = np.rint(x * inv[:, None]).clip(qmin, qmax).astype(np.int32)
        # optimal d given q: argmin_d Σ w (x − d q)² = Σwxq / Σwq²
        num = (w * x * q).sum(axis=1)
        den = (w * q * q).sum(axis=1)
        d = np.where(den > 0, num / np.where(den > 0, den, 1.0), d)
    return d, q


def quantize_weighted(x: np.ndarray, ggml_type: GGMLType,
                      weights: np.ndarray | None) -> np.ndarray:
    """Quantize with per-input-channel importance weights (imatrix values).

    ``weights`` has the length of the last tensor axis (mean squared
    activation per channel); rows are quantized to minimize the weighted
    reconstruction error, matching the role of make_qx_quants in
    llama-quant.cpp.  Supported: Q4_0/Q5_0/Q8_0 (scale formats); other
    types fall back to the unweighted encoder."""
    ggml_type = GGMLType(ggml_type)
    if weights is None:
        return quantize(x, ggml_type)
    if ggml_type == GGMLType.Q4_K:
        return _quantize_weighted_q4_k(x, weights)
    iq_weighted = {
        GGMLType.IQ4_XS: quant_iq4_xs,
        GGMLType.IQ2_XXS: quant_iq2_xxs,
        GGMLType.IQ2_XS: quant_iq2_xs,
        GGMLType.IQ2_S: quant_iq2_s,
        GGMLType.IQ3_XXS: quant_iq3_xxs,
        GGMLType.IQ3_S: quant_iq3_s,
        GGMLType.IQ1_S: quant_iq1_s,
    }
    if ggml_type in iq_weighted:
        K = x.shape[-1]
        w_row = np.asarray(weights, np.float32).reshape(-1)[:K]
        flat = np.ascontiguousarray(x, np.float32).reshape(-1, QK_K)
        wfull = np.broadcast_to(w_row, x.shape).reshape(-1, QK_K)
        return iq_weighted[ggml_type](flat, wfull.astype(np.float32)).reshape(-1)
    grids = {
        GGMLType.Q4_0: (-8, 7),
        GGMLType.Q5_0: (-16, 15),
        GGMLType.Q8_0: (-127, 127),
    }
    if ggml_type not in grids:
        return quantize(x, ggml_type)
    blck, _ = GGML_BLOCK_SIZES[ggml_type]
    K = x.shape[-1]
    w_row = np.broadcast_to(np.asarray(weights, np.float32).reshape(-1)[:K], x.shape[-1:])
    flat = np.ascontiguousarray(x, np.float32).reshape(-1, blck)
    wfull = np.broadcast_to(w_row, x.shape).reshape(-1, blck).astype(np.float32)
    wfull = wfull + 1e-8  # keep zero-importance channels weakly pinned

    qmin, qmax = grids[ggml_type]
    idx = np.argmax(np.abs(flat), axis=1)
    mx = flat[np.arange(flat.shape[0]), idx]
    d0 = mx / float(qmin)  # max-magnitude maps to the negative end (ggml)
    d, q = _weighted_scale_quant(flat, wfull, qmin, qmax, d0)

    if ggml_type == GGMLType.Q8_0:
        return np.concatenate(
            [_to_f16_bytes(d[:, None]), q.astype(np.int8).view(np.uint8)], axis=1
        ).reshape(-1)
    if ggml_type == GGMLType.Q4_0:
        qu = (q + 8).clip(0, 15).astype(np.uint8)
        return np.concatenate(
            [_to_f16_bytes(d[:, None]), qu[:, :16] | (qu[:, 16:] << 4)], axis=1
        ).reshape(-1)
    # Q5_0
    qu = (q + 16).clip(0, 31).astype(np.uint8)
    bits = np.concatenate([(qu[:, :16] >> 4) & 1, (qu[:, 16:] >> 4) & 1], axis=1)
    return np.concatenate(
        [
            _to_f16_bytes(d[:, None]),
            _pack_qh(bits),
            (qu[:, :16] & 0x0F) | ((qu[:, 16:] & 0x0F) << 4),
        ],
        axis=1,
    ).reshape(-1)


def _quantize_weighted_q4_k(x: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Importance-weighted Q4_K (llama-quant.cpp make_qkx3_quants role):
    per-32-sub-block (scale, min) refined by weighted least squares, then
    packed into the 6-bit scale/min grid."""
    K = x.shape[-1]
    w_row = np.asarray(weights, np.float32).reshape(-1)[:K]
    flat = np.ascontiguousarray(x, np.float32).reshape(-1, QK_K)
    wfull = np.broadcast_to(np.broadcast_to(w_row, x.shape).reshape(-1, QK_K), flat.shape)
    wfull = (wfull + 1e-8).astype(np.float32)
    n = flat.shape[0]
    x32 = flat.reshape(n, 8, 32)
    w32 = wfull.reshape(n, 8, 32)

    # init from the unweighted asymmetric fit
    mn = x32.min(axis=2)
    mn = np.minimum(mn, 0.0)
    dl = (x32.max(axis=2) - mn) / 15.0  # (n, 8) sub-block scales
    ml = -mn  # dequant is dl*q - ml

    for _ in range(3):
        inv = _safe_inv(dl)
        q = np.clip(np.rint((x32 + ml[:, :, None]) * inv[:, :, None]), 0, 15)
        # weighted least squares for (dl, ml) given q: x ≈ dl*q - ml
        sw = w32.sum(axis=2)
        swq = (w32 * q).sum(axis=2)
        swx = (w32 * x32).sum(axis=2)
        swqq = (w32 * q * q).sum(axis=2)
        swqx = (w32 * q * x32).sum(axis=2)
        det = sw * swqq - swq * swq
        ok = det > 1e-12
        new_dl = np.where(ok, (sw * swqx - swq * swx) / np.where(ok, det, 1.0), dl)
        new_ml = np.where(ok, -(swqq * swx - swq * swqx) / np.where(ok, det, 1.0), ml)
        # Q4_K requires non-negative scale/min (6-bit unsigned grid)
        dl = np.maximum(new_dl, 1e-12)
        ml = np.maximum(new_ml, 0.0)

    d = dl.max(axis=1) / 63.0
    dmin = ml.max(axis=1) / 63.0
    sc = np.clip(np.rint(dl * _safe_inv(d)[:, None]), 0, 63).astype(np.uint8)
    m = np.clip(np.rint(ml * _safe_inv(dmin)[:, None]), 0, 63).astype(np.uint8)
    dl_q = d[:, None] * sc
    ml_q = dmin[:, None] * m
    q = np.clip(
        np.rint((x32 + ml_q[:, :, None]) * _safe_inv(dl_q)[:, :, None]), 0, 15
    ).astype(np.uint8)

    qs = np.empty((n, 128), np.uint8)
    for j in range(4):
        lo, hi = q[:, 2 * j], q[:, 2 * j + 1]
        qs[:, 32 * j : 32 * (j + 1)] = lo | (hi << 4)
    return np.concatenate(
        [
            _to_f16_bytes(d[:, None]),
            _to_f16_bytes(dmin[:, None]),
            _pack_k4_scales(sc, m),
            qs,
        ],
        axis=1,
    ).reshape(-1)
