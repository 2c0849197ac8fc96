"""Quant codec tests: round-trip RMSE bounds + layout self-consistency.

Mirrors the reference's test strategy (``tests/test-quantize-fns.cpp``:
quantize→dequantize RMSE bounds per type; ``gguf-py/tests/test_quants.py``:
cross-checking codec layouts).
"""

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize, dequantize, GGML_BLOCK_SIZES
from llama_cpp_gfx906_tpu.gguf import quants

RNG = np.random.default_rng(42)

# Max RMSE (relative to input std) per type: ~1.3× the round-to-nearest
# noise floor of each format on gaussian data with 4σ outliers.  A layout
# or codec bug produces rmse ≈ 1.0, far above any bound here.  (Same role
# as test-quantize-fns.cpp's MAX_QUANTIZATION_TOTAL_ERROR bounds.)
RMSE_BOUNDS = {
    GGMLType.F32: 0.0,
    GGMLType.F16: 0.001,
    GGMLType.BF16: 0.005,
    GGMLType.Q8_0: 0.012,
    GGMLType.Q8_K: 0.020,
    GGMLType.Q6_K: 0.036,
    GGMLType.Q5_K: 0.063,
    GGMLType.Q5_0: 0.090,
    GGMLType.Q5_1: 0.080,
    GGMLType.Q4_K: 0.130,
    GGMLType.Q4_0: 0.175,
    GGMLType.Q4_1: 0.160,
    GGMLType.IQ4_NL: 0.160,
    GGMLType.Q3_K: 0.320,
    GGMLType.MXFP4: 0.210,
    GGMLType.Q2_K: 0.500,
}


@pytest.mark.parametrize("qtype", sorted(RMSE_BOUNDS, key=lambda t: t.name))
def test_round_trip_rmse(qtype):
    n = 256 * 16
    x = RNG.standard_normal(n).astype(np.float32)
    # synthesize some structure like real weights (heavy tails)
    x[::17] *= 4.0
    raw = quantize(x, qtype)
    blck, bsize = GGML_BLOCK_SIZES[qtype]
    assert raw.size == n // blck * bsize
    y = dequantize(raw, qtype, (n,))
    rmse = np.sqrt(np.mean((x - y) ** 2)) / x.std()
    assert rmse <= RMSE_BOUNDS[qtype], f"{qtype.name}: rmse {rmse:.4f}"


@pytest.mark.parametrize("qtype", sorted(RMSE_BOUNDS, key=lambda t: t.name))
def test_idempotent_requant(qtype):
    """quantize(dequantize(quantize(x))) must be (near-)stable."""
    if qtype in (GGMLType.F32,):
        return
    n = 256 * 4
    x = RNG.standard_normal(n).astype(np.float32)
    raw1 = quantize(x, qtype)
    y1 = dequantize(raw1, qtype, (n,))
    raw2 = quantize(y1, qtype)
    y2 = dequantize(raw2, qtype, (n,))
    # re-quantizing already-quantized values should add much less error than
    # the first pass did (grid drift only)
    denom = max(np.abs(y1).max(), 1e-6)
    assert np.abs(y1 - y2).max() / denom < 0.25, qtype.name


def test_q8_0_grid_values():
    """A ramp hitting the int8 grid decodes within one f16-scale step."""
    x = np.arange(-16, 16, dtype=np.float32)
    y = dequantize(quantize(x, GGMLType.Q8_0), GGMLType.Q8_0, (32,))
    step = 16.0 / 127.0
    assert np.abs(y - x).max() <= step


def test_q4_0_known_layout():
    """Hand-constructed Q4_0 block decodes to the spec values."""
    d = np.float16(2.0)
    qs = np.arange(16, dtype=np.uint8) | (np.arange(16, dtype=np.uint8) << 4)
    raw = np.concatenate([np.frombuffer(d.tobytes(), np.uint8), qs])
    y = dequantize(raw, GGMLType.Q4_0, (32,))
    expect = np.concatenate([np.arange(16) - 8.0, np.arange(16) - 8.0]) * 2.0
    np.testing.assert_allclose(y, expect)


def test_q8_k_bsums():
    x = RNG.standard_normal(512).astype(np.float32)
    raw = quantize(x, GGMLType.Q8_K)
    blocks = raw.reshape(2, -1)
    qs = blocks[:, 4:260].copy().view(np.int8)
    bsums = blocks[:, 260:292].copy().view("<i2")
    np.testing.assert_array_equal(bsums, qs.reshape(2, 16, 16).sum(axis=2))


def test_k_scale_pack_round_trip():
    sc = RNG.integers(0, 64, (7, 8)).astype(np.uint8)
    m = RNG.integers(0, 64, (7, 8)).astype(np.uint8)
    packed = quants._pack_k4_scales(sc, m)
    sc2, m2 = quants._unpack_k4_scales(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(m, m2)


def test_q3k_scale_pack_round_trip():
    s = RNG.integers(0, 64, (5, 16)).astype(np.uint8)
    unpacked = quants._unpack_q3k_scales(quants._pack_q3k_scales(s))
    np.testing.assert_array_equal(unpacked, s.astype(np.int16) - 32)


def test_mxfp4_codes():
    """All 16 MXFP4 codes decode through the kvalue LUT with E8M0 scaling."""
    e = np.uint8(128)  # scale 2^0 = 1
    qs = (np.arange(16, dtype=np.uint8)) | (np.arange(16, dtype=np.uint8) << 4)
    raw = np.concatenate([[e], qs]).astype(np.uint8)
    y = dequantize(raw, GGMLType.MXFP4, (32,))
    np.testing.assert_allclose(y[:16], quants.MXFP4_KVALUES)
    np.testing.assert_allclose(y[16:], quants.MXFP4_KVALUES)


def test_multirow_shape_handling():
    x = RNG.standard_normal((8, 512)).astype(np.float32)
    raw = quantize(x, GGMLType.Q4_K)
    y = dequantize(raw, GGMLType.Q4_K, (8, 512))
    assert y.shape == (8, 512)
    # per-row quantization must be independent: row 0 decodes identically alone
    raw0 = quantize(x[0], GGMLType.Q4_K)
    y0 = dequantize(raw0, GGMLType.Q4_K, (512,))
    np.testing.assert_array_equal(y[0], y0)
