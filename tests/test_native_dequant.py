"""Native C++ dequant vs numpy-codec oracle (reference strategy:
test-backend-ops TEST mode — every backend checked against the CPU
reference per type; here native-C++ vs numpy per quant type)."""

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.gguf import quants
from llama_cpp_gfx906_tpu.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from llama_cpp_gfx906_tpu.gguf.native import native_available, native_dequantize

TYPES = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
    GGMLType.Q2_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.MXFP4,
    GGMLType.F16, GGMLType.BF16,
]


@pytest.fixture(scope="module")
def native_ok():
    if not native_available(int(GGMLType.Q4_0)):
        pytest.skip("native dequant library unavailable (g++ build failed)")


@pytest.mark.parametrize("ggml_type", TYPES, ids=lambda t: t.name)
def test_native_matches_numpy(ggml_type, native_ok):
    blck, bsize = GGML_BLOCK_SIZES[ggml_type]
    rng = np.random.default_rng(int(ggml_type))
    n_elem = blck * 813  # odd block count; exercises the tail
    x = (rng.standard_normal(n_elem) * 4).astype(np.float32)
    if ggml_type == GGMLType.F16:
        raw = x.astype("<f2").view(np.uint8)
    elif ggml_type == GGMLType.BF16:
        raw = x.view(np.uint32).astype(np.uint32)
        raw = ((raw + 0x7FFF + ((raw >> 16) & 1)) >> 16).astype("<u2").view(np.uint8)
    else:
        raw = quants.quantize(x, ggml_type)
    n_blocks = n_elem // blck

    ref = quants._DEQUANT[ggml_type](np.asarray(raw).reshape(n_blocks, bsize))
    got = native_dequantize(np.asarray(raw), int(ggml_type), n_blocks, blck)
    assert got is not None
    np.testing.assert_allclose(got, ref.reshape(n_blocks, blck), rtol=1e-6, atol=1e-6)


def test_native_multithreaded_large(native_ok):
    """Above the thread-pool threshold the result must stay identical."""
    blck, bsize = GGML_BLOCK_SIZES[GGMLType.Q4_K]
    rng = np.random.default_rng(0)
    n_blocks = 8192
    x = (rng.standard_normal(n_blocks * blck) * 2).astype(np.float32)
    raw = quants.quantize(x, GGMLType.Q4_K)
    ref = quants._DEQUANT[GGMLType.Q4_K](np.asarray(raw).reshape(n_blocks, bsize))
    got = native_dequantize(np.asarray(raw), int(GGMLType.Q4_K), n_blocks, blck, n_threads=8)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_dispatch_uses_native_above_threshold(native_ok, monkeypatch):
    """gguf.quants.dequantize routes large tensors through the native lib."""
    calls = {}
    from llama_cpp_gfx906_tpu.gguf import native as native_mod

    orig = native_mod.native_dequantize

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native_mod, "native_dequantize", spy)
    blck, _ = GGML_BLOCK_SIZES[GGMLType.Q8_0]
    n_elem = blck * 5000
    x = np.random.default_rng(1).standard_normal(n_elem).astype(np.float32)
    raw = quants.quantize(x, GGMLType.Q8_0)
    out = quants.dequantize(np.asarray(raw), GGMLType.Q8_0, (n_elem,))
    assert calls.get("hit")
    assert out.shape == (n_elem,)
