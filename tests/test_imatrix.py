"""imatrix collection + weighted quantization (reference: tools/imatrix,
llama-quant.cpp imatrix-weighted make_qx_quants)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.quants import dequantize, quantize, quantize_weighted
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
from llama_cpp_gfx906_tpu.tools.imatrix import collect_imatrix, load_imatrix, save_imatrix

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("im") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_collect_and_roundtrip(model_path, tmp_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    rng = np.random.default_rng(0)
    chunks = [list(rng.integers(3, VOCAB, 16)) for _ in range(3)]
    stats = collect_imatrix(eng, chunks)
    # every matmul input captured, with the right channel counts
    assert "blk.0.attn_q.weight" in stats
    assert stats["blk.0.attn_q.weight"][0].shape == (64,)
    assert stats["blk.0.ffn_down.weight"][0].shape == (112,)
    assert stats["output.weight"][0].shape == (64,)
    assert stats["blk.0.attn_q.weight"][1] == 3  # chunk count
    assert (stats["blk.0.attn_q.weight"][0] >= 0).all()

    f = str(tmp_path / "im.gguf")
    save_imatrix(f, stats, dataset="synthetic", chunk_size=16)
    back = load_imatrix(f)
    np.testing.assert_allclose(
        back["blk.0.attn_q.weight"], stats["blk.0.attn_q.weight"][0] / 3, rtol=1e-6
    )


def test_weighted_quant_reduces_weighted_error():
    """Channels with high importance must reconstruct better than with the
    unweighted encoder on the weighted error metric."""
    rng = np.random.default_rng(1)
    K = 256
    x = rng.standard_normal((64, K)).astype(np.float32)
    # a handful of channels dominate importance (outlier activations)
    w = np.full(K, 0.01, np.float32)
    hot = rng.choice(K, 16, replace=False)
    w[hot] = 10.0
    # make hot channels the small-magnitude ones so rounding hurts them
    x[:, hot] *= 0.15

    for t in (GGMLType.Q4_0, GGMLType.Q5_0):
        raw_u = quantize(x, t)
        raw_w = quantize_weighted(x, t, w)
        xu = dequantize(np.asarray(raw_u), t, x.shape)
        xw = dequantize(np.asarray(raw_w), t, x.shape)
        err_u = (w * (x - xu) ** 2).sum()
        err_w = (w * (x - xw) ** 2).sum()
        assert err_w < err_u, (t, err_u, err_w)


def test_weighted_quant_uniform_close_to_plain():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w = np.ones(32, np.float32)
    raw = quantize_weighted(x, GGMLType.Q8_0, w)
    xw = dequantize(np.asarray(raw), GGMLType.Q8_0, x.shape)
    xu = dequantize(np.asarray(quantize(x, GGMLType.Q8_0)), GGMLType.Q8_0, x.shape)
    # weighted with uniform weights should be at least as good as plain
    assert ((x - xw) ** 2).sum() <= ((x - xu) ** 2).sum() * 1.01


def test_quantize_tool_with_imatrix(model_path, tmp_path):
    from llama_cpp_gfx906_tpu.tools.quantize import quantize_file

    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    rng = np.random.default_rng(0)
    stats = collect_imatrix(eng, [list(rng.integers(3, VOCAB, 16)) for _ in range(2)])
    imf = str(tmp_path / "im.gguf")
    save_imatrix(imf, stats)

    out = str(tmp_path / "q4-im.gguf")
    quantize_file(model_path, out, "Q4_0", imatrix_path=imf)
    eng_q = Engine.from_gguf(out, max_seq=64, dtype=jnp.float32)
    logits = eng_q.prefill([3, 17, 42])
    assert np.isfinite(logits).all()


def test_weighted_q4_k_reduces_weighted_error():
    rng = np.random.default_rng(5)
    K = 512
    x = rng.standard_normal((32, K)).astype(np.float32)
    w = np.full(K, 0.01, np.float32)
    hot = rng.choice(K, 32, replace=False)
    w[hot] = 10.0
    x[:, hot] *= 0.15

    raw_u = quantize(x, GGMLType.Q4_K)
    raw_w = quantize_weighted(x, GGMLType.Q4_K, w)
    xu = dequantize(np.asarray(raw_u), GGMLType.Q4_K, x.shape)
    xw = dequantize(np.asarray(raw_w), GGMLType.Q4_K, x.shape)
    err_u = (w * (x - xu) ** 2).sum()
    err_w = (w * (x - xw) ** 2).sum()
    assert err_w < err_u, (err_u, err_w)


def test_weighted_q4_k_roundtrips_via_standard_decoder():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    w = np.ones(256, np.float32)
    raw = quantize_weighted(x, GGMLType.Q4_K, w)
    xw = dequantize(np.asarray(raw), GGMLType.Q4_K, x.shape)
    # sane reconstruction through the reference-layout decoder
    rel = np.abs(xw - x).mean() / np.abs(x).mean()
    assert rel < 0.08
