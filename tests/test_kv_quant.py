"""Quantized (q8) KV cache tests (reference capability: type_k/type_v,
llama.h:322-323)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.ops.kv_quant import QuantKV, dequantize_rows, quantize_rows
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

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
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("kvq") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 16)) * 3, jnp.float32)
    q = quantize_rows(x)
    back = dequantize_rows(q, jnp.float32)
    rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.02  # int8 row quantization error bound


def test_q8_cache_close_to_fp(model_path):
    eng_f = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng_q = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    assert isinstance(eng_q.kv.k, QuantKV)
    ids = [3, 17, 42, 9, 7]
    lf = eng_f.prefill(ids)
    lq = eng_q.prefill(ids)
    assert int(np.argmax(lf)) == int(np.argmax(lq))
    # decode several tokens; greedy paths should agree on a tiny model
    for _ in range(6):
        t = int(np.argmax(lf))
        lf = eng_f.decode_one(t)
        lq = eng_q.decode_one(t)
    assert int(np.argmax(lf)) == int(np.argmax(lq))


def test_q8_cache_memory_is_int8(model_path):
    eng_q = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    assert eng_q.kv.k.q.dtype == jnp.int8
    assert eng_q.kv.k.s.shape[-1] == 1
