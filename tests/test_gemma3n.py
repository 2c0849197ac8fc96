"""Gemma-3n parity vs HF transformers: AltUp multi-stream residuals,
LAuReL, per-layer inputs, activation sparsity, KV-shared trailing layers
(llm_build_gemma3n_iswa, src/llama-model.cpp:10455)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine

VOCAB = 96
L = 6  # pattern-5 iSWA: layers 0-3 sliding, layer 4 full, layer 5 sliding


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "gpt2",
        "tokens": tokens,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def g3n_pair(tmp_path_factory):
    from transformers import Gemma3nTextConfig
    from transformers.models.gemma3n.modeling_gemma3n import Gemma3nForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma3n

    layer_types = ["full_attention" if (il + 1) % 5 == 0 else "sliding_attention"
                   for il in range(L)]
    torch.manual_seed(95)
    hf = Gemma3nForCausalLM(Gemma3nTextConfig(
        vocab_size=VOCAB, vocab_size_per_layer_input=VOCAB, hidden_size=32,
        intermediate_size=64, num_hidden_layers=L, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, altup_num_inputs=2,
        hidden_size_per_layer_input=8, laurel_rank=4, num_kv_shared_layers=1,
        layer_types=layer_types, sliding_window=8,
        activation_sparsity_pattern=[0.95] + [0.0] * (L - 1),
        max_position_embeddings=128, tie_word_embeddings=True,
    )).eval()
    path = str(tmp_path_factory.mktemp("g3n") / "tiny-gemma3n.gguf")
    convert_hf_gemma3n(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_gemma3n_logits_parity(g3n_pair):
    path, hf = g3n_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "gemma3n"
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.gemma3n import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=5e-3, atol=5e-3)


def test_gemma3n_decode_continuity(g3n_pair):
    """KV-shared layers must read the owner layer's updated cache at
    decode time too."""
    path, hf = g3n_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9]
    logits = eng.prefill(ids)
    t0 = int(np.argmax(logits))
    with torch.no_grad():
        ref2 = hf(torch.tensor([ids + [t0]])).logits[0, -1].float().numpy()
    got2 = eng.decode_one(t0)
    np.testing.assert_allclose(got2, ref2, rtol=5e-3, atol=5e-3)
