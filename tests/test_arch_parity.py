"""Architecture-family parity vs HF transformers (torch CPU oracle).

Extends the llama parity contract to the non-llama graph shapes:
GPT-2 (LayerNorm, learned positions, fused qkv, ungated gelu MLP) and
Phi-2 (parallel residual, partial NEOX rotary, biases everywhere).
Reference builders: llm_build_gpt2 / llm_build_phi2 (src/llama-model.cpp).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gpt2, convert_hf_phi

VOCAB = 96


def dummy_vocab(model="gpt2"):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    d = {
        "model": model,
        "tokens": tokens,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }
    if model == "llama":
        d["scores"] = [0.0] * VOCAB
    return d


@pytest.fixture(scope="module")
def gpt2_pair(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        GPT2Config(
            vocab_size=VOCAB, n_positions=128, n_embd=64, n_layer=3, n_head=4,
            activation_function="gelu_new",
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("gpt2") / "tiny-gpt2-f32.gguf")
    convert_hf_gpt2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


@pytest.fixture(scope="module")
def phi_pair(tmp_path_factory):
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(1)
    hf = PhiForCausalLM(
        PhiConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
            partial_rotary_factor=0.5, max_position_embeddings=128,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("phi") / "tiny-phi-f32.gguf")
    convert_hf_phi(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def _check_parity(path, hf, rtol=2e-3, atol=2e-3):
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9, 88, 5, 63, 21]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=rtol, atol=atol)
    return eng


def _check_greedy(eng, hf, prompt_ids=(3, 17, 42, 9), n_steps=10):
    ids = list(prompt_ids)
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt_ids):]

    eng.reset()
    logits = eng.prefill(list(prompt_ids))
    got = []
    for _ in range(n_steps):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out


def test_gpt2_logits_parity(gpt2_pair):
    path, hf = gpt2_pair
    eng = _check_parity(path, hf)
    assert eng.cfg.norm_type == "layer"
    assert eng.cfg.pos_emb == "learned"
    assert not eng.cfg.ffn_gated


def test_gpt2_greedy_decode(gpt2_pair):
    path, hf = gpt2_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    _check_greedy(eng, hf)


def test_phi_logits_parity(phi_pair):
    path, hf = phi_pair
    eng = _check_parity(path, hf)
    assert eng.cfg.parallel_residual
    assert eng.cfg.rope_dim == eng.cfg.head_dim // 2


def test_phi_greedy_decode(phi_pair):
    path, hf = phi_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    _check_greedy(eng, hf)


def test_gpt2_quantized(gpt2_pair, tmp_path):
    _, hf = gpt2_pair
    q = str(tmp_path / "tiny-gpt2-q8.gguf")
    convert_hf_gpt2(hf, dummy_vocab(), q, quant_type=GGMLType.Q8_0)
    eng = Engine.from_gguf(q, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    got = eng.prefill(ids)
    assert int(np.argmax(got)) == int(np.argmax(ref))


@pytest.fixture(scope="module")
def phi3_pair(tmp_path_factory):
    from transformers import Phi3Config, Phi3ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_phi3

    torch.manual_seed(2)
    hf = Phi3ForCausalLM(
        Phi3Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=0, eos_token_id=1,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("phi3") / "tiny-phi3-f32.gguf")
    convert_hf_phi3(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_phi3_fused_tensor_parity(phi3_pair):
    """Exercises effective_tensors: fused attn_qkv + gate||up ffn_up split
    at load (reference: llm_build_phi3 views)."""
    path, hf = phi3_pair
    eng = _check_parity(path, hf)
    layers = eng.params["layers"]
    # the split projections may be re-fused by the loader fast path
    assert "wq" in layers or "wqkv_fused" in layers
    assert "w_gate" in layers or "wgateup_fused" in layers


def test_phi3_greedy(phi3_pair):
    path, hf = phi3_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    _check_greedy(eng, hf)


def test_phi3_quantized_fused_split(phi3_pair, tmp_path):
    """Row-slicing of QUANTIZED fused tensors must stay bit-exact."""
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_phi3

    _, hf = phi3_pair
    q = str(tmp_path / "tiny-phi3-q8.gguf")
    convert_hf_phi3(hf, dummy_vocab(), q, quant_type=GGMLType.Q8_0)
    eng = Engine.from_gguf(q, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    got = eng.prefill(ids)
    assert int(np.argmax(got)) == int(np.argmax(ref))
