"""Diffusion LMs (Dream/LLaDA): bidirectional forward parity vs HF with a
full attention mask, plus denoising-loop behavior
(reference: llm_build_dream/llm_build_llada + examples/diffusion/
diffusion-cli.cpp)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.diffusion import DiffusionEngine, forward_bidir

VOCAB = 96
MASK_ID = 2  # reuse <unk> as the mask token in the tiny fixture


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
def dream_pair(tmp_path_factory):
    """Qwen2 donor weights under arch 'dream' (dream = the qwen2 block
    shape run non-causally, llm_build_dream :8254)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    torch.manual_seed(90)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path_factory.mktemp("dream") / "tiny-dream.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     arch="dream", permute=False)
    return path, hf


def test_dream_bidirectional_parity(dream_pair):
    """Our non-causal forward must match HF run with a full (all-attend)
    4D attention mask."""
    path, hf = dream_pair
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    ids = [3, 17, 42, 9, 88]
    T = len(ids)
    full_mask = torch.zeros(1, 1, T, T)  # additive mask: attend everywhere
    with torch.no_grad():
        ref = hf(torch.tensor([ids]), attention_mask=full_mask).logits[0].float().numpy()
    got = np.asarray(forward_bidir(eng.params, eng.cfg,
                                   jnp.asarray([ids], jnp.int32)))[0]
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_diffusion_generate_fills_all_masks(dream_pair):
    path, _ = dream_pair
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    out = eng.generate([3, 17, 42], max_length=16, steps=6, seed=1)
    assert len(out) == 13
    assert all(t != MASK_ID for t in out)
    assert all(0 <= t < VOCAB for t in out)
    # deterministic at temperature 0
    out2 = eng.generate([3, 17, 42], max_length=16, steps=6, seed=1)
    assert out == out2


def test_diffusion_block_schedule(dream_pair):
    path, _ = dream_pair
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    out = eng.generate([3, 17, 42, 9], max_length=16, steps=8,
                       schedule="block", block_length=4)
    assert len(out) == 12 and all(t != MASK_ID for t in out)


def test_diffusion_prompt_preserved(dream_pair):
    """The prompt region must never be remasked or rewritten."""
    path, _ = dream_pair
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    prompt = [3, 17, 42, 9]
    # generate() returns only the suffix; regenerate with same seed and
    # check stability as a proxy + the suffix never contains mask
    a = eng.generate(prompt, max_length=12, steps=4, seed=7)
    b = eng.generate(prompt, max_length=12, steps=4, seed=7)
    assert a == b


def test_llada_arch_routes_to_diffusion(dream_pair, tmp_path):
    """The causal Engine must refuse diffusion archs with a pointer to
    DiffusionEngine."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    torch.manual_seed(91)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-llada.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     arch="llada")
    with pytest.raises(ValueError, match="DiffusionEngine"):
        Engine.from_gguf(path)
    # and the diffusion engine runs it (llama shape, NORM rope)
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    assert not eng.shift_logits  # llada predicts in place
    out = eng.generate([3, 17], max_length=8, steps=3)
    assert len(out) == 6 and all(t != MASK_ID for t in out)


def test_llada_bidirectional_parity(tmp_path):
    """LLaDA shape: llama weights + full-mask HF forward."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    torch.manual_seed(92)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-llada2.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     arch="llada")
    eng = DiffusionEngine.from_gguf(path, mask_token_id=MASK_ID)
    ids = [3, 17, 42, 9, 88]
    T = len(ids)
    full_mask = torch.zeros(1, 1, T, T)
    with torch.no_grad():
        ref = hf(torch.tensor([ids]), attention_mask=full_mask).logits[0].float().numpy()
    got = np.asarray(forward_bidir(eng.params, eng.cfg,
                                   jnp.asarray([ids], jnp.int32)))[0]
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)
