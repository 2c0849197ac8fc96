"""gpt-oss (openai_moe) parity vs HF transformers — attention sinks,
alternating sliding window, swiglu_oai MoE with biases (reference:
llm_build_openai_moe_iswa, src/llama-model.cpp:17610)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gpt_oss

VOCAB = 96


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
def oss_pair(tmp_path_factory):
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(0)
    hf = GptOssForCausalLM(
        GptOssConfig(
            vocab_size=VOCAB,
            hidden_size=64,
            intermediate_size=48,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            num_local_experts=4,
            num_experts_per_tok=2,
            sliding_window=8,
            max_position_embeddings=128,
            rope_scaling=None,
            attention_bias=True,
            tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("oss") / "tiny-gptoss-f32.gguf")
    convert_hf_gpt_oss(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_gpt_oss_config(oss_pair):
    path, hf = oss_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "gpt-oss"
    assert eng.cfg.moe_topk_softmax
    assert eng.cfg.act_fn == "swiglu_oai"
    # alternating iSWA: even layers sliding (HF layer_types)
    assert eng.cfg.swa_layers == (True, False, True, False)
    assert "sinks" in eng.params["layers"]


def test_gpt_oss_logits_parity(oss_pair):
    path, hf = oss_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    ids = [3, 17, 42, 9, 88, 5, 63, 21, 40, 6, 28, 13]  # > window: exercises SWA
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)


def test_gpt_oss_greedy_decode(oss_pair):
    path, hf = oss_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    n_steps = 10
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]

    logits = eng.prefill(prompt)
    got = []
    for _ in range(n_steps):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out
