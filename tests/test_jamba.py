"""Jamba hybrid (attention + mamba + MoE) parity vs HF transformers
(reference: llm_build_jamba + llama_memory_hybrid)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_jamba

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
def jamba_pair(tmp_path_factory):
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(0)
    hf = JambaForCausalLM(
        JambaConfig(
            vocab_size=VOCAB,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            attn_layer_period=2,  # layers 1, 3 attention; 0, 2 mamba
            attn_layer_offset=1,
            expert_layer_period=2,  # layers 1, 3 MoE
            expert_layer_offset=1,
            num_experts=4,
            num_experts_per_tok=2,
            mamba_d_state=8,
            mamba_d_conv=4,
            mamba_expand=2,
            mamba_dt_rank=8,
            use_mamba_kernels=False,
            tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("jb") / "tiny-jamba-f32.gguf")
    convert_hf_jamba(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_jamba_logits_parity(jamba_pair):
    path, hf = jamba_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.family.name == "jamba"
    ids = [3, 17, 42, 9, 88, 5]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.jamba import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)


def test_jamba_greedy_decode(jamba_pair):
    """Incremental decode through the HYBRID state (KV + conv/ssm carry)."""
    path, hf = jamba_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    n_steps = 8
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]

    logits = eng.prefill(prompt)  # bucket-padded: exercises hybrid masking
    got = []
    for _ in range(n_steps):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out
