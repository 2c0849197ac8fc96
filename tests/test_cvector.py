"""cvector-generator + infill sampler tests (reference:
tools/cvector-generator; llama-sampling.cpp:2504)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerChain, SamplerParams, apply_infill
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
from llama_cpp_gfx906_tpu.tools.cvector_generator import (
    collect_hidden_diffs,
    pca_directions,
    write_control_vector,
)

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
    path = str(tmp_path_factory.mktemp("cv") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_cvector_pipeline(model_path, tmp_path):
    eng = Engine.from_gguf(model_path, keep_quantized=False, dtype=jnp.float32)
    pos = ["<t1><t2><t3>", "<t1><t4>"]
    neg = ["<t9><t8><t7>", "<t9><t6>"]
    diffs = collect_hidden_diffs(eng, pos, neg)
    assert diffs.shape == (2, 2, 64)
    dirs = pca_directions(diffs)
    assert dirs.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, rtol=1e-5)

    f = str(tmp_path / "cv.gguf")
    write_control_vector(f, dirs)
    base = eng.prefill([3, 17, 42]).copy()
    eng.reset()
    eng.apply_control_vector_file(f, strength=2.0)
    steered = eng.prefill([3, 17, 42])
    assert not np.allclose(base, steered)


def test_infill_sampler_suppresses_eog():
    logits = np.zeros(10, np.float32)
    logits[1] = 1.0  # eog modestly likely but text dominates
    out = apply_infill(logits.copy(), frozenset({1}))
    assert not np.isfinite(out[1])
    assert np.isfinite(out[0])


def test_infill_sampler_forces_eog_when_dominant():
    logits = np.full(10, -10.0, np.float32)
    logits[1] = 5.0  # eog dominates
    out = apply_infill(logits.copy(), frozenset({1}))
    assert np.isfinite(out[1])
    assert not np.isfinite(out[0])


def test_infill_in_chain():
    chain = SamplerChain(SamplerParams(greedy=True, infill=True), 10)
    chain.set_eog_ids({1})
    logits = np.zeros(10, np.float32)
    logits[1] = 1.0
    logits[2] = 0.5
    assert chain.sample(logits, []) == 2  # eog suppressed → best text token
