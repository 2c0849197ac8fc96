"""MoE parity vs HF Mixtral (oracle for build_moe_ffn semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import MixtralConfig, MixtralForCausalLM

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import VOCAB, dummy_vocab


def tiny_mixtral(seed=0):
    torch.manual_seed(seed)
    cfg = MixtralConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    return MixtralForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def mixtral_gguf(tmp_path_factory):
    model = tiny_mixtral()
    path = str(tmp_path_factory.mktemp("m") / "tiny-mixtral.gguf")
    convert_hf_llama(model, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, model


def test_mixtral_logits_parity(mixtral_gguf):
    path, hf = mixtral_gguf
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.n_experts == 4 and eng.cfg.n_experts_used == 2
    ids = [3, 17, 42, 9, 88, 5]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    got = eng.prefill(ids)  # length 6 → bucket 8 → dense-moe path
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_mixtral_decode_gather_path(mixtral_gguf):
    """Incremental decode (T=1 → expert-gather path) matches HF greedy."""
    path, hf = mixtral_gguf
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    prompt = [3, 17, 42]
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]

    logits = eng.prefill(prompt)
    got = []
    for _ in range(8):
        t = int(np.argmax(logits))
        got.append(t)
        logits = eng.decode_one(t)
    assert got == ref_out
