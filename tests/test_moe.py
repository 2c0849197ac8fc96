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


@pytest.fixture(scope="module")
def mixtral_q8_gguf(tmp_path_factory):
    model = tiny_mixtral()
    path = str(tmp_path_factory.mktemp("mq") / "tiny-mixtral-q8.gguf")
    convert_hf_llama(model, dummy_vocab(), path, quant_type=GGMLType.Q8_0)
    return path, model


def test_moe_experts_stay_quantized(mixtral_q8_gguf):
    """Capacity contract: with keep_quantized, expert tensors must be
    QuantTensor (int8/nib4) on device, never dequantized bf16 (reference
    runs MoE fully quantized via ggml_mul_mat_id)."""
    from llama_cpp_gfx906_tpu.ops.quant_matmul import QuantTensor

    path, _ = mixtral_q8_gguf
    eng = Engine.from_gguf(path, max_seq=64, keep_quantized=True)
    layers = eng.params["layers"]
    for key in ("moe_gate", "moe_up", "moe_down"):
        assert isinstance(layers[key], QuantTensor), key
        assert layers[key].q.dtype == jnp.int8


def test_moe_quantized_matches_dequantized(mixtral_q8_gguf):
    """Quantized-resident experts give the same results as load-time
    dequantization, on both the dense (prefill) and gather (decode) paths."""
    path, _ = mixtral_q8_gguf
    eng_q = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=True)
    eng_d = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    prompt = [3, 17, 42, 9, 88, 5, 11, 2, 7]  # bucket 16 → dense scan path
    lq = eng_q.prefill(prompt)
    ld = eng_d.prefill(prompt)
    assert np.abs(lq - ld).max() < 0.05 * (np.abs(ld).max() + 1)
    # decode (T=1 → routed gather path)
    t = int(np.argmax(ld))
    dq = eng_q.decode_one(t)
    dd = eng_d.decode_one(t)
    assert int(np.argmax(dq)) == int(np.argmax(dd))
    assert np.abs(dq - dd).max() < 0.05 * (np.abs(dd).max() + 1)


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
