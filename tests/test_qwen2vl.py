"""Qwen2-VL language model + M-RoPE parity (reference: llm_build_qwen2vl,
src/llama-model.cpp:8457; ggml_rope_multi MROPE sections)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_qwen2vl

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
def qwen2vl_pair(tmp_path_factory):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(
        Qwen2VLConfig(
            text_config=dict(
                vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=128,
                rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
                tie_word_embeddings=False,
            ),
            vision_config=dict(
                depth=2, embed_dim=32, hidden_size=32, num_heads=2, in_channels=3,
                patch_size=4, spatial_merge_size=1, temporal_patch_size=1,
            ),
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("qwen2vl") / "tiny-qwen2vl-f32.gguf")
    convert_hf_qwen2vl(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_qwen2vl_text_parity(qwen2vl_pair):
    """Text-only input: M-RoPE with equal streams must equal the HF full
    forward (which derives identical t/h/w positions for text)."""
    path, hf = qwen2vl_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.mrope_sections == (1, 1, 2, 0)
    ids = [3, 17, 42, 9, 88, 5]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_qwen2vl_greedy_decode(qwen2vl_pair):
    path, hf = qwen2vl_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            logits = hf(input_ids=torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]
    logits = eng.prefill(prompt)
    got = []
    for _ in range(8):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out


def test_qwen2vl_mrope_distinct_streams(qwen2vl_pair):
    """True M-RoPE coverage: distinct (t, h, w) position streams must match
    HF's apply_multimodal_rotary_pos_emb down to the hidden states."""
    path, hf = qwen2vl_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9]
    T = len(ids)
    # non-uniform streams (uniform shifts are relative-rope no-ops):
    # t reversed (hits the high-frequency section), h doubled, w squared
    pos = np.zeros((3, 1, T), np.int64)
    pos[0, 0] = np.arange(T)[::-1]
    pos[1, 0] = np.arange(T) * 2
    pos[2, 0] = np.arange(T) ** 2
    with torch.no_grad():
        ref = hf.model.language_model(
            input_ids=torch.tensor([ids]), position_ids=torch.tensor(pos)
        ).last_hidden_state[0].float().numpy()

    from llama_cpp_gfx906_tpu.models.llama import forward

    mpos = np.zeros((1, T, 4), np.int32)
    mpos[0, :, 0] = pos[0, 0]
    mpos[0, :, 1] = pos[1, 0]
    mpos[0, :, 2] = pos[2, 0]
    hidden, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv,
                        return_hidden=True, mrope_pos=jnp.asarray(mpos))
    np.testing.assert_allclose(np.asarray(hidden[0]), ref, rtol=3e-3, atol=3e-3)

    # and the streams must matter: equal streams give different hiddens
    hidden_eq, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv,
                           return_hidden=True)
    assert np.abs(np.asarray(hidden_eq[0]) - ref).max() > 1e-3
