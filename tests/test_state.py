"""State save/load + context shift (reference strategy:
examples/save-load-state, test of llama_state_* round trip;
context-shift semantics from server.cpp:3049-3090)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
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
    path = str(tmp_path_factory.mktemp("m") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_state_roundtrip(model_path, tmp_path):
    """save → new engine → load → continued decode must match."""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 7]
    logits = eng.prefill(prompt)
    toks = [int(np.argmax(logits))]
    for _ in range(3):
        toks.append(int(np.argmax(eng.decode_one(toks[-1]))))

    sfile = str(tmp_path / "sess.bin")
    eng.save_state(sfile, prompt + toks)

    # continue original
    cont_a = [int(np.argmax(eng.decode_one(toks[-1])))]
    for _ in range(4):
        cont_a.append(int(np.argmax(eng.decode_one(cont_a[-1]))))

    # fresh engine + load
    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    hist = eng2.load_state(sfile)
    assert hist == prompt + toks
    cont_b = [int(np.argmax(eng2.decode_one(toks[-1])))]
    for _ in range(4):
        cont_b.append(int(np.argmax(eng2.decode_one(cont_b[-1]))))
    assert cont_a == cont_b


def test_state_rejects_other_model(model_path, tmp_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng.prefill([1, 2, 3])
    sfile = str(tmp_path / "sess.bin")
    eng.save_state(sfile, [1, 2, 3])

    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng2.cfg = eng2.cfg.with_(n_layers=99)
    with pytest.raises(ValueError):
        eng2.load_state(sfile)


def test_context_shift_layer0_exact(model_path):
    """Layer-0 K/V after a shift must equal a fresh prefill of the
    survivors: layer-0 keys depend only on the token + its position, so
    this isolates the row-move + re-rope correctness.  (Deeper layers
    legitimately differ — their K/V embed the dropped context; the
    reference's context shift has the same approximation.)"""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25, 33, 11, 40, 6, 28, 13]
    n_keep, n_discard = 2, 4
    eng.prefill(tokens)
    eng.context_shift(n_keep, n_discard)
    survivors = tokens[:n_keep] + tokens[n_keep + n_discard :]
    assert eng.n_past == len(survivors)

    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng2.prefill(survivors)
    n = len(survivors)
    np.testing.assert_allclose(
        np.asarray(eng.kv.k)[0, :, :n], np.asarray(eng2.kv.k)[0, :, :n], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(eng.kv.v)[0, :, :n], np.asarray(eng2.kv.v)[0, :, :n], rtol=1e-5, atol=1e-5
    )


def test_context_shift_zero_discard_noop(model_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25]
    eng.prefill(tokens)
    k_before = np.asarray(eng.kv.k).copy()
    eng.context_shift(2, 0)
    assert eng.n_past == len(tokens)
    np.testing.assert_allclose(np.asarray(eng.kv.k), k_before, rtol=1e-6, atol=1e-6)


def test_context_shift_decode_continues(model_path):
    """After a shift the engine keeps decoding deterministically."""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25, 33, 11, 40, 6, 28, 13]
    eng.prefill(tokens)
    eng.context_shift(4, 4)
    out = []
    logits = eng.decode_one(50)
    for _ in range(4):
        tok = int(np.argmax(logits))
        out.append(tok)
        logits = eng.decode_one(tok)
    assert all(0 <= t < VOCAB for t in out)
    assert eng.n_past == len(tokens) - 4 + 5


def test_seq_state_file_roundtrip(model_path, tmp_path):
    from llama_cpp_gfx906_tpu.runtime.state import load_seq_state_file, save_seq_state_file

    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    state = {
        "k": np.random.randn(3, 5, 2, 16).astype(np.float32),
        "v": np.random.randn(3, 5, 2, 16).astype(np.float32),
        "n_past": 5,
        "prompt_ids": [1, 2, 3],
        "generated": [4, 5],
    }
    f = str(tmp_path / "seq.bin")
    save_seq_state_file(f, state, eng.cfg)
    back = load_seq_state_file(f, eng.cfg)
    np.testing.assert_array_equal(back["k"], state["k"])
    assert back["n_past"] == 5 and back["generated"] == [4, 5]
