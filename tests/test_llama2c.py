"""llama2.c → GGUF converter (convert-llama2c-to-ggml.cpp analog).

Oracle: a tiny HF llama re-exported in llama2.c layout (with q/k rows
permuted to the interleaved-rope order llama2.c uses natively) must,
after conversion, produce the HF model's logits through the Engine."""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import permute_qk
from llama_cpp_gfx906_tpu.tools.convert_llama2c import (
    convert_llama2c, read_llama2c, read_llama2c_tokenizer)

from test_llama_parity import VOCAB, dummy_vocab, tiny_hf_model


def write_llama2c_bin(hf, path, shared=False):
    cfg = hf.config
    st = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    H, KV = cfg.num_attention_heads, cfg.num_key_value_heads
    head = D // H
    with open(path, "wb") as f:
        f.write(struct.pack("<7i", D, F, L, H, KV,
                            cfg.vocab_size if shared else -cfg.vocab_size,
                            cfg.max_position_embeddings))

        def wr(a):
            np.asarray(a, np.float32).tofile(f)

        wr(st["model.embed_tokens.weight"])
        wr(np.stack([st[f"model.layers.{i}.input_layernorm.weight"]
                     for i in range(L)]))
        # llama2.c rotates adjacent pairs → permute HF half-rotation rows
        wr(np.stack([permute_qk(st[f"model.layers.{i}.self_attn.q_proj.weight"], H)
                     for i in range(L)]))
        wr(np.stack([permute_qk(st[f"model.layers.{i}.self_attn.k_proj.weight"], KV)
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.self_attn.v_proj.weight"]
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.self_attn.o_proj.weight"]
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.post_attention_layernorm.weight"]
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.mlp.gate_proj.weight"]
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.mlp.down_proj.weight"]
                     for i in range(L)]))
        wr(np.stack([st[f"model.layers.{i}.mlp.up_proj.weight"]
                     for i in range(L)]))
        wr(st["model.norm.weight"])
        wr(np.zeros(cfg.max_position_embeddings * head, np.float32))  # freq_cis
        if not shared:
            wr(st["lm_head.weight"])


def write_llama2c_tokenizer(path, vocab):
    with open(path, "wb") as f:
        f.write(struct.pack("<i", max(len(t) for t in vocab["tokens"])))
        for tok, score in zip(vocab["tokens"], vocab["scores"]):
            b = tok.encode("utf-8")
            f.write(struct.pack("<f", float(score)))
            f.write(struct.pack("<i", len(b)))
            f.write(b)


def test_llama2c_roundtrip_matches_hf(tmp_path):
    hf = tiny_hf_model(seed=21)
    bin_path = str(tmp_path / "stories-tiny.bin")
    write_llama2c_bin(hf, bin_path)

    hp, t = read_llama2c(bin_path)
    assert hp["n_layers"] == 3 and not hp["shared"]
    assert t["wcls"].shape == (VOCAB, 64)

    gguf_path = str(tmp_path / "stories-tiny.gguf")
    convert_llama2c(bin_path, dummy_vocab(), gguf_path)

    eng = Engine.from_gguf(gguf_path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.rope_interleaved  # llama2.c = ggml NORM rope mode
    ids = [3, 17, 42, 9, 88, 5]
    got = eng.prefill(ids)
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_llama2c_shared_classifier(tmp_path):
    hf = tiny_hf_model(seed=22)
    bin_path = str(tmp_path / "shared.bin")
    write_llama2c_bin(hf, bin_path, shared=True)
    hp, t = read_llama2c(bin_path)
    assert hp["shared"]
    np.testing.assert_array_equal(t["wcls"], t["tok_emb"])


def test_llama2c_tokenizer_bin(tmp_path):
    vocab = dummy_vocab()
    tok_path = str(tmp_path / "tokenizer.bin")
    write_llama2c_tokenizer(tok_path, vocab)
    parsed = read_llama2c_tokenizer(tok_path, VOCAB)
    assert parsed["tokens"] == vocab["tokens"]
    assert parsed["scores"] == [float(s) for s in vocab["scores"]]
    assert parsed["bos"] == 1 and parsed["eos"] == 2
