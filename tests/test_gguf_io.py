"""GGUF reader/writer tests.

Oracles: (1) self round-trip incl. splits, (2) the reference's committed
vocab GGUF fixtures (real tokenizer tables, no weights — the same fixture
strategy as reference ``tests/CMakeLists.txt:114-126``), read as pure data.
"""

import glob
import os

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.gguf import (
    GGMLType,
    GGUFModelReader,
    GGUFReader,
    GGUFWriter,
    GGUFValueType,
    Keys,
    write_split,
)

from conftest import REFERENCE_DIR, reference_available

RNG = np.random.default_rng(0)


def test_write_read_round_trip(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    w = GGUFWriter(path, "llama")
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, 64)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_bool(Keys.Tokenizer.ADD_BOS, True)
    w.add_string(Keys.General.NAME, "tiny-test")
    w.add_array(Keys.Tokenizer.LIST, ["<s>", "</s>", "hello", "▁world"])
    w.add_array(Keys.Tokenizer.SCORES, np.arange(4, dtype=np.float32))
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.array([3, 3, 1, 1], np.int32))

    t_f32 = RNG.standard_normal((8, 64)).astype(np.float32)
    t_q8 = RNG.standard_normal((16, 64)).astype(np.float32)
    t_q4k = RNG.standard_normal((4, 256)).astype(np.float32)
    w.add_tensor("output.weight", t_f32)
    w.add_tensor("blk.0.attn_q.weight", t_q8, GGMLType.Q8_0)
    w.add_tensor("blk.0.ffn_up.weight", t_q4k, GGMLType.Q4_K)
    w.write()

    r = GGUFReader(path)
    assert r.version == 3
    assert r.architecture == "llama"
    assert r.get(Keys.LLM.EMBEDDING_LENGTH) == 64
    assert abs(r.get(Keys.Attention.LAYERNORM_RMS_EPS) - 1e-5) < 1e-9
    assert r.get(Keys.Tokenizer.ADD_BOS) is True
    assert r.get(Keys.Tokenizer.LIST) == ["<s>", "</s>", "hello", "▁world"]
    np.testing.assert_array_equal(r.get(Keys.Tokenizer.SCORES), np.arange(4, dtype=np.float32))

    assert set(r.tensors) == {"output.weight", "blk.0.attn_q.weight", "blk.0.ffn_up.weight"}
    np.testing.assert_array_equal(r.tensors["output.weight"].to_f32(), t_f32)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.attn_q.weight"].shape == (16, 64)
    # quantized round trip within Q8_0 precision
    got = r.tensors["blk.0.attn_q.weight"].to_f32()
    assert np.sqrt(np.mean((got - t_q8) ** 2)) < 0.01
    # data offsets are aligned
    for t in r.tensors.values():
        assert t.offset % r.alignment == 0


def test_split_write_read(tmp_path):
    path = str(tmp_path / "model.gguf")
    tensors = [
        (f"blk.{i}.w", RNG.standard_normal((4, 32)).astype(np.float32), GGMLType.F32)
        for i in range(7)
    ]
    paths = write_split(path, "llama", [(Keys.General.NAME, "split-test", None)], tensors, 3)
    assert len(paths) == 3
    assert os.path.exists(paths[0]) and "00001-of-00003" in paths[0]

    m = GGUFModelReader(paths[0])
    assert len(m.tensors) == 7
    for name, arr, _ in tensors:
        np.testing.assert_array_equal(m[name].to_f32(), arr)


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not mounted")
@pytest.mark.parametrize(
    "fixture",
    sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REFERENCE_DIR, "models", "ggml-vocab-*.gguf"))
    ),
)
def test_read_reference_vocab_fixtures(fixture):
    """Every reference vocab GGUF parses and exposes a coherent tokenizer table."""
    r = GGUFReader(os.path.join(REFERENCE_DIR, "models", fixture))
    tokens = r.get(Keys.Tokenizer.LIST)
    assert isinstance(tokens, list) and len(tokens) > 100
    model = r.get(Keys.Tokenizer.MODEL)
    assert model in ("llama", "gpt2", "bert", "t5", "rwkv", "plamo2")
    types = r.get(Keys.Tokenizer.TOKEN_TYPE)
    if types is not None:
        assert len(types) == len(tokens)
    # BPE vocabs carry merges; SPM vocabs carry scores
    if model == "gpt2":
        assert len(r.get(Keys.Tokenizer.MERGES)) > 0
    if model == "llama":
        assert len(r.get(Keys.Tokenizer.SCORES)) == len(tokens)
