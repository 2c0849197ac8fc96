"""Auto HF→GGUF conversion: model_type dispatch, tokenizer extraction, CLI.

Behavioral contract: reference ``convert_hf_to_gguf.py`` (positional model
dir → GGUF with full tokenizer metadata; SPM via sentencepiece proto, BPE
via tokenizer.json; pretokenizer family detection)."""

import json
import struct

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llama_cpp_gfx906_tpu.gguf.constants import GGMLType, TokenType
from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_for_vocab
from llama_cpp_gfx906_tpu.tokenizers.vocab import vocab_from_gguf
from llama_cpp_gfx906_tpu.tools.convert_auto import (
    convert_hf_auto,
    detect_pre,
    extract_hf_vocab,
    main,
    parse_spm_model,
)

VOCAB = 97


# -- protobuf helpers to author a tiny sentencepiece model in-test ----------


def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _pb_field(field: int, wire: int, payload: bytes) -> bytes:
    return _pb_varint((field << 3) | wire) + payload


def _pb_piece(piece: str, score: float, ptype: int) -> bytes:
    body = _pb_field(1, 2, _pb_varint(len(piece.encode())) + piece.encode())
    body += _pb_field(2, 5, struct.pack("<f", score))
    body += _pb_field(3, 0, _pb_varint(ptype))
    return _pb_field(1, 2, _pb_varint(len(body)) + body)


def test_spm_proto_parse():
    data = (
        _pb_piece("<unk>", 0.0, int(TokenType.UNKNOWN))
        + _pb_piece("<s>", 0.0, int(TokenType.CONTROL))
        + _pb_piece("▁hello", -2.5, int(TokenType.NORMAL))
        + _pb_piece("<0x41>", 0.0, int(TokenType.BYTE))
        # NormalizerSpec with add_dummy_prefix=0
        + _pb_field(3, 2, _pb_varint(2) + _pb_field(3, 0, _pb_varint(0)))
    )
    tv = parse_spm_model(data)
    assert tv["tokens"] == ["<unk>", "<s>", "▁hello", "<0x41>"]
    assert tv["token_types"] == [2, 3, 1, 6]
    assert abs(tv["scores"][2] + 2.5) < 1e-6
    assert tv["add_space_prefix"] is False


GPT2_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)"
)


def _write_bpe_dir(path, chat_template=None):
    """Tiny byte-level-ish BPE tokenizer.json + config dir."""
    toks = ["<unk>", "<s>", "</s>"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    toks += ["ab", "abc", "Ġthe", "Ġ"]  # Ġthe
    vocab = {t: i for i, t in enumerate(toks)}
    tj = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": ["a b", "ab c", "Ġ t"],
        },
        "pre_tokenizer": {
            "type": "Sequence",
            "pretokenizers": [
                {"type": "Split", "pattern": {"Regex": GPT2_RE}, "behavior": "Isolated"},
                {"type": "ByteLevel", "add_prefix_space": False},
            ],
        },
        "added_tokens": [
            {"id": 1, "content": "<s>", "special": True},
            {"id": 2, "content": "</s>", "special": True},
        ],
    }
    (path / "tokenizer.json").write_text(json.dumps(tj))
    tok_cfg = {"add_bos_token": True}
    if chat_template:
        tok_cfg["chat_template"] = chat_template
    (path / "tokenizer_config.json").write_text(json.dumps(tok_cfg))
    return toks


def test_bpe_extraction_and_pre(tmp_path):
    toks = _write_bpe_dir(tmp_path, chat_template="{{ messages }}")
    (tmp_path / "config.json").write_text(json.dumps(
        {"model_type": "gpt2", "bos_token_id": 1, "eos_token_id": 2}))
    tv = extract_hf_vocab(tmp_path)
    assert tv["model"] == "gpt2"
    assert tv["tokens"] == toks
    assert tv["merges"] == ["a b", "ab c", "Ġ t"]
    assert tv["token_types"][1] == int(TokenType.CONTROL)
    assert tv["bos"] == 1 and tv["eos"] == 2
    assert tv["add_bos"] is True
    assert tv["chat_template"] == "{{ messages }}"
    assert tv["pre"] in ("gpt-2", "mpt", "olmo", "jais")  # shared regex family


def test_detect_pre_llama3():
    tj = {"pre_tokenizer": {"type": "Split", "pattern": {"Regex":
        r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*"}}}
    assert detect_pre(tj) in ("llama-bpe", "llama3", "dbrx", "smaug-bpe")


def _save_tiny_llama(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=33, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )).eval()
    hf.save_pretrained(str(tmp_path))
    # hand-made SPM vocab file so extraction has a real tokenizer to read
    data = _pb_piece("<unk>", 0.0, int(TokenType.UNKNOWN))
    data += _pb_piece("<s>", 0.0, int(TokenType.CONTROL))
    data += _pb_piece("</s>", 0.0, int(TokenType.CONTROL))
    for i in range(3, 33):
        data += _pb_piece(f"▁t{i}", -float(i), int(TokenType.NORMAL))
    (tmp_path / "tokenizer.model").write_bytes(data)
    return hf


def test_auto_convert_llama_end_to_end(tmp_path):
    hf = _save_tiny_llama(tmp_path)
    out = str(tmp_path / "auto.gguf")
    convert_hf_auto(tmp_path, out, outtype="f32")

    r = GGUFReader(out)
    voc = vocab_from_gguf(r)
    assert voc.model == "llama" and voc.n_tokens == 33
    assert voc.special.bos == 1 and voc.special.eos == 2

    eng = Engine.from_gguf(out, max_seq=32, dtype=jnp.float32)
    ids = [3, 17, 29, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)


def test_auto_convert_rope_scaling_llama3(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=33, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False,
    )).eval()
    hf.save_pretrained(str(tmp_path))
    data = b"".join(_pb_piece(f"▁t{i}", -1.0, 1) for i in range(33))
    (tmp_path / "tokenizer.model").write_bytes(data)

    out = str(tmp_path / "l3.gguf")
    convert_hf_auto(tmp_path, out, outtype="f32")
    eng = Engine.from_gguf(out, max_seq=48, dtype=jnp.float32)
    ids = list(range(3, 11))
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_auto_convert_bpe_qwen2(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(5)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=33, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    hf.save_pretrained(str(tmp_path))
    _write_bpe_dir(tmp_path)  # 33 tokens
    cfg = json.loads((tmp_path / "config.json").read_text())
    cfg.update(bos_token_id=1, eos_token_id=2)
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    out = str(tmp_path / "qwen2.gguf")
    convert_hf_auto(tmp_path, out, outtype="f32")
    eng = Engine.from_gguf(out, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "qwen2"
    ids = [3, 17, 29, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)
    # BPE runtime path: merges survived the round-trip
    voc = vocab_from_gguf(GGUFReader(out))
    tok = tokenizer_for_vocab(voc)
    assert tok.tokenize("abc", add_special=False) == [voc.token_to_id["abc"]]


def test_unknown_model_type(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "frobnicator"}))
    _write_bpe_dir(tmp_path)
    with pytest.raises(NotImplementedError, match="frobnicator"):
        convert_hf_auto(tmp_path, str(tmp_path / "x.gguf"))


def test_cli_vocab_only(tmp_path, capsys):
    _write_bpe_dir(tmp_path)
    (tmp_path / "config.json").write_text(json.dumps(
        {"model_type": "gpt2", "bos_token_id": 1, "eos_token_id": 2}))
    out = str(tmp_path / "vocab.gguf")
    main([str(tmp_path), "--outfile", out, "--vocab-only"])
    assert capsys.readouterr().out.strip() == out
    voc = vocab_from_gguf(GGUFReader(out))
    assert voc.model == "gpt2" and voc.merges
