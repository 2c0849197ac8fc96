"""Tokenizer golden tests against the reference's committed fixtures.

The reference drives ``test-tokenizer-0`` over vocab GGUFs with paired
``.inp``/``.out`` files (prompts separated by ``__ggml_vocab_test__``; one
line of space-separated ids per prompt).  We replay the same fixtures.
"""

import os

import pytest

from llama_cpp_gfx906_tpu.gguf import GGUFReader
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf

from conftest import REFERENCE_DIR, reference_available

MODELS_DIR = os.path.join(REFERENCE_DIR, "models")

GOLDEN_FIXTURES = [
    "llama-spm",
    "phi-3",
    "gpt-2",
    "falcon",
    "deepseek-llm",
    "deepseek-coder",
    "mpt",
    "starcoder",
    "refact",
    "bert-bge",
]


def load_golden(name):
    sep = "\n__ggml_vocab_test__\n"
    with open(os.path.join(MODELS_DIR, f"ggml-vocab-{name}.gguf.inp"), encoding="utf-8") as f:
        raw = f.read()
    prompts = raw.split(sep)
    if raw.endswith(sep):
        prompts = prompts[:-1]
    with open(os.path.join(MODELS_DIR, f"ggml-vocab-{name}.gguf.out"), encoding="utf-8") as f:
        outs = [
            [int(t) for t in line.split()] for line in f.read().splitlines()
        ]
    assert len(prompts) == len(outs), f"{name}: {len(prompts)} prompts vs {len(outs)} outputs"
    return list(zip(prompts, outs))


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not mounted")
@pytest.mark.parametrize("name", GOLDEN_FIXTURES)
def test_tokenizer_golden(name):
    tok = tokenizer_from_gguf(GGUFReader(os.path.join(MODELS_DIR, f"ggml-vocab-{name}.gguf")))
    failures = []
    cases = load_golden(name)
    for prompt, expect in cases:
        got = tok.tokenize(prompt, add_special=False, parse_special=False)
        if got != expect:
            failures.append((prompt, expect, got))
    detail = "\n".join(
        f"  {p!r}\n    want {e}\n    got  {g}" for p, e, g in failures[:5]
    )
    assert not failures, f"{name}: {len(failures)}/{len(cases)} mismatches\n{detail}"


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not mounted")
@pytest.mark.parametrize("name", ["llama-spm", "gpt-2"])
def test_detokenize_round_trip(name):
    tok = tokenizer_from_gguf(GGUFReader(os.path.join(MODELS_DIR, f"ggml-vocab-{name}.gguf")))
    for text in ["Hello world", "  leading spaces", "tab\tnewline\n", "ünïcodé ♔ text"]:
        ids = tok.tokenize(text, add_special=False, parse_special=False)
        assert tok.detokenize(ids) == text, (text, ids)


# -----------------------------------------------------------------------------
# PLaMo2 (Viterbi DP tokenizer; reference llm_tokenizer_plamo2,
# llama-vocab.cpp:1208-1472)
# -----------------------------------------------------------------------------


def _plamo2_vocab():
    import numpy as np
    from llama_cpp_gfx906_tpu.tokenizers.vocab import SpecialTokens, Vocab

    tokens = ["<|plamo:unk|>", "<|plamo:bos|>", "<|plamo:eos|>"]
    types = [2, 3, 3]
    for b in range(256):  # byte fallback tokens
        tokens.append(f"<0x{b:02X}>")
        types.append(6)
    pieces = {"hello": 2.0, "hell": 1.0, "he": 0.5, "llo": 1.5, "o": 0.1,
              " world": 2.5, " ": 0.2, "wor": 1.0, "ld": 0.8, "l": 0.05}
    scores = [0.0] * len(tokens)
    for p, s in pieces.items():
        tokens.append(p)
        types.append(1)
        scores.append(s)
    scores = [0.0] * 259 + [pieces[p] for p in pieces]
    return Vocab(
        model="plamo2", pre="", tokens=tokens,
        scores=np.asarray(scores, np.float32),
        token_types=np.asarray(types, np.int32),
        special=SpecialTokens(bos=1, eos=2, unk=0),
        merges=None, add_bos=True, add_eos=False, chat_template=None,
    )


def test_plamo2_dp_segmentation():
    from llama_cpp_gfx906_tpu.tokenizers import PLaMo2Tokenizer

    v = _plamo2_vocab()
    tok = PLaMo2Tokenizer(v)
    ids = tok.tokenize("hello world", add_special=False)
    texts = [v.tokens[i] for i in ids]
    # DP picks the highest-scoring segmentation: "hello" + " world"
    assert texts == ["hello", " world"], texts
    assert tok.detokenize(ids) == "hello world"


def test_plamo2_byte_fallback():
    from llama_cpp_gfx906_tpu.tokenizers import PLaMo2Tokenizer

    v = _plamo2_vocab()
    tok = PLaMo2Tokenizer(v)
    ids = tok.tokenize("héllo", add_special=False)  # é is unknown → utf-8 bytes
    assert tok.detokenize(ids) == "héllo"
    # the é must have come out as its two UTF-8 byte tokens
    eb = "é".encode("utf-8")
    assert v.tokens.index(f"<0x{eb[0]:02X}>") in ids
    assert v.tokens.index(f"<0x{eb[1]:02X}>") in ids


def test_plamo2_specials_and_bos():
    from llama_cpp_gfx906_tpu.tokenizers import PLaMo2Tokenizer

    v = _plamo2_vocab()
    tok = PLaMo2Tokenizer(v)
    ids = tok.tokenize("hello<|plamo:eos|>", add_special=True, parse_special=True)
    assert ids[0] == 1  # bos
    assert ids[-1] == 2  # parsed eos literal


def test_plamo2_from_gguf_dispatch(tmp_path):
    import numpy as np
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.constants import Keys
    from llama_cpp_gfx906_tpu.tokenizers import PLaMo2Tokenizer, tokenizer_from_gguf

    v = _plamo2_vocab()
    w = GGUFWriter(str(tmp_path / "p2.gguf"), "plamo2")
    w.add_string(Keys.Tokenizer.MODEL, "plamo2")
    w.add_array(Keys.Tokenizer.LIST, v.tokens)
    w.add_array(Keys.Tokenizer.SCORES, v.scores)
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, v.token_types)
    w.add_uint32(Keys.Tokenizer.BOS_ID, 1)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 2)
    w.add_uint32(Keys.Tokenizer.UNK_ID, 0)
    w.add_tensor("token_embd.weight", np.zeros((4, 8), np.float32))
    path = w.write()
    tok = tokenizer_from_gguf(GGUFReader(path))
    assert isinstance(tok, PLaMo2Tokenizer)
    assert tok.detokenize(tok.tokenize("hello world", add_special=False)) == "hello world"
