"""Randomized cross-check vs the HuggingFace ``tokenizers`` engine
(reference: tests/test-tokenizer-random.py, which fuzzes llama.cpp's
tokenizers against HF AutoTokenizer).

An HF BPE tokenizer is reconstructed *from the GGUF vocab fixture* (the
real llama.cpp-produced gpt-2 vocab), so both engines run the identical
merges/vocab and must agree on arbitrary text.
"""

import random
import string

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from llama_cpp_gfx906_tpu.gguf import GGUFReader
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf
from llama_cpp_gfx906_tpu.tokenizers.vocab import vocab_from_gguf

FIXTURE = "/root/reference/models/ggml-vocab-gpt-2.gguf"


@pytest.fixture(scope="module")
def pair():
    import os

    if not os.path.exists(FIXTURE):
        pytest.skip("reference vocab fixture unavailable")
    reader = GGUFReader(FIXTURE)
    ours = tokenizer_from_gguf(reader)
    v = vocab_from_gguf(reader)

    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers import pre_tokenizers, decoders

    vocab_map = {t: i for i, t in enumerate(v.tokens)}
    merges = [tuple(m.split(" ", 1)) for m in (v.merges or [])]
    hf = Tokenizer(BPE(vocab_map, merges))
    # gpt-2 pretokenizer: byte-level with the standard gpt2 regex
    hf.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    hf.decoder = decoders.ByteLevel()
    return ours, hf


CORPUS = [
    "Hello world",
    "  leading spaces",
    "CamelCase mixedNumbers123 and-punct!?",
    "unicode: héllo wörld çafé 日本語 🦙",
    "tabs\tand\nnewlines\r\n",
    "'quotes' \"double\" don't can't won't",
    "http://example.com/path?q=1&x=2",
    "1234567890 3.14159 -42",
    "",
    " ",
]


def test_corpus_matches_hf(pair):
    ours, hf = pair
    for text in CORPUS:
        got = ours.tokenize(text, add_special=False, parse_special=False)
        ref = hf.encode(text).ids
        assert got == ref, (text, got[:20], ref[:20])


def test_randomized_ascii(pair):
    ours, hf = pair
    rng = random.Random(0)
    chars = string.ascii_letters + string.digits + string.punctuation + "   \t\n"
    for _ in range(200):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(chars) for _ in range(n))
        got = ours.tokenize(text, add_special=False, parse_special=False)
        ref = hf.encode(text).ids
        assert got == ref, repr(text)


def test_randomized_unicode(pair):
    ours, hf = pair
    rng = random.Random(1)
    pools = [
        (0x20, 0x7E), (0xA0, 0xFF), (0x370, 0x3FF), (0x400, 0x4FF),
        (0x3040, 0x30FF), (0x1F300, 0x1F5FF),
    ]
    for _ in range(100):
        n = rng.randint(1, 24)
        text = "".join(
            chr(rng.randint(*pools[rng.randrange(len(pools))])) for _ in range(n)
        )
        got = ours.tokenize(text, add_special=False, parse_special=False)
        ref = hf.encode(text).ids
        assert got == ref, repr(text)


def test_roundtrip_detokenize(pair):
    ours, _ = pair
    rng = random.Random(2)
    for _ in range(100):
        n = rng.randint(0, 40)
        text = "".join(chr(rng.randint(0x20, 0x2FF)) for _ in range(n))
        ids = ours.tokenize(text, add_special=False, parse_special=False)
        assert ours.detokenize(ids) == text
