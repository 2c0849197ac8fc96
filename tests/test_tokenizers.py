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
