"""Constrained decoding: GBNF grammars + JSON-schema conversion.

Reference surface: src/llama-grammar.{h,cpp} (engine),
common/json-schema-to-grammar.{h,cpp} (schema converter), and the
grammar samplers at src/llama-sampling.cpp:1572-1718.
"""

from .gbnf import Grammar, GrammarParseError, GrammarVocab, PartialUtf8, decode_utf8, parse_gbnf
from .json_schema import json_schema_to_gbnf
from .lark import is_llguidance, lark_to_gbnf

__all__ = [
    "Grammar",
    "GrammarParseError",
    "GrammarVocab",
    "PartialUtf8",
    "decode_utf8",
    "parse_gbnf",
    "json_schema_to_gbnf",
    "grammar_vocab_from_tokenizer",
    "is_llguidance",
    "lark_to_gbnf",
]

_VOCAB_CACHE: dict[int, GrammarVocab] = {}


def grammar_vocab_from_tokenizer(tokenizer) -> GrammarVocab:
    """Build (and cache) the per-vocab masking tables.

    Special/control tokens get empty pieces so the grammar never selects
    them (the reference rejects non-EOG specials the same way)."""
    key = id(tokenizer)
    hit = _VOCAB_CACHE.get(key)
    if hit is not None:
        return hit
    vocab = tokenizer.vocab
    pieces: list[bytes] = []
    for i in range(vocab.n_tokens):
        if vocab.is_special(i):
            pieces.append(b"")
        else:
            try:
                pieces.append(tokenizer.token_bytes(i))
            except Exception:
                pieces.append(b"")
    gv = GrammarVocab(pieces, vocab.special.eog_ids())
    _VOCAB_CACHE[key] = gv
    return gv
