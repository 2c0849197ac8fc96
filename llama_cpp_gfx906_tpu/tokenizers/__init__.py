"""Tokenizer families (SPM, BPE, WPM, UGM, RWKV, PLaMo2) loaded from GGUF
vocab metadata.

Reference coverage: all 6 families in ``src/llama-vocab.cpp`` (SPM :110,
BPE :279, WPM :636, UGM :752, RWKV :1156, PLaMo2 :1208).
"""

from __future__ import annotations

from .bpe import BPETokenizer
from .plamo2 import PLaMo2Tokenizer
from .rwkv import RWKVTokenizer
from .spm import SPMTokenizer
from .ugm import UGMTokenizer
from .vocab import SpecialTokens, Vocab, vocab_from_gguf
from .wpm import WPMTokenizer

Tokenizer = (
    SPMTokenizer | BPETokenizer | WPMTokenizer | UGMTokenizer | RWKVTokenizer
    | PLaMo2Tokenizer
)


def tokenizer_for_vocab(vocab: Vocab) -> Tokenizer:
    if vocab.model == "llama":
        return SPMTokenizer(vocab)
    if vocab.model == "gpt2":
        return BPETokenizer(vocab)
    if vocab.model == "bert":
        return WPMTokenizer(vocab)
    if vocab.model == "t5":
        return UGMTokenizer(vocab)
    if vocab.model == "rwkv":
        return RWKVTokenizer(vocab)
    if vocab.model == "plamo2":
        return PLaMo2Tokenizer(vocab)
    raise NotImplementedError(f"tokenizer model {vocab.model!r} not supported yet")


def tokenizer_from_gguf(reader) -> Tokenizer:
    """Build the right tokenizer for a GGUF model file."""
    return tokenizer_for_vocab(vocab_from_gguf(reader))


__all__ = [
    "BPETokenizer",
    "RWKVTokenizer",
    "UGMTokenizer",
    "SPMTokenizer",
    "WPMTokenizer",
    "SpecialTokens",
    "Tokenizer",
    "Vocab",
    "tokenizer_for_vocab",
    "tokenizer_from_gguf",
    "vocab_from_gguf",
]
