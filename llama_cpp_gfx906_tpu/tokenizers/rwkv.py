"""RWKV "world" tokenizer — greedy longest-match over byte strings.

Reference: ``llm_tokenizer_rwkv`` (src/llama-vocab.cpp:1156): the vocab
is a list of raw byte strings; tokenization walks the input taking the
longest matching token at each position (a naive trie in the reference;
a length-bucketed dict here).
"""

from __future__ import annotations

from .vocab import Vocab


class RWKVTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self._by_bytes: dict[bytes, int] = {}
        max_len = 1
        for i, tok in enumerate(vocab.tokens):
            b = _token_bytes(tok)
            if b and b not in self._by_bytes:
                self._by_bytes[b] = i
                max_len = max(max_len, len(b))
        self._max_len = max_len

    def encode_fragment(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out: list[int] = []
        pos = 0
        n = len(data)
        while pos < n:
            # greedy longest match
            end = min(n, pos + self._max_len)
            tok = None
            for j in range(end, pos, -1):
                tok = self._by_bytes.get(data[pos:j])
                if tok is not None:
                    out.append(tok)
                    pos = j
                    break
            if tok is None:
                unk = self.vocab.special.unk
                out.append(unk if unk is not None else 0)
                pos += 1
        return out

    def tokenize(self, text: str, add_special: bool = False, parse_special: bool = False) -> list[int]:
        ids: list[int] = []
        for frag in self.vocab.partition_specials(text, parse_special):
            if isinstance(frag, int):
                ids.append(frag)
            else:
                ids.extend(self.encode_fragment(frag))
        return ids

    def token_bytes(self, token_id: int, special: bool = False) -> bytes:
        if self.vocab.is_special(token_id) and not special:
            return b""
        return _token_bytes(self.vocab.tokens[token_id])

    def detokenize(self, ids: list[int], special: bool = False) -> str:
        out = b""
        for t in ids:
            out += self.token_bytes(t, special)
        return out.decode("utf-8", errors="replace")


def _token_bytes(tok: str) -> bytes:
    """RWKV vocab entries may be escaped byte strings (\\xNN)."""
    try:
        return tok.encode("utf-8")
    except UnicodeEncodeError:
        return tok.encode("utf-8", errors="replace")
