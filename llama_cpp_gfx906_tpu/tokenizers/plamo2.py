"""PLaMo2 tokenizer — Viterbi DP over scored vocabulary pieces.

Reference: ``llm_tokenizer_plamo2`` (src/llama-vocab.cpp:1208-1472).  The
reference builds a reversed-suffix trie table for speed; the *semantics*
are a unigram-style dynamic program, implemented here directly:

    scores[n] = 0
    scores[i] = min over pieces p matching text[i:] of
                    scores[i + |p|] − round(score(p)·1e4)
                and the 1-codepoint unknown fallback at UNKNOWN_SCORE

Ties break toward longer pieces (the reference iterates decreasing piece
length with strict improvement).  Unknown codepoints emit UTF-8 byte
tokens (``<0xXX>``).
"""

from __future__ import annotations

from .vocab import Vocab

UNKNOWN_SCORE = -10_000_000
INF = 1 << 60


class PLaMo2Tokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.piece_score: dict[str, int] = {}
        self.piece_id: dict[str, int] = {}
        self.byte_tokens: dict[int, int] = {}
        self.max_piece_cpts = 1
        scores = vocab.scores
        for tid, text in enumerate(vocab.tokens):
            tt = vocab.token_types[tid] if vocab.token_types is not None else 1
            if tt == 6 or (len(text) == 6 and text.startswith("<0x") and text.endswith(">")):
                try:
                    self.byte_tokens[int(text[3:5], 16)] = tid
                    continue
                except ValueError:
                    pass
            if tt in (3, 4) and not text.startswith("<0x"):
                # control/user-defined tokens only match via parse_special
                continue
            sc = float(scores[tid]) if scores is not None else 0.0
            self.piece_score[text] = int(round(sc * 1e4))
            self.piece_id[text] = tid
            self.max_piece_cpts = max(self.max_piece_cpts, len(text))

    def _encode(self, text: str) -> list[int]:
        if text and text[0] == "﻿":  # BOM skip, like the reference
            text = text[1:]
        n = len(text)
        if n == 0:
            return []
        scores = [INF] * (n + 1)
        scores[n] = 0
        best_len = [1] * n
        best_tok = [-1] * n
        for i in range(n - 1, -1, -1):
            # unknown 1-codepoint fallback
            s = scores[i + 1] - UNKNOWN_SCORE
            scores[i] = s
            best_len[i] = 1
            best_tok[i] = -1
            # vocabulary pieces, longest first so ties keep the longer piece
            top = min(self.max_piece_cpts, n - i)
            for L in range(top, 0, -1):
                piece = text[i : i + L]
                sc = self.piece_score.get(piece)
                if sc is None:
                    continue
                s = scores[i + L] - sc
                if s < scores[i]:
                    scores[i] = s
                    best_len[i] = L
                    best_tok[i] = self.piece_id[piece]
        out: list[int] = []
        pos = 0
        while pos < n:
            if best_tok[pos] >= 0:
                out.append(best_tok[pos])
            else:
                for b in text[pos].encode("utf-8"):
                    out.append(self.byte_tokens.get(b, self.vocab.special.unk or 0))
            pos += best_len[pos]
        return out

    def tokenize(self, text: str, add_special: bool = True, parse_special: bool = True) -> list[int]:
        v = self.vocab
        out: list[int] = []
        if add_special and v.special.bos is not None:
            out.append(v.special.bos)
        for frag in v.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self._encode(frag))
        return out

    def detokenize(self, ids: list[int]) -> str:
        parts: list[bytes] = []
        for tid in ids:
            text = self.vocab.tokens[tid]
            if len(text) == 6 and text.startswith("<0x") and text.endswith(">"):
                try:
                    parts.append(bytes([int(text[3:5], 16)]))
                    continue
                except ValueError:
                    pass
            parts.append(text.encode("utf-8"))
        return b"".join(parts).decode("utf-8", errors="replace")
