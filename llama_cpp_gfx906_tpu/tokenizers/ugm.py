"""UGM (SentencePiece unigram) tokenizer — T5 family.

Behavioral contract: reference ``llm_tokenizer_ugm``
(src/llama-vocab.cpp:752-1050) — Viterbi over codepoints with per-token
log-probabilities; spans with no vocab match consume one codepoint as
<unk> with score ``min_score − 10`` and consecutive unknowns merge into
a single <unk>.  The optional XCDA precompiled-charsmap normalization is
not implemented; the fallback normalization (space → ▁, optional prefix
space, whitespace collapsing) covers the common T5 vocabs.
"""

from __future__ import annotations

from .vocab import TokenType, Vocab

_SPACE = "▁"  # ▁
_UNKNOWN_PENALTY = 10.0


class UGMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        v = vocab
        self._scores = v.scores
        # matchable tokens: NORMAL + USER_DEFINED + UNUSED (reference :777-789)
        self._match: dict[str, int] = {}
        min_score = float("inf")
        for i, text in enumerate(v.tokens):
            tt = v.token_type(i)
            if tt in (TokenType.NORMAL, TokenType.USER_DEFINED, TokenType.UNUSED) and text:
                self._match.setdefault(text, i)
                if tt == TokenType.NORMAL and v.scores is not None:
                    min_score = min(min_score, float(v.scores[i]))
        self._max_token_len = max((len(t) for t in self._match), default=1)
        self._unknown_score = (min_score if min_score != float("inf") else 0.0) - _UNKNOWN_PENALTY
        self._user_defined = {
            v.tokens[i] for i in range(v.n_tokens) if v.token_type(i) == TokenType.USER_DEFINED
        }

    # -- normalization (fallback path, no charsmap) ---------------------------

    def _normalize(self, text: str) -> str:
        # remove_extra_whitespaces-style collapsing, then escape
        out = " ".join(text.split()) if text.strip() else ""
        if self.vocab.add_space_prefix and out:
            out = " " + out
        return out.replace(" ", _SPACE)

    # -- Viterbi ---------------------------------------------------------------

    def encode_fragment(self, text: str) -> list[int]:
        norm = self._normalize(text)
        if not norm:
            return []
        n = len(norm)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)  # (prev_pos, token_id)
        best[0] = 0.0
        unk = self.vocab.special.unk if self.vocab.special.unk is not None else 0
        scores = self._scores
        for i in range(n):
            if best[i] == NEG:
                continue
            matched = False
            limit = min(n, i + self._max_token_len)
            for j in range(i + 1, limit + 1):
                tok = self._match.get(norm[i:j])
                if tok is None:
                    continue
                matched = True
                tt = self.vocab.token_type(tok)
                s = (
                    0.0
                    if tt == TokenType.USER_DEFINED
                    else float(scores[tok]) if scores is not None else 0.0
                )
                cand = best[i] + s
                if cand > best[j]:
                    best[j] = cand
                    back[j] = (i, tok)
            if not matched or best[i + 1] == NEG:
                cand = best[i] + self._unknown_score
                if cand > best[i + 1]:
                    best[i + 1] = cand
                    back[i + 1] = (i, unk)
        # backtrack
        out: list[int] = []
        pos = n
        while pos > 0:
            prev, tok = back[pos]
            out.append(tok)
            pos = prev
        out.reverse()
        # merge consecutive unknowns (reference :1040)
        merged: list[int] = []
        for t in out:
            if merged and t == unk and merged[-1] == unk:
                continue
            merged.append(t)
        return merged

    # -- public API --------------------------------------------------------------

    def tokenize(self, text: str, add_special: bool = True, parse_special: bool = False) -> list[int]:
        v = self.vocab
        ids: list[int] = []
        for frag in v.partition_specials(text, parse_special):
            if isinstance(frag, int):
                ids.append(frag)
            else:
                ids.extend(self.encode_fragment(frag))
        if add_special:
            # T5 appends EOS, no BOS (vocab flags decide)
            if v.add_bos and v.special.bos is not None:
                ids = [v.special.bos] + ids
            if v.add_eos and v.special.eos is not None:
                ids = ids + [v.special.eos]
        return ids

    def token_bytes(self, token_id: int, special: bool = False) -> bytes:
        text = self.vocab.tokens[token_id]
        if self.vocab.is_special(token_id) and not special:
            return b""
        return text.replace(_SPACE, " ").encode("utf-8")

    def detokenize(self, ids: list[int], special: bool = False) -> str:
        parts = []
        for t in ids:
            if self.vocab.is_special(t) and not special:
                continue
            parts.append(self.vocab.tokens[t])
        out = "".join(parts).replace(_SPACE, " ")
        return out[1:] if out.startswith(" ") and self.vocab.add_space_prefix else out
