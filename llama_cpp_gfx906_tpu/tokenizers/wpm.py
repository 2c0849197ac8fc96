"""WordPiece tokenizer (BERT family).

Behavioral contract: reference ``src/llama-vocab.cpp`` ``llm_tokenizer_wpm``
(:636-752) — NFD-lowercase normalization with accent stripping, punctuation
and CJK isolation, then greedy longest-match with ``##`` continuations;
words with no match collapse to UNK.
"""

from __future__ import annotations

import unicodedata

from .vocab import Vocab


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if 33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126:
        return True
    return unicodedata.category(ch).startswith("P")


class WPMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab

    def _normalize_words(self, text: str) -> list[str]:
        out: list[str] = []
        word: list[str] = []

        def flush():
            if word:
                out.append("".join(word))
                word.clear()

        for ch in unicodedata.normalize("NFD", text):
            cat = unicodedata.category(ch)
            if cat == "Mn":  # strip accents
                continue
            ch = ch.lower()
            if ch.isspace():
                flush()
                continue
            # only punctuation, *ASCII* symbols, and CJK isolate; emoji and
            # format chars accumulate into the running word (→ one UNK)
            if _is_punct(ch) or _is_cjk(ord(ch)):
                flush()
                out.append(ch)
                continue
            word.append(ch)
        flush()
        return out

    def encode_fragment(self, text: str) -> list[int]:
        v = self.vocab
        t2i = v.token_to_id
        out: list[int] = []
        for word in self._normalize_words(text):
            # GGUF WPM convention: word-initial pieces carry a phantom "▁"
            # prefix; continuations are bare substrings of "▁word"
            word1 = "▁" + word
            ids: list[int] = []
            pos = 0
            ok = True
            while pos < len(word1):
                end = len(word1)
                found = None
                while end > pos:
                    tok = t2i.get(word1[pos:end])
                    if tok is not None:
                        found = tok
                        break
                    end -= 1
                if found is None:
                    ok = False
                    break
                ids.append(found)
                pos = end
            if ok and ids:
                out.extend(ids)
            elif v.special.unk is not None:
                out.append(v.special.unk)
        return out

    def tokenize(self, text: str, add_special: bool = True, parse_special: bool = True) -> list[int]:
        v = self.vocab
        out: list[int] = []
        if add_special and v.special.bos is not None:  # [CLS]
            out.append(v.special.bos)
        for frag in v.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self.encode_fragment(frag))
        if add_special and v.special.sep is not None:  # [SEP]
            out.append(v.special.sep)
        return out

    def token_bytes(self, token_id: int, special: bool = False) -> bytes:
        v = self.vocab
        if v.is_special(token_id):
            return v.tokens[token_id].encode("utf-8") if special else b""
        text = v.tokens[token_id]
        if text.startswith("##"):
            return text[2:].encode("utf-8")
        return (" " + text).encode("utf-8")

    def detokenize(self, ids: list[int], special: bool = False) -> str:
        text = b"".join(self.token_bytes(i, special) for i in ids).decode(
            "utf-8", errors="replace"
        )
        return text.lstrip(" ")
