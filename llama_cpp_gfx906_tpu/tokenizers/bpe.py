"""Byte-level BPE tokenizer (GPT-2 family) with per-model pretokenizers.

Behavioral contract: reference ``src/llama-vocab.cpp`` ``llm_tokenizer_bpe``
(:279 onward).  The per-family pretokenizer regex strings (:284-430) are
public constants originating from each model's HF ``tokenizer.json``; the
splitting semantics are sequential: each regex extracts matches from the
not-yet-matched gaps left by the previous one.
"""

from __future__ import annotations

import functools

import regex as re

from .vocab import Vocab

# pretokenizer family → ordered regex list (llama-vocab.cpp:284-430)
_GPT2_RE = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)"""
_LLAMA3_RE = r"""(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""

PRE_REGEXES: dict[str, list[str]] = {
    "default": [_GPT2_RE + r"|\s+"],
    "gpt-2": [_GPT2_RE + r"|\s+"],
    "mpt": [_GPT2_RE + r"|\s+"],
    "olmo": [_GPT2_RE + r"|\s+"],
    "jais": [_GPT2_RE + r"|\s+"],
    "llama3": [_LLAMA3_RE],
    "llama-bpe": [_LLAMA3_RE],
    "dbrx": [_LLAMA3_RE],
    "smaug-bpe": [_LLAMA3_RE],
    "falcon": [
        r"[\p{P}\$\+<=>\^~\|`]+",
        _GPT2_RE,
        r"[0-9][0-9][0-9]",
    ],
    "starcoder": [r"\p{N}", _GPT2_RE],
    "refact": [r"\p{N}", _GPT2_RE],
    "command-r": [r"\p{N}", _GPT2_RE],
    "smollm": [r"\p{N}", _GPT2_RE],
    "codeshell": [r"\p{N}", _GPT2_RE],
    "qwen2": [
        r"""(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
    ],
    "stablelm2": [
        r"""(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
    ],
    "deepseek-llm": [
        "[\r\n]",
        "\\s?[A-Za-z\u00b5\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u01ba\u01bc-\u01bf"
        "\u01c4-\u0293\u0295-\u02af\u0370-\u0373\u0376\u0377\u037b-\u037d\u037f"
        "\u0386\u0388-\u038a\u038c\u038e-\u03a1\u03a3-\u03f5\u03f7-\u0481"
        "\u048a-\u052f\u0531-\u0556\u10a0-\u10c5\u13a0-\u13f5\u13f8-\u13fd"
        "\u1c90-\u1cba\u1cbd-\u1cbf\u1d00-\u1d2b\u1d6b-\u1d77\u1d79-\u1d9a"
        "\u1e00-\u1f15\u1f18-\u1f1d\u1f20-\u1f45\u1f48-\u1f4d\u1f50-\u1f57"
        "\u1f59\u1f5b\u1f5d\u1f5f-\u1f7d\u1f80-\u1fb4\u1fb6-\u1fbc\u1fbe"
        "\u1fc2-\u1fc4\u1fc6-\u1fcc\u1fd0-\u1fd3\u1fd6-\u1fdb\u1fe0-\u1fec"
        "\u1ff2-\u1ff4\u1ff6-\u1ffc\u2102\u2107\u210a-\u2113\u2115\u2119-\u211d"
        "\u2124\u2126\u2128\u212a-\u212d\u212f-\u2134\u2139\u213c-\u213f"
        "\u2145-\u2149\u214e\u2183\u2184\u2c00-\u2c7b\u2c7e-\u2ce4\u2ceb-\u2cee"
        "\u2cf2\u2cf3\ua640-\ua66d\ua680-\ua69b\ua722-\ua76f\ua771-\ua787"
        "\ua78b-\ua78e\uab70-\uabbf\ufb00-\ufb06\ufb13-\ufb17\uff21-\uff3a"
        "\uff41-\uff5a\U00010400-\U0001044f\U000104b0-\U000104d3"
        "\U000104d8-\U000104fb\U00010c80-\U00010cb2\U00010cc0-\U00010cf2"
        "\U000118a0-\U000118df\U0001e900-\U0001e943]+",
        "\\s?[!-/:-~\uff01-\uff0f\uff1a-\uff5e\u2018-\u201f\u3000-\u3002]+",
        r"\s+$",
        "[\u4e00-\u9fa5\u0800-\u4e00\uac00-\ud7ff]+",
        r"\p{N}+",
    ],
    "deepseek-coder": [
        r"[\r\n]",
        r"\s?\p{L}+",
        r"\s?\p{P}+",
        r"[一-龥ࠀ-一가-퟿]+",
        r"\p{N}",
    ],
    "gpt-4o": [
        r"""[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
    ],
    "tekken": [
        r"""[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
    ],
}

# families where a whole pretoken already present in the vocab skips merges
_IGNORE_MERGES = {"llama3", "llama-bpe"}


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte↔unicode table: printable bytes map to themselves, the rest
    to U+0100+n, so every byte has a visible single-codepoint stand-in."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@functools.lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def regex_split(text: str, patterns: list[str]) -> list[str]:
    """Sequential regex splitting: every pattern re-splits *all* fragments
    produced so far — matches become fragments, gaps stay fragments, and both
    flow into the next pattern (semantics of the reference's
    ``unicode_regex_split``, which is why e.g. falcon's trailing
    ``[0-9][0-9][0-9]`` chops digit runs that an earlier pattern matched)."""
    segments: list[str] = [text]
    for pat in patterns:
        rx = re.compile(pat)
        out: list[str] = []
        for frag in segments:
            pos = 0
            for m in rx.finditer(frag):
                if m.start() > pos:
                    out.append(frag[pos : m.start()])
                if m.end() > m.start():
                    out.append(m.group())
                pos = m.end()
            if pos < len(frag):
                out.append(frag[pos:])
        segments = out
    return [s for s in segments if s]


class BPETokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.patterns = PRE_REGEXES.get(vocab.pre, PRE_REGEXES["default"])
        self.ignore_merges = vocab.pre in _IGNORE_MERGES
        self.ranks: dict[tuple[str, str], int] = {}
        for i, merge in enumerate(vocab.merges):
            left, _, right = merge.partition(" ")
            self.ranks[(left, right)] = i
        self.b2u = bytes_to_unicode()
        self.u2b = unicode_to_bytes()

    # -- core BPE over one pretoken ----------------------------------------

    def _bpe_word(self, word: str) -> list[int]:
        t2i = self.vocab.token_to_id
        if self.ignore_merges and word in t2i:
            return [t2i[word]]
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        out = []
        for p in parts:
            tok = t2i.get(p)
            if tok is not None:
                out.append(tok)
            else:
                # fall back to per-byte tokens of the piece
                for ch in p:
                    b = t2i.get(ch)
                    if b is not None:
                        out.append(b)
        return out

    def encode_fragment(self, text: str) -> list[int]:
        out: list[int] = []
        for pretoken in regex_split(text, self.patterns):
            mapped = "".join(self.b2u[b] for b in pretoken.encode("utf-8"))
            out.extend(self._bpe_word(mapped))
        return out

    def tokenize(self, text: str, add_special: bool = True, parse_special: bool = True) -> list[int]:
        v = self.vocab
        out: list[int] = []
        if add_special and v.add_bos and v.special.bos is not None:
            out.append(v.special.bos)
        for frag in v.partition_specials(text, parse_special):
            if isinstance(frag, int):
                out.append(frag)
            else:
                out.extend(self.encode_fragment(frag))
        if add_special and v.add_eos and v.special.eos is not None:
            out.append(v.special.eos)
        return out

    # -- decoding -----------------------------------------------------------

    def token_bytes(self, token_id: int, special: bool = False) -> bytes:
        v = self.vocab
        text = v.tokens[token_id]
        if v.is_special(token_id) or v.token_type(token_id).name == "USER_DEFINED":
            return text.encode("utf-8") if special else b""
        return bytes(self.u2b.get(ch, ord("?")) for ch in text)

    def detokenize(self, ids: list[int], special: bool = False) -> str:
        return b"".join(self.token_bytes(i, special) for i in ids).decode(
            "utf-8", errors="replace"
        )
