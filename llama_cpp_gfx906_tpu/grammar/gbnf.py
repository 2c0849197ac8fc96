"""GBNF grammar engine: parser + pushdown automaton + token masking.

TPU-native rethink of the reference's constrained-decoding engine
(reference: src/llama-grammar.{h,cpp} — element encoding at
llama-grammar.h:12-44, stack advance / accept / reject logic in
llama-grammar.cpp).  Same grammar language (GBNF), same semantics
(codepoint-level PDA with partial-UTF8 carry across token boundaries),
but a vectorised mask path: stack tops expose their acceptable
first-codepoint ranges, and the vocab is prefiltered against those
ranges with numpy before any per-token simulation runs.  Sampling
itself stays on device; the mask is the only host product.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Grammar representation
#
# A rule is a list of alternates; an alternate is a tuple of elements.
# Elements:
#   ("ref", rule_id)
#   ("char", ((lo, hi), ...), negated)   -- codepoint ranges; (0, 0x10FFFF)
#                                           with negated=False is '.' (any)
# ---------------------------------------------------------------------------

Element = tuple
Alternate = tuple
Rule = list  # list[Alternate]


class GrammarParseError(ValueError):
    pass


def _hex(src: str, i: int, n: int) -> tuple[int, int]:
    v = src[i : i + n]
    if len(v) != n:
        raise GrammarParseError(f"expecting {n} hex chars at {i}")
    return int(v, 16), i + n


def _parse_char(src: str, i: int) -> tuple[int, int]:
    """One (possibly escaped) character inside a literal or char class."""
    c = src[i]
    if c == "\\":
        e = src[i + 1]
        i += 2
        if e == "x":
            return _hex(src, i, 2)
        if e == "u":
            return _hex(src, i, 4)
        if e == "U":
            return _hex(src, i, 8)
        m = {"t": 9, "n": 10, "r": 13, '"': 34, "[": 91, "]": 93, "\\": 92, "-": 45}
        if e in m:
            return m[e], i
        raise GrammarParseError(f"unknown escape \\{e}")
    return ord(c), i + 1


class _Parser:
    """Recursive-descent GBNF parser (grammar language per reference
    grammars/README.md; parse structure mirrors llama_grammar_parser
    at llama-grammar.h:80-106 without copying its implementation)."""

    def __init__(self, src: str):
        self.src = src
        self.i = 0
        self.symbol_ids: dict[str, int] = {}
        self.rules: dict[int, Rule] = {}
        self.gen_counter = 0

    # -- lexing helpers ----------------------------------------------------
    def _ws(self, newlines: bool = True):
        src, n = self.src, len(self.src)
        while self.i < n:
            c = src[self.i]
            if c == "#":
                while self.i < n and src[self.i] != "\n":
                    self.i += 1
            elif c in " \t" or (newlines and c in "\r\n"):
                self.i += 1
            elif c == "\\" and self.i + 1 < n and src[self.i + 1] in "\r\n":
                self.i += 2
            else:
                break

    def _name(self) -> str:
        j = self.i
        while self.i < len(self.src) and (
            self.src[self.i].isalnum() or self.src[self.i] in "-_"
        ):
            self.i += 1
        if j == self.i:
            raise GrammarParseError(f"expecting name at pos {j}")
        return self.src[j : self.i]

    def _symbol(self, name: str) -> int:
        if name not in self.symbol_ids:
            self.symbol_ids[name] = len(self.symbol_ids)
        return self.symbol_ids[name]

    def _gen_symbol(self, base: str) -> int:
        self.gen_counter += 1
        return self._symbol(f"{base}_{self.gen_counter}")

    # -- grammar productions -------------------------------------------------
    def parse(self) -> tuple[dict[int, Rule], dict[str, int]]:
        self._ws()
        while self.i < len(self.src):
            self._parse_rule()
            self._ws()
        # validate refs
        defined = set(self.rules)
        for rid, rule in self.rules.items():
            for alt in rule:
                for el in alt:
                    if el[0] == "ref" and el[1] not in defined:
                        missing = [k for k, v in self.symbol_ids.items() if v == el[1]]
                        raise GrammarParseError(f"undefined rule {missing or el[1]}")
        return self.rules, self.symbol_ids

    def _parse_rule(self):
        name = self._name()
        self._ws(newlines=False)
        if self.src[self.i : self.i + 3] != "::=":
            raise GrammarParseError(f"expecting ::= at pos {self.i}")
        self.i += 3
        self._ws(newlines=True)
        rule_id = self._symbol(name)
        self.rules[rule_id] = self._parse_alternates(name)
        if self.i < len(self.src) and self.src[self.i] in "\r\n":
            self._ws()

    def _parse_alternates(self, base: str, nested: bool = False) -> Rule:
        alts = [self._parse_sequence(base, nested)]
        self._ws(newlines=nested)
        while self.i < len(self.src) and self.src[self.i] == "|":
            self.i += 1
            self._ws()
            alts.append(self._parse_sequence(base, nested))
            self._ws(newlines=nested)
        return alts

    def _parse_sequence(self, base: str, nested: bool) -> Alternate:
        out: list[Element] = []
        last_start = 0  # index in `out` where the most recent item began
        src = self.src
        while self.i < len(src):
            self._ws(newlines=nested)
            if self.i >= len(src):
                break
            c = src[self.i]
            if c == '"':  # literal
                last_start = len(out)
                self.i += 1
                while src[self.i] != '"':
                    cp, self.i = _parse_char(src, self.i)
                    out.append(("char", ((cp, cp),), False))
                self.i += 1
            elif c == "[":  # char class
                last_start = len(out)
                self.i += 1
                neg = src[self.i] == "^"
                if neg:
                    self.i += 1
                ranges = []
                while src[self.i] != "]":
                    lo, self.i = _parse_char(src, self.i)
                    hi = lo
                    if src[self.i] == "-" and src[self.i + 1] != "]":
                        self.i += 1
                        hi, self.i = _parse_char(src, self.i)
                    ranges.append((lo, hi))
                self.i += 1
                out.append(("char", tuple(ranges), neg))
            elif c == ".":
                last_start = len(out)
                self.i += 1
                out.append(("char", ((0, 0x10FFFF),), False))
            elif c == "(":
                last_start = len(out)
                self.i += 1
                self._ws()
                sub_id = self._gen_symbol(base)
                self.rules[sub_id] = self._parse_alternates(base, nested=True)
                if src[self.i] != ")":
                    raise GrammarParseError(f"expecting ) at pos {self.i}")
                self.i += 1
                out.append(("ref", sub_id))
            elif c.isalnum() or c in "-_":
                j = self.i
                name = self._name()
                # lookahead: a rule definition terminates this sequence
                k = self.i
                while k < len(src) and src[k] in " \t":
                    k += 1
                if src[k : k + 3] == "::=":
                    self.i = j
                    break
                last_start = len(out)
                out.append(("ref", self._symbol(name)))
            elif c in "*+?{":
                if not out:
                    raise GrammarParseError(f"repetition with no operand at {self.i}")
                mn, mx = 0, -1
                if c == "*":
                    self.i += 1
                elif c == "+":
                    mn = 1
                    self.i += 1
                elif c == "?":
                    mx = 1
                    self.i += 1
                else:  # {m}, {m,}, {m,n}
                    self.i += 1
                    j = self.i
                    while src[self.i].isdigit():
                        self.i += 1
                    mn = int(src[j : self.i])
                    mx = mn
                    if src[self.i] == ",":
                        self.i += 1
                        j = self.i
                        while src[self.i].isdigit():
                            self.i += 1
                        mx = int(src[j : self.i]) if self.i > j else -1
                    if src[self.i] != "}":
                        raise GrammarParseError(f"expecting }} at pos {self.i}")
                    self.i += 1
                item = tuple(out[last_start:])
                del out[last_start:]
                out.append(self._rewrite_repetition(item, mn, mx, base))
            else:
                break
        return tuple(out)

    def _rewrite_repetition(self, item: Alternate, mn: int, mx: int, base: str) -> Element:
        """X{m,n} over the whole previous item (literal/class/group/ref).

        X* => S ::= X S | eps (right recursion keeps the PDA stack shallow);
        {m,n} = m mandatory copies then nested optionals.
        """
        if len(item) == 1:
            el = item[0]
        else:
            sid = self._gen_symbol(base)
            self.rules[sid] = [tuple(item)]
            el = ("ref", sid)
        if mn == 0 and mx == -1:  # *
            rid = self._gen_symbol(base)
            self.rules[rid] = [(el, ("ref", rid)), ()]
            return ("ref", rid)
        if mn == 1 and mx == -1:  # +
            rid = self._gen_symbol(base)
            self.rules[rid] = [(el, ("ref", rid)), (el,)]
            return ("ref", rid)
        if mn == 0 and mx == 1:  # ?
            rid = self._gen_symbol(base)
            self.rules[rid] = [(el,), ()]
            return ("ref", rid)
        rid = self._gen_symbol(base)
        seq: list[Element] = [el] * mn
        if mx == -1:
            star = self._gen_symbol(base)
            self.rules[star] = [(el, ("ref", star)), ()]
            seq.append(("ref", star))
        else:
            prev = None
            for _ in range(mx - mn):
                oid = self._gen_symbol(base)
                body = (el,) if prev is None else (el, ("ref", prev))
                self.rules[oid] = [body, ()]
                prev = oid
            if prev is not None:
                seq.append(("ref", prev))
        self.rules[rid] = [tuple(seq)]
        return ("ref", rid)


def parse_gbnf(src: str) -> tuple[dict[int, Rule], dict[str, int]]:
    try:
        return _Parser(src).parse()
    except IndexError as e:  # ran off the end mid-construct
        raise GrammarParseError(f"unexpected end of grammar: {e}") from e


# ---------------------------------------------------------------------------
# UTF-8 decode with carry (reference: decode_utf8 in llama-grammar.cpp,
# llama_partial_utf8 at llama-grammar.h:46-49)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PartialUtf8:
    value: int = 0
    n_remain: int = 0  # -1 = invalid


def decode_utf8(data: bytes, partial: PartialUtf8) -> tuple[tuple[int, ...], PartialUtf8]:
    """Decode bytes to codepoints, resuming/leaving a partial sequence."""
    cps: list[int] = []
    value, n_remain = partial.value, partial.n_remain
    pos = 0
    if n_remain > 0:
        while n_remain > 0 and pos < len(data):
            b = data[pos]
            if (b & 0xC0) != 0x80:
                return (), PartialUtf8(0, -1)
            value = (value << 6) | (b & 0x3F)
            pos += 1
            n_remain -= 1
        if n_remain == 0:
            cps.append(value)
            value = 0
    while pos < len(data):
        b = data[pos]
        if b < 0x80:
            cps.append(b)
            pos += 1
            continue
        if (b & 0xF8) == 0xF0:
            n_more = 3
        elif (b & 0xF0) == 0xE0:
            n_more = 2
        elif (b & 0xE0) == 0xC0:
            n_more = 1
        else:
            return (), PartialUtf8(0, -1)
        mask = (1 << (7 - n_more - 1)) - 1
        value = b & mask
        pos += 1
        k = n_more
        while k > 0 and pos < len(data):
            b2 = data[pos]
            if (b2 & 0xC0) != 0x80:
                return (), PartialUtf8(0, -1)
            value = (value << 6) | (b2 & 0x3F)
            pos += 1
            k -= 1
        if k > 0:
            return tuple(cps), PartialUtf8(value, k)
        cps.append(value)
        value = 0
    return tuple(cps), PartialUtf8(0, 0)


# ---------------------------------------------------------------------------
# Pushdown automaton
# ---------------------------------------------------------------------------


def _char_matches(el: Element, cp: int) -> bool:
    _, ranges, neg = el
    hit = any(lo <= cp <= hi for lo, hi in ranges)
    return hit != neg


class Grammar:
    """A grammar instance: immutable rules + mutable set of PDA stacks.

    Stacks are tuples of (rule_id, alt_idx, pos) frames; the top frame's
    current element is always a char class (refs are expanded eagerly,
    mirroring llama_grammar_advance_stack).
    """

    def __init__(
        self,
        rules: dict[int, Rule],
        root: int,
        *,
        lazy: bool = False,
        trigger_tokens: tuple[int, ...] = (),
        trigger_patterns: tuple[str, ...] = (),
    ):
        self.rules = rules
        self.root = root
        self.lazy = lazy
        self.awaiting_trigger = lazy
        self.trigger_tokens = set(trigger_tokens)
        self.trigger_patterns = trigger_patterns
        self.trigger_buffer = ""
        self.partial = PartialUtf8()
        self.stacks: frozenset = self._expand(((root, None, 0),))
        self._init_stacks = self.stacks

    @classmethod
    def from_string(cls, src: str, root: str = "root", **kw) -> "Grammar":
        from .lark import is_llguidance, lark_to_gbnf

        if is_llguidance(src):
            # the reference's routing test (common/sampling.cpp:157-159):
            # %llguidance-prefixed grammars are Lark-dialect; translate and
            # run on the same PDA (root rule is `start` by convention)
            src, root = lark_to_gbnf(src), "start"
        rules, symbols = parse_gbnf(src)
        if root not in symbols:
            raise GrammarParseError(f"no '{root}' rule")
        return cls(rules, symbols[root], **kw)

    # -- stack machinery -----------------------------------------------------
    def _expand(self, stack: tuple) -> frozenset:
        """Epsilon-closure: expand stacks until every top is a char element.
        A frame (rule, None, 0) means 'enter rule, all alternates'."""
        out: set = set()
        self._advance(list(stack), out)
        return frozenset(out)

    def _elem(self, frame):
        rule_id, alt, pos = frame
        alternate = self.rules[rule_id][alt]
        return alternate[pos] if pos < len(alternate) else None

    def _advance(self, stack: list, out: set, depth: int = 0):
        if depth > 512:
            raise RecursionError(
                "grammar stack depth exceeded (left-recursive rule?)"
            )
        if not stack:
            out.add(())
            return
        frame = stack[-1]
        rule_id, alt, pos = frame
        if alt is None:
            # entering a rule: branch on each alternate
            for a in range(len(self.rules[rule_id])):
                self._advance(stack[:-1] + [(rule_id, a, 0)], out, depth + 1)
            return
        el = self._elem(frame)
        if el is None:
            # end of alternate: pop, advance caller
            below = stack[:-1]
            if not below:
                out.add(())
                return
            r2, a2, p2 = below[-1]
            self._advance(below[:-1] + [(r2, a2, p2 + 1)], out, depth + 1)
            return
        if el[0] == "ref":
            self._advance(stack[:-1] + [(rule_id, alt, pos), (el[1], None, 0)], out, depth + 1)
            return
        # char element: this stack is in canonical position, but the frame as
        # stored must make _elem() return the char — push as-is
        out.add(tuple(stack))

    def _accept_cp(self, stacks: frozenset, cp: int) -> frozenset:
        out: set = set()
        for stack in stacks:
            if not stack:
                continue
            el = self._elem(stack[-1])
            if el is not None and el[0] == "char" and _char_matches(el, cp):
                r, a, p = stack[-1]
                out |= self._expand(stack[:-1] + ((r, a, p + 1),))
        return frozenset(out)

    # -- public API ------------------------------------------------------------
    def accept_codepoint(self, cp: int) -> bool:
        new = self._accept_cp(self.stacks, cp)
        if not new:
            return False
        self.stacks = new
        return True

    def accept_bytes(self, data: bytes) -> bool:
        cps, partial = decode_utf8(data, self.partial)
        if partial.n_remain < 0:
            return False
        stacks = self.stacks
        for cp in cps:
            stacks = self._accept_cp(stacks, cp)
            if not stacks:
                return False
        self.stacks = stacks
        self.partial = partial
        return True

    def accept_token(self, token_id: int, piece: bytes, is_eog: bool = False):
        """Commit a sampled token (reference: llama_grammar_accept_impl)."""
        if self.awaiting_trigger:
            if token_id in self.trigger_tokens:
                self.awaiting_trigger = False
                self.trigger_buffer = ""
                return
            self.trigger_buffer += piece.decode("utf-8", errors="replace")
            import re

            for pat in self.trigger_patterns:
                m = re.search(pat, self.trigger_buffer)
                if m:
                    self.awaiting_trigger = False
                    # feed everything from the match start into the grammar
                    tail = self.trigger_buffer[m.start() :].encode()
                    self.accept_bytes(tail)
                    self.trigger_buffer = ""
                    return
            return
        if is_eog:
            if not self.can_stop():
                raise RuntimeError("grammar: EOG token accepted while grammar open")
            return
        ok = self.accept_bytes(piece)
        if not ok:
            raise RuntimeError(f"grammar: token {token_id} not accepted")

    def can_stop(self) -> bool:
        return any(len(s) == 0 for s in self.stacks)

    def must_stop(self) -> bool:
        return all(len(s) == 0 for s in self.stacks)

    def _first_ranges(self) -> list[tuple[int, int]]:
        """Union of acceptable first-codepoint ranges over all stacks."""
        ranges: list[tuple[int, int]] = []
        for stack in self.stacks:
            if not stack:
                continue
            el = self._elem(stack[-1])
            if el is None or el[0] != "char":
                continue
            _, rs, neg = el
            if neg:
                # complement of rs within [0, 0x10FFFF]
                pts = sorted(rs)
                lo = 0
                for a, b in pts:
                    if a > lo:
                        ranges.append((lo, a - 1))
                    lo = max(lo, b + 1)
                if lo <= 0x10FFFF:
                    ranges.append((lo, 0x10FFFF))
            else:
                ranges.extend(rs)
        return ranges

    def token_allowed(self, piece: bytes) -> bool:
        """Full PDA simulation of one token piece (no state change)."""
        cps, partial = decode_utf8(piece, self.partial)
        if partial.n_remain < 0:
            return False
        stacks = self.stacks
        for cp in cps:
            stacks = self._accept_cp(stacks, cp)
            if not stacks:
                return False
        if partial.n_remain > 0:
            # a dangling partial sequence is fine only if some continuation
            # could complete it; over-approximate by allowing it (the
            # completing token will be checked on the next step)
            return True
        return True

    def compute_mask(self, vocab_cps, vocab_first_cp: np.ndarray, eog_mask: np.ndarray) -> np.ndarray:
        """Boolean allow-mask over the vocab.

        vocab_cps: list of per-token codepoint tuples (None = invalid utf8 /
        special); vocab_first_cp: int32 array of each token's first codepoint
        (-1 for empty/invalid).  Prefilter by first codepoint, then simulate
        survivors.
        """
        n = len(vocab_first_cp)
        allow = np.zeros(n, dtype=bool)
        if self.awaiting_trigger:
            allow[:] = True
            return allow
        if self.partial.n_remain > 0:
            # mid-codepoint: only byte-continuation tokens can work; these are
            # rare raw-byte tokens — simulate everything with invalid-utf8 fast
            # rejection (decode_utf8 handles the carry).
            pieces = self._vocab_pieces
            for t in range(n):
                p = pieces[t]
                if p:
                    allow[t] = self._simulate(p)
            if self.can_stop():
                allow |= eog_mask
            return allow
        ranges = self._first_ranges()
        if ranges:
            first_ok = np.zeros(n, dtype=bool)
            for lo, hi in ranges:
                first_ok |= (vocab_first_cp >= lo) & (vocab_first_cp <= hi)
            cand = np.nonzero(first_ok)[0]
            cache = self._mask_cache()
            for t in cand:
                cps = vocab_cps[t]
                hit = cache.get(cps)
                if hit is None:
                    hit = self._simulate_cps(cps)
                    cache[cps] = hit
                allow[t] = hit
        if self.can_stop():
            allow |= eog_mask
        return allow

    _vocab_pieces: list = []

    def _mask_cache(self) -> dict:
        key = self.stacks
        if getattr(self, "_cache_key", None) != key:
            self._cache_key = key
            self._cache: dict = {}
        return self._cache

    def _simulate(self, piece: bytes) -> bool:
        cps, partial = decode_utf8(piece, self.partial)
        if partial.n_remain < 0:
            return False
        return self._simulate_cps(cps)

    def _simulate_cps(self, cps) -> bool:
        if cps is None:
            return False
        stacks = self.stacks
        for cp in cps:
            stacks = self._accept_cp(stacks, cp)
            if not stacks:
                return False
        return True

    def reset(self):
        self.stacks = self._init_stacks
        self.partial = PartialUtf8()
        self.awaiting_trigger = self.lazy
        self.trigger_buffer = ""


class GrammarVocab:
    """Precomputed per-vocab tables for fast masking."""

    def __init__(self, pieces: list[bytes], eog_ids: set[int]):
        self.pieces = pieces
        n = len(pieces)
        self.cps: list = [None] * n
        self.first_cp = np.full(n, -1, dtype=np.int64)
        for t, p in enumerate(pieces):
            cps, partial = decode_utf8(p, PartialUtf8())
            if partial.n_remain == 0 and cps:
                self.cps[t] = cps
                self.first_cp[t] = cps[0]
            elif partial.n_remain > 0 and cps:
                self.cps[t] = cps  # ends mid-codepoint; prefilter by first cp
                self.first_cp[t] = cps[0]
        self.eog_mask = np.zeros(n, dtype=bool)
        for t in eog_ids:
            if 0 <= t < n:
                self.eog_mask[t] = True

    def mask(self, grammar: Grammar) -> np.ndarray:
        grammar._vocab_pieces = self.pieces
        return grammar.compute_mask(self.cps, self.first_cp, self.eog_mask)
