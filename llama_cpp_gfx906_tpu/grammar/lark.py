"""Lark-dialect grammar frontend — the llguidance analog.

The reference routes any grammar string starting with ``%llguidance`` to
the llguidance library, which parses a Lark-dialect grammar
(`common/llguidance.cpp:1-254`, selected in `common/sampling.cpp:157-159`
with kind "lark").  Instead of binding an external Rust library, this
module translates the practically-used Lark subset into GBNF and runs it
on the repo's own PDA engine (`grammar/gbnf.py`) — one grammar engine,
two surface syntaxes.

Supported Lark constructs:

- rules ``name: expansion`` and terminals ``NAME: expansion`` (leading
  ``?``/``!`` rule modifiers and ``.N`` priorities are accepted and
  ignored — they affect tree shaping, not the language);
- alternation ``|``, grouping ``( )``, optional ``[ ]``;
- postfix ``* + ?`` and Lark repeats ``x ~ 3`` / ``x ~ 2..5``;
- strings ``"..."`` (escapes), case-insensitive ``"..."i``, literal
  ranges ``"a".."z"``;
- regex terminals ``/.../`` over a practical subset (char classes,
  escapes ``\\d \\w \\s`` + negations — including inside ``[]`` via
  range complement, ``.``, groups, alternation, quantifiers incl.
  ``{m,n}``);
- ``%json { <schema> }`` inline JSON-schema atoms (the llguidance
  extension): the schema compiles through the repo's
  json-schema→GBNF converter and splices in under a fresh rule prefix;
- rule/lexeme attribute lists ``name[attr=value, ...]:``.  Attributes
  that don't change the token-mask language (``capture``,
  ``temperature``, ``max_tokens`` — generation-control hints the PDA
  engine doesn't model) are accepted and ignored; ``stop=""`` is a
  no-op; non-empty ``stop``/``suffix``/``lazy`` change the language and
  raise;
- ``//`` and ``#`` comments.

``%ignore``/``%import``/``%declare`` (unsupported in llguidance's Lark
dialect too), special-token literals ``<|...|>`` (need tokenizer-level
matching), and regex flags/anchors/backrefs raise ``GrammarParseError``
naming the construct — silent mis-parses are worse than a loud
unsupported error.  The root rule is ``start`` (llguidance convention).
"""

from __future__ import annotations

from .gbnf import GrammarParseError

_SPECIAL = set('"\\')


def _gbnf_char(cp: int, in_class: bool = False) -> str:
    """One codepoint as GBNF source (string literal or char-class member)."""
    c = chr(cp)
    if c == "\n":
        return "\\n"
    if c == "\r":
        return "\\r"
    if c == "\t":
        return "\\t"
    if in_class and c in "]^-\\":
        return "\\" + c
    if not in_class and c in _SPECIAL:
        return "\\" + c
    if cp < 0x20 or cp == 0x7F:
        return f"\\u{cp:04X}"
    return c


def _class(ranges: list[tuple[int, int]], neg: bool = False) -> str:
    body = "".join(
        _gbnf_char(lo, True) + ("" if lo == hi else "-" + _gbnf_char(hi, True))
        for lo, hi in ranges
    )
    return "[" + ("^" if neg else "") + body + "]"


_D = [(0x30, 0x39)]
_W = [(0x30, 0x39), (0x41, 0x5A), (0x5F, 0x5F), (0x61, 0x7A)]
_S = [(0x09, 0x0D), (0x20, 0x20)]
_MAX_CP = 0x10FFFF


def _complement(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Codepoint ranges NOT covered by ``ranges`` (which must be sorted
    and non-overlapping, as the shorthand tables are)."""
    out: list[tuple[int, int]] = []
    nxt = 0
    for lo, hi in ranges:
        if lo > nxt:
            out.append((nxt, lo - 1))
        nxt = hi + 1
    if nxt <= _MAX_CP:
        out.append((nxt, _MAX_CP))
    return out


class _Lark:
    def __init__(self, src: str):
        self.src = src
        self.i = 0
        self.out: list[str] = []          # emitted GBNF rule lines
        self.defined: set[str] = set()
        self.referenced: set[str] = set()
        self.n_gen = 0

    # -- lexical helpers ----------------------------------------------------

    def _ws(self, newlines: bool = True):
        src, n = self.src, len(self.src)
        while self.i < n:
            c = src[self.i]
            if c in " \t" or (newlines and c in "\r\n"):
                self.i += 1
            elif c == "#" or src[self.i : self.i + 2] == "//":
                while self.i < n and src[self.i] != "\n":
                    self.i += 1
            else:
                break

    def _peek_rule_def(self) -> bool:
        """At a name: does ``name[.N]? :`` follow (a new rule definition)?"""
        j = self.i
        src, n = self.src, len(self.src)
        while j < n and (src[j].isalnum() or src[j] == "_"):
            j += 1
        if j < n and src[j] == ".":  # priority suffix .N / .-N
            k = j + 1
            if k < n and src[k] == "-":
                k += 1
            if k < n and src[k].isdigit():
                j = k
                while j < n and src[j].isdigit():
                    j += 1
        if j < n and src[j] == "[":  # attribute list name[attr=v, ...]:
            depth = 0
            while j < n:
                if src[j] == "[":
                    depth += 1
                elif src[j] == "]":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                elif src[j] == '"':  # string attr values may hold ]/[
                    j += 1
                    while j < n and src[j] != '"':
                        j += 2 if src[j] == "\\" else 1
                j += 1
        while j < n and src[j] in " \t":
            j += 1
        return j < n and src[j] == ":" and src[j : j + 2] != "::"

    def _name(self) -> str:
        j = self.i
        src = self.src
        while self.i < len(src) and (src[self.i].isalnum() or src[self.i] == "_"):
            self.i += 1
        if self.i == j:
            raise GrammarParseError(f"lark: expected name at pos {self.i}")
        return src[j : self.i]

    def _string(self) -> list[int]:
        """Parse "..." (cursor on the opening quote); returns codepoints."""
        src = self.src
        assert src[self.i] == '"'
        self.i += 1
        cps: list[int] = []
        while self.i < len(src) and src[self.i] != '"':
            c = src[self.i]
            if c == "\\":
                self.i += 1
                e = src[self.i]
                self.i += 1
                if e == "n":
                    cps.append(0x0A)
                elif e == "t":
                    cps.append(0x09)
                elif e == "r":
                    cps.append(0x0D)
                elif e == "f":
                    cps.append(0x0C)
                elif e == "b":
                    cps.append(0x08)
                elif e == "0":
                    cps.append(0x00)
                elif e in ("x", "u", "U"):
                    width = {"x": 2, "u": 4, "U": 8}[e]
                    cps.append(int(src[self.i : self.i + width], 16))
                    self.i += width
                else:
                    cps.append(ord(e))
            else:
                cps.append(ord(c))
                self.i += 1
        if self.i >= len(src):
            raise GrammarParseError("lark: unterminated string")
        self.i += 1
        return cps

    def _gensym(self, base: str) -> str:
        self.n_gen += 1
        return f"{base}-l{self.n_gen}"

    # -- grammar ------------------------------------------------------------

    def parse(self) -> str:
        self._ws()
        try:
            while self.i < len(self.src):
                if self.src[self.i] == "%":
                    self._directive()
                else:
                    self._rule()
                self._ws()
        except IndexError:  # truncated grammar: every raw index past EOF
            raise GrammarParseError(
                f"lark: unexpected end of grammar at pos {self.i}") from None
        missing = self.referenced - self.defined
        if missing:
            raise GrammarParseError(
                f"lark: undefined rule(s): {', '.join(sorted(missing))}")
        if "start" not in self.defined:
            raise GrammarParseError("lark: no 'start' rule")
        return "\n".join(self.out) + "\n"

    def _directive(self):
        j = self.i
        self.i += 1
        name = self._name()
        if name == "llguidance":
            # header directive — options JSON (or nothing) to end of line
            while self.i < len(self.src) and self.src[self.i] != "\n":
                self.i += 1
            return
        raise GrammarParseError(
            f"lark: %{name} is not supported at pos {j} "
            "(only %llguidance headers; inline whitespace explicitly)")

    def _rule(self):
        while self.src[self.i] in "?!":  # tree-shaping modifiers
            self.i += 1
        name = self._name()
        if self.src[self.i] == "{":
            raise GrammarParseError("lark: template rules are not supported")
        if self.src[self.i] == ".":  # priority
            self.i += 1
            if self.src[self.i] == "-":
                self.i += 1
            while self.src[self.i].isdigit():
                self.i += 1
        if self.src[self.i] == "[":
            self._attributes(name)
        self._ws(newlines=False)
        if self.src[self.i] != ":":
            raise GrammarParseError(f"lark: expected ':' after rule name "
                                    f"{name!r} at pos {self.i}")
        self.i += 1
        body = self._expansions(name)
        self.defined.add(name)
        self.out.append(f"{name} ::= {body}")

    # attributes whose effect is generation control (captures, sampling
    # temperature, token budget), not the per-step token-mask language the
    # PDA engine models — accepted and ignored
    _NEUTRAL_ATTRS = frozenset({"capture", "temperature", "max_tokens"})

    def _attributes(self, rule: str):
        """Parse ``[attr=value, ...]`` after a rule/lexeme name."""
        assert self.src[self.i] == "["
        self.i += 1
        while True:
            self._ws(newlines=False)
            if self.src[self.i] == "]":
                self.i += 1
                return
            attr = self._name()
            self._ws(newlines=False)
            value = None
            if self.src[self.i] == "=":
                self.i += 1
                self._ws(newlines=False)
                c = self.src[self.i]
                if c == '"':
                    value = "".join(chr(cp) for cp in self._string())
                else:
                    j = self.i
                    while (self.i < len(self.src)
                           and self.src[self.i] not in ",]\r\n"):
                        self.i += 1
                    if self.i >= len(self.src) or self.src[self.i] in "\r\n":
                        raise GrammarParseError(
                            f"lark: unterminated attribute list on rule "
                            f"{rule!r} (attribute {attr!r} at offset {j})")
                    value = self.src[j : self.i].strip()
            if attr in self._NEUTRAL_ATTRS:
                pass
            elif attr in ("stop", "suffix") and value == "":
                pass  # empty stop/suffix: no language change
            else:
                raise GrammarParseError(
                    f"lark: attribute {attr}={value!r} on rule {rule!r} "
                    "changes the matched language and is not supported "
                    "(supported: capture/temperature/max_tokens, empty "
                    "stop/suffix)")
            self._ws(newlines=False)
            if self.src[self.i] == ",":
                self.i += 1

    def _expansions(self, base: str, nested: bool = False) -> str:
        alts = [self._alternative(base, nested)]
        while True:
            self._ws(newlines=nested)
            if not nested:
                # newline continuation: `| alt` on following lines
                j = self.i
                self._ws()
                if self.i < len(self.src) and self.src[self.i] == "|":
                    pass  # fall through to consume below
                else:
                    self.i = j
            if self.i < len(self.src) and self.src[self.i] == "|":
                self.i += 1
                alts.append(self._alternative(base, nested))
            else:
                break
        return " | ".join(a if a else '""' for a in alts)

    def _alternative(self, base: str, nested: bool) -> str:
        items: list[str] = []
        while True:
            self._ws(newlines=nested)
            if self.i >= len(self.src):
                break
            c = self.src[self.i]
            if c in "|)]":
                break
            if c == "%" and self.src[self.i : self.i + 5] != "%json":
                break
            if not nested and c in "\r\n":
                break
            if (c.isalpha() or c in "?!_") and self._peek_rule_def():
                break
            items.append(self._item(base, nested))
        return " ".join(items)

    def _item(self, base: str, nested: bool) -> str:
        atom = self._atom(base)
        while True:
            if self.i < len(self.src) and self.src[self.i] in "*+?~":
                op = self.src[self.i]
            else:
                # `x ~ 3` is conventionally space-separated; lookahead
                j = self.i
                while j < len(self.src) and self.src[j] in " \t":
                    j += 1
                if j < len(self.src) and self.src[j] == "~":
                    self.i, op = j, "~"
                else:
                    break
            self.i += 1
            if op == "~":
                self._ws(newlines=False)
                mn = self._number()
                mx = mn
                if self.src[self.i : self.i + 2] == "..":
                    self.i += 2
                    mx = self._number()
                atom = f"{atom}{{{mn},{mx}}}"
            else:
                atom = atom + op
        return atom

    def _number(self) -> int:
        j = self.i
        while self.i < len(self.src) and self.src[self.i].isdigit():
            self.i += 1
        if self.i == j:
            raise GrammarParseError(f"lark: expected number at pos {j}")
        return int(self.src[j : self.i])

    def _atom(self, base: str) -> str:
        src, c = self.src, self.src[self.i]
        if c == '"':
            cps = self._string()
            if self.i < len(src) and src[self.i] == "i":  # "abc"i
                self.i += 1
                return self._ci_literal(cps)
            if src[self.i : self.i + 2] == "..":  # "a".."z"
                self.i += 2
                self._ws(newlines=False)
                if src[self.i] != '"':
                    raise GrammarParseError(
                        f"lark: expected string after .. at pos {self.i}")
                hi = self._string()
                if len(cps) != 1 or len(hi) != 1:
                    raise GrammarParseError(
                        "lark: range endpoints must be single characters")
                return _class([(cps[0], hi[0])])
            return '"' + "".join(_gbnf_char(cp) for cp in cps) + '"'
        if c == "/":
            return self._regex(base)
        if c == "(":
            self.i += 1
            body = self._expansions(base, nested=True)
            if self.src[self.i] != ")":
                raise GrammarParseError(f"lark: expecting ) at pos {self.i}")
            self.i += 1
            return "(" + body + ")"
        if c == "[":
            self.i += 1
            body = self._expansions(base, nested=True)
            if self.src[self.i] != "]":
                raise GrammarParseError(f"lark: expecting ] at pos {self.i}")
            self.i += 1
            return "(" + body + ")?"
        if c == "%" and src[self.i : self.i + 5] == "%json":
            return self._json_schema_atom()
        if c == "<" and src[self.i : self.i + 2] == "<|":
            raise GrammarParseError(
                "lark: special-token literals <|...|> require tokenizer-"
                "level matching and are not supported")
        if c.isalpha() or c == "_":
            name = self._name()
            self.referenced.add(name)
            return name
        raise GrammarParseError(f"lark: unexpected {c!r} at pos {self.i}")

    def _json_schema_atom(self) -> str:
        """``%json { <schema> }`` (llguidance extension): compile the
        inline JSON schema through the GBNF converter and splice its rules
        in under a fresh prefix."""
        import json as _json
        import re as _re

        self.i += 5
        self._ws(newlines=False)
        src = self.src
        if self.i >= len(src) or src[self.i] != "{":
            raise GrammarParseError(
                f"lark: expected {{ after %json at pos {self.i}")
        j = self.i
        depth = 0
        while j < len(src):
            c = src[j]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            elif c == '"':
                j += 1
                while j < len(src) and src[j] != '"':
                    j += 2 if src[j] == "\\" else 1
            j += 1
        else:
            raise GrammarParseError("lark: unterminated %json { ... }")
        raw = src[self.i : j]
        self.i = j
        try:
            schema = _json.loads(raw)
        except ValueError as e:
            raise GrammarParseError(f"lark: invalid %json schema: {e}") from None
        from .json_schema import json_schema_to_gbnf

        gbnf = json_schema_to_gbnf(schema)
        prefix = self._gensym("json")
        # rename every rule the converter defined (identifiers outside
        # string literals / char classes) so repeated %json atoms and user
        # rules can't collide
        names = {
            m.group(1)
            for m in _re.finditer(r"(?m)^([A-Za-z_][\w-]*)\s*::=", gbnf)
        }

        def rename_line(line: str) -> str:
            out: list[str] = []
            k, n = 0, len(line)
            while k < n:
                ch = line[k]
                if ch == '"' or ch == "[":
                    close = '"' if ch == '"' else "]"
                    out.append(ch)
                    k += 1
                    while k < n and line[k] != close:
                        if line[k] == "\\":
                            out.append(line[k : k + 2])
                            k += 2
                        else:
                            out.append(line[k])
                            k += 1
                    if k < n:
                        out.append(close)
                        k += 1
                elif ch.isalpha() or ch == "_":
                    m = _re.match(r"[\w-]*", line[k:])
                    word = line[k : k + m.end()]
                    out.append(
                        f"{prefix}-{word}" if word in names else word)
                    k += m.end()
                else:
                    out.append(ch)
                    k += 1
            return "".join(out)

        for line in gbnf.splitlines():
            if line.strip():
                self.out.append(rename_line(line))
        for nm in names:
            self.defined.add(f"{prefix}-{nm}")
        return f"{prefix}-root"

    def _ci_literal(self, cps: list[int]) -> str:
        parts = []
        for cp in cps:
            ch = chr(cp)
            if ch.isalpha() and len(ch.lower()) == 1 and len(ch.upper()) == 1:
                lo, up = ord(ch.lower()), ord(ch.upper())
                parts.append(_class(sorted({(lo, lo), (up, up)})))
            else:
                parts.append('"' + _gbnf_char(cp) + '"')
        return "(" + " ".join(parts) + ")" if len(parts) != 1 else parts[0]

    # -- regex subset → GBNF ------------------------------------------------

    def _regex(self, base: str) -> str:
        src = self.src
        assert src[self.i] == "/"
        self.i += 1
        j = self.i
        # find the unescaped closing /
        while self.i < len(src):
            if src[self.i] == "\\":
                self.i += 2
            elif src[self.i] == "/":
                break
            else:
                self.i += 1
        if self.i >= len(src):
            raise GrammarParseError("lark: unterminated regex")
        pat = src[j : self.i]
        self.i += 1
        flags = ""
        while self.i < len(src) and src[self.i] in "imslux":
            flags += src[self.i]
            self.i += 1
        if flags.replace("u", ""):
            raise GrammarParseError(
                f"lark: regex flags {flags!r} are not supported")
        try:
            return _RegexTr(pat).parse()
        except (IndexError, ValueError) as e:
            if isinstance(e, GrammarParseError):
                raise
            raise GrammarParseError(
                f"lark: malformed regex {pat!r}: {e}") from None


class _RegexTr:
    """Translate a practical regex subset into a GBNF fragment."""

    def __init__(self, pat: str):
        self.p = pat
        self.i = 0

    def parse(self) -> str:
        out = self._alts()
        if self.i < len(self.p):
            raise GrammarParseError(
                f"lark: unexpected {self.p[self.i]!r} in regex {self.p!r}")
        return out

    def _alts(self) -> str:
        alts = [self._seq()]
        while self.i < len(self.p) and self.p[self.i] == "|":
            self.i += 1
            alts.append(self._seq())
        if len(alts) == 1:
            return alts[0]
        return "(" + " | ".join(a if a else '""' for a in alts) + ")"

    def _seq(self) -> str:
        items = []
        while self.i < len(self.p) and self.p[self.i] not in "|)":
            items.append(self._quantified())
        return " ".join(items)

    def _quantified(self) -> str:
        atom = self._atom()
        if self.i >= len(self.p):
            return atom
        c = self.p[self.i]
        if c in "*+?":
            self.i += 1
            if self.i < len(self.p) and self.p[self.i] == "?":
                self.i += 1  # lazy quantifier: same language
            return atom + c
        if c == "{":
            j = self.p.find("}", self.i)
            if j < 0:
                raise GrammarParseError("lark: unterminated {} in regex")
            spec = self.p[self.i + 1 : j]
            self.i = j + 1
            return atom + "{" + spec + "}"
        return atom

    def _atom(self) -> str:
        p, c = self.p, self.p[self.i]
        if c == "(":
            self.i += 1
            if p[self.i : self.i + 2] == "?:":
                self.i += 2
            elif p[self.i] == "?":
                raise GrammarParseError(
                    f"lark: regex lookaround/named group in {p!r} unsupported")
            body = self._alts()
            if self.i >= len(p) or p[self.i] != ")":
                raise GrammarParseError(f"lark: unbalanced ( in regex {p!r}")
            self.i += 1
            return "(" + body + ")"
        if c == "[":
            return self._cls()
        if c == ".":
            self.i += 1
            return "[^\\n]"
        if c == "\\":
            self.i += 1
            return self._escape(in_class=False)
        if c in "^$":
            raise GrammarParseError(
                f"lark: regex anchors are not supported ({self.p!r})")
        self.i += 1
        return '"' + _gbnf_char(ord(c)) + '"'

    def _escape(self, in_class: bool) -> str:
        e = self.p[self.i]
        self.i += 1
        table = {"d": (_D, False), "D": (_D, True), "w": (_W, False),
                 "W": (_W, True), "s": (_S, False), "S": (_S, True)}
        if e in table:
            ranges, neg = table[e]
            if in_class:
                # negated shorthands inside [] contribute the complement
                # ranges ([\D] ≡ [^0-9]; [^\D] round-trips back to \d)
                return _complement(ranges) if neg else ranges
            return _class(ranges, neg)
        cp = {"n": 0x0A, "t": 0x09, "r": 0x0D, "f": 0x0C, "v": 0x0B,
              "0": 0x00}.get(e)
        if cp is None:
            if e == "x":
                cp = int(self.p[self.i : self.i + 2], 16)
                self.i += 2
            elif e == "u":
                cp = int(self.p[self.i : self.i + 4], 16)
                self.i += 4
            elif e.isalnum():
                raise GrammarParseError(
                    f"lark: regex escape \\{e} is not supported")
            else:
                cp = ord(e)
        if in_class:
            return [(cp, cp)]
        return '"' + _gbnf_char(cp) + '"'

    def _cls(self) -> str:
        p = self.p
        assert p[self.i] == "["
        self.i += 1
        neg = self.i < len(p) and p[self.i] == "^"
        if neg:
            self.i += 1
        ranges: list[tuple[int, int]] = []
        while self.i < len(p) and p[self.i] != "]":
            if p[self.i] == "\\":
                self.i += 1
                got = self._escape(in_class=True)
                # class shorthands (\d \w \s) contribute their ranges and
                # cannot anchor a range; literal escapes are single cps
                if len(got) > 1 or got[0][0] != got[0][1]:
                    ranges.extend(got)
                    continue
                lo = got[0][0]
            else:
                lo = ord(p[self.i])
                self.i += 1
            hi = lo
            if p[self.i : self.i + 1] == "-" and p[self.i + 1 : self.i + 2] != "]":
                self.i += 1
                if p[self.i] == "\\":
                    self.i += 1
                    got = self._escape(in_class=True)
                    if len(got) > 1 or got[0][0] != got[0][1]:
                        raise GrammarParseError(
                            "lark: class escape cannot be a range endpoint")
                    hi = got[0][0]
                else:
                    hi = ord(p[self.i])
                    self.i += 1
            ranges.append((lo, hi))
        if self.i >= len(p):
            raise GrammarParseError(f"lark: unbalanced [ in regex {p!r}")
        self.i += 1
        return _class(ranges, neg)


def lark_to_gbnf(src: str) -> str:
    """Translate a Lark-dialect (llguidance) grammar to GBNF text.

    The returned grammar's root rule is ``start``.
    """
    return _Lark(src).parse()


def is_llguidance(src: str) -> bool:
    """The reference's routing test (`common/sampling.cpp:157`)."""
    return src.lstrip().startswith("%llguidance")
