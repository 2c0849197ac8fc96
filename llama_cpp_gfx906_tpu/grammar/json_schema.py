"""JSON schema -> GBNF grammar conversion.

Capability mirror of the reference's common/json-schema-to-grammar.cpp
(SchemaConverter; primitive rules, $ref resolution, oneOf/anyOf/allOf,
object property ordering with required/optional split, array bounds,
string bounds/formats, integer ranges, pattern subset) — re-implemented
from the behavior contract, not translated.  The emitted grammar feeds
grammar.gbnf.Grammar, which produces the token masks for constrained
sampling on the server's `response_format: json_schema` path
(reference: tools/server/utils.hpp oaicompat parsing).
"""

from __future__ import annotations

import json
import re

PRIMITIVE_RULES: dict[str, str] = {
    "space": '" "?',
    "boolean": '("true" | "false") space',
    "null": '"null" space',
    "string": r'"\"" char* "\"" space',
    "char": r'[^"\\\x7F\x00-\x1F] | [\\] (["\\bfnrt] | "u" [0-9a-fA-F]{4})',
    "integer": '("-"? integral-part) space',
    "number": '("-"? integral-part) ("." decimal-part)? ([eE] [-+]? integral-part)? space',
    "integral-part": "[0] | [1-9] [0-9]{0,15}",
    "decimal-part": "[0-9]{1,16}",
    "value": "object | array | string | number | boolean | null",
    "object": '"{" space (string ":" space value ("," space string ":" space value)*)? "}" space',
    "array": '"[" space (value ("," space value)*)? "]" space',
}

FORMAT_RULES: dict[str, dict[str, str]] = {
    "date": {
        "date": '[0-9]{4} "-" ("0" [1-9] | "1" [0-2]) "-" ("0" [1-9] | [1-2] [0-9] | "3" [0-1])'
    },
    "time": {
        "time": '([01] [0-9] | "2" [0-3]) ":" [0-5] [0-9] ":" [0-5] [0-9] ("." [0-9]{3})? ("Z" | [+-] ([01] [0-9] | "2" [0-3]) ":" [0-5] [0-9])'
    },
    "date-time": {"date-time": 'date "T" time'},
    "uuid": {
        "uuid": '[0-9a-fA-F]{8} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{12}'
    },
}
FORMAT_RULES["date-time"].update(FORMAT_RULES["date"])
FORMAT_RULES["date-time"].update(FORMAT_RULES["time"])


def _gbnf_literal(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    out = out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    return f'"{out}"'


def _json_literal(v) -> str:
    return _gbnf_literal(json.dumps(v, ensure_ascii=False))


# ---------------------------------------------------------------------------
# integer range -> digit grammar
# ---------------------------------------------------------------------------


def _span(a: str, b: str) -> str:
    """Grammar for integers (as equal-length digit strings) in [a, b]."""
    if a == b:
        return _gbnf_literal(a)
    if len(a) == 1:
        return f"[{a}-{b}]" if a != b else _gbnf_literal(a)
    if a[0] == b[0]:
        return f"{_gbnf_literal(a[0])} ({_span(a[1:], b[1:])})"
    alts = [f"{_gbnf_literal(a[0])} ({_span(a[1:], '9' * (len(a) - 1))})"]
    lo, hi = int(a[0]) + 1, int(b[0]) - 1
    if lo <= hi:
        mid = f"[{lo}]" if lo == hi else f"[{lo}-{hi}]"
        alts.append(f"{mid} [0-9]{{{len(a) - 1}}}")
    alts.append(f"{_gbnf_literal(b[0])} ({_span('0' * (len(b) - 1), b[1:])})")
    return " | ".join(alts)


def _uint_range(lo: int | None, hi: int | None) -> str:
    """Grammar for non-negative integers with optional bounds (no sign)."""
    if lo is None:
        lo = 0
    if hi is None:
        # >= lo, unbounded
        s = str(lo)
        parts = [f"({_span(s, '9' * len(s))})"]
        parts.append(f"[1-9] [0-9]{{{len(s)},15}}")
        return " | ".join(parts)
    alts = []
    for nd in range(len(str(max(lo, 1))), len(str(hi)) + 1):
        a = max(lo, 0 if nd == 1 else 10 ** (nd - 1))
        b = min(hi, 10**nd - 1)
        if a > b:
            continue
        alts.append(f"({_span(str(a), str(b))})")
    return " | ".join(alts) if alts else '"?impossible?"'


def _int_range_rule(mn: int | None, mx: int | None) -> str:
    """Full signed-integer range grammar body."""
    alts = []
    # negative side
    if (mn is None or mn < 0) and (mx is None or mx <= -1 or mx >= 0):
        neg_hi = -1 if mx is None or mx >= 0 else mx  # most positive negative
        neg_lo = mn  # most negative (None = unbounded)
        if mn is None or mn < 0:
            lo_mag = None if neg_lo is None else -neg_lo
            hi_mag = -neg_hi
            # magnitudes in [hi_mag, lo_mag] -> reversed bounds
            alts.append(f'"-" ({_uint_range(hi_mag, lo_mag)})')
    # non-negative side
    if mx is None or mx >= 0:
        pos_lo = 0 if mn is None or mn < 0 else mn
        pos_hi = mx
        if pos_hi is None or pos_hi >= pos_lo:
            alts.append(f"({_uint_range(pos_lo, pos_hi)})")
    return " | ".join(alts) if alts else '"?impossible?"'


# ---------------------------------------------------------------------------
# regex pattern subset -> GBNF
# ---------------------------------------------------------------------------

_CLASS_MAP = {
    "d": "[0-9]",
    "w": "[0-9a-zA-Z_]",
    "s": "[ \\t\\n\\r]",
}


def _pattern_to_gbnf(pattern: str) -> str:
    """Convert a (subset of) regex to a GBNF fragment.

    Supports: literals, '.', escaped classes \\d \\w \\s, char classes,
    groups, alternation, * + ? {m,n}.  Anchors ^...$ are stripped (the
    whole string is matched, mirroring the reference converter).
    """
    p = pattern
    if p.startswith("^"):
        p = p[1:]
    if p.endswith("$") and not p.endswith("\\$"):
        p = p[:-1]
    i = 0
    n = len(p)

    def parse_alt() -> str:
        nonlocal i
        seqs = [parse_seq()]
        while i < n and p[i] == "|":
            i += 1
            seqs.append(parse_seq())
        return " | ".join(s if s else '""' for s in seqs)

    def parse_seq() -> str:
        nonlocal i
        items = []
        while i < n and p[i] not in "|)":
            items.append(parse_item())
        return " ".join(items)

    def parse_item() -> str:
        nonlocal i
        atom = parse_atom()
        if i < n and p[i] in "*+?{":
            c = p[i]
            if c == "{":
                j = p.index("}", i)
                spec = p[i + 1 : j]
                i = j + 1
                rep = "{" + spec + "}"
            else:
                i += 1
                rep = c
            return f"({atom}){rep}"
        return atom

    def parse_atom() -> str:
        nonlocal i
        c = p[i]
        if c == "(":
            i += 1
            if p[i : i + 2] == "?:":
                i += 2
            inner = parse_alt()
            if i >= n or p[i] != ")":
                raise ValueError(f"unbalanced group in pattern {pattern!r}")
            i += 1
            return f"({inner})"
        if c == "[":
            j = i + 1
            if j < n and p[j] == "^":
                j += 1
            if j < n and p[j] == "]":
                j += 1
            while j < n and p[j] != "]":
                if p[j] == "\\":
                    j += 1
                j += 1
            cls = p[i : j + 1]
            i = j + 1
            return cls
        if c == "\\":
            e = p[i + 1]
            i += 2
            if e in _CLASS_MAP:
                return _CLASS_MAP[e]
            if e in "DWS":
                inner = _CLASS_MAP[e.lower()][1:-1]
                return f"[^{inner}]"
            return _gbnf_literal(e)
        if c == ".":
            i += 1
            return "[^\\x0A\\x0D]"
        i += 1
        return _gbnf_literal(c)

    out = parse_alt()
    if i != n:
        raise ValueError(f"trailing characters in pattern {pattern!r}")
    return out


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------


class SchemaConverter:
    def __init__(self):
        self.rules: dict[str, str] = {"space": PRIMITIVE_RULES["space"]}
        self.refs: dict[str, dict] = {}
        self._counter = 0

    # rule helpers ---------------------------------------------------------
    def _add(self, name: str, body: str) -> str:
        key = re.sub(r"[^a-zA-Z0-9-]+", "-", name).strip("-") or "rule"
        if self.rules.get(key, body) is None:  # recursive placeholder
            self.rules[key] = body
            return key
        if key in self.rules and self.rules[key] != body:
            k = 0
            while f"{key}{k}" in self.rules and self.rules[f"{key}{k}"] != body:
                k += 1
            key = f"{key}{k}"
        self.rules[key] = body
        return key

    def _primitive(self, name: str) -> str:
        body = PRIMITIVE_RULES[name]
        if name not in self.rules:
            self.rules[name] = body
            for dep in re.findall(r"\b[a-z][a-z-]*\b", body):
                if dep in PRIMITIVE_RULES and dep not in self.rules:
                    self._primitive(dep)
        return name

    # $ref resolution --------------------------------------------------------
    def _resolve_ref(self, ref: str, root: dict) -> dict:
        if not ref.startswith("#/"):
            raise ValueError(f"only local $refs supported: {ref}")
        node = root
        for part in ref[2:].split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            node = node[part]
        return node

    # main ------------------------------------------------------------------
    def visit(self, schema: dict | bool, name: str, root: dict) -> str:
        if schema is True or schema == {}:
            return self._primitive("value")
        if schema is False:
            return self._add(name or "never", '"?never?"')

        if "$ref" in schema:
            ref = schema["$ref"]
            rule_name = re.sub(r"[^a-zA-Z0-9-]+", "-", ref.split("/")[-1]).strip("-")
            if ref not in self.refs:
                self.refs[ref] = None  # in-progress marker for recursion
                target = self._resolve_ref(ref, root)
                self.refs[ref] = {"name": self.visit(target, rule_name, root)}
            elif self.refs[ref] is None:
                # recursive ref: the final rule will get this name
                self.refs[ref] = {"name": rule_name}
                self.rules.setdefault(rule_name, None)
                return rule_name
            return self.refs[ref]["name"]

        if "const" in schema:
            return self._add(name or "const", _json_literal(schema["const"]) + " space")
        if "enum" in schema:
            body = " | ".join(_json_literal(v) for v in schema["enum"]) + " space"
            return self._add(name or "enum", body)

        if "allOf" in schema:
            merged: dict = {}
            for sub in schema["allOf"]:
                if "$ref" in sub:
                    sub = self._resolve_ref(sub["$ref"], root)
                for k, v in sub.items():
                    if k == "properties":
                        merged.setdefault("properties", {}).update(v)
                    elif k == "required":
                        merged["required"] = list(set(merged.get("required", [])) | set(v))
                    else:
                        merged.setdefault(k, v)
            for k, v in schema.items():
                if k != "allOf":
                    merged.setdefault(k, v)
            return self.visit(merged, name, root)

        for comb in ("oneOf", "anyOf"):
            if comb in schema:
                alts = [
                    self.visit(sub, f"{name}-{i}" if name else f"alt-{i}", root)
                    for i, sub in enumerate(schema[comb])
                ]
                return self._add(name or "union", " | ".join(alts))

        stype = schema.get("type")
        if isinstance(stype, list):
            alts = [
                self.visit({**schema, "type": t}, f"{name}-{t}" if name else t, root)
                for t in stype
            ]
            return self._add(name or "typeunion", " | ".join(alts))

        if stype == "object" or (stype is None and "properties" in schema):
            return self._object(schema, name, root)
        if stype == "array" or (stype is None and ("items" in schema or "prefixItems" in schema)):
            return self._array(schema, name, root)
        if stype == "string":
            return self._string(schema, name)
        if stype == "integer":
            if "minimum" in schema or "maximum" in schema or "exclusiveMinimum" in schema or "exclusiveMaximum" in schema:
                mn = schema.get("minimum")
                if "exclusiveMinimum" in schema:
                    mn = int(schema["exclusiveMinimum"]) + 1
                mx = schema.get("maximum")
                if "exclusiveMaximum" in schema:
                    mx = int(schema["exclusiveMaximum"]) - 1
                body = f"({_int_range_rule(None if mn is None else int(mn), None if mx is None else int(mx))}) space"
                return self._add(name or "int-range", body)
            return self._primitive("integer")
        if stype == "number":
            return self._primitive("number")
        if stype == "boolean":
            return self._primitive("boolean")
        if stype == "null":
            return self._primitive("null")
        return self._primitive("value")

    def _string(self, schema: dict, name: str) -> str:
        if "pattern" in schema:
            frag = _pattern_to_gbnf(schema["pattern"])
            body = f'"\\"" ({frag}) "\\"" space'
            return self._add(name or "pattern-string", body)
        fmt = schema.get("format")
        if fmt in FORMAT_RULES:
            for rn, rb in FORMAT_RULES[fmt].items():
                self.rules.setdefault(rn, rb)
            self._primitive("space")
            return self._add(
                (name or fmt) + "-string", f'"\\"" {fmt} "\\"" space'
            )
        mn = schema.get("minLength", 0)
        mx = schema.get("maxLength")
        if mn or mx is not None:
            self._primitive("char")
            rep = f"{{{mn},{mx}}}" if mx is not None else (f"{{{mn},}}" if mn else "*")
            return self._add(name or "sized-string", f'"\\"" char{rep} "\\"" space')
        return self._primitive("string")

    def _object(self, schema: dict, name: str, root: dict) -> str:
        props = schema.get("properties", {})
        required = set(schema.get("required", []))
        # NOTE: like the reference converter, additionalProperties defaults to
        # false (constrained output wants closed objects by default)
        additional = schema.get("additionalProperties", False)

        prop_rules = {
            k: self.visit(v, f"{name}-{k}" if name else k, root) for k, v in props.items()
        }
        self._primitive("space")

        def kv(k: str) -> str:
            return f'{_json_literal(k)} space ":" space {prop_rules[k]}'

        ordered = list(props.keys())
        req = [k for k in ordered if k in required]
        opt = [k for k in ordered if k not in required]

        # required props in declaration order; optional props may appear after,
        # each preceded by a comma (same shape the reference emits)
        parts = []
        if req:
            parts.append(' "," space '.join(kv(k) for k in req))
        if opt:
            if req:
                opt_frag = " ".join(f'( "," space {kv(k)} )?' for k in opt)
                body_inner = f"{parts[0]} {opt_frag}"
            else:
                # all-optional: first present property has no leading comma
                alts = []
                for i, k in enumerate(opt):
                    rest = " ".join(f'( "," space {kv(k2)} )?' for k2 in opt[i + 1 :])
                    alts.append(f"{kv(k)} {rest}".strip())
                body_inner = f"( {' | '.join(alts)} )?"
        else:
            body_inner = parts[0] if parts else ""

        if additional is True and not props:
            return self._primitive("object")
        if additional not in (False, None) and additional is not True:
            ad_rule = self.visit(additional, f"{name}-additional" if name else "additional", root)
            self._primitive("string")
            ad_kv = f'string ":" space {ad_rule}'
            if body_inner:
                body_inner = f'{body_inner} ( "," space {ad_kv} )*'
            else:
                body_inner = f'( {ad_kv} ( "," space {ad_kv} )* )?'
        elif additional is True and props:
            self._primitive("value")
            self._primitive("string")
            ad_kv = 'string ":" space value'
            body_inner = f'{body_inner} ( "," space {ad_kv} )*'

        body = f'"{{" space {body_inner} "}}" space'
        return self._add(name or "object", body)

    def _array(self, schema: dict, name: str, root: dict) -> str:
        self._primitive("space")
        if "prefixItems" in schema:
            items = [
                self.visit(s, f"{name}-{i}" if name else f"item-{i}", root)
                for i, s in enumerate(schema["prefixItems"])
            ]
            inner = ' "," space '.join(items)
            return self._add(name or "tuple", f'"[" space {inner} "]" space')
        item = self.visit(schema.get("items", {}), f"{name}-item" if name else "item", root)
        mn = int(schema.get("minItems", 0))
        mx = schema.get("maxItems")
        if mn == 0 and mx is None:
            inner = f'( {item} ( "," space {item} )* )?'
        elif mx is None:
            inner = f'{item} ( "," space {item} ){{{mn - 1},}}'
        elif mn == 0:
            inner = f'( {item} ( "," space {item} ){{0,{int(mx) - 1}}} )?' if int(mx) > 0 else '""'
        else:
            inner = f'{item} ( "," space {item} ){{{mn - 1},{int(mx) - 1}}}'
        return self._add(name or "array", f'"[" space {inner} "]" space')

    def format_grammar(self, root_rule: str) -> str:
        lines = [f"root ::= {root_rule}"]
        for rname, body in sorted(self.rules.items()):
            if body is None:
                raise ValueError(f"unresolved recursive rule {rname}")
            if rname != "root":
                lines.append(f"{rname} ::= {body}")
        return "\n".join(lines) + "\n"


def json_schema_to_gbnf(schema: dict | str) -> str:
    """Public entry point (reference: json_schema_to_grammar(),
    common/json-schema-to-grammar.h)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    conv = SchemaConverter()
    root = conv.visit(schema, "root-schema", schema)
    # patch unresolved recursive refs: point the placeholder at the real rule
    return conv.format_grammar(root)
