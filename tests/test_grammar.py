"""Grammar engine tests (reference strategy: tests/test-grammar-parser.cpp,
test-grammar-integration.cpp, test-json-schema-to-grammar.cpp,
test-sampling.cpp grammar sections)."""

import json
import pathlib
import random

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.grammar import (
    Grammar,
    GrammarParseError,
    GrammarVocab,
    json_schema_to_gbnf,
    parse_gbnf,
)
from llama_cpp_gfx906_tpu.sampling.samplers import (
    SamplerChain,
    SamplerParams,
    apply_dry,
    apply_top_n_sigma,
)

REF_GRAMMARS = pathlib.Path("/root/reference/grammars")


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_simple():
    rules, symbols = parse_gbnf('root ::= "ab" | [0-9]+')
    assert "root" in symbols
    assert len(rules[symbols["root"]]) == 2


def test_parse_escapes():
    g = Grammar.from_string(r'root ::= "\n" "\x41" "é"')
    assert g.accept_bytes("\nAé".encode()) and g.can_stop()


def test_parse_errors():
    for bad in ["root = x", 'root ::= "unterminated', "root ::= undefined-rule", "::= nothing"]:
        with pytest.raises(GrammarParseError):
            parse_gbnf(bad)


def test_all_reference_grammars_parse():
    for f in sorted(REF_GRAMMARS.glob("*.gbnf")):
        Grammar.from_string(f.read_text())


# ---------------------------------------------------------------------------
# PDA acceptance
# ---------------------------------------------------------------------------

JSON_GBNF = (REF_GRAMMARS / "json.gbnf").read_text()


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"a": 1}', True),
        ('{"a": [1, 2.5, "x"], "b": null}', True),
        ('{"nested": {"deep": [true, false]}}', True),
        ("{", False),  # incomplete -> accepted prefix but cannot stop
        ('{"a" 1}', None),  # hard reject mid-way
    ],
)
def test_json_grammar(text, ok):
    g = Grammar.from_string(JSON_GBNF)
    accepted = g.accept_bytes(text.encode())
    if ok is None:
        assert not accepted
    elif ok:
        assert accepted and g.can_stop()
    else:
        assert accepted and not g.can_stop()


def test_repetition_bounds():
    g = Grammar.from_string('root ::= "a"{2,4}')
    for s, ok in [(b"aa", True), (b"aaaa", True), (b"a", False), (b"aaaaa", False)]:
        g.reset()
        acc = g.accept_bytes(s)
        assert (acc and g.must_stop() or (acc and g.can_stop())) == ok if ok else not (acc and g.can_stop())


def test_star_plus_opt():
    g = Grammar.from_string('root ::= ("ab" | "cd")* "!"')
    for s, ok in [(b"!", True), (b"abcdab!", True), (b"abc!", False)]:
        g.reset()
        assert (g.accept_bytes(s) and g.can_stop()) == ok


def test_utf8_partial_carry():
    g = Grammar.from_string("root ::= [\\u00e0-\\u00ff]+")
    raw = "éàü".encode()
    # feed byte-by-byte: multi-byte codepoints split across calls
    for i in range(len(raw)):
        assert g.accept_bytes(raw[i : i + 1])
    assert g.can_stop()


def test_negated_class():
    g = Grammar.from_string('root ::= [^"\\n]+')
    assert g.accept_bytes(b"hello world") and g.can_stop()
    g.reset()
    assert not g.accept_bytes(b'he"llo')


# ---------------------------------------------------------------------------
# token masking
# ---------------------------------------------------------------------------


def _toy_vocab():
    pieces = [b"", b"{", b"}", b'"', b"a", b"b", b"ab", b":", b" ", b"1", b"23", b"true", b"<eos>"]
    pieces[-1] = b""  # eos is special: empty piece
    return GrammarVocab(pieces, eog_ids={12}), pieces


def test_mask_json_start():
    gv, pieces = _toy_vocab()
    g = Grammar.from_string(JSON_GBNF)
    mask = gv.mask(g)
    assert mask[1]  # '{'
    assert not mask[2] and not mask[4] and not mask[12]


def test_mask_eog_when_complete():
    gv, _ = _toy_vocab()
    g = Grammar.from_string('root ::= "a"')
    g.accept_bytes(b"a")
    mask = gv.mask(g)
    assert mask[12]  # eos allowed at completion
    assert not mask[4]  # no more 'a'


def test_chain_grammar_constrained_sampling():
    gv, pieces = _toy_vocab()
    g = Grammar.from_string(JSON_GBNF)
    chain = SamplerChain(SamplerParams(greedy=True), len(pieces))
    chain.set_grammar(g, gv)
    # rig logits to prefer 'true' (invalid at start) — grammar must redirect
    logits = np.full(len(pieces), -10.0, np.float32)
    logits[11] = 5.0  # "true"
    logits[1] = 1.0  # "{"
    tok = chain.sample(logits, [])
    assert tok == 1
    chain.accept(tok)
    # inside object: '"' should be reachable, '1' not (need key or '}')
    logits2 = np.full(len(pieces), 0.0, np.float32)
    logits2[9] = 9.0  # '1' invalid here
    tok2 = chain.sample(logits2, [])
    assert pieces[tok2] in (b"}", b'"', b" ")


def test_chain_grammar_full_generation():
    """Drive a random model through the grammar to EOS; output must be valid JSON."""
    gv, pieces = _toy_vocab()
    g = Grammar.from_string(JSON_GBNF)
    chain = SamplerChain(SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, seed=7), len(pieces))
    chain.set_grammar(g, gv)
    rng = np.random.default_rng(0)
    out = b""
    for _ in range(80):
        logits = rng.normal(0, 2, len(pieces)).astype(np.float32)
        tok = chain.sample(logits, [])
        if tok == 12:
            chain.accept(tok, is_eog=True)
            break
        chain.accept(tok)
        out += pieces[tok]
    assert json.loads(out.decode()) is not None


# ---------------------------------------------------------------------------
# lazy grammar (trigger words — reference: lazy-grammar sampler :1590)
# ---------------------------------------------------------------------------


def test_lazy_grammar_trigger():
    gv, pieces = _toy_vocab()
    g = Grammar.from_string('root ::= "{" "}"', lazy=True, trigger_patterns=(r"\{",))
    chain = SamplerChain(SamplerParams(greedy=True), len(pieces))
    chain.set_grammar(g, gv)
    # before trigger: anything goes
    logits = np.zeros(len(pieces), np.float32)
    logits[11] = 5.0
    assert chain.sample(logits, []) == 11
    chain.accept(11)
    assert g.awaiting_trigger
    # the trigger char arrives
    chain.accept(1)  # "{"
    assert not g.awaiting_trigger
    # now constrained: only "}" legal
    logits[11] = 5.0
    tok = chain.sample(logits, [])
    assert pieces[tok] == b"}"


# ---------------------------------------------------------------------------
# JSON schema conversion
# ---------------------------------------------------------------------------


SCHEMA_CASES = [
    ({"type": "object", "properties": {"name": {"type": "string"}, "age": {"type": "integer", "minimum": 0, "maximum": 130}}, "required": ["name"]},
     ['{"name": "bob"}', '{"name": "x", "age": 42}'],
     ['{"age": 5}', '{"name": 3}', '{"name": "x", "age": 200}']),
    ({"type": "array", "items": {"type": "number"}, "minItems": 2, "maxItems": 3},
     ["[1, 2]", "[1.5, -2e3, 4]"], ["[1]", "[1, 2, 3, 4]", '["a", "b"]']),
    ({"enum": ["red", "green", 7]}, ['"red"', "7"], ['"blue"', "8"]),
    ({"oneOf": [{"type": "boolean"}, {"type": "null"}]}, ["true", "null"], ["1"]),
    ({"type": "string", "pattern": "^[a-f]{3}-[0-9]+$"}, ['"abc-123"'], ['"abcd-1"', '"abc-"']),
    ({"type": "string", "format": "uuid"}, ['"01234567-89ab-cdef-0123-456789abcdef"'], ['"xyz"']),
    ({"type": "object", "properties": {"a": {"type": "integer"}, "b": {"type": "string"}}},
     ["{}", '{"a": 1}', '{"b": "x"}', '{"a": 1, "b": "y"}'], ['{"c": 1}', '{"b": "x", "a": 1}']),
    ({"$defs": {"n": {"type": "object", "properties": {"v": {"type": "integer"}, "next": {"oneOf": [{"$ref": "#/$defs/n"}, {"type": "null"}]}}, "required": ["v", "next"]}}, "$ref": "#/$defs/n"},
     ['{"v": 1, "next": null}', '{"v": 1, "next": {"v": 2, "next": null}}'], ['{"v": 1}']),
    ({"type": "array", "prefixItems": [{"type": "string"}, {"type": "integer"}]},
     ['["a", 1]'], ['[1, "a"]', '["a"]']),
    ({"allOf": [{"type": "object", "properties": {"x": {"type": "integer"}}, "required": ["x"]},
                {"properties": {"y": {"type": "integer"}}, "required": ["y"]}]},
     ['{"x": 1, "y": 2}'], ['{"x": 1}']),
]


@pytest.mark.parametrize("schema,good,bad", SCHEMA_CASES)
def test_json_schema_to_gbnf(schema, good, bad):
    g = Grammar.from_string(json_schema_to_gbnf(schema))
    for s in good:
        g.reset()
        assert g.accept_bytes(s.encode()) and g.can_stop(), s
    for s in bad:
        g.reset()
        assert not (g.accept_bytes(s.encode()) and g.can_stop()), s


def test_int_range_random_sweep():
    from llama_cpp_gfx906_tpu.grammar.json_schema import _int_range_rule

    random.seed(1)
    for mn, mx in [(0, 130), (-5, 5), (7, 7), (-100, -10), (5, None), (None, 20), (0, None)]:
        g = Grammar.from_string(f"root ::= {_int_range_rule(mn, mx)}")
        for _ in range(100):
            v = random.randint((mn if mn is not None else -150) - 30, (mx if mx is not None else 150) + 30)
            g.reset()
            ok = g.accept_bytes(str(v).encode()) and g.can_stop()
            assert ok == ((mn is None or v >= mn) and (mx is None or v <= mx)), (mn, mx, v)


# ---------------------------------------------------------------------------
# new samplers
# ---------------------------------------------------------------------------


def test_dry_penalizes_repeats():
    # context ends with "1 2 3 1 2" -> continuing with 3 extends a repeat
    prev = [1, 2, 3, 1, 2]
    logits = np.zeros(10, np.float32)
    out = apply_dry(logits.copy(), prev, multiplier=1.0, base=2.0, allowed_length=2, last_n=-1, breakers=frozenset())
    assert out[3] < 0.0
    assert out[4] == 0.0


def test_dry_respects_breakers():
    prev = [1, 2, 9, 1, 2]  # 9 is a breaker: match cannot cross it
    out = apply_dry(np.zeros(10, np.float32), prev, 1.0, 2.0, 1, -1, frozenset({9}))
    assert out[9] == 0.0  # breaker token itself never penalised


def test_top_n_sigma():
    logits = np.array([10.0, 9.5, 0.0, -5.0], np.float32)
    out = apply_top_n_sigma(logits.copy(), 1.0)
    assert np.isfinite(out[0]) and np.isfinite(out[1])
    assert not np.isfinite(out[3])


def test_mirostat_v1_runs():
    chain = SamplerChain(SamplerParams(mirostat=1, temp=1.0, seed=3), 128)
    rng = np.random.default_rng(0)
    for _ in range(10):
        tok = chain.sample(rng.normal(0, 3, 128).astype(np.float32), [])
        assert 0 <= tok < 128
    assert chain.mu is not None
