"""Lark-dialect (llguidance analog) grammar frontend.

Reference: grammars starting with ``%llguidance`` route to a Lark-dialect
engine (`common/sampling.cpp:157-159`, `common/llguidance.cpp`); here they
translate onto the GBNF PDA.  Tests mirror the llguidance integration's
observable contract: the constrained language, not the library internals.
"""

import pytest

from llama_cpp_gfx906_tpu.grammar import (
    Grammar,
    GrammarParseError,
    is_llguidance,
    lark_to_gbnf,
)


def accepts(g: Grammar, text: str, complete: bool = True) -> bool:
    g.reset()
    if not g.accept_bytes(text.encode()):
        return False
    return g.can_stop() if complete else True


def lark(src: str) -> Grammar:
    return Grammar.from_string("%llguidance {}\n" + src)


def test_routing_detection():
    assert is_llguidance("%llguidance {}\nstart: \"a\"")
    assert is_llguidance("  %llguidance\nstart: \"a\"")
    assert not is_llguidance("root ::= \"a\"")


def test_basic_alternation_and_literals():
    g = lark('start: "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # prefix but not complete


def test_rule_refs_and_repetition():
    g = lark('''
start: greeting name "!"
greeting: "hi " | "hello "
name: LETTER+
LETTER: "a".."z"
''')
    assert accepts(g, "hi bob!")
    assert accepts(g, "hello x!")
    assert not accepts(g, "hi !")
    assert not accepts(g, "yo bob!")


def test_lark_repeat_operator():
    g = lark('start: DIGIT ~ 3\nDIGIT: "0".."9"')
    assert accepts(g, "123")
    assert not accepts(g, "12")
    assert not accepts(g, "1234")
    g2 = lark('start: "a" ~ 2..4')
    assert not accepts(g2, "a")
    assert accepts(g2, "aa")
    assert accepts(g2, "aaaa")
    assert not accepts(g2, "aaaaa")


def test_optional_brackets_and_groups():
    g = lark('start: [SIGN] DIGIT+ ("." DIGIT+)?\nSIGN: "-" | "+"\nDIGIT: "0".."9"')
    for ok in ("42", "-7", "+3.25", "0.5"):
        assert accepts(g, ok), ok
    for bad in ("-", "3.", ".5", "--1"):
        assert not accepts(g, bad), bad


def test_case_insensitive_literal():
    g = lark('start: "select"i " *"')
    assert accepts(g, "SELECT *")
    assert accepts(g, "select *")
    assert accepts(g, "SeLeCt *")
    assert not accepts(g, "select*")


def test_regex_terminal():
    g = lark('start: /[a-f0-9]{2}(:[a-f0-9]{2})*/')
    assert accepts(g, "de:ad:be:ef")
    assert accepts(g, "00")
    assert not accepts(g, "0")
    assert not accepts(g, "de:")


def test_regex_escapes_and_dot():
    g = lark(r'start: /\d+\.\d+/')
    assert accepts(g, "3.14")
    assert not accepts(g, "3.")
    g2 = lark('start: /a.c/')
    assert accepts(g2, "abc")
    assert accepts(g2, "a?c")
    assert not accepts(g2, "a\nc")  # regex . excludes newline


def test_regex_class_negation_and_words():
    g = lark(r'start: "\"" /[^"\n]*/ "\""')
    assert accepts(g, '"hello world"')
    assert not accepts(g, '"he"llo"')
    g2 = lark(r'start: /\w+(\s\w+)*/')
    assert accepts(g2, "two words")
    assert not accepts(g2, "two  ")


def test_newline_alternation_continuation():
    g = lark('''
start: verb
verb: "run"
    | "jump"
    | "swim"
''')
    for v in ("run", "jump", "swim"):
        assert accepts(g, v)
    assert not accepts(g, "walk")


def test_comments_and_priorities():
    g = lark('''
// a lark comment
start: item        # trailing comment
item.2: "x" | "y"  // priorities are tree-shaping, ignored here
''')
    assert accepts(g, "x")
    assert not accepts(g, "z")


def test_json_subset_grammar():
    g = lark(r'''
start: value
value: object | array | STRING | NUMBER | "true" | "false" | "null"
object: "{" [pair ("," pair)*] "}"
pair: STRING ":" value
array: "[" [value ("," value)*] "]"
STRING: "\"" /[^"\\\n]*/ "\""
NUMBER: ["-"] DIGIT+ ["." DIGIT+]
DIGIT: "0".."9"
''')
    assert accepts(g, '{"a":1,"b":[true,null],"c":{"d":"e"}}')
    assert accepts(g, "[1,2,3]")
    assert not accepts(g, '{"a":}')
    assert not accepts(g, "[1,2,")


def test_token_masking_integration():
    """The constrained-decoding surface the sampler chain actually uses."""
    import numpy as np

    from llama_cpp_gfx906_tpu.grammar.gbnf import GrammarVocab

    g = lark('start: "ab" | "cd"')
    pieces = [b"a", b"b", b"c", b"d", b"ab", b"cd", b"x", b"</s>"]
    gv = GrammarVocab(pieces, eog_ids={7})
    mask = gv.mask(g)
    assert mask.dtype == np.bool_
    allowed = {pieces[i] for i in np.nonzero(mask)[0]}
    assert allowed == {b"a", b"c", b"ab", b"cd"}
    g.accept_token(0, b"a")
    allowed = {pieces[i] for i in np.nonzero(gv.mask(g))[0]}
    assert allowed == {b"b"}
    g.accept_token(1, b"b")
    allowed = set(np.nonzero(gv.mask(g))[0].tolist())
    assert allowed == {7}  # only EOG once the literal completes


def test_unsupported_directives_raise():
    with pytest.raises(GrammarParseError, match="%ignore"):
        lark_to_gbnf('%ignore WS\nstart: "a"\nWS: " "')
    with pytest.raises(GrammarParseError, match="%import"):
        lark_to_gbnf('%import common.WS\nstart: "a"')
    with pytest.raises(GrammarParseError, match="anchors"):
        lark_to_gbnf('start: /^abc$/')
    with pytest.raises(GrammarParseError, match="flags"):
        lark_to_gbnf('start: /abc/i')
    with pytest.raises(GrammarParseError, match="start"):
        lark_to_gbnf('thing: "a"')
    with pytest.raises(GrammarParseError, match="undefined"):
        lark_to_gbnf('start: missing_rule')


def test_engine_generation_with_lark_grammar():
    """End-to-end: a lark grammar constrains batched-server sampling."""
    np = pytest.importorskip("numpy")
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.gguf import GGMLType
    from llama_cpp_gfx906_tpu.grammar import grammar_vocab_from_tokenizer
    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.sampling.samplers import SamplerChain, SamplerParams
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
    from transformers import LlamaConfig, LlamaForCausalLM
    import tempfile, os

    torch.manual_seed(0)
    vocab_toks = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(45)] + [
        "yes", "no", "y", "e", "s", "n", "o", "x"]
    VOCAB = len(vocab_toks)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64)).eval()
    vocab = {
        "model": "llama", "tokens": vocab_toks, "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [1] * (VOCAB - 3), "bos": 0, "eos": 1,
    }
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.gguf")
        convert_hf_llama(hf, vocab, path, quant_type=GGMLType.F32)
        eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)

    chain = SamplerChain(SamplerParams(greedy=True), VOCAB)
    chain.set_grammar(Grammar.from_string('%llguidance {}\nstart: "yes" | "no"'),
                      grammar_vocab_from_tokenizer(eng.tokenizer))
    logits = eng.prefill([3, 9])
    text = b""
    prev = [3, 9]
    for _ in range(6):
        tok = chain.sample(np.asarray(logits, np.float32).reshape(-1), prev)
        prev.append(tok)
        chain.accept(tok)
        piece = eng.tokenizer.token_bytes(tok) if tok != 1 else b""
        if tok == 1:
            break
        text += piece
        logits = eng.decode_one(tok)
    assert text in (b"yes", b"no")


def test_class_shorthand_ranges():
    """\\d inside a character class must contribute its full range
    (regression: it collapsed to just '0')."""
    g = lark(r'start: /[\d,]+/')
    assert accepts(g, "5,91")
    assert accepts(g, "007")
    assert not accepts(g, "5a")
    g2 = lark(r'start: /[\w.]+/')
    assert accepts(g2, "a_9.Z")


def test_truncated_grammar_raises_parse_error():
    """Truncated grammars raise GrammarParseError (a ValueError), never
    IndexError — the server's admission guard depends on it."""
    for src in ("start", "start: (", 'start: "a', "start: x ~",
                "start: /ab", "start: [x", 'start: "a".."', "start: /a{2/"):
        with pytest.raises(GrammarParseError):
            lark_to_gbnf(src)


def test_regex_translation_fuzz_vs_re():
    """Deterministic fuzz: random regexes from the supported subset must
    accept exactly the strings Python's re.fullmatch accepts."""
    import random
    import re as pyre

    rng = random.Random(7)
    ATOMS = ["a", "b", "c", "0", "1", r"\d", r"\w", "[ab]", "[^a]",
             "[a-c]", "[0-9a-f]", "."]
    QUANTS = ["", "*", "+", "?", "{2}", "{1,3}"]

    def gen_seq(depth):
        n = rng.randint(1, 3)
        parts = []
        for _ in range(n):
            if depth < 2 and rng.random() < 0.25:
                alts = [gen_seq(depth + 1) for _ in range(rng.randint(1, 2))]
                # an unbounded quantifier around a possibly-empty group
                # (e.g. "(a*)*") loops the PDA — true for the reference
                # GBNF engine too, so the fuzzer doesn't generate it
                atom = "(" + "|".join(alts) + ")"
            else:
                atom = rng.choice(ATOMS) + rng.choice(QUANTS)
            parts.append(atom)
        return "".join(parts)

    alphabet = "abc019f_-\n"
    for trial in range(60):
        pat = gen_seq(0)
        try:
            compiled = pyre.compile(pat)
        except pyre.error:
            continue
        g = lark(f"start: /{pat}/")
        for _ in range(25):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 6)))
            want = compiled.fullmatch(s) is not None
            got = accepts(g, s)
            assert got == want, (pat, s, want, got)


# ---------------------------------------------------------------------------
# dialect breadth (round 4): %json atoms, attribute lists, negated class
# escapes inside [], named errors for special-token literals

def test_json_schema_atom():
    g = lark_to_gbnf(
        'start: "x" %json {"type": "object", "properties": '
        '{"a": {"type": "integer"}}, "required": ["a"]} "y"\n'
    )
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b'x{"a" : 12}y')
    gr2 = Grammar.from_string(g, root="start")
    assert not gr2.accept_bytes(b'x{"b": 1}y')


def test_json_schema_atom_twice_no_collision():
    g = lark_to_gbnf(
        'start: %json {"type": "integer"} "," %json {"type": "boolean"}\n'
    )
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"42,true")
    gr2 = Grammar.from_string(g, root="start")
    assert not gr2.accept_bytes(b"true,42")


def test_json_schema_atom_invalid_json():
    with pytest.raises(GrammarParseError, match="invalid %json"):
        lark_to_gbnf("start: %json {not json}\n")


def test_rule_attributes_neutral_ignored():
    g = lark_to_gbnf('start[max_tokens=30, temperature=0.7, capture]: "a"+\n')
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"aaa")


def test_lexeme_attribute_empty_stop_ok():
    g = lark_to_gbnf('start: T\nT[stop=""]: /[a-z]+/\n')
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"abc")


def test_unterminated_attribute_list_names_the_error():
    # an unquoted value must not scan across newlines into the next rule
    with pytest.raises(GrammarParseError, match="unterminated attribute"):
        lark_to_gbnf('start[capture=foo : "a"\nother: "b"\n')
    with pytest.raises(GrammarParseError, match="unterminated attribute"):
        lark_to_gbnf("start[capture=foo")


def test_attribute_changing_language_raises():
    with pytest.raises(GrammarParseError, match="stop"):
        lark_to_gbnf('start[stop="\\n"]: /.+/\n')
    with pytest.raises(GrammarParseError, match="suffix"):
        lark_to_gbnf('start[suffix="!"]: /.+/\n')


def test_negated_class_escape_inside_brackets():
    g = lark_to_gbnf(r"start: /[\D]+/" + "\n")
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"ab!")
    gr2 = Grammar.from_string(g, root="start")
    assert not gr2.accept_bytes(b"a7")


def test_negated_class_escape_mixed_members():
    # [\S,] — non-space plus comma; complement ranges merge with literals
    g = lark_to_gbnf(r"start: /[\Sx]+/" + "\n")
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"a,x")
    gr2 = Grammar.from_string(g, root="start")
    assert not gr2.accept_bytes(b"a b")


def test_double_negation_roundtrip():
    # [^\D] ≡ \d
    g = lark_to_gbnf(r"start: /[^\D]+/" + "\n")
    gr = Grammar.from_string(g, root="start")
    assert gr.accept_bytes(b"123")
    gr2 = Grammar.from_string(g, root="start")
    assert not gr2.accept_bytes(b"12a")


def test_special_token_literal_named_error():
    with pytest.raises(GrammarParseError, match="special-token"):
        lark_to_gbnf("start: <|eot_id|>\n")
