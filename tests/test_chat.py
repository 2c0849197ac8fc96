"""Chat template + tool-call parsing tests (reference strategy:
tests/test-chat-template.cpp, test-chat.cpp, test-json-partial.cpp)."""

import json

import pytest

from llama_cpp_gfx906_tpu.chat import (
    apply_builtin_template,
    detect_template,
    extract_reasoning,
    heal_partial_json,
    parse_chat_output,
    render_chat_template,
    tool_call_grammar,
)
from llama_cpp_gfx906_tpu.grammar import Grammar

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


# ---------------------------------------------------------------------------
# builtin dialects
# ---------------------------------------------------------------------------


def test_chatml():
    out = apply_builtin_template("chatml", MSGS)
    assert out.startswith("<|im_start|>system\nYou are helpful.<|im_end|>\n")
    assert out.endswith("<|im_start|>assistant\n")
    assert out.count("<|im_start|>") == 5


def test_llama3():
    out = apply_builtin_template("llama3", MSGS)
    assert "<|start_header_id|>user<|end_header_id|>\n\nHi<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_llama2_sys():
    out = apply_builtin_template("llama2_sys", MSGS)
    assert "<<SYS>>\nYou are helpful.\n<</SYS>>" in out
    assert "[INST]" in out and "[/INST]" in out


def test_gemma_system_folded_into_user():
    out = apply_builtin_template("gemma", MSGS)
    assert "<start_of_turn>user\nYou are helpful.\n\nHi<end_of_turn>" in out
    assert "<start_of_turn>model\nHello!<end_of_turn>" in out
    assert out.endswith("<start_of_turn>model\n")


def test_phi3():
    out = apply_builtin_template("phi3", MSGS)
    assert "<|user|>\nHi<|end|>" in out
    assert out.endswith("<|assistant|>\n")


@pytest.mark.parametrize("dialect", [
    "vicuna", "command_r", "deepseek", "deepseek2", "deepseek3", "granite",
    "zephyr", "openchat", "chatglm3", "chatglm4", "glmedge", "monarch",
    "falcon3", "openai_moe", "minicpm", "exaone3", "exaone4", "rwkv_world",
    "gigachat", "megrez", "yandex", "bailing", "llama4", "smolvlm", "dots1",
    "hunyuan_moe",
])
def test_dialect_renders(dialect):
    out = apply_builtin_template(dialect, MSGS)
    assert "Hi" in out and len(out) > 20


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fingerprint,expect",
    [
        ("{% for m in messages %}<|im_start|>{{m.role}}...", "chatml"),
        ("...<|start_header_id|>{{ role }}<|end_header_id|>...", "llama3"),
        ("{{ bos }}{% for m %}[INST] {{c}} [/INST]<<SYS>>", "llama2_sys"),
        ("...<start_of_turn>{{ role }}...", "gemma"),
        ("...<|START_OF_TURN_TOKEN|>...", "command_r"),
        ("...<|user|>{{ x }}<|end|>...", "phi3"),
        ("llama2", "llama2"),
    ],
)
def test_detect(fingerprint, expect):
    assert detect_template(fingerprint) == expect


def test_jinja_render_with_tools():
    tmpl = (
        "{% if tools %}TOOLS:{{ tools | tojson }}\n{% endif %}"
        "{% for m in messages %}{{ m.role }}: {{ m.content }}\n{% endfor %}"
    )
    tools = [{"type": "function", "function": {"name": "get_time", "parameters": {}}}]
    out = render_chat_template(tmpl, MSGS[:2], tools=tools)
    assert "get_time" in out and "user: Hi" in out


def test_jinja_fallback_on_error():
    out = render_chat_template("{{ undefined_fn() }}<|im_start|>", MSGS[:2])
    assert "<|im_start|>" in out  # fell back to chatml builtin


# ---------------------------------------------------------------------------
# reasoning + tool-call parsing
# ---------------------------------------------------------------------------


def test_llama4_format():
    out = apply_builtin_template("llama4", MSGS[:2])
    assert "<|header_start|>user<|header_end|>\n\nHi<|eot|>" in out
    assert out.endswith("<|header_start|>assistant<|header_end|>\n\n")


def test_deepseek2_format():
    out = apply_builtin_template("deepseek2", MSGS)
    assert "User: Hi\n\n" in out and "Assistant: Hello!<｜end▁of▁sentence｜>" in out
    assert out.endswith("Assistant:")


def test_gigachat_system_handling():
    out = apply_builtin_template("gigachat", MSGS)
    assert out.startswith("<s>You are helpful.<|message_sep|>")
    assert "available functions<|role_sep|>[]" in out


def test_extract_reasoning():
    c, r = extract_reasoning("<think>step 1\nstep 2</think>The answer is 4.")
    assert r == "step 1\nstep 2"
    assert c == "The answer is 4."


def test_extract_reasoning_unterminated():
    c, r = extract_reasoning("<think>still going")
    assert c == "" and r == "still going"


def test_parse_hermes():
    text = 'Let me check.\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "Paris"}}\n</tool_call>'
    msg = parse_chat_output(text, fmt="hermes")
    assert len(msg.tool_calls) == 1
    assert msg.tool_calls[0].name == "get_weather"
    assert json.loads(msg.tool_calls[0].arguments) == {"city": "Paris"}
    assert msg.content == "Let me check."


def test_parse_mistral():
    text = '[TOOL_CALLS][{"name": "add", "arguments": {"a": 1, "b": 2}}]'
    msg = parse_chat_output(text, fmt="mistral")
    assert msg.tool_calls[0].name == "add"


def test_parse_llama3():
    text = '{"name": "search", "parameters": {"q": "tpu"}}'
    msg = parse_chat_output(text, fmt="llama3")
    assert msg.tool_calls[0].name == "search"
    assert json.loads(msg.tool_calls[0].arguments) == {"q": "tpu"}


def test_parse_generic_fenced():
    text = '```json\n{"tool_call": {"name": "f", "arguments": {}}}\n```'
    msg = parse_chat_output(text, fmt="generic")
    assert msg.tool_calls[0].name == "f"


def test_parse_auto_plain_text():
    msg = parse_chat_output("Just a normal answer.", fmt="auto")
    assert msg.content == "Just a normal answer."
    assert not msg.tool_calls


def test_parse_auto_with_think_and_tool():
    text = '<think>need weather</think><tool_call>{"name": "w", "arguments": {}}</tool_call>'
    msg = parse_chat_output(text, fmt="auto")
    assert msg.reasoning_content == "need weather"
    assert msg.tool_calls and msg.tool_calls[0].name == "w"


# ---------------------------------------------------------------------------
# partial JSON healing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "prefix,expect",
    [
        ('{"a": 1}', {"a": 1}),
        ('{"a": 1', {"a": 1}),
        ('{"a": [1, 2', {"a": [1, 2]}),
        ('{"a": "hel', {"a": "hel"}),
        ('{"a": tru', {"a": None}),
        ('{"key', {"key": None}),
        ('[{"x": 1}, {"y"', [{"x": 1}, {"y": None}]),
        ('{"a": 1, ', {"a": 1}),
    ],
)
def test_heal_partial(prefix, expect):
    val, complete = heal_partial_json(prefix)
    assert val == expect
    assert complete == (prefix == '{"a": 1}')


# ---------------------------------------------------------------------------
# tool-call grammar
# ---------------------------------------------------------------------------


def test_tool_call_grammar_constrains():
    tools = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object", "properties": {"city": {"type": "string"}}, "required": ["city"]},
        }}
    ]
    gb = tool_call_grammar(tools, fmt="hermes")
    g = Grammar.from_string(gb)
    good = '<tool_call>{"name": "get_weather", "arguments": {"city": "Paris"}}</tool_call>'
    assert g.accept_bytes(good.encode()) and g.can_stop()
    g.reset()
    bad = '<tool_call>{"name": "other_fn", "arguments": {}}</tool_call>'
    assert not (g.accept_bytes(bad.encode()) and g.can_stop())
