"""Chat formatting & parsing (reference: common/chat.{h,cpp},
src/llama-chat.{h,cpp}, common/chat-parser.cpp).

- render_chat_template: Jinja rendering of the model's own template
  (minja analog) with tools / generation-prompt support.
- builtin dialects: hardcoded fallbacks selected by fingerprint.
- parse_chat_output: reasoning + tool-call extraction per family.
"""

from __future__ import annotations

from .parser import (
    ParsedMessage,
    ToolCall,
    extract_reasoning,
    heal_partial_json,
    parse_chat_output,
)
from .templates import BUILTIN_DIALECTS, apply_builtin_template, detect_template

CHATML_FALLBACK = (
    "{% for message in messages %}"
    "<|im_start|>{{ message.role }}\n{{ message.content }}<|im_end|>\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def render_chat_template(
    template: str | None,
    messages: list[dict],
    add_generation_prompt: bool = True,
    bos_token: str = "",
    eos_token: str = "",
    tools: list[dict] | None = None,
    **extra,
) -> str:
    """Render a conversation.  Uses the model's Jinja template when given;
    falls back to the detected builtin dialect on template errors.  A bare
    builtin dialect name (``--chat-template gemma`` etc., the reference's
    common_chat_templates_init name lookup) renders that dialect directly."""
    if template in BUILTIN_DIALECTS:
        return apply_builtin_template(template, messages, add_generation_prompt)
    import jinja2

    env = jinja2.Environment(
        loader=jinja2.BaseLoader(),
        trim_blocks=True,
        lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"],
    )
    import json as _json

    env.filters["tojson"] = lambda value, **kw: _json.dumps(value, ensure_ascii=False)
    env.globals["raise_exception"] = _raise_exception
    env.globals["strftime_now"] = _strftime_now
    try:
        tpl = env.from_string(template or CHATML_FALLBACK)
        kwargs = dict(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=bos_token,
            eos_token=eos_token,
            **extra,
        )
        if tools is not None:
            kwargs["tools"] = tools
        return tpl.render(**kwargs)
    except Exception:
        dialect = detect_template(template)
        if dialect not in BUILTIN_DIALECTS:
            dialect = "chatml"
        return apply_builtin_template(dialect, messages, add_generation_prompt)


def _raise_exception(msg):
    raise ValueError(msg)


def _strftime_now(fmt):
    import datetime

    return datetime.datetime.now().strftime(fmt)


def tool_call_grammar(tools: list[dict], fmt: str = "hermes") -> str:
    """Build a GBNF grammar that constrains output to valid tool calls for
    the given OpenAI-style tool list (reference: common/chat.cpp builds
    per-format grammars from tool schemas)."""
    from ..grammar.json_schema import json_schema_to_gbnf

    schemas = []
    for t in tools:
        fn = t.get("function", t)
        schemas.append(
            {
                "type": "object",
                "properties": {
                    "name": {"const": fn.get("name", "")},
                    "arguments": fn.get("parameters", {"type": "object"}),
                },
                "required": ["name", "arguments"],
            }
        )
    call_schema = {"oneOf": schemas} if len(schemas) > 1 else schemas[0]
    body = json_schema_to_gbnf(call_schema)
    if fmt == "hermes":
        # wrap: root ::= "<tool_call>" call "</tool_call>"
        wrapped = body.replace("root ::=", "call ::=", 1)
        return f'root ::= "<tool_call>" space call "</tool_call>"\n{wrapped}'
    return body


__all__ = [
    "render_chat_template",
    "apply_builtin_template",
    "detect_template",
    "BUILTIN_DIALECTS",
    "parse_chat_output",
    "extract_reasoning",
    "heal_partial_json",
    "ParsedMessage",
    "ToolCall",
    "tool_call_grammar",
    "CHATML_FALLBACK",
]
