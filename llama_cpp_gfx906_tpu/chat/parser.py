"""Chat output parsing: reasoning extraction, tool-call formats, partial JSON.

Reference surface: common/chat-parser.cpp (per-family tool-call syntaxes),
common/json-partial.cpp (healing incomplete JSON during streaming),
common/chat.cpp COMMON_CHAT_FORMAT_* dispatch.  Behaviors re-derived from
the wire formats, not the code.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded argument object (OpenAI wire format)
    id: str | None = None


@dataclass
class ParsedMessage:
    content: str = ""
    reasoning_content: str = ""
    tool_calls: list[ToolCall] = field(default_factory=list)


# ---------------------------------------------------------------------------
# partial JSON healing (streaming) — json-partial.cpp analog
# ---------------------------------------------------------------------------


def heal_partial_json(src: str) -> tuple[object, bool]:
    """Parse a possibly-truncated JSON document.

    Returns (value, complete).  Incomplete documents are healed by closing
    open strings/objects/arrays and trimming a dangling key/comma; raises
    ValueError if the prefix is not valid JSON at all."""
    src = src.strip()
    if not src:
        return None, False
    try:
        return json.loads(src), True
    except json.JSONDecodeError:
        pass
    # scan: track string state + bracket stack
    stack: list[str] = []
    in_str = False
    esc = False
    last_significant = -1
    for i, c in enumerate(src):
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c in "{[":
            stack.append("}" if c == "{" else "]")
        elif c in "}]":
            if stack:
                stack.pop()
        if not c.isspace():
            last_significant = i
    healed = src
    if in_str:
        if esc:
            healed = healed[:-1]  # drop dangling backslash
        healed += '"'
    # trim a dangling comma / colon / partial literal so closure parses
    for _ in range(3):
        t = healed.rstrip()
        if t.endswith((",", ":")):
            healed = t[:-1]
        elif re.search(r'[{\[,:]\s*[a-zA-Z+\-.0-9]*$', t) and not re.search(r'[\d"\]}el]\s*$', t):
            # dangling bare token like `tru` / `nul` / `-` — cut it
            healed = re.sub(r"[a-zA-Z+\-.]+$", "", t)
        else:
            break
    # if we cut back to a dangling key (`{"a"`), close as null value
    t = healed.rstrip()
    if t.endswith('"') and stack and stack[-1] == "}":
        # key or value? heuristic: look back for unmatched ':' at this depth
        j = len(t) - 1
        # find string start
        j -= 1
        while j >= 0 and not (t[j] == '"' and (j == 0 or t[j - 1] != "\\")):
            j -= 1
        before = t[:j].rstrip()
        if before.endswith((",", "{")):
            healed = t + ": null"
    healed += "".join(reversed(stack))
    try:
        return json.loads(healed), False
    except json.JSONDecodeError:
        # one more pass: drop trailing comma before the closers
        healed2 = re.sub(r",\s*([\]}])", r"\1", healed)
        try:
            return json.loads(healed2), False
        except json.JSONDecodeError as e:
            raise ValueError(f"unhealable JSON prefix: {src[:80]!r}") from e


# ---------------------------------------------------------------------------
# reasoning extraction
# ---------------------------------------------------------------------------

_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)
_THINK_OPEN_RE = re.compile(r"<think>(.*)\Z", re.DOTALL)


def extract_reasoning(text: str) -> tuple[str, str]:
    """Split <think>…</think> blocks out of the content (deepseek-r1 /
    qwen3 style).  Returns (content, reasoning)."""
    chunks = _THINK_RE.findall(text)
    content = _THINK_RE.sub("", text)
    m = _THINK_OPEN_RE.search(content)
    if m:  # unterminated block (mid-stream): everything after is reasoning
        chunks.append(m.group(1))
        content = content[: m.start()]
    return content.strip(), "\n".join(c.strip() for c in chunks)


# ---------------------------------------------------------------------------
# tool-call formats
# ---------------------------------------------------------------------------


def _mk_call(name, args, idx) -> ToolCall:
    if not isinstance(args, str):
        args = json.dumps(args, ensure_ascii=False)
    return ToolCall(name=name, arguments=args, id=f"call_{idx}")


def parse_hermes(text: str) -> ParsedMessage | None:
    """Hermes/Qwen: <tool_call>{"name": ..., "arguments": {...}}</tool_call>"""
    calls = []
    pat = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
    rest = pat.sub("", text)
    for i, m in enumerate(pat.finditer(text)):
        try:
            obj = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        calls.append(_mk_call(obj.get("name", ""), obj.get("arguments", {}), i))
    if not calls:
        return None
    return ParsedMessage(content=rest.strip(), tool_calls=calls)


def parse_llama3(text: str) -> ParsedMessage | None:
    """Llama-3.x JSON function call: {"name": ..., "parameters": {...}}
    (optionally preceded by <|python_tag|>)."""
    t = text.strip()
    if t.startswith("<|python_tag|>"):
        t = t[len("<|python_tag|>") :]
    if not t.startswith("{"):
        return None
    try:
        obj = json.loads(t)
    except json.JSONDecodeError:
        return None
    if isinstance(obj, dict) and "name" in obj and ("parameters" in obj or "arguments" in obj):
        args = obj.get("parameters", obj.get("arguments", {}))
        return ParsedMessage(tool_calls=[_mk_call(obj["name"], args, 0)])
    return None


def parse_mistral(text: str) -> ParsedMessage | None:
    """Mistral: [TOOL_CALLS][{"name": ..., "arguments": {...}}, ...]"""
    marker = "[TOOL_CALLS]"
    idx = text.find(marker)
    if idx < 0:
        return None
    payload = text[idx + len(marker) :].strip()
    try:
        arr = json.loads(payload)
    except json.JSONDecodeError:
        return None
    if not isinstance(arr, list):
        return None
    calls = [
        _mk_call(o.get("name", ""), o.get("arguments", {}), i)
        for i, o in enumerate(arr)
        if isinstance(o, dict)
    ]
    return ParsedMessage(content=text[:idx].strip(), tool_calls=calls) if calls else None


def parse_generic(text: str) -> ParsedMessage | None:
    """Generic JSON tool call: {"tool_call": {...}} / {"tool_calls": [...]}
    possibly inside a ```json fence (the reference's GENERIC format)."""
    t = text.strip()
    fence = re.match(r"```(?:json)?\s*(.*?)```", t, re.DOTALL)
    if fence:
        t = fence.group(1).strip()
    if not t.startswith("{"):
        return None
    try:
        obj = json.loads(t)
    except json.JSONDecodeError:
        return None
    if not isinstance(obj, dict):
        return None
    if "tool_calls" in obj and isinstance(obj["tool_calls"], list):
        calls = [
            _mk_call(o.get("name", ""), o.get("arguments", o.get("parameters", {})), i)
            for i, o in enumerate(obj["tool_calls"])
            if isinstance(o, dict)
        ]
        if calls:
            return ParsedMessage(content=str(obj.get("response", "")), tool_calls=calls)
    if "tool_call" in obj and isinstance(obj["tool_call"], dict):
        o = obj["tool_call"]
        return ParsedMessage(
            content=str(obj.get("response", "")),
            tool_calls=[_mk_call(o.get("name", ""), o.get("arguments", o.get("parameters", {})), 0)],
        )
    return None


_FORMAT_PARSERS = {
    "hermes": parse_hermes,
    "llama3": parse_llama3,
    "mistral": parse_mistral,
    "generic": parse_generic,
}


def parse_chat_output(text: str, fmt: str = "auto", extract_think: bool = True) -> ParsedMessage:
    """Parse a completed assistant turn into content/reasoning/tool_calls.

    fmt: one of auto|hermes|llama3|mistral|generic|none."""
    reasoning = ""
    if extract_think:
        text, reasoning = extract_reasoning(text)
    msg: ParsedMessage | None = None
    if fmt == "none":
        msg = None
    elif fmt == "auto":
        for p in (parse_hermes, parse_mistral, parse_llama3, parse_generic):
            msg = p(text)
            if msg is not None:
                break
    else:
        msg = _FORMAT_PARSERS[fmt](text)
    if msg is None:
        msg = ParsedMessage(content=text.strip())
    msg.reasoning_content = reasoning
    return msg
