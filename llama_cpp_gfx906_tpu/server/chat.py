"""Chat template rendering (reference: vendored minja + llama_chat_apply_template).

GGUF files carry a Jinja template under ``tokenizer.chat_template``; the
reference renders it with minja (``common/chat.cpp``) and keeps 45
hardcoded fallbacks (``src/llama-chat.cpp``).  Here jinja2 renders the
model's own template, with a ChatML fallback when absent.
"""

from __future__ import annotations

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
    **extra,
) -> str:
    import jinja2

    env = jinja2.Environment(
        loader=jinja2.BaseLoader(),
        trim_blocks=True,
        lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"],
    )
    env.filters["tojson"] = lambda value, **kw: __import__("json").dumps(value)
    env.globals["raise_exception"] = _raise_exception
    env.globals["strftime_now"] = _strftime_now
    tpl = env.from_string(template or CHATML_FALLBACK)
    return tpl.render(
        messages=messages,
        add_generation_prompt=add_generation_prompt,
        bos_token=bos_token,
        eos_token=eos_token,
        **extra,
    )


def _raise_exception(msg):
    raise ValueError(msg)


def _strftime_now(fmt):
    import datetime

    return datetime.datetime.now().strftime(fmt)
