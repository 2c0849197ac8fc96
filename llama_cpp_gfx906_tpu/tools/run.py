"""llama-run equivalent: interactive chat runner.

Reference: ``tools/run/run.cpp`` (3,412 LoC) — a linenoise REPL over the
model's chat template with streamed output, multiline input
(``\\``-continuation), model-protocol prefixes and in-chat commands.  The
download protocols (hf://, ollama://, https://) are recognized and
rejected with a clear message: this environment is zero-egress, and model
distribution is a local-filesystem concern on the TPU pods this engine
targets.  Everything else is feature-matched:

- streamed token output (incremental detokenization, UTF-8 safe)
- multiline input: a trailing backslash continues the line (run.cpp's
  linenoise multiline mode)
- chat-template conversation state with /bye, /clear, /save, /load,
  /regen, /help commands
- ``-v`` perf report per turn (prefill/decode tok/s from PerfCounters)
"""

from __future__ import annotations

import argparse
import json
import sys


def _resolve_model(spec: str) -> str:
    """run.cpp model-protocol handling, minus downloads (zero egress)."""
    if spec.startswith("file://"):
        return spec[len("file://"):]
    for proto in ("hf://", "huggingface://", "hf.co/", "ollama://", "https://", "http://"):
        if spec.startswith(proto):
            raise SystemExit(
                f"model protocol {proto!r} needs network access, which this "
                "deployment does not have; pass a local GGUF path (the "
                "reference's run tool downloads here — fetch the file "
                "out-of-band instead)")
    return spec


class _Stream:
    """Incremental detokenizer: prints only the new, fully-decodable
    suffix each token (avoids splitting multi-byte UTF-8 pieces)."""

    def __init__(self, tokenizer):
        self.tok = tokenizer
        self.ids: list[int] = []
        self.printed = 0

    def __call__(self, tok_id: int):
        self.ids.append(tok_id)
        text = self.tok.detokenize(self.ids)
        # hold back trailing replacement chars from partial UTF-8
        safe = len(text) - (1 if text.endswith("�") else 0)
        if safe > self.printed:
            sys.stdout.write(text[self.printed:safe])
            sys.stdout.flush()
            self.printed = safe

    def finish(self) -> str:
        text = self.tok.detokenize(self.ids)
        if len(text) > self.printed:
            sys.stdout.write(text[self.printed:])
            sys.stdout.flush()
        return text


def _read_multiline(prompt: str) -> str | None:
    """Backslash-continuation input (run.cpp linenoise multiline)."""
    try:
        line = input(prompt)
    except (EOFError, KeyboardInterrupt):
        return None
    parts = []
    while line.endswith("\\"):
        parts.append(line[:-1])
        try:
            line = input("... ")
        except (EOFError, KeyboardInterrupt):
            break
    parts.append(line)
    return "\n".join(parts)


HELP = """commands:
  /bye, /exit, /quit   leave
  /clear               reset the conversation
  /save FILE           save conversation JSON
  /load FILE           load conversation JSON
  /regen               regenerate the last assistant reply
  /help                this message
a trailing backslash continues the line"""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="llama-run (TPU)",
        description="chat runner over the model's chat template")
    ap.add_argument("model", help="GGUF path (file:// ok; hf://.... rejected: zero egress)")
    ap.add_argument("prompt", nargs="?", default=None,
                    help="one-shot prompt (omit for REPL; '-' reads stdin)")
    ap.add_argument("-n", "--ngl", type=int, default=999,
                    help="accepted for CLI parity (all layers live on the TPU)")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--seed", type=int, default=0xFFFFFFFF)
    ap.add_argument("-c", "--context-size", type=int, default=2048)
    ap.add_argument("--n-predict", type=int, default=512)
    ap.add_argument("--chat-template-file", default=None,
                    help="override the GGUF chat template (Jinja file)")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="print per-turn perf (prefill/decode tok/s)")
    args = ap.parse_args(argv)

    from ..chat import parse_chat_output, render_chat_template
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    eng = Engine.from_gguf(_resolve_model(args.model), max_seq=args.context_size)
    sampler = SamplerParams(temp=args.temp, top_k=args.top_k, top_p=args.top_p,
                            seed=args.seed, greedy=args.temp <= 0)
    tmpl = eng.tokenizer.vocab.chat_template
    if args.chat_template_file:
        tmpl = open(args.chat_template_file).read()
    messages: list[dict] = []

    def turn(user_text: str | None, stream: bool) -> str:
        if user_text is not None:
            messages.append({"role": "user", "content": user_text})
        prompt = render_chat_template(tmpl, messages, add_generation_prompt=True)
        n_prompt = len(eng.tokenizer.tokenize(prompt, add_special=True,
                                              parse_special=True))
        n_predict = min(args.n_predict, max(args.context_size - n_prompt - 1, 1))
        cb = _Stream(eng.tokenizer) if stream else None
        text, _ = eng.generate(prompt, n_predict=n_predict, sampler=sampler,
                               stream_cb=cb)
        if cb is not None:
            cb.finish()
            sys.stdout.write("\n")
        parsed = parse_chat_output(text, fmt="none")
        messages.append({"role": "assistant", "content": parsed.content})
        if args.verbose:
            s = eng.perf.summary()
            sys.stderr.write(
                f"[perf] prompt {n_prompt} tok, prefill {s['prefill_tok_s']} "
                f"tok/s, decode {s['decode_tok_s']} tok/s\n")
        return parsed.content

    if args.prompt is not None:
        text = sys.stdin.read() if args.prompt == "-" else args.prompt
        turn(text, stream=True)
        return 0

    print("llama-run (TPU) — /help for commands, /bye to exit")
    while True:
        line = _read_multiline("> ")
        if line is None:
            break
        cmd = line.strip()
        if cmd in ("/bye", "/exit", "/quit"):
            break
        if not cmd:
            continue
        if cmd == "/help":
            print(HELP)
            continue
        if cmd == "/clear":
            messages.clear()
            print("(conversation cleared)")
            continue
        if cmd.startswith("/save "):
            json.dump(messages, open(cmd[6:].strip(), "w"), indent=1)
            print("(saved)")
            continue
        if cmd.startswith("/load "):
            messages[:] = json.load(open(cmd[6:].strip()))
            print(f"(loaded {len(messages)} messages)")
            continue
        if cmd == "/regen":
            while messages and messages[-1]["role"] == "assistant":
                messages.pop()
            if not messages:
                print("(nothing to regenerate)")
                continue
            turn(None, stream=True)
            continue
        turn(line, stream=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
