"""llama-run equivalent: minimal interactive chat runner
(reference: tools/run — linenoise REPL over the chat template)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-run (TPU)")
    ap.add_argument("model", help="GGUF path")
    ap.add_argument("prompt", nargs="?", default=None, help="one-shot prompt (omit for REPL)")
    ap.add_argument("-n", "--ngl", type=int, default=999, help="accepted for CLI parity (all layers live on the TPU)")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("-c", "--context-size", type=int, default=2048)
    args = ap.parse_args(argv)

    from ..chat import parse_chat_output, render_chat_template
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    eng = Engine.from_gguf(args.model, max_seq=args.context_size)
    sampler = SamplerParams(temp=args.temp, greedy=args.temp <= 0)
    tmpl = eng.tokenizer.vocab.chat_template
    messages: list[dict] = []

    def turn(user_text: str) -> str:
        messages.append({"role": "user", "content": user_text})
        prompt = render_chat_template(tmpl, messages, add_generation_prompt=True)
        text, _ = eng.generate(prompt, n_predict=512, sampler=sampler)
        parsed = parse_chat_output(text, fmt="none")
        messages.append({"role": "assistant", "content": parsed.content})
        return parsed.content

    if args.prompt is not None:
        print(turn(args.prompt))
        return 0

    print("llama-run (TPU) — /bye to exit")
    while True:
        try:
            line = input("> ")
        except (EOFError, KeyboardInterrupt):
            break
        if line.strip() in ("/bye", "/exit", "/quit"):
            break
        if not line.strip():
            continue
        print(turn(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
