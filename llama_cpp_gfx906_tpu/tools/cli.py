"""llama-cli equivalent: prompt → streamed completion.

Mirrors the flag surface of the reference's ``tools/main`` for the core
options (``-m -p -n -c --temp --top-k --top-p --min-p --seed``; env mirrors
use the same ``LLAMA_ARG_*`` names as ``common/arg.cpp``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="llama-cli (TPU)", description="TPU-native GGUF text generation"
    )
    env = os.environ.get
    ap.add_argument("-m", "--model", default=env("LLAMA_ARG_MODEL"), required=env("LLAMA_ARG_MODEL") is None)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-f", "--file", default=None, help="read prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=int(env("LLAMA_ARG_N_PREDICT", 128)))
    ap.add_argument("-c", "--ctx-size", type=int, default=int(env("LLAMA_ARG_CTX_SIZE", 2048)))
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--typical", type=float, default=1.0)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--repeat-last-n", type=int, default=64)
    ap.add_argument("--mirostat", type=int, default=0)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--no-display-prompt", action="store_true")
    ap.add_argument("--perf", action="store_true", help="print perf counters as JSON")
    ap.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX platform (default: let JAX pick the TPU)",
    )
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # heavy imports after argparse so --help stays fast
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    prompt = args.prompt
    if args.file:
        with open(args.file, encoding="utf-8") as f:
            prompt = f.read()

    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    sampler = SamplerParams(
        temp=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        typical_p=args.typical,
        penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n,
        mirostat=args.mirostat,
        seed=args.seed if args.seed >= 0 else 0xFFFFFFFF,
        greedy=args.temp <= 0,
    )

    if not args.no_display_prompt:
        sys.stdout.write(prompt)
        sys.stdout.flush()

    tok = eng.tokenizer

    def stream(token_id: int):
        sys.stdout.write(tok.detokenize([token_id], special=True))
        sys.stdout.flush()

    t0 = time.perf_counter()
    eng.generate(prompt, n_predict=args.n_predict, sampler=sampler, stream_cb=stream)
    sys.stdout.write("\n")
    if args.perf:
        perf = eng.perf.summary()
        perf["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(perf), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
