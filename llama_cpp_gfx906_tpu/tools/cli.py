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
    ap.add_argument("--grammar", default=None, help="GBNF grammar string")
    ap.add_argument("--grammar-file", default=None, help="GBNF grammar file")
    ap.add_argument("--json-schema", default=None, help="JSON schema to constrain output")
    ap.add_argument(
        "--prompt-cache", default=None,
        help="session file: reuse cached prefix state and save on exit "
        "(llama-cli --prompt-cache analog)",
    )
    ap.add_argument("--lora", action="append", default=[], help="LoRA adapter GGUF")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--control-vector", action="append", default=[])
    ap.add_argument("--control-vector-scale", type=float, default=1.0)
    ap.add_argument("--cache-type-k", default=None, choices=("f32", "bf16", "q8"),
                    help="KV cache storage type (q8 halves KV memory)")
    ap.add_argument("--no-display-prompt", action="store_true")
    ap.add_argument("--perf", action="store_true", help="print perf counters as JSON")
    ap.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force a JAX platform (default: let JAX pick the TPU)",
    )
    return ap


def _generate_with_cache(eng, prompt: str, args, chain, stream):
    """Session-file generation: reuse the cached KV prefix when the new
    prompt extends the cached token history (tools/main session load,
    main.cpp:236-254 + prompt-prefix matching :336-348)."""
    import os as _os

    import numpy as np

    ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
    cached: list[int] = []
    if _os.path.exists(args.prompt_cache):
        try:
            cached = eng.load_state(args.prompt_cache)
        except ValueError:
            cached = []
    n_match = 0
    while n_match < len(cached) and n_match < len(ids) - 1 and cached[n_match] == ids[n_match]:
        n_match += 1
    if n_match < len(cached):  # diverged: rewind to the shared prefix
        eng.set_n_past(n_match) if n_match else eng.reset()
    tail = ids[n_match:]
    logits = eng.prefill(tail) if n_match == 0 else eng.decode_chunk(tail)[-1]
    all_ids = list(ids)
    eog = eng.tokenizer.vocab.special.eog_ids()
    for _ in range(args.n_predict):
        tok_id = chain.sample(logits, all_ids)
        chain.accept(tok_id, is_eog=tok_id in eog)
        if tok_id in eog:
            break
        all_ids.append(tok_id)
        stream(tok_id)
        logits = eng.decode_one(tok_id)
    eng.save_state(args.prompt_cache, all_ids)


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

    kv_dtype = None
    if args.cache_type_k == "q8":
        kv_dtype = "q8"
    elif args.cache_type_k == "f32":
        import jax.numpy as jnp

        kv_dtype = jnp.float32
    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size, kv_cache_dtype=kv_dtype)
    for lora_path in args.lora:
        eng.apply_lora_file(lora_path, args.lora_scale)
    for cv_path in args.control_vector:
        eng.apply_control_vector_file(cv_path, args.control_vector_scale)
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

    from ..sampling.samplers import SamplerChain

    chain = SamplerChain(sampler, eng.cfg.n_vocab)
    grammar_src = args.grammar
    if args.grammar_file:
        with open(args.grammar_file, encoding="utf-8") as f:
            grammar_src = f.read()
    if args.json_schema:
        from ..grammar import json_schema_to_gbnf

        grammar_src = json_schema_to_gbnf(json.loads(args.json_schema))
    if grammar_src:
        from ..grammar import Grammar, grammar_vocab_from_tokenizer

        chain.set_grammar(Grammar.from_string(grammar_src), grammar_vocab_from_tokenizer(tok))

    def stream(token_id: int):
        sys.stdout.write(tok.detokenize([token_id], special=True))
        sys.stdout.flush()

    t0 = time.perf_counter()
    if args.prompt_cache:
        _generate_with_cache(eng, prompt, args, chain, stream)
    else:
        eng.generate(prompt, n_predict=args.n_predict, sampler=chain, stream_cb=stream)
    sys.stdout.write("\n")
    if args.perf:
        perf = eng.perf.summary()
        perf["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(perf), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
