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
    from ..common.args import build_parser as registry_parser

    ap = registry_parser("cli", description="TPU-native GGUF text generation")
    ap.prog = "llama-cli (TPU)"
    # tool-specific extras on top of the shared registry (common/arg.cpp
    # scoping analog)
    ap.add_argument("--typical", type=float, default=1.0)
    ap.add_argument("--mirostat", type=int, default=0)
    ap.add_argument("--json-schema", default=None, help="JSON schema to constrain output")
    ap.add_argument(
        "--prompt-cache", default=None,
        help="session file: reuse cached prefix state and save on exit "
        "(llama-cli --prompt-cache analog)",
    )
    ap.add_argument("--no-display-prompt", action="store_true")
    ap.add_argument("--perf", action="store_true", help="print perf counters as JSON")
    ap.set_defaults(prompt="")
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
    from ..common.args import maybe_print_completion

    if maybe_print_completion(args, "cli", "llama-cli"):
        return 0

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
    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size,
                           kv_cache_dtype=kv_dtype,
                           repack_int8=getattr(args, "repack_int8", False))
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
