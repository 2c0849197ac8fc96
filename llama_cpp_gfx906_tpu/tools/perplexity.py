"""Perplexity / KL-divergence evaluation (reference: ``tools/perplexity``).

Chunked wikitext-style PPL with half-window context re-eval
(``perplexity.cpp:441``): each n_ctx chunk contributes NLL only for its
second half, the first half serving as context.  ``--save-logits`` /
``--kl-divergence`` mirror the reference's logit-dump + KL mode
(``perplexity.cpp:1692``) for comparing quantizations against a base run.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def evaluate(
    model_path: str,
    text: str,
    n_ctx: int = 512,
    n_chunks: int | None = None,
    keep_quantized: bool = True,
    save_logits_path: str | None = None,
    kl_base_path: str | None = None,
    dtype=None,
    token_ids: list[int] | None = None,  # --binary-file pre-tokenized input
    from_chunk: int = 0,                 # --from-chunk
    stride: int = 0,                     # --ppl-stride (overlapping windows)
    output_type: int = 0,                # --ppl-output-type
) -> dict:
    import jax.numpy as jnp

    from ..gguf.reader import GGUFModelReader
    from ..models.config import config_from_gguf
    from ..models.llama import KVCache, forward
    from ..runtime.weights import load_llama_params, load_llama_params_quantized
    from ..tokenizers import tokenizer_from_gguf
    import jax

    dtype = dtype or jnp.bfloat16
    reader = GGUFModelReader(model_path)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader.readers[0])
    loader = load_llama_params_quantized if keep_quantized else load_llama_params
    params = loader(reader, cfg, dtype)

    ids = (list(token_ids) if token_ids is not None
           else tok.tokenize(text, add_special=False, parse_special=False))
    bos = tok.vocab.special.bos
    # --ppl-stride: overlapping windows every `stride` tokens, scoring only
    # the final stride targets of each (perplexity.cpp ppl_stride mode);
    # --from-chunk skips evaluation windows before that index
    if stride and 0 < stride < n_ctx:
        starts = list(range(0, len(ids) - n_ctx + 1, stride))
    else:
        stride = 0
        starts = list(range(0, (len(ids) // n_ctx) * n_ctx, n_ctx))
    starts = starts[from_chunk:]
    if n_chunks:
        starts = starts[:n_chunks]
    total_chunks = len(starts)
    if total_chunks == 0:
        raise ValueError(f"text too short: {len(ids)} tokens < n_ctx {n_ctx}")

    fwd = jax.jit(forward, static_argnames=("cfg",))
    first_eval = (n_ctx - stride) if stride else max(1, n_ctx // 2)

    nll = 0.0
    count = 0
    t0 = time.time()
    all_logprobs = [] if save_logits_path or kl_base_path else None
    for c, start in enumerate(starts):
        chunk = ids[start : start + n_ctx]
        if bos is not None:
            chunk = [bos] + chunk[:-1]
        toks = jnp.asarray([chunk], jnp.int32)
        kv = KVCache.create(cfg, 1, n_ctx, dtype)
        logits, _ = fwd(params, cfg, toks, kv)
        logits = np.asarray(logits[0], np.float32)  # (T, V)
        logp = logits - _logsumexp(logits)
        targets = np.asarray(chunk[1:] + [0])
        token_logp = logp[np.arange(len(chunk)), targets]  # next-token logprob
        sel = token_logp[first_eval - 1 : n_ctx - 1]
        nll -= float(sel.sum())
        count += sel.size
        if all_logprobs is not None:
            all_logprobs.append(logp[first_eval - 1 : n_ctx - 1].astype(np.float16))
        ppl_so_far = float(np.exp(nll / count))
        if output_type == 1:  # cumulative (token_count, ppl) pairs
            print(f"{count} {ppl_so_far:.4f}", flush=True)
        else:
            print(f"chunk {c + 1}/{total_chunks}: ppl = {ppl_so_far:.4f}",
                  flush=True)

    result = {
        "ppl": float(np.exp(nll / count)),
        "n_tokens": count,
        "n_chunks": total_chunks,
        "t_eval_s": round(time.time() - t0, 2),
    }

    if save_logits_path:
        np.savez_compressed(save_logits_path, logprobs=np.concatenate(all_logprobs))
    if kl_base_path:
        base = np.load(kl_base_path)["logprobs"].astype(np.float32)
        ours = np.concatenate(all_logprobs).astype(np.float32)
        n = min(len(base), len(ours))
        p = np.exp(base[:n])
        kl = (p * (base[:n] - ours[:n])).sum(axis=-1)
        result["kl_divergence_mean"] = float(kl.mean())
        result["kl_divergence_p99"] = float(np.percentile(kl, 99))
    return result


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def main(argv=None) -> int:
    from ..common.args import build_parser

    ap = build_parser("perplexity", description="wikitext-style perplexity + evals")
    ap.prog = "llama-perplexity (TPU)"
    ap.set_defaults(ctx_size=512)
    # (--chunks/--hellaswag/--winogrande/--multiple-choice/
    #  --kl-divergence-base come from the shared registry)
    ap.add_argument("--no-quantized", action="store_true", help="dequantize weights to bf16")
    ap.add_argument("--save-logits", default=None)
    ap.add_argument("--limit", type=int, default=None, help="max eval tasks")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")

    if args.hellaswag or args.winogrande or args.multiple_choice:
        from ..runtime.engine import Engine
        from . import evals

        eng = Engine.from_gguf(args.model, max_seq=args.ctx_size,
                               keep_quantized=not args.no_quantized)
        # reference task-count flags (--hellaswag-tasks etc.) bound each
        # eval; --limit keeps working as a shared override
        if args.hellaswag:
            lim = args.limit or args.hellaswag_tasks or None
            print(json.dumps(evals.hellaswag(eng, args.hellaswag, lim)))
        if args.winogrande:
            lim = args.limit or args.winogrande_tasks or None
            print(json.dumps(evals.winogrande(eng, args.winogrande, lim)))
        if args.multiple_choice:
            lim = args.limit or args.multiple_choice_tasks or None
            print(json.dumps(evals.multiple_choice(eng, args.multiple_choice,
                                                   lim)))
        return 0

    if args.kl_divergence and not args.kl_divergence_base:
        ap.error("--kl-divergence needs --kl-divergence-base LOGITS_FILE")
    if not args.file:
        ap.error("-f/--file is required for perplexity mode")
    token_ids = None
    text = ""
    if args.binary_file:  # raw little-endian int32 token ids
        import numpy as _np

        token_ids = _np.fromfile(args.file, dtype="<i4").tolist()
    else:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
        if args.no_escape is False and getattr(args, "escape", False):
            text = (text.encode().decode("unicode_escape")
                    .encode("latin-1").decode("utf-8", "replace"))
    result = evaluate(
        args.model,
        text,
        n_ctx=args.ctx_size,
        n_chunks=args.chunks,
        keep_quantized=not args.no_quantized,
        save_logits_path=args.save_logits or args.save_all_logits,
        kl_base_path=args.kl_divergence_base,
        token_ids=token_ids,
        from_chunk=args.from_chunk,
        stride=args.ppl_stride,
        output_type=args.ppl_output_type,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
