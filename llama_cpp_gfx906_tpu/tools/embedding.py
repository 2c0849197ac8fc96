"""llama-embedding analog: prompts → embedding vectors.

Reference surface: ``tools/main``-style flags + the embedding example's
``--pooling / --embd-normalize / --embd-output-format / --embd-separator``
options (common/arg.cpp LLAMA_ARG_POOLING; embedding output formats
'', json, json+, array).  Normalization follows the reference numbering:
-1 = none, 0 = max-absolute, 1 = taxicab, 2 = euclidean, >2 = p-norm.
"""

from __future__ import annotations

import json
import sys


def _normalize(v, how: int):
    import numpy as np

    if how < 0:
        return v
    if how == 0:
        d = np.abs(v).max() or 1.0
    elif how == 1:
        d = np.abs(v).sum() or 1.0
    elif how == 2:
        d = np.linalg.norm(v) or 1.0
    else:
        d = (np.abs(v) ** how).sum() ** (1.0 / how) or 1.0
    return v / d


def main(argv=None) -> int:
    from ..common.args import build_parser, maybe_print_completion

    ap = build_parser("embedding", description="text → embedding vectors")
    ap.prog = "llama-embedding (TPU)"
    args = ap.parse_args(argv)
    if maybe_print_completion(args, "embedding", "llama-embedding"):
        return 0
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")

    import numpy as np

    from ..runtime.engine import Engine

    text = args.prompt or ""
    if args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    if args.escape:
        text = text.encode().decode("unicode_escape").encode("latin-1").decode("utf-8", "replace")
    prompts = [p for p in text.split(args.embd_separator) if p.strip()]
    if not prompts:
        ap.error("no prompts: pass -p or -f (split on --embd-separator)")

    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size)
    embds = []
    for p in prompts:
        v = np.asarray(eng.embed(p, pooling=args.pooling, normalize=False),
                       np.float32)
        if v.ndim > 1 and args.pooling == "none":
            embds.append(np.stack([_normalize(r, args.embd_normalize) for r in v]))
        else:
            embds.append(_normalize(v.reshape(-1), args.embd_normalize))

    fmt = args.embd_output_format
    if fmt == "json" or fmt == "json+":
        out = {
            "object": "list",
            "data": [
                {"object": "embedding", "index": i,
                 "embedding": np.asarray(e).reshape(-1).tolist()}
                for i, e in enumerate(embds)
            ],
            "model": args.model.rsplit("/", 1)[-1],
        }
        if fmt == "json+" and len(embds) > 1:
            # pairwise cosine similarity matrix (reference json+ extra)
            flat = [np.asarray(e).reshape(-1) for e in embds]
            sim = [[float(np.dot(a, b) /
                          ((np.linalg.norm(a) * np.linalg.norm(b)) or 1.0))
                    for b in flat] for a in flat]
            out["cosineSimilarity"] = sim
        print(json.dumps(out))
    elif fmt == "array":
        print(json.dumps([np.asarray(e).reshape(-1).tolist() for e in embds]))
    else:
        for i, e in enumerate(embds):
            vec = np.asarray(e).reshape(-1)
            head = " ".join(f"{x:.6f}" for x in vec[:16])
            sys.stdout.write(f"embedding {i}: {head}{' ...' if vec.size > 16 else ''}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
