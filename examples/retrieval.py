"""Embedding retrieval over text chunks (reference: examples/retrieval)."""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# honor forced-CPU runs (the axon plugin overrides JAX_PLATFORMS at
# discovery; only jax.config wins — same workaround as tests/conftest.py)
import os as _os2
if _os2.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from llama_cpp_gfx906_tpu.common.args import build_parser

import numpy as np

from llama_cpp_gfx906_tpu.runtime.engine import Engine

ap = build_parser("retrieval")  # --context-file / --chunk-separator /
ap.set_defaults(chunk_size=200)   # --chunk-size from the shared registry
ap.add_argument("-q", "--query", required=True)
ap.add_argument("--top-k", type=int, default=3)
args = ap.parse_args()
# --context-file entries join -f as corpus sources (retrieval.cpp)
corpus_files = [f for f in [args.file] + list(args.context_file or []) if f]
if not corpus_files:
    ap.error("need -f or --context-file")

eng = Engine.from_gguf(args.model)
text = "\n".join(open(f, encoding="utf-8").read() for f in corpus_files)
if args.chunk_separator and args.chunk_separator != "\n":
    # --chunk-separator: split on the separator, regroup to ~chunk_size
    parts, chunks, cur = text.split(args.chunk_separator), [], ""
    for prt in parts:
        cur += prt + args.chunk_separator
        if len(cur) >= args.chunk_size:
            chunks.append(cur)
            cur = ""
    if cur:
        chunks.append(cur)
else:
    chunks = [text[i:i + args.chunk_size]
              for i in range(0, len(text), args.chunk_size)]
emb = np.stack([eng.embed(c) for c in chunks])
q = eng.embed(args.query)
scores = emb @ q
for i in np.argsort(-scores)[: args.top_k]:
    print(f"[{scores[i]:.3f}] {chunks[i][:120]!r}")
