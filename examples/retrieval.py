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

import argparse

import numpy as np

from llama_cpp_gfx906_tpu.runtime.engine import Engine

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-f", "--file", required=True, help="text corpus")
ap.add_argument("-q", "--query", required=True)
ap.add_argument("--chunk-size", type=int, default=200)
ap.add_argument("--top-k", type=int, default=3)
args = ap.parse_args()

eng = Engine.from_gguf(args.model)
text = open(args.file, encoding="utf-8").read()
chunks = [text[i:i + args.chunk_size] for i in range(0, len(text), args.chunk_size)]
emb = np.stack([eng.embed(c) for c in chunks])
q = eng.embed(args.query)
scores = emb @ q
for i in np.argsort(-scores)[: args.top_k]:
    print(f"[{scores[i]:.3f}] {chunks[i][:120]!r}")
