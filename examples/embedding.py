"""Pooled sequence embeddings (reference: examples/embedding)."""
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
ap.add_argument("-p", "--prompt", action="append", default=None)
args = ap.parse_args()
prompts = args.prompt or ["Hello world", "Goodbye world"]

eng = Engine.from_gguf(args.model)
vecs = [eng.embed(p) for p in prompts]
for p, v in zip(prompts, vecs):
    print(f"{p!r}: dim={len(v)} norm={np.linalg.norm(v):.3f} head={np.round(v[:4], 3)}")
if len(vecs) >= 2:
    print("cos(0,1) =", float(np.dot(vecs[0], vecs[1])))
