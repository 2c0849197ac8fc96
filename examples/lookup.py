"""N-gram lookup decoding — no draft model (reference: examples/lookup)."""
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

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.ngram_cache import NgramCache, generate_with_lookup

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-p", "--prompt", default="The quick brown fox")
ap.add_argument("-n", "--n-predict", type=int, default=64)
ap.add_argument("--cache", default=None, help="load/save ngram cache file")
args = ap.parse_args()

eng = Engine.from_gguf(args.model)
cache = NgramCache.load(args.cache) if args.cache else NgramCache()
text, ids, stats = generate_with_lookup(eng, args.prompt, n_predict=args.n_predict, cache=cache)
print(args.prompt + text)
print(f"\n{stats}")
if args.cache:
    cache.save(args.cache)
