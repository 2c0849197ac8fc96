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

from llama_cpp_gfx906_tpu.common.args import build_parser

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.ngram_cache import NgramCache, generate_with_lookup

ap = build_parser("lookup")
ap.set_defaults(prompt="The quick brown fox", n_predict=64)
ap.add_argument("--cache", default=None, help="load/save ngram cache file")
args = ap.parse_args()
# reference -lcs/-lcd: static cache seeds the ngrams, dynamic cache
# persists what generation adds
args.cache = args.cache or args.lookup_cache_dynamic

eng = Engine.from_gguf(args.model)
cache = NgramCache.load(args.cache) if args.cache else NgramCache()
if args.lookup_cache_static:  # merge a static seed cache (lookup.cpp -lcs)
    cache.merge(NgramCache.load(args.lookup_cache_static))
text, ids, stats = generate_with_lookup(eng, args.prompt, n_predict=args.n_predict, cache=cache)
print(args.prompt + text)
print(f"\n{stats}")
if args.cache:
    cache.save(args.cache)
