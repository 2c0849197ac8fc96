"""Draft-model speculative decoding (reference: examples/speculative-simple)."""
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
from llama_cpp_gfx906_tpu.runtime.speculative import SpeculativeConfig, SpeculativeEngine

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True, help="target model")
ap.add_argument("-md", "--model-draft", required=True)
ap.add_argument("-p", "--prompt", default="The quick brown fox")
ap.add_argument("-n", "--n-predict", type=int, default=64)
ap.add_argument("--draft", type=int, default=8, help="tokens per draft")
args = ap.parse_args()

tgt = Engine.from_gguf(args.model)
dft = Engine.from_gguf(args.model_draft)
spec = SpeculativeEngine(tgt, dft, SpeculativeConfig(n_draft=args.draft))
text, ids, stats = spec.generate(args.prompt, n_predict=args.n_predict)
print(args.prompt + text)
print(f"\naccept rate: {stats.acceptance_rate():.2%}")
