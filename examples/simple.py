"""Minimal decode loop (reference: examples/simple/simple.cpp).

    python examples/simple.py -m model.gguf -p "Hello" -n 32
"""
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
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-p", "--prompt", default="Hello my name is")
ap.add_argument("-n", "--n-predict", type=int, default=32)
args = ap.parse_args()

eng = Engine.from_gguf(args.model)
text, ids = eng.generate(args.prompt, n_predict=args.n_predict,
                         sampler=SamplerParams(greedy=True))
print(args.prompt + text)
print(f"\n{len(ids)} tokens; {eng.perf.summary()}")
