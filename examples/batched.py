"""N parallel continuations of one prompt (reference: examples/batched).

    python examples/batched.py -m model.gguf -p "The" -np 4 -n 24
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

from llama_cpp_gfx906_tpu.models.config import config_from_gguf  # noqa: F401 (docs)
from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
from llama_cpp_gfx906_tpu.runtime.engine import Engine

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-p", "--prompt", default="The quick brown fox")
ap.add_argument("-np", "--n-parallel", type=int, default=4)
ap.add_argument("-n", "--n-predict", type=int, default=24)
args = ap.parse_args()

base = Engine.from_gguf(args.model)
eng = BatchedEngine(base.cfg, base.params, base.tokenizer, n_slots=args.n_parallel)
ids = base.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
for i in range(args.n_parallel):
    eng.add_request(ids, args.n_predict, SamplerConfig(temp=0.8, seed=i), request_id=str(i))
while eng.busy:  # prompts prefill in chunks inside step()
    for slot, tok, finished in eng.step():
        if finished:
            print(f"[seq {slot.request_id}] {base.tokenizer.detokenize(slot.generated)}")
            eng.release(slot)
