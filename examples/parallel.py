"""Multi-client server simulation (reference: examples/parallel): random
requests arrive while the continuous-batching engine drains them."""
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
import random

from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
from llama_cpp_gfx906_tpu.runtime.engine import Engine

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-ns", "--n-sequences", type=int, default=8, help="total requests")
ap.add_argument("-np", "--n-parallel", type=int, default=4, help="slots")
ap.add_argument("-n", "--n-predict", type=int, default=16)
args = ap.parse_args()

base = Engine.from_gguf(args.model)
eng = BatchedEngine(base.cfg, base.params, base.tokenizer, n_slots=args.n_parallel)
prompts = [f"Request {i}:" for i in range(args.n_sequences)]
pending = list(enumerate(prompts))
random.shuffle(pending)
done = 0
while done < args.n_sequences:
    while pending and eng.free_slot() is not None:
        rid, p = pending.pop()
        ids = base.tokenizer.tokenize(p, add_special=True, parse_special=True)
        eng.add_request(ids, args.n_predict, SamplerConfig(temp=0.0), request_id=str(rid))
    for slot, tok, finished in eng.step():
        if finished:
            print(f"[{slot.request_id}] {base.tokenizer.detokenize(slot.generated)!r}")
            eng.release(slot)
            done += 1
print(eng.metrics)
