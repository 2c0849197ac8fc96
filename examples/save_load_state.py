"""State round-trip (reference: examples/save-load-state): generate, save,
restore into a fresh engine, verify the continuation matches."""
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
ap.add_argument("-p", "--prompt", default="The quick brown fox")
args = ap.parse_args()

eng = Engine.from_gguf(args.model)
ids = eng.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
logits = eng.prefill(ids)
history = list(ids)
for _ in range(8):
    history.append(int(np.argmax(logits)))
    logits = eng.decode_one(history[-1])
eng.save_state("/tmp/state.bin", history)

eng2 = Engine.from_gguf(args.model)
hist2 = eng2.load_state("/tmp/state.bin")
assert hist2 == history
a = [int(np.argmax(eng.decode_one(history[-1])))]
b = [int(np.argmax(eng2.decode_one(history[-1])))]
print("continuations match:", a == b)
