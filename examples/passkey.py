"""Long-context passkey retrieval using context shift (reference:
examples/passkey — the reference uses grouped self-extend; this framework
demonstrates the StreamingLLM-style shift path)."""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("--junk", type=int, default=50, help="filler repetitions")
args = ap.parse_args()

eng = Engine.from_gguf(args.model, max_seq=4096)
passkey = "7342"
junk = "The grass is green. The sky is blue. The sun is yellow. " * args.junk
prompt = f"The pass key is {passkey}. Remember it. {junk} What is the pass key? The pass key is"
ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
print(f"prompt: {len(ids)} tokens")
if len(ids) > eng.max_seq - 64:
    # shift out middle junk, keeping the head (with the passkey) pinned
    eng.prefill(ids[: eng.max_seq - 64])
    eng.context_shift(n_keep=64, n_discard=len(ids) - (eng.max_seq - 64))
text, _ = eng.generate(prompt[-2000:], n_predict=8, sampler=SamplerParams(greedy=True))
print("model answer:", text.strip()[:20])
