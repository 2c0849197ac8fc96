"""Long-context passkey retrieval via grouped self-extend (reference:
examples/passkey.cpp — llama_memory_seq_div position compression)."""
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
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

ap = build_parser("passkey")  # --junk / --pos from the shared registry
ap.set_defaults(junk=50)
args = ap.parse_args()

import numpy as np

eng = Engine.from_gguf(args.model, max_seq=4096)
passkey = "7342"
filler = "The grass is green. The sky is blue. The sun is yellow. "
key_sent = f"The pass key is {passkey}. Remember it. "
if args.pos >= 0:  # --pos: insert the key after N filler repetitions
    i = min(args.pos, args.junk)
    junk = filler * i + key_sent + filler * (args.junk - i)
    prompt = f"{junk} What is the pass key? The pass key is"
else:
    junk = filler * args.junk
    prompt = f"{key_sent}{junk} What is the pass key? The pass key is"
ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
print(f"prompt: {len(ids)} tokens")
grp = 4  # grouped-attention factor (passkey.cpp --grp-attn-n)
logits = eng.prefill(ids)
# compress all positions by grp: the model now "sees" a 4x shorter context
eng.seq_div(0, len(ids), grp)
out = []
for _ in range(8):
    tok = int(np.argmax(logits))
    out.append(tok)
    logits = eng.decode_one(tok)
print("model answer:", eng.tokenizer.detokenize(out).strip()[:20])
