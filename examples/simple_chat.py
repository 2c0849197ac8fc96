"""Interactive chat with the model's template (reference: examples/simple-chat).

    python examples/simple_chat.py -m model.gguf
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

from llama_cpp_gfx906_tpu.chat import render_chat_template
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-n", "--n-predict", type=int, default=256)
args = ap.parse_args()

eng = Engine.from_gguf(args.model)
messages = []
while True:
    try:
        user = input("> ")
    except EOFError:
        break
    messages.append({"role": "user", "content": user})
    prompt = render_chat_template(eng.tokenizer.vocab.chat_template, messages)
    text, _ = eng.generate(prompt, n_predict=args.n_predict, sampler=SamplerParams(temp=0.7))
    print(text)
    messages.append({"role": "assistant", "content": text})
