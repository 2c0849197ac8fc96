"""Persistent chat: the KV cache is saved to disk between turns so a
restarted process resumes without re-prefilling the whole history
(reference: examples/chat-persistent.sh over --prompt-cache).

    python examples/chat_persistent.py model.gguf cache.bin "First message"
    python examples/chat_persistent.py model.gguf cache.bin "Second message"
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor forced-CPU runs (the axon plugin overrides JAX_PLATFORMS at
# discovery; only jax.config wins — same workaround as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams


def main():
    model, cache, user_msg = sys.argv[1], sys.argv[2], sys.argv[3]
    ctx = int(os.environ.get("CTX", "2048"))
    eng = Engine.from_gguf(model, max_seq=ctx, dtype=jnp.bfloat16)

    history: list[int] = []
    if os.path.exists(cache):
        history = eng.load_state(cache)  # restores KV + token history
        print(f"[resumed {len(history)} cached tokens]")

    turn = eng.tokenizer.tokenize(f"User: {user_msg}\nAssistant:",
                                  add_special=not history)
    if history:
        logits = eng.decode_chunk(turn)[-1]
    else:
        logits = eng.prefill(turn)
    history += turn

    chain_ids = list(history)
    sp = SamplerParams(greedy=True)
    n_predict = int(os.environ.get("N_PREDICT", "48"))
    out = []
    import numpy as np

    for _ in range(n_predict):
        tok = int(np.argmax(logits))
        if tok in eng.tokenizer.vocab.special.eog_ids():
            break
        out.append(tok)
        chain_ids.append(tok)
        logits = eng.decode_one(tok)
    history += out
    print(eng.tokenizer.detokenize(out))

    eng.save_state(cache, history)
    print(f"[saved {len(history)} tokens to {cache}]")


if __name__ == "__main__":
    main()
