"""GritLM-style unified generation + embedding (reference: examples/gritlm —
one model serves both retrieval embeddings and chat generation).

Embeddings use instruction-prefixed mean pooling over the final hidden
states (the GritLM recipe); generation is the normal decode loop.

    python examples/gritlm.py -m model.gguf -q "query" -d "doc a" -d "doc b"
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

import numpy as np


def gritlm_instruction(instruction: str = "") -> str:
    return (
        "<|user|>\n" + instruction + "\n<|embed|>\n" if instruction else "<|embed|>\n"
    )


def main(argv=None) -> int:
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-q", "--query", default="What is a llama?")
    ap.add_argument("-d", "--doc", action="append", default=[])
    ap.add_argument("-i", "--instruction", default="Retrieve relevant documents")
    ap.add_argument("-n", "--n-predict", type=int, default=24)
    args = ap.parse_args(argv)

    eng = Engine.from_gguf(args.model, dtype=jnp.float32)

    # embedding mode: instruction-prefixed mean pooling
    prefix = gritlm_instruction(args.instruction)
    qv = eng.embed(prefix + args.query, pooling="mean")
    docs = args.doc or ["A llama is a camelid.", "Paris is a city."]
    scores = []
    for d in docs:
        dv = eng.embed(gritlm_instruction() + d, pooling="mean")
        scores.append(float(np.dot(qv, dv)))
    order = np.argsort(scores)[::-1]
    print("[embed] ranking:")
    for i in order:
        print(f"  {scores[i]: .4f}  {docs[i]!r}")

    # generation mode: same weights, normal decode
    text, _ = eng.generate(args.query, n_predict=args.n_predict)
    print(f"[generate] {text!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
