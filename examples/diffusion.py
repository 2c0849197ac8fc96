"""Diffusion LM generation (Dream / LLaDA) — the diffusion-cli analog.

Denoises a [prompt | MASK…] canvas with confidence-based remasking
(reference: examples/diffusion/diffusion-cli.cpp).

Usage:
    python examples/diffusion.py -m model.gguf -p "prompt" \
        --max-length 128 --steps 32 [--schedule block --block-length 32]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Once upon a time")
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--algorithm", default="confidence",
                    choices=("confidence", "entropy", "margin"))
    ap.add_argument("--schedule", default="timestep", choices=("timestep", "block"))
    ap.add_argument("--block-length", type=int, default=32)
    ap.add_argument("--mask-token-id", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms",
                          args.platform if args.platform != "tpu" else "axon,tpu")

    from llama_cpp_gfx906_tpu.runtime.diffusion import DiffusionEngine

    eng = DiffusionEngine.from_gguf(args.model, mask_token_id=args.mask_token_id)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
    out = eng.generate(
        ids, max_length=args.max_length, steps=args.steps,
        temperature=args.temperature, algorithm=args.algorithm,
        schedule=args.schedule, block_length=args.block_length, seed=args.seed,
    )
    print(args.prompt + eng.tokenizer.detokenize(out))


if __name__ == "__main__":
    main()
