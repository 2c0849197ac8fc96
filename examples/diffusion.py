"""Diffusion LM generation (Dream / LLaDA) — the diffusion-cli analog.

Denoises a [prompt | MASK…] canvas with confidence-based remasking
(reference: examples/diffusion/diffusion-cli.cpp).

Usage:
    python examples/diffusion.py -m model.gguf -p "prompt" \
        --max-length 128 --steps 32 [--schedule block --block-length 32]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from llama_cpp_gfx906_tpu.common.args import build_parser

    ap = build_parser("diffusion")
    ap.set_defaults(prompt="Once upon a time", seed=0)
    # local aliases kept for the original example surface
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--steps", type=int, default=None, help="alias of --diffusion-steps")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--algorithm", default=None, help="alias of --diffusion-algorithm")
    ap.add_argument("--schedule", default="timestep", choices=("timestep", "block"))
    ap.add_argument("--block-length", type=int, default=None,
                    help="alias of --diffusion-block-length")
    ap.add_argument("--mask-token-id", type=int, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms",
                          args.platform if args.platform != "tpu" else "axon,tpu")

    from llama_cpp_gfx906_tpu.runtime.diffusion import DiffusionEngine

    eng = DiffusionEngine.from_gguf(args.model, mask_token_id=args.mask_token_id)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
    alg = args.algorithm or args.diffusion_algorithm
    if alg == "low_confidence":  # reference naming for the same rule
        alg = "confidence"

    visual_cb = None
    if args.diffusion_visual:
        def visual_cb(canvas, step):
            txt = eng.tokenizer.detokenize(
                [t for t in canvas.tolist() if t != eng.mask_token_id])
            print(f"\r[step {step}] {txt[:120]}", end="", flush=True)

    out = eng.generate(
        ids, max_length=args.max_length,
        steps=args.steps or args.diffusion_steps,
        temperature=args.temperature, algorithm=alg,
        schedule=args.schedule,
        block_length=args.block_length or args.diffusion_block_length,
        eps=args.diffusion_eps, seed=args.seed,
        alg_temp=args.diffusion_alg_temp,
        cfg_scale=args.diffusion_cfg_scale,
        visual_cb=visual_cb,
    )
    if args.diffusion_visual:
        print()
    print(args.prompt + eng.tokenizer.detokenize(out))


if __name__ == "__main__":
    main()
