"""Jeopardy-style Q/A sweep (reference: examples/jeopardy/jeopardy.sh).

Runs every question in a file through the model with the reference's game
preamble, appending each answer to a results file and printing a summary —
the jeopardy.sh + graph.py loop as one script.

    python examples/jeopardy.py -m model.gguf -f questions.txt -o results.txt
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

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

INTRO = (
    "You will be playing a game of Jeopardy. Simply answer the question in "
    "the correct format (Ex. What is Paris, or Who is George Washington)."
)
DEFAULT_QUESTIONS = [
    "This European city hosts the Louvre museum?",
    "He was the first President of the United States?",
    "This planet is known as the Red Planet?",
]

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-f", "--questions", help="one question per line (default: built-in sample)")
ap.add_argument("-o", "--output", help="append answers here (jeopardy.sh results file)")
ap.add_argument("-n", "--n-predict", type=int, default=80)
ap.add_argument("--prefix", default="Human: ", help="chat prefix (vicuna-style)")
args = ap.parse_args()

if args.questions:
    with open(args.questions) as f:
        questions = [ln.strip() for ln in f if ln.strip()]
else:
    questions = DEFAULT_QUESTIONS

eng = Engine.from_gguf(args.model)
out_f = open(args.output, "a") if args.output else None
print("Running")
for i, q in enumerate(questions, 1):
    print(i)
    print(f"Current Question: {q}")
    prompt = f"{args.prefix}{INTRO}\n{args.prefix}{q}"
    text, _ = eng.generate(prompt, n_predict=args.n_predict,
                           sampler=SamplerParams(greedy=True))
    answer = text.strip().split("\n")[0]
    print(f"  -> {answer}")
    if out_f is not None:
        out_f.write(f"{answer}\n------\n")
if out_f is not None:
    out_f.close()
print(f"[jeopardy] answered {len(questions)} questions")
