"""ReAct tool loop (reference: examples/reason-act.sh + prompts/reason-act.txt).

Drives the reference's Thought/Action/Observation prompt: generation stops at
the "Observation:"/"Question:" reverse prompts, `calculate[...]` actions are
evaluated host-side, and the observation is fed back until the model emits an
Answer — the -r/--in-prefix interactive loop of reason-act.sh, non-interactive.

    python examples/reason_act.py -m model.gguf -q "What is 4 * 7 / 3?"
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
import ast
import operator
import re

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

# few-shot preamble transcribed from the reference's prompts/reason-act.txt
PREAMBLE = """You run in a loop of Thought, Action, Observation.
At the end of the loop either Answer or restate your Thought and Action.
Use Thought to describe your thoughts about the question you have been asked.
Use Action to run one of these actions available to you:
- calculate[python math expression]
Observation will be the result of running those actions


Question: What is 4 * 7 / 3?
Thought: Do I need to use an action? Yes, I use calculate to do math
Action: calculate[4 * 7 / 3]
Observation: 9.3333333333
Thought: Do I need to use an action? No, have the result
Answer: The calculate tool says it is 9.3333333333
Question: What is capital of france?
Thought: Do I need to use an action? No, I know the answer
Answer: Paris is the capital of France
Question: """

_OPS = {ast.Add: operator.add, ast.Sub: operator.sub, ast.Mult: operator.mul,
        ast.Div: operator.truediv, ast.Pow: operator.pow, ast.Mod: operator.mod,
        ast.USub: operator.neg, ast.UAdd: operator.pos}


def calculate(expr: str) -> str:
    """Arithmetic-only evaluator (no eval: the action payload is model text)."""
    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return node.value
        if isinstance(node, ast.BinOp) and type(node.op) in _OPS:
            return _OPS[type(node.op)](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp) and type(node.op) in _OPS:
            return _OPS[type(node.op)](ev(node.operand))
        raise ValueError(f"unsupported expression: {expr!r}")
    try:
        return f"{ev(ast.parse(expr, mode='eval')):.10g}"
    except Exception as e:
        return f"error: {e}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-q", "--question", default="What is 12 * 9 - 8?")
    ap.add_argument("-n", "--n-predict", type=int, default=96, help="per round")
    ap.add_argument("--max-rounds", type=int, default=4)
    ap.add_argument("--temp", type=float, default=0.2)
    ap.add_argument("--top-k", type=int, default=10000)
    args = ap.parse_args()

    eng = Engine.from_gguf(args.model)
    sampler = SamplerParams(temp=args.temp, top_k=args.top_k, penalty_repeat=1.0)
    transcript = PREAMBLE + args.question + "\n"
    stops = ("Question:", "Observation:")
    for _ in range(args.max_rounds):
        text, _ = eng.generate(transcript, n_predict=args.n_predict, sampler=sampler)
        # reverse-prompt stop: cut at the first stop marker the model emits
        cut = min((text.find(s) for s in stops if s in text), default=len(text))
        step = text[:cut]
        print(step, end="", flush=True)
        transcript += step
        if "Answer:" in step:
            break
        m = re.search(r"Action: calculate\[([^\]]+)\]", step)
        if m is None:
            break  # no action and no answer: nothing to observe
        obs = f"Observation: {calculate(m.group(1))}\n"
        print(obs, end="", flush=True)
        transcript += obs
    print()


if __name__ == "__main__":
    main()
