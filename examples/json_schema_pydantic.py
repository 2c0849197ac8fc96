"""Constrain generation to a pydantic model's JSON schema
(reference: examples/json_schema_pydantic_example.py /
pydantic_models_to_grammar.py — here pydantic's own .model_json_schema()
feeds the repo's json-schema→GBNF converter).

    python examples/json_schema_pydantic.py model.gguf
"""

import json
import sys

sys.path.insert(0, ".")

try:
    from pydantic import BaseModel
except ImportError:
    print("pydantic not installed — showing the plain-dict equivalent")
    BaseModel = None

from llama_cpp_gfx906_tpu.grammar.json_schema import json_schema_to_gbnf

if BaseModel is not None:

    class QAPair(BaseModel):
        question: str
        concise_answer: str
        justification: str

    schema = QAPair.model_json_schema()
else:
    schema = {
        "type": "object",
        "properties": {
            "question": {"type": "string"},
            "concise_answer": {"type": "string"},
            "justification": {"type": "string"},
        },
        "required": ["question", "concise_answer", "justification"],
    }

gbnf = json_schema_to_gbnf(schema)
print("# schema:", json.dumps(schema))
print(gbnf)

if len(sys.argv) > 1:
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.sampling.samplers import SamplerChain, SamplerParams

    from llama_cpp_gfx906_tpu.grammar import Grammar, grammar_vocab_from_tokenizer

    eng = Engine.from_gguf(sys.argv[1], max_seq=1024, dtype=jnp.bfloat16)
    chain = SamplerChain(SamplerParams(greedy=True), eng.cfg.n_vocab)
    chain.set_grammar(Grammar.from_string(gbnf),
                      grammar_vocab_from_tokenizer(eng.tokenizer))
    text, _ = eng.generate("Q&A about TPUs, as JSON: ", n_predict=200,
                           sampler=chain)
    print(text)
