"""Convert a regex pattern to a GBNF grammar and print it
(reference: examples/regex_to_grammar.py).

    python examples/regex_to_grammar.py '[A-Z][a-z]+( [A-Z][a-z]+)*'
"""

import sys

sys.path.insert(0, ".")

from llama_cpp_gfx906_tpu.grammar.json_schema import json_schema_to_gbnf


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else r"\d{3}-\d{4}"
    print(json_schema_to_gbnf({"type": "string", "pattern": pattern}))


if __name__ == "__main__":
    main()
