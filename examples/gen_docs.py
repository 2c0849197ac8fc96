"""Generate markdown docs for every CLI/server flag from the registry
(reference: examples/gen-docs — emits the arg tables in docs/).

    python examples/gen_docs.py [scope ...]   # default: cli server
"""

import sys

sys.path.insert(0, ".")

from llama_cpp_gfx906_tpu.common.args import REGISTRY


def main(scopes):
    for scope in scopes:
        print(f"## {scope} flags\n")
        print("| flag | env | default | description |")
        print("|---|---|---|---|")
        for flag in REGISTRY:
            if scope not in flag.scopes:
                continue
            names = ", ".join(f"`{n}`" for n in flag.names)
            env = f"`{flag.env}`" if flag.env else ""
            default = "" if flag.default in (None, False) else f"`{flag.default}`"
            print(f"| {names} | {env} | {default} | {flag.help} |")
        print()


if __name__ == "__main__":
    main(sys.argv[1:] or ["cli", "server"])
