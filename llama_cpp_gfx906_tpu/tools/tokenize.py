"""llama-tokenize equivalent (reference: tools/tokenize/tokenize.cpp)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-tokenize (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--stdin", action="store_true")
    ap.add_argument("--ids", action="store_true", help="print raw id array only")
    ap.add_argument("--no-bos", action="store_true")
    ap.add_argument("--no-parse-special", action="store_true")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFModelReader
    from ..tokenizers import tokenizer_from_gguf

    tok = tokenizer_from_gguf(GGUFModelReader(args.model).readers[0])
    if args.stdin:
        text = sys.stdin.read()
    elif args.file:
        text = open(args.file, encoding="utf-8").read()
    elif args.prompt is not None:
        text = args.prompt
    else:
        ap.error("need one of -p/-f/--stdin")
    ids = tok.tokenize(text, add_special=not args.no_bos, parse_special=not args.no_parse_special)
    if args.ids:
        print(json.dumps(ids))
    else:
        for t in ids:
            piece = tok.detokenize([t], special=True)
            print(f"{t:>7} -> {piece!r}")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
