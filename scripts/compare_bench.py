#!/usr/bin/env python3
"""Compare two llama-bench jsonl runs (reference:
``scripts/compare-llama-bench.py`` — it joins two bench outputs on the
test configuration and prints per-test speedups).

Usage:
    python -m llama_cpp_gfx906_tpu.tools.bench -m m.gguf -o jsonl > before.jsonl
    ... change something ...
    python -m llama_cpp_gfx906_tpu.tools.bench -m m.gguf -o jsonl > after.jsonl
    python scripts/compare_bench.py before.jsonl after.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys

KEY_FIELDS = ("model", "arch", "test", "batch", "kv", "weights")


def load(path: str) -> dict[tuple, dict]:
    rows = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            key = tuple(r.get(k) for k in KEY_FIELDS)
            rows[key] = r
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("compare-bench")
    ap.add_argument("baseline", help="jsonl from the old run")
    ap.add_argument("compare", help="jsonl from the new run")
    ap.add_argument("-o", "--output", default="md", choices=("md", "json"))
    args = ap.parse_args(argv)

    base = load(args.baseline)
    new = load(args.compare)
    common = [k for k in base if k in new]
    if not common:
        print("no common test configurations", file=sys.stderr)
        return 1

    rows = []
    for k in common:
        b, n = base[k], new[k]
        if not b.get("t/s"):
            continue
        rows.append({
            **{f: b.get(f) for f in KEY_FIELDS if b.get(f) is not None},
            "t/s (old)": b["t/s"],
            "t/s (new)": n["t/s"],
            "speedup": round(n["t/s"] / b["t/s"], 3),
        })
    missing = [k for k in new if k not in base]
    if args.output == "json":
        print(json.dumps(rows, indent=2))
    else:
        keys = list(rows[0].keys())
        print("| " + " | ".join(keys) + " |")
        print("| " + " | ".join("---" for _ in keys) + " |")
        for r in rows:
            print("| " + " | ".join(str(r[k]) for k in keys) + " |")
        if missing:
            print(f"\n({len(missing)} configuration(s) only in the new run)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
