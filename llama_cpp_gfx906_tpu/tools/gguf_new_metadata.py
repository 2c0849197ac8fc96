"""Edit GGUF metadata without touching tensor data (reference:
gguf-py/gguf/scripts/gguf_new_metadata.py)."""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..gguf.reader import GGUFModelReader
from ..gguf.writer import GGUFWriter


def rewrite_metadata(in_path: str, out_path: str, set_kv: dict | None = None,
                     remove: list[str] | None = None,
                     chat_template: str | None = None) -> str:
    reader = GGUFModelReader(in_path)
    r0 = reader.readers[0]
    w = GGUFWriter(out_path, r0.architecture)
    removed = set(remove or [])
    overrides = dict(set_kv or {})
    if chat_template is not None:
        overrides["tokenizer.chat_template"] = chat_template
    for key in r0.field_names():
        if key == "general.architecture" or key in removed:
            continue
        value = overrides.pop(key, r0.get(key))
        from ..gguf.constants import GGUFValueType

        vtype = GGUFValueType.ARRAY if isinstance(value, (list, np.ndarray)) else None
        w.add_kv(key, value, vtype)
    for key, value in overrides.items():  # brand-new keys
        w.add_kv(key, value)
    for name, t in reader.tensors.items():
        w.add_tensor(name, np.asarray(t.data), t.ggml_type, raw_ne=t.ne)
    return w.write()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gguf-new-metadata (TPU)")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--set", action="append", default=[],
                    help="KEY=JSON_VALUE (repeatable)")
    ap.add_argument("--remove", action="append", default=[])
    ap.add_argument("--chat-template", default=None)
    ap.add_argument("--chat-template-file", default=None)
    args = ap.parse_args(argv)
    kv = {}
    for item in args.set:
        key, _, raw = item.partition("=")
        try:
            kv[key] = json.loads(raw)
        except json.JSONDecodeError:
            kv[key] = raw
    tmpl = args.chat_template
    if args.chat_template_file:
        tmpl = open(args.chat_template_file, encoding="utf-8").read()
    out = rewrite_metadata(args.input, args.output, kv, args.remove, tmpl)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
