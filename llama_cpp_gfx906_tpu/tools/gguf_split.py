"""Split / merge GGUF files (reference: ``tools/gguf-split``)."""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGUFValueType, Keys
from ..gguf.reader import GGUFModelReader, GGUFReader
from ..gguf.writer import GGUFWriter, split_path_for


def split(in_path: str, out_prefix: str, max_tensors: int) -> list[str]:
    reader = GGUFReader(in_path)
    names = list(reader.tensors)
    n_split = max(1, -(-len(names) // max_tensors))
    paths = []
    for i in range(n_split):
        shard_path = split_path_for(out_prefix, i, n_split)
        w = GGUFWriter(shard_path, reader.architecture)
        if i == 0:
            for key, value in reader.metadata.items():
                if key.startswith("split.") or key == "general.architecture":
                    continue
                vtype = GGUFValueType.ARRAY if isinstance(value, (list, np.ndarray)) else None
                w.add_kv(key, value, vtype)
        w.add_kv(Keys.Split.NO, i, GGUFValueType.UINT16)
        w.add_kv(Keys.Split.COUNT, n_split, GGUFValueType.UINT16)
        w.add_kv(Keys.Split.TENSORS_COUNT, len(names), GGUFValueType.INT32)
        for name in names[i * max_tensors : (i + 1) * max_tensors]:
            t = reader.tensors[name]
            w.add_tensor(name, np.asarray(t.data), t.ggml_type, raw_ne=t.ne)
        paths.append(w.write())
    return paths


def merge(in_path: str, out_path: str) -> str:
    model = GGUFModelReader(in_path)
    w = GGUFWriter(out_path, model.architecture)
    for key, value in model.metadata.items():
        if key.startswith("split.") or key == "general.architecture":
            continue
        vtype = GGUFValueType.ARRAY if isinstance(value, (list, np.ndarray)) else None
        w.add_kv(key, value, vtype)
    for name, t in model.tensors.items():
        w.add_tensor(name, np.asarray(t.data), t.ggml_type, raw_ne=t.ne)
    return w.write()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gguf-split (TPU)")
    ap.add_argument("--split", action="store_true")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--split-max-tensors", type=int, default=128)
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args(argv)
    if args.merge:
        print(merge(args.input, args.output))
    else:
        for p in split(args.input, args.output, args.split_max_tensors):
            print(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
