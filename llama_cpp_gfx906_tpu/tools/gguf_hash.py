"""Per-tensor + whole-model hashing (reference: examples/gguf-hash) —
used to verify conversions and split/merge round trips."""

from __future__ import annotations

import argparse
import hashlib

from ..gguf.reader import GGUFModelReader


def hash_tensors(path: str, algo: str = "sha256") -> dict[str, str]:
    reader = GGUFModelReader(path)
    out: dict[str, str] = {}
    overall = hashlib.new(algo)
    for name in sorted(reader.tensors):
        t = reader.tensors[name]
        h = hashlib.new(algo)
        import numpy as np

        data = np.asarray(t.data).tobytes()
        h.update(data)
        overall.update(data)
        out[name] = h.hexdigest()
    out["__overall__"] = overall.hexdigest()
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gguf-hash (TPU)")
    ap.add_argument("model")
    ap.add_argument("--algo", default="sha256", choices=("sha256", "sha1", "md5", "blake2b"))
    ap.add_argument("--per-tensor", action="store_true")
    args = ap.parse_args(argv)
    hashes = hash_tensors(args.model, args.algo)
    if args.per_tensor:
        for name, h in hashes.items():
            if name != "__overall__":
                print(f"{h}  {name}")
    print(f"{hashes['__overall__']}  {args.model}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
