"""llama-export-lora equivalent: merge LoRA adapters into a base GGUF.

Reference: tools/export-lora (434 LoC) — for every base tensor with an
adapter pair, write dequant(W) + scale·(B·A) requantized to the original
type; everything else is copied through bit-exact.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModelReader
from ..gguf.writer import GGUFWriter
from ..runtime.lora import LoraAdapter, _SUFFIX_TO_KEY


def merge_lora(base_path: str, lora_paths: list[str], out_path: str, scale: float = 1.0) -> str:
    reader = GGUFModelReader(base_path)
    adapters = [LoraAdapter.from_gguf(p) for p in lora_paths]

    # per-gguf-name merged delta
    deltas: dict[str, np.ndarray] = {}
    for ad in adapters:
        eff = scale * ad.alpha / max(ad.rank, 1)
        inv_key = {v: k for k, v in _SUFFIX_TO_KEY.items()}
        for key, per_layer in ad.pairs.items():
            suffix = inv_key[key]
            for il, (A, B) in per_layer.items():
                name = f"blk.{il}.{suffix}"
                # A (K,r), B (r,out) → delta W (out, K) in GGUF orientation
                d = (A @ B).T * eff
                deltas[name] = deltas.get(name, 0.0) + d

    r0 = reader.readers[0]
    w = GGUFWriter(out_path, r0.architecture)
    # copy metadata (architecture is written by the ctor)
    for fname in r0.field_names():
        if fname == "general.architecture":
            continue
        w.add_kv(fname, r0.get(fname))

    for name, t in reader.tensors.items():
        if name in deltas:
            merged = t.to_f32() + deltas[name].astype(np.float32)
            w.add_tensor(name, merged, t.ggml_type)  # requantize to base type
        else:
            w.add_tensor(name, np.frombuffer(np.asarray(t.data).tobytes(), np.uint8),
                         t.ggml_type, raw_ne=t.ne)
    return w.write()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-export-lora (TPU)")
    ap.add_argument("-m", "--model", required=True, help="base GGUF")
    ap.add_argument("--lora", action="append", required=True, help="LoRA GGUF (repeatable)")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--lora-scale", type=float, default=1.0)
    args = ap.parse_args(argv)
    out = merge_lora(args.model, args.lora, args.output, args.lora_scale)
    print(f"merged {len(args.lora)} adapter(s) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
