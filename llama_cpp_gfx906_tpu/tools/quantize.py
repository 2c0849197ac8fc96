"""Requantize GGUF files (reference: ``src/llama-quant.cpp`` + tools/quantize).

Reads any supported GGUF, re-encodes tensors to the target scheme, writes a
new file preserving metadata.  Mirrors the reference's per-tensor type
rules (``llama_tensor_get_type``, llama-quant.cpp:178): 1-D/norm tensors
stay F32, the output head and sensitive projections get a higher-precision
type in the _M mixes, embeddings keep a mid-width type.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..gguf.constants import GGMLType, GGUFValueType
from ..gguf.quants import dequantize, quantize, supported_quant_types
from ..gguf.reader import GGUFModelReader
from ..gguf.writer import GGUFWriter

# preset name → (default type, overrides fn)
def _mix_rules(preset: str):
    preset = preset.upper()
    simple = {
        "Q4_0": GGMLType.Q4_0,
        "Q4_1": GGMLType.Q4_1,
        "Q5_0": GGMLType.Q5_0,
        "Q5_1": GGMLType.Q5_1,
        "Q8_0": GGMLType.Q8_0,
        "Q2_K": GGMLType.Q2_K,
        "Q3_K": GGMLType.Q3_K,
        "Q4_K": GGMLType.Q4_K,
        "Q5_K": GGMLType.Q5_K,
        "Q6_K": GGMLType.Q6_K,
        "MXFP4": GGMLType.MXFP4,
        "IQ4_NL": GGMLType.IQ4_NL,
        "IQ4_XS": GGMLType.IQ4_XS,
        "IQ2_XXS": GGMLType.IQ2_XXS,
        "IQ2_XS": GGMLType.IQ2_XS,
        "IQ2_S": GGMLType.IQ2_S,
        "IQ3_XXS": GGMLType.IQ3_XXS,
        "IQ3_S": GGMLType.IQ3_S,
        "IQ1_S": GGMLType.IQ1_S,
        "F16": GGMLType.F16,
        "BF16": GGMLType.BF16,
        "F32": GGMLType.F32,
    }
    if preset in simple:
        t = simple[preset]
        return t, lambda name, i_layer, n_layers: t

    if preset in ("Q4_K_M", "Q4_K_S", "Q5_K_M", "Q5_K_S", "Q3_K_M"):
        base = {"Q4": GGMLType.Q4_K, "Q5": GGMLType.Q5_K, "Q3": GGMLType.Q3_K}[preset[:2]]
        bump = {GGMLType.Q3_K: GGMLType.Q4_K, GGMLType.Q4_K: GGMLType.Q6_K, GGMLType.Q5_K: GGMLType.Q6_K}[base]
        medium = preset.endswith("_M")

        def rule(name: str, i_layer: int, n_layers: int) -> GGMLType:
            # llama-quant.cpp heuristics (simplified): output head always
            # Q6_K; in _M mixes the first/last eighth of ffn_down and all
            # attn_v get the bumped type
            if name == "output.weight":
                return GGMLType.Q6_K
            if name == "token_embd.weight":
                return base
            if medium and ".attn_v.weight" in name:
                return bump
            if medium and ".ffn_down.weight" in name and n_layers:
                if i_layer < max(1, n_layers // 8) or i_layer >= n_layers - max(1, n_layers // 8):
                    return bump
            return base

        return base, rule
    raise SystemExit(f"unknown quantization preset {preset!r}")


def quantize_file(
    in_path: str,
    out_path: str,
    preset: str,
    allow_requantize: bool = False,
    imatrix_path: str | None = None,
) -> dict:
    reader = GGUFModelReader(in_path)
    imatrix = None
    if imatrix_path:
        from .imatrix import load_imatrix

        imatrix = load_imatrix(imatrix_path)
    default_t, rule = _mix_rules(preset)
    n_layers = 0
    for name in reader.tensors:
        if name.startswith("blk."):
            n_layers = max(n_layers, int(name.split(".")[1]) + 1)

    w = GGUFWriter(out_path, reader.architecture)
    for key, value in reader.metadata.items():
        if key in ("general.architecture", "split.no", "split.count", "split.tensors.count"):
            continue
        if key == "general.file_type":
            continue
        vtype = GGUFValueType.ARRAY if isinstance(value, (list, np.ndarray)) else None
        w.add_kv(key, value, vtype)

    stats = {"in_bytes": 0, "out_bytes": 0, "n_tensors": 0, "skipped": 0}
    for i, (name, t) in enumerate(sorted(reader.tensors.items())):
        stats["in_bytes"] += t.n_bytes
        stats["n_tensors"] += 1
        already_quant = t.ggml_type not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)
        i_layer = int(name.split(".")[1]) if name.startswith("blk.") else -1

        if t.shape and len(t.shape) >= 2 and t.shape[-1] % 32 == 0 and "norm" not in name:
            target = rule(name, i_layer, n_layers)
        else:
            target = GGMLType.F32

        if already_quant and not allow_requantize and target not in (GGMLType.F32, GGMLType.F16):
            # keep original encoding rather than degrading twice
            w.add_tensor(name, np.asarray(t.data), t.ggml_type, raw_ne=t.ne)
            stats["skipped"] += 1
            stats["out_bytes"] += t.n_bytes
            continue

        f32 = t.to_f32()
        if target not in supported_quant_types():
            target = GGMLType.F16
        iw = imatrix.get(name) if imatrix else None
        if iw is not None and target not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            # importance-weighted encoding (llama-quant.cpp imatrix path)
            from ..gguf.quants import quantize_weighted

            raw = quantize_weighted(f32, target, iw)
            w.add_tensor(name, raw.view(np.uint8), target, raw_ne=t.ne)
        else:
            w.add_tensor(name, f32, target)
        from ..gguf.constants import type_size_bytes

        stats["out_bytes"] += type_size_bytes(target, t.n_elements)
    w.write()
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-quantize (TPU)")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("type", help="Q4_0/Q8_0/Q4_K_M/Q5_K_M/Q6_K/MXFP4/F16/...")
    ap.add_argument("--allow-requantize", action="store_true")
    ap.add_argument("--imatrix", default=None, help="importance matrix GGUF")
    args = ap.parse_args(argv)
    t0 = time.time()
    stats = quantize_file(args.input, args.output, args.type, args.allow_requantize,
                          imatrix_path=args.imatrix)
    mb = 1024 * 1024
    print(
        f"quantized {stats['n_tensors']} tensors "
        f"({stats['in_bytes']/mb:.1f} MiB -> {stats['out_bytes']/mb:.1f} MiB, "
        f"{stats['skipped']} kept) in {time.time()-t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
