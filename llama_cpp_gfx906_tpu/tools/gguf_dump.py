"""Inspect GGUF files (reference: ``gguf-py/gguf/scripts/gguf_dump.py``)."""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..gguf.reader import GGUFReader


def dump(path: str, as_json: bool = False, show_tensors: bool = True) -> str:
    r = GGUFReader(path)
    if as_json:
        meta = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in r.metadata.items()
            if not isinstance(v, (list, np.ndarray)) or len(v) <= 16
        }
        out = {
            "version": r.version,
            "alignment": r.alignment,
            "architecture": r.architecture,
            "metadata": meta,
            "n_tensors": len(r.tensors),
        }
        if show_tensors:
            out["tensors"] = [
                {
                    "name": t.name,
                    "shape": list(t.shape),
                    "type": t.ggml_type.name,
                    "bytes": t.n_bytes,
                }
                for t in r.tensors.values()
            ]
        return json.dumps(out, indent=2)

    lines = [f"GGUF v{r.version} | arch={r.architecture} | align={r.alignment}"]
    lines.append(f"{len(r.metadata)} metadata keys:")
    for k, v in r.metadata.items():
        if isinstance(v, (list, np.ndarray)) and len(v) > 8:
            desc = f"[{len(v)} items: {str(v[0])[:24]!r}, ...]"
        else:
            desc = repr(v)[:80]
        lines.append(f"  {k} = {desc}")
    if show_tensors:
        lines.append(f"{len(r.tensors)} tensors:")
        for t in r.tensors.values():
            lines.append(
                f"  {t.name:48s} {str(tuple(t.shape)):>20s} {t.ggml_type.name:8s} {t.n_bytes:>12,d} B"
            )
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gguf-dump (TPU)")
    ap.add_argument("path")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-tensors", action="store_true")
    args = ap.parse_args(argv)
    print(dump(args.path, args.json, not args.no_tensors))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
