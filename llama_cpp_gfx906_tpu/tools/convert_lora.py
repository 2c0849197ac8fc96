"""PEFT LoRA adapter → LoRA GGUF (reference: convert_lora_to_gguf.py).

Maps ``base_model.model.model.layers.N.<proj>.lora_A.weight`` style keys
to the reference's ``blk.N.<tensor>.lora_a``/``.lora_b`` pairs plus
``adapter.lora.alpha`` metadata, consumable by runtime/lora.py and by
llama.cpp itself.
"""

from __future__ import annotations

import argparse
import re

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter

_PROJ_TO_GGUF = {
    "q_proj": "attn_q.weight",
    "k_proj": "attn_k.weight",
    "v_proj": "attn_v.weight",
    "o_proj": "attn_output.weight",
    "gate_proj": "ffn_gate.weight",
    "up_proj": "ffn_up.weight",
    "down_proj": "ffn_down.weight",
}


def convert_peft_lora(state: dict, out_path: str, alpha: float, arch: str = "llama",
                      n_head: int = 0, n_kv_head: int = 0) -> str:
    """``state``: {name: np.ndarray} from a PEFT adapter checkpoint.

    ``n_head``/``n_kv_head`` enable the q/k rope-layout permutation of
    lora_B — required so the low-rank delta matches the permuted base
    weights (reference convert_lora_to_gguf.py applies modify_tensors the
    same way)."""
    from .convert_hf import permute_qk

    w = GGUFWriter(out_path, arch)
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", float(alpha))

    pat = re.compile(
        r"(?:base_model\.model\.)?model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_([AB])\.(?:default\.)?weight"
    )
    n = 0
    for name, arr in state.items():
        m = pat.match(name)
        if not m:
            continue
        il, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        gg = _PROJ_TO_GGUF.get(proj)
        if gg is None:
            continue
        arr = np.asarray(arr, np.float32)
        if ab == "B" and proj == "q_proj" and n_head:
            arr = permute_qk(arr, n_head)
        elif ab == "B" and proj == "k_proj" and n_kv_head:
            arr = permute_qk(arr, n_kv_head)
        suffix = "lora_a" if ab == "A" else "lora_b"
        w.add_tensor(f"blk.{il}.{gg}.{suffix}", arr, GGMLType.F32)
        n += 1
    if n == 0:
        raise ValueError("no LoRA tensor pairs found in the adapter state dict")
    return w.write()


def convert_peft_model(peft_model, out_path: str) -> str:
    """Convert an in-memory peft.PeftModel."""
    cfg = peft_model.peft_config["default"]
    base_cfg = peft_model.base_model.model.config
    state = {
        k: v.detach().cpu().float().numpy()
        for k, v in peft_model.state_dict().items()
        if "lora_" in k
    }
    return convert_peft_lora(
        state, out_path, alpha=float(cfg.lora_alpha),
        n_head=getattr(base_cfg, "num_attention_heads", 0),
        n_kv_head=getattr(base_cfg, "num_key_value_heads", 0),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="convert-lora-to-gguf (TPU)")
    ap.add_argument("adapter_dir", help="PEFT adapter directory (adapter_model.safetensors)")
    ap.add_argument("-o", "--outfile", required=True)
    args = ap.parse_args(argv)

    import json
    import os

    with open(os.path.join(args.adapter_dir, "adapter_config.json"), encoding="utf-8") as f:
        acfg = json.load(f)
    path_st = os.path.join(args.adapter_dir, "adapter_model.safetensors")
    if os.path.exists(path_st):
        from safetensors.numpy import load_file

        state = load_file(path_st)
    else:
        import torch

        state = {
            k: v.float().numpy()
            for k, v in torch.load(os.path.join(args.adapter_dir, "adapter_model.bin"),
                                   map_location="cpu").items()
        }
    out = convert_peft_lora(state, args.outfile, alpha=float(acfg.get("lora_alpha", 16)))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
