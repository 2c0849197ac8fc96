"""On-device TPU smoke (tests force CPU; this runs the real-chip paths:
flash-attention prefill, fused dequant decode, q8 KV).  Run directly:
    python ci/tpu_smoke.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import jax

from transformers import LlamaConfig, LlamaForCausalLM
from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
from llama_cpp_gfx906_tpu.tools.quantize import quantize_file

def main():
    print("backend:", jax.default_backend())
    torch.manual_seed(0)
    VOCAB = 128
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512)).eval()
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    vocab = {"model": "llama", "tokens": tokens, "scores": [0.0] * VOCAB,
             "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1}
    f16 = "/tmp/tpu-smoke-f16.gguf"
    q4k = "/tmp/tpu-smoke-q4k.gguf"
    convert_hf_llama(hf, vocab, f16, quant_type=GGMLType.F16)
    quantize_file(f16, q4k, "Q4_K")

    for path, kvt in [(f16, None), (q4k, None), (q4k, "q8")]:
        eng = Engine.from_gguf(path, max_seq=256, kv_cache_dtype=kvt)
        ids = [int(t) for t in np.random.default_rng(0).integers(3, VOCAB, 100)]
        logits = eng.prefill(ids)  # T=100 -> flash path on TPU
        assert np.isfinite(logits).all(), (path, kvt)
        l = logits
        for _ in range(8):
            l = eng.decode_one(int(np.argmax(l)))
        print(f"OK {path} kv={kvt}")

    # flash-path parity vs HF (bf16 weights: top-1 agreement)
    eng = Engine.from_gguf(f16, max_seq=256)
    ids = [3, 17, 42, 9, 88, 5, 63, 21] * 9
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    got = eng.prefill(ids)
    assert int(np.argmax(got)) == int(np.argmax(ref)), "flash-path top1 mismatch"
    print("flash-path parity OK")

if __name__ == "__main__":
    main()
