"""Write a structurally-valid synthetic Q4_K_M GGUF at a chosen scale.

For serving-load benchmarks on hardware where no real big checkpoint is
reachable (zero-egress environment): block payloads are a tiled valid
pattern (finite f16 scales, random nibbles), so the engine loads and
decodes at exactly real-model speed — decode throughput is
value-independent.  NOT for quality metrics.

Usage:
    python scripts/make_synth_gguf.py out.gguf [--preset 8b|3b|tiny]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter

PRESETS = {
    # (L, D, heads, kv, head_dim, F, V)
    "8b": (32, 4096, 32, 8, 128, 14336, 128256),
    "3b": (28, 3072, 24, 8, 128, 8192, 128256),
    "tiny": (2, 256, 2, 1, 128, 512, 2048),
}


def q4k_rows(rng, n_rows: int, K: int) -> np.ndarray:
    """(n_rows, K/256*144) valid Q4_K block bytes."""
    nb = K // 256
    blk = np.zeros((n_rows, nb, 144), np.uint8)
    d = np.float16(2e-3).tobytes()
    dmin = np.float16(1e-3).tobytes()
    blk[:, :, 0:2] = np.frombuffer(d, np.uint8)
    blk[:, :, 2:4] = np.frombuffer(dmin, np.uint8)
    blk[:, :, 4:16] = rng.integers(0, 63, (n_rows, nb, 12), dtype=np.uint8)
    blk[:, :, 16:] = rng.integers(0, 256, (n_rows, nb, 128), dtype=np.uint8)
    return blk.reshape(n_rows, nb * 144)


def q6k_rows(rng, n_rows: int, K: int) -> np.ndarray:
    nb = K // 256
    blk = np.zeros((n_rows, nb, 210), np.uint8)
    blk[:, :, :192] = rng.integers(0, 256, (n_rows, nb, 192), dtype=np.uint8)
    blk[:, :, 192:208] = rng.integers(1, 32, (n_rows, nb, 16), dtype=np.uint8)
    blk[:, :, 208:210] = np.frombuffer(np.float16(2e-3).tobytes(), np.uint8)
    return blk.reshape(n_rows, nb * 210)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--preset", default="8b", choices=sorted(PRESETS))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    L, D, H, KVH, DH, F, V = PRESETS[args.preset]
    rng = np.random.default_rng(args.seed)

    w = GGUFWriter(args.out, "llama")
    w.add_string("general.name", f"synth-{args.preset}-q4km")
    w.add_uint32("llama.block_count", L)
    w.add_uint32("llama.embedding_length", D)
    w.add_uint32("llama.attention.head_count", H)
    w.add_uint32("llama.attention.head_count_kv", KVH)
    w.add_uint32("llama.attention.key_length", DH)
    w.add_uint32("llama.attention.value_length", DH)
    w.add_uint32("llama.feed_forward_length", F)
    w.add_uint32("llama.context_length", 8192)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_float32("llama.rope.freq_base", 500000.0)
    w.add_uint32("llama.vocab_size", V)
    w.add_string("tokenizer.ggml.model", "llama")
    tokens = ["<s>", "</s>", "<unk>"] + [f"<0x{b:02X}>" for b in range(256)]
    tokens += [f"tok{i}" for i in range(V - len(tokens))]
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", [0.0] * V)
    w.add_array("tokenizer.ggml.token_type", [3, 3, 2] + [6] * 256
                + [1] * (V - 259))
    w.add_uint32("tokenizer.ggml.bos_token_id", 0)
    w.add_uint32("tokenizer.ggml.eos_token_id", 1)

    def add_q(name, out_dim, in_dim, kind="q4k"):
        rows = (q4k_rows if kind == "q4k" else q6k_rows)(rng, out_dim, in_dim)
        w.add_tensor(name, rows.reshape(-1),
                     ggml_type=(GGMLType.Q4_K if kind == "q4k"
                                else GGMLType.Q6_K),
                     raw_ne=(in_dim, out_dim))

    emb = (rng.standard_normal((V, D)).astype(np.float16) * 0.02)
    w.add_tensor("token_embd.weight", emb, ggml_type=GGMLType.F16)
    w.add_tensor("output_norm.weight", np.ones(D, np.float32))
    add_q("output.weight", V, D, "q6k")
    for i in range(L):
        w.add_tensor(f"blk.{i}.attn_norm.weight", np.ones(D, np.float32))
        w.add_tensor(f"blk.{i}.ffn_norm.weight", np.ones(D, np.float32))
        add_q(f"blk.{i}.attn_q.weight", H * DH, D)
        add_q(f"blk.{i}.attn_k.weight", KVH * DH, D)
        add_q(f"blk.{i}.attn_v.weight", KVH * DH, D, "q6k")
        add_q(f"blk.{i}.attn_output.weight", D, H * DH)
        add_q(f"blk.{i}.ffn_gate.weight", F, D)
        add_q(f"blk.{i}.ffn_up.weight", F, D)
        add_q(f"blk.{i}.ffn_down.weight", D, F)
    w.write()
    print(args.out, os.path.getsize(args.out), "bytes")


if __name__ == "__main__":
    main()
