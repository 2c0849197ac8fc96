"""Convert a Karpathy llama2.c checkpoint (.bin) to GGUF.

Reference: ``examples/convert-llama2c-to-ggml/convert-llama2c-to-ggml.cpp``
(header layout :221-238, weight order ``checkpoint_init_weights`` :155-185,
shared-classifier convention ``vocab_size > 0`` :898, llama2.c
``tokenizer.bin`` vocab parsing).

llama2.c layout (all f32, row-major):
  header: 7×int32 — dim, hidden_dim, n_layers, n_heads, n_kv_heads,
          vocab_size (NEGATIVE → separate classifier follows), seq_len
  tok_emb (V, D) · rms_att (L, D) · wq (L, D, D) · wk (L, KVD, D) ·
  wv (L, KVD, D) · wo (L, D, D) · rms_ffn (L, D) · w1/gate (L, F, D) ·
  w2/down (L, D, F) · w3/up (L, F, D) · rms_final (D) ·
  freq_cis (seq_len × head_size, skipped) · [wcls (V, D) if unshared]

llama2.c applies rotary to adjacent pairs, i.e. the ggml NORM
(interleaved) layout — weights go into the GGUF unpermuted with the
default llama rope mode (unlike HF conversions, which permute).
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..gguf.constants import Keys


def read_llama2c(path: str) -> tuple[dict, dict]:
    """Parse a llama2.c .bin → (hparams dict, {name: np.ndarray})."""
    with open(path, "rb") as f:
        dim, hidden, n_layers, n_heads, n_kv, vocab, seq_len = struct.unpack(
            "<7i", f.read(28)
        )
        shared = vocab > 0  # negative vocab_size → separate classifier
        vocab = abs(vocab)
        head = dim // n_heads
        kvd = n_kv * head

        def rd(*shape):
            n = int(np.prod(shape))
            a = np.fromfile(f, np.float32, n)
            if a.size != n:
                raise ValueError(f"truncated llama2.c file at {shape}")
            return a.reshape(shape)

        t = {
            "tok_emb": rd(vocab, dim),
            "rms_att": rd(n_layers, dim),
            "wq": rd(n_layers, dim, dim),
            "wk": rd(n_layers, kvd, dim),
            "wv": rd(n_layers, kvd, dim),
            "wo": rd(n_layers, dim, dim),
            "rms_ffn": rd(n_layers, dim),
            "w1": rd(n_layers, hidden, dim),  # gate
            "w2": rd(n_layers, dim, hidden),  # down
            "w3": rd(n_layers, hidden, dim),  # up
            "rms_final": rd(dim),
        }
        f.seek(seq_len * head * 4, 1)  # skip freq_cis real+imag
        t["wcls"] = t["tok_emb"] if shared else rd(vocab, dim)
        tail = f.read(1)
        if tail:
            raise ValueError("llama2.c file has trailing bytes (bad header?)")
    hp = dict(dim=dim, hidden=hidden, n_layers=n_layers, n_heads=n_heads,
              n_kv_heads=n_kv, vocab=vocab, seq_len=seq_len, shared=shared)
    return hp, t


def read_llama2c_tokenizer(path: str, vocab_size: int) -> dict:
    """Parse llama2.c tokenizer.bin → the converter vocab dict
    (SPM-style: id 0 <unk>, 1 BOS, 2 EOS, '<0x..>' as BYTE)."""
    tokens, scores = [], []
    with open(path, "rb") as f:
        struct.unpack("<i", f.read(4))  # max_token_length (unused)
        for _ in range(vocab_size):
            (score,) = struct.unpack("<f", f.read(4))
            (ln,) = struct.unpack("<i", f.read(4))
            tokens.append(f.read(ln).decode("utf-8", errors="replace"))
            scores.append(score)
    types = []
    for i, tok in enumerate(tokens):
        if i == 0:
            types.append(2)  # UNKNOWN
        elif i in (1, 2):
            types.append(3)  # CONTROL (BOS/EOS)
        elif tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
            types.append(6)  # BYTE
        else:
            types.append(1)  # NORMAL
    return {"model": "llama", "tokens": tokens, "scores": scores,
            "token_types": types, "bos": 1, "eos": 2}


def convert_llama2c(model_path: str, tokenizer_vocab: dict, out_path: str,
                    quant_type=GGMLType.F32, rope_base: float = 10000.0):
    """llama2.c .bin + vocab dict → GGUF (llama arch, interleaved rope)."""
    from ..gguf.constants import GGML_BLOCK_SIZES

    hp, t = read_llama2c(model_path)
    L = hp["n_layers"]
    w = GGUFWriter(out_path, "llama")
    w.add_string(Keys.General.NAME, "llama2c-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hp["seq_len"])
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hp["dim"])
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hp["hidden"])
    w.add_uint32(Keys.Attention.HEAD_COUNT, hp["n_heads"])
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, hp["n_kv_heads"])
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, hp["dim"] // hp["n_heads"])
    w.add_float32(Keys.Rope.FREQ_BASE, rope_base)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hp["vocab"])

    tv = tokenizer_vocab
    w.add_string(Keys.Tokenizer.MODEL, tv.get("model", "llama"))
    w.add_array(Keys.Tokenizer.LIST, tv["tokens"])
    if "scores" in tv:
        w.add_array(Keys.Tokenizer.SCORES, np.asarray(tv["scores"], np.float32))
    if "token_types" in tv:
        w.add_array(Keys.Tokenizer.TOKEN_TYPE,
                    np.asarray(tv["token_types"], np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, tv.get("bos", 1))
    w.add_uint32(Keys.Tokenizer.EOS_ID, tv.get("eos", 2))

    def qt(name, arr):
        if arr.ndim == 1 or "norm" in name:
            return GGMLType.F32
        blck, _ = GGML_BLOCK_SIZES[quant_type]
        return quant_type if arr.shape[-1] % blck == 0 else GGMLType.F32

    def add(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), qt(name, arr))

    add("token_embd.weight", t["tok_emb"])
    for i in range(L):
        add(f"blk.{i}.attn_norm.weight", t["rms_att"][i])
        add(f"blk.{i}.attn_q.weight", t["wq"][i])
        add(f"blk.{i}.attn_k.weight", t["wk"][i])
        add(f"blk.{i}.attn_v.weight", t["wv"][i])
        add(f"blk.{i}.attn_output.weight", t["wo"][i])
        add(f"blk.{i}.ffn_norm.weight", t["rms_ffn"][i])
        add(f"blk.{i}.ffn_gate.weight", t["w1"][i])
        add(f"blk.{i}.ffn_down.weight", t["w2"][i])
        add(f"blk.{i}.ffn_up.weight", t["w3"][i])
    add("output_norm.weight", t["rms_final"])
    add("output.weight", t["wcls"])
    w.write()
    return hp


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="convert a llama2.c checkpoint to GGUF "
                    "(llama-convert-llama2c-to-ggml analog)")
    ap.add_argument("--llama2c-model", required=True)
    ap.add_argument("--llama2c-output-model", default="ak_llama_model.gguf")
    ap.add_argument("--copy-vocab-from-model",
                    help="GGUF model to copy the vocab from")
    ap.add_argument("--llama2c-tokenizer",
                    help="llama2.c tokenizer.bin to read the vocab from")
    ap.add_argument("--outtype", default="f32",
                    choices=("f32", "f16", "q8_0"))
    args = ap.parse_args(argv)

    hp, _ = read_llama2c(args.llama2c_model)
    if args.llama2c_tokenizer:
        vocab = read_llama2c_tokenizer(args.llama2c_tokenizer, hp["vocab"])
    elif args.copy_vocab_from_model:
        from ..gguf import GGUFReader

        r = GGUFReader(args.copy_vocab_from_model)
        g = r.metadata
        vocab = {
            "model": g.get("tokenizer.ggml.model", "llama"),
            "tokens": list(g["tokenizer.ggml.tokens"]),
            "scores": list(g.get("tokenizer.ggml.scores",
                                 [0.0] * hp["vocab"])),
            "token_types": list(g.get("tokenizer.ggml.token_type",
                                      [1] * hp["vocab"])),
            "bos": int(g.get("tokenizer.ggml.bos_token_id", 1)),
            "eos": int(g.get("tokenizer.ggml.eos_token_id", 2)),
        }
    else:
        ap.error("need --llama2c-tokenizer or --copy-vocab-from-model")
    qt = {"f32": GGMLType.F32, "f16": GGMLType.F16,
          "q8_0": GGMLType.Q8_0}[args.outtype]
    convert_llama2c(args.llama2c_model, vocab, args.llama2c_output_model, qt)
    print(f"wrote {args.llama2c_output_model}")


if __name__ == "__main__":
    sys.exit(main())
