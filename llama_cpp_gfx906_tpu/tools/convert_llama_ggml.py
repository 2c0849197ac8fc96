"""Legacy GGML/GGMF/GGJT → GGUF migration.

Analog of the reference's ``convert_llama_ggml_to_gguf.py`` (450 LoC):
parses the three pre-GGUF container generations (magics ``lmgg``/
``fmgg``/``tjgg``), the 7-word llama hyperparameter header, the inline
vocab and the (optionally 32-byte-aligned) tensor records, and rewrites
them under GGUF names.  Tensor bytes are copied verbatim: GGJT v3 block
layouts are identical to GGUF's, so no requantization happens.  Older
generations are convertible only for unquantized types, mirroring the
reference's "Quantizations changed in GGJTv2" guard.

    python -m llama_cpp_gfx906_tpu.tools.convert_llama_ggml model.bin out.gguf
"""

from __future__ import annotations

import argparse
import struct
from dataclasses import dataclass, field

import numpy as np

from ..gguf.constants import GGMLType, Keys, type_size_bytes
from ..gguf.writer import GGUFWriter

MAGICS = {b"lmgg": "ggml", b"fmgg": "ggmf", b"tjgg": "ggjt"}

# legacy llama tensor names → GGUF names
_FIXED = {
    "tok_embeddings.weight": "token_embd.weight",
    "norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
}
_LAYER = {
    "attention.wq.weight": "attn_q.weight",
    "attention.wk.weight": "attn_k.weight",
    "attention.wv.weight": "attn_v.weight",
    "attention.wo.weight": "attn_output.weight",
    "attention_norm.weight": "attn_norm.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}


def map_name(name: str) -> str:
    if name in _FIXED:
        return _FIXED[name]
    if name.startswith("layers."):
        _, idx, rest = name.split(".", 2)
        if rest in _LAYER:
            return f"blk.{idx}.{_LAYER[rest]}"
    raise ValueError(f"unmapped legacy tensor name {name!r}")


@dataclass
class LegacyModel:
    fmt: str = "ggjt"
    version: int = 3
    n_vocab: int = 0
    n_embd: int = 0
    n_mult: int = 0
    n_head: int = 0
    n_layer: int = 0
    n_rot: int = 0
    ftype: int = 0
    tokens: list = field(default_factory=list)
    scores: list = field(default_factory=list)
    tensors: list = field(default_factory=list)  # (name, dims, GGMLType, bytes)


def parse_ggml(data: bytes) -> LegacyModel:
    m = LegacyModel()
    magic = bytes(data[:4])
    if magic == b"GGUF":
        raise ValueError("already a GGUF file")
    if magic not in MAGICS:
        raise ValueError(f"unexpected magic {magic!r}: not a legacy GGML file")
    m.fmt = MAGICS[magic]
    off = 4
    if m.fmt == "ggml":
        m.version = 0
    else:
        (m.version,) = struct.unpack_from("<I", data, off)
        off += 4
    (m.n_vocab, m.n_embd, m.n_mult, m.n_head, m.n_layer, m.n_rot,
     m.ftype) = struct.unpack_from("<7I", data, off)
    off += 28

    quantized_ok = m.fmt == "ggjt" and m.version >= 3
    v2_ok = m.fmt == "ggjt" and m.version == 2

    # vocab: n_vocab × [len:u32, bytes, score:f32 (not in bare ggml)]
    has_scores = m.fmt != "ggml"
    for _ in range(m.n_vocab):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        m.tokens.append(bytes(data[off:off + ln]))
        off += ln
        if has_scores:
            (score,) = struct.unpack_from("<f", data, off)
            off += 4
            m.scores.append(score)
        else:
            m.scores.append(0.0)

    pad = m.fmt == "ggjt"
    while off < len(data):
        n_dims, name_len, dtype = struct.unpack_from("<3I", data, off)
        off += 12
        dims = list(struct.unpack_from(f"<{n_dims}I", data, off))
        off += 4 * n_dims
        name = bytes(data[off:off + name_len]).decode("utf-8")
        off += name_len
        if pad:
            off = (off + 31) & ~31
        t = GGMLType(dtype)
        if t not in (GGMLType.F32, GGMLType.F16):
            if not quantized_ok and not (
                v2_ok and t not in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0)
            ):
                raise ValueError(
                    f"quantized tensor {name!r} ({t.name}) in a "
                    f"{m.fmt.upper()}v{m.version} file: block layouts changed "
                    "in GGJTv2/v3 — only GGJTv3 quantized files convert "
                    "losslessly (reference guard)")
        n_elems = int(np.prod(dims))
        nbytes = type_size_bytes(t, n_elems)
        m.tensors.append((name, dims, t, data[off:off + nbytes]))
        off += nbytes
    return m


def convert(in_path: str, out_path: str, context_length: int = 2048,
            gqa: int = 1, eps: float = 1e-5,
            name: str | None = None) -> str:
    data = np.fromfile(in_path, dtype=np.uint8).tobytes()
    m = parse_ggml(data)

    # n_ff from the layer-0 gate tensor, like the reference
    n_ff = next(dims[1] for tname, dims, _, _ in m.tensors
                if tname == "layers.0.feed_forward.w1.weight")
    n_kv = m.n_head // gqa if gqa > 1 else m.n_head

    w = GGUFWriter(out_path, "llama")
    w.add_string(Keys.General.NAME, name or f"ggml-{m.fmt}v{m.version}-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, context_length)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, m.n_embd)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, m.n_layer)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, n_ff)
    w.add_uint32(Keys.Attention.HEAD_COUNT, m.n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, eps)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, m.n_embd // m.n_head)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, m.n_vocab)

    # vocab: legacy single raw bytes become <0xXX> byte tokens
    tokens, types = [], []
    for tok in m.tokens:
        try:
            text = tok.decode("utf-8")
            types.append(1)  # NORMAL
        except UnicodeDecodeError:
            if len(tok) == 1:
                text = f"<0x{tok[0]:02X}>"
                types.append(6)  # BYTE
            else:
                text = tok.decode("utf-8", errors="replace")
                types.append(1)
        tokens.append(text)
    w.add_string(Keys.Tokenizer.MODEL, "llama")
    w.add_array(Keys.Tokenizer.LIST, tokens)
    w.add_array(Keys.Tokenizer.SCORES, np.asarray(m.scores, np.float32))
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.asarray(types, np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, 1)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 2)
    w.add_uint32(Keys.Tokenizer.UNK_ID, 0)

    for tname, dims, t, raw in m.tensors:
        # legacy dims are (ne0, ne1, ...) — same element order as GGUF ne
        arr = np.frombuffer(raw, dtype=np.uint8)
        w.add_tensor(map_name(tname), arr, t, raw_ne=tuple(dims))
    return w.write()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="convert-llama-ggml (TPU)",
        description="convert legacy GGML/GGMF/GGJT llama files to GGUF")
    ap.add_argument("input", help="legacy .bin model")
    ap.add_argument("output", help="output .gguf")
    ap.add_argument("-c", "--context-length", type=int, default=2048)
    ap.add_argument("--gqa", type=int, default=1,
                    help="GQA factor (8 for llama2-70b)")
    ap.add_argument("--eps", type=float, default=1e-5)
    ap.add_argument("--model-name", default=None)
    args = ap.parse_args(argv)
    out = convert(args.input, args.output, args.context_length, args.gqa,
                  args.eps, args.model_name)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
