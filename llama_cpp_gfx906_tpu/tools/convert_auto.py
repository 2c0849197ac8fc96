"""Automatic HF-checkpoint → GGUF conversion (model_type dispatch + vocab).

CLI analog of the reference's ``convert_hf_to_gguf.py`` entrypoint (8,751
LoC; positional model dir, ``--outfile``, ``--outtype``, ``--vocab-only``):

    python -m llama_cpp_gfx906_tpu.tools.convert_auto /path/to/hf \
        --outfile model.gguf --outtype f16

Reads ``config.json`` + ``*.safetensors`` (or ``pytorch_model*.bin``)
without instantiating a transformers model class, extracts the tokenizer
(BPE from ``tokenizer.json``; SPM from ``tokenizer.model`` via a minimal
protobuf walk — no sentencepiece dependency), detects the BPE pretokenizer
family, and dispatches on ``config.model_type`` to the per-architecture
converters in :mod:`.convert_hf`.

The pretokenizer detection deliberately differs from the reference's
chkhsh hash registry (convert_hf_to_gguf.py ``get_vocab_base_pre``): we
match the tokenizer.json Split regexes against the engine's own
``PRE_REGEXES`` table and fall back to structural heuristics, with
``--pre`` as the explicit override.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from ..gguf.constants import GGMLType, Keys, RopeScalingType, TokenType
from ..gguf.writer import GGUFWriter
from . import convert_extra as CE
from . import convert_hf as C

# ---------------------------------------------------------------------------
# HF checkpoint loading (state dict + config shim)
# ---------------------------------------------------------------------------


def _ns(obj):
    """Recursive dict → attribute-access namespace (config.json shim)."""
    if isinstance(obj, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_ns(v) for v in obj]
    return obj


class _HFShim:
    """Looks enough like a transformers model for the converters:
    ``.config`` with attribute access and ``.state_dict()`` → torch
    tensors."""

    def __init__(self, config, state):
        self.config = config
        self._state = state

    def state_dict(self):
        return self._state


def load_hf_dir(path: str | Path) -> _HFShim:
    """Load an HF model directory into a converter-ready shim."""
    path = Path(path)
    cfg_file = path / "config.json"
    if not cfg_file.exists():
        raise FileNotFoundError(f"no config.json under {path}")
    config = _ns(json.loads(cfg_file.read_text()))

    import torch

    state: dict = {}
    st_files = sorted(path.glob("*.safetensors"))
    # sharded checkpoints ship an index; the glob already covers the shards
    st_files = [f for f in st_files if "index" not in f.name]
    if st_files:
        from safetensors.torch import load_file

        for f in st_files:
            state.update(load_file(str(f)))
    else:
        bins = sorted(path.glob("pytorch_model*.bin")) + sorted(path.glob("*.pt"))
        if not bins:
            raise FileNotFoundError(f"no *.safetensors / pytorch_model*.bin under {path}")
        for f in bins:
            state.update(torch.load(str(f), map_location="cpu", weights_only=True))
    # some exports drop the "model." prefix or keep a tied lm_head out
    return _HFShim(config, state)


# ---------------------------------------------------------------------------
# SPM tokenizer.model — minimal protobuf parse (no sentencepiece dep)
# ---------------------------------------------------------------------------


def _walk_proto(data: bytes):
    """Yield (field_no, wire_type, value) triples of one message."""
    i, n = 0, len(data)
    while i < n:
        key, i = _varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _varint(data, i)
        elif wire == 1:  # fixed64
            val = data[i : i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _varint(data, i)
            val = data[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32
            val = data[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, val


def _varint(data: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = data[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def parse_spm_model(data: bytes) -> dict:
    """sentencepiece ModelProto → {tokens, scores, token_types, add_space_prefix}.

    ModelProto: pieces=1 (repeated SentencePiece), normalizer_spec=3;
    SentencePiece: piece=1 (string), score=2 (float), type=3 (enum whose
    values coincide with ggml token types: NORMAL=1 … BYTE=6)."""
    tokens, scores, types = [], [], []
    add_prefix = True
    for field, wire, val in _walk_proto(data):
        if field == 1 and wire == 2:  # SentencePiece
            piece, score, ptype = "", 0.0, int(TokenType.NORMAL)
            for f2, w2, v2 in _walk_proto(val):
                if f2 == 1:
                    piece = v2.decode("utf-8", errors="replace")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            tokens.append(piece)
            scores.append(score)
            types.append(ptype)
        elif field == 3 and wire == 2:  # NormalizerSpec: add_dummy_prefix=3
            for f2, w2, v2 in _walk_proto(val):
                if f2 == 3 and w2 == 0:
                    add_prefix = bool(v2)
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": scores,
        "token_types": types,
        "add_space_prefix": add_prefix,
    }


# ---------------------------------------------------------------------------
# BPE / WPM / UGM from tokenizer.json
# ---------------------------------------------------------------------------


def _collect_split_regexes(pre) -> list[str]:
    if not isinstance(pre, dict):
        return []
    out = []
    if pre.get("type") == "Sequence":
        for p in pre.get("pretokenizers", []):
            out += _collect_split_regexes(p)
    pat = pre.get("pattern")
    if isinstance(pat, dict) and "Regex" in pat:
        out.append(pat["Regex"])
    return out


def detect_pre(tok_json: dict, model_type: str = "") -> str:
    """BPE pretokenizer family from the tokenizer.json Split regexes."""
    from ..tokenizers.bpe import PRE_REGEXES

    regexes = _collect_split_regexes(tok_json.get("pre_tokenizer") or {})
    # match against the engine's own regex table: a family fits when every
    # one of its patterns appears in the tokenizer.json Split regexes (the
    # table folds a trailing `|\s+` into some single-pattern entries); the
    # most specific family (most patterns) wins
    if regexes:
        aug = set(regexes) | {r + r"|\s+" for r in regexes}
        best = None
        for name, pats in PRE_REGEXES.items():
            if name == "default":
                continue
            if all(p in aug for p in pats):
                if best is None or len(pats) > len(PRE_REGEXES[best]):
                    best = name
        if best:
            return best
    joined = "\n".join(regexes)
    # structural fingerprints of the common families
    if "\\p{N}{1,3}" in joined:
        return "llama-bpe"  # llama3-style digit triples
    if "[\\p{Lu}\\p{Lt}\\p{Lm}\\p{Lo}\\p{M}]" in joined:
        return "tekken"
    if "(?i:'s|'t|'re|'ve|'m|'ll|'d)" in joined and "\\p{N}" in joined:
        return "qwen2"
    by_type = {
        "gpt2": "gpt-2",
        "falcon": "falcon",
        "mpt": "mpt",
        "gpt_bigcode": "starcoder",
        "starcoder2": "starcoder",
        "dbrx": "dbrx",
        "jais": "jais",
        "olmo2": "olmo",
        "olmoe": "olmo",
        "cohere": "command-r",
        "cohere2": "command-r",
        "refact": "refact",
        "codeshell": "codeshell",
        "stablelm": "stablelm2",
    }
    if model_type in by_type:
        return by_type[model_type]
    return "gpt-2"


def _vocab_from_tokenizer_json(path: Path, model_type: str, pre: str | None) -> dict:
    tj = json.loads((path / "tokenizer.json").read_text())
    model = tj.get("model", {})
    mtype = model.get("type", "BPE")
    if mtype == "BPE":
        vocab = model["vocab"]
        n = max(vocab.values()) + 1
        tokens = [""] * n
        types = [int(TokenType.NORMAL)] * n
        for tok, idx in vocab.items():
            tokens[idx] = tok
        merges = []
        for m in model.get("merges", []):
            merges.append(m if isinstance(m, str) else " ".join(m))
        for at in tj.get("added_tokens", []):
            idx = at["id"]
            if idx >= len(tokens):
                tokens += [""] * (idx + 1 - len(tokens))
                types += [int(TokenType.NORMAL)] * (idx + 1 - len(types))
            tokens[idx] = at["content"]
            types[idx] = int(TokenType.CONTROL if at.get("special") else TokenType.USER_DEFINED)
        return {
            "model": "gpt2",
            "pre": pre or detect_pre(tj, model_type),
            "tokens": tokens,
            "token_types": types,
            "merges": merges,
        }
    if mtype == "WordPiece":
        vocab = model["vocab"]
        n = max(vocab.values()) + 1
        tokens = [""] * n
        for tok, idx in vocab.items():
            tokens[idx] = tok
        types = [int(TokenType.NORMAL)] * n
        for at in tj.get("added_tokens", []):
            if at.get("special") and at["id"] < n:
                types[at["id"]] = int(TokenType.CONTROL)
        return {"model": "bert", "tokens": tokens, "token_types": types}
    if mtype == "Unigram":
        entries = model["vocab"]  # [token, score] pairs ordered by id
        tokens = [e[0] for e in entries]
        scores = [float(e[1]) for e in entries]
        types = [int(TokenType.NORMAL)] * len(tokens)
        unk = model.get("unk_id")
        if unk is not None:
            types[unk] = int(TokenType.UNKNOWN)
        for at in tj.get("added_tokens", []):
            if at["id"] < len(types):
                types[at["id"]] = int(
                    TokenType.CONTROL if at.get("special") else TokenType.USER_DEFINED
                )
        return {"model": "t5", "tokens": tokens, "scores": scores, "token_types": types}
    raise NotImplementedError(f"tokenizer.json model type {mtype!r}")


def extract_hf_vocab(path: str | Path, pre: str | None = None) -> dict:
    """Tokenizer metadata dict (converter ``tokenizer_vocab`` arg) from an
    HF model dir. Prefers SPM ``tokenizer.model``, then ``tokenizer.json``."""
    path = Path(path)
    cfg = {}
    if (path / "config.json").exists():
        cfg = json.loads((path / "config.json").read_text())
    model_type = cfg.get("model_type", "")

    if (path / "tokenizer.jsonl").exists():
        # PLaMo-2 custom tokenizer: one [token, score, type, ...] JSON
        # list per line (spec: Plamo2Model.set_vocab,
        # convert_hf_to_gguf.py:4019)
        tokens, scores, types = [], [], []
        for line in (path / "tokenizer.jsonl").read_text().splitlines():
            if not line.strip():
                continue
            row = json.loads(line)
            tok = row[0]
            tokens.append(tok)
            scores.append(float(row[1]))
            tstr = row[2] if len(row) > 2 else "NORMAL"
            if tstr == "UNKNOWN":
                types.append(int(TokenType.UNKNOWN))
            elif tstr == "CONTROL" or (tok.startswith("<|plamo:") and tok.endswith("|>")):
                types.append(int(TokenType.CONTROL))
            elif tstr == "BYTE":
                types.append(int(TokenType.BYTE))
            else:
                types.append(int(TokenType.NORMAL))
        vocab_size = int(cfg.get("vocab_size", len(tokens)))
        for i in range(1, vocab_size - len(tokens) + 1):
            tokens.append(f"[PAD{i}]")
            scores.append(-1000.0)
            types.append(int(TokenType.UNUSED))
        tv = {"model": "plamo2", "tokens": tokens, "scores": scores,
              "token_types": types, "eot": 4, "add_space_prefix": False}
    elif (path / "tokenizer.model").exists():
        tv = parse_spm_model((path / "tokenizer.model").read_bytes())
    elif (path / "tokenizer.json").exists():
        tv = _vocab_from_tokenizer_json(path, model_type, pre)
    elif (path / "vocab.txt").exists():
        tokens = (path / "vocab.txt").read_text().splitlines()
        tv = {"model": "bert", "tokens": tokens,
              "token_types": [int(TokenType.NORMAL)] * len(tokens)}
    else:
        raise FileNotFoundError(f"no tokenizer files under {path}")

    tok_cfg = {}
    if (path / "tokenizer_config.json").exists():
        tok_cfg = json.loads((path / "tokenizer_config.json").read_text())

    tok2id = {t: i for i, t in enumerate(tv["tokens"])}

    def _tok_id(spec):
        if spec is None:
            return None
        if isinstance(spec, dict):  # {"content": "<s>", ...}
            spec = spec.get("content")
        return tok2id.get(spec)

    for key, cfg_key in [("bos", "bos_token_id"), ("eos", "eos_token_id"),
                         ("pad", "pad_token_id"), ("sep", "sep_token_id"),
                         ("unk", "unk_token_id"), ("mask", "mask_token_id")]:
        vid = cfg.get(cfg_key)
        if isinstance(vid, list):
            vid = vid[0] if vid else None
        if vid is None:
            vid = _tok_id(tok_cfg.get(cfg_key.replace("_id", "")))
        if vid is not None:
            tv[key] = int(vid)
    for key in ("add_bos_token", "add_eos_token"):
        if key in tok_cfg:
            tv[key.replace("_token", "")] = bool(tok_cfg[key])
    if tok_cfg.get("chat_template") and isinstance(tok_cfg["chat_template"], str):
        tv["chat_template"] = tok_cfg["chat_template"]
    # mark CONTROL on bos/eos for SPM vocabs (HF keeps them typed NORMAL)
    if tv.get("model") == "llama":
        for key in ("bos", "eos", "unk", "pad"):
            tid = tv.get(key)
            if tid is not None and tid < len(tv["token_types"]):
                tv["token_types"][tid] = int(
                    TokenType.UNKNOWN if key == "unk" else TokenType.CONTROL
                )
    return tv


# ---------------------------------------------------------------------------
# model_type dispatch
# ---------------------------------------------------------------------------


def _rope_extra_kv(hf) -> dict:
    """llama-family rope_scaling config → GGUF rope keys."""
    extra = {}
    rs = getattr(hf, "rope_scaling", None)
    if rs is None:
        return extra
    rtype = getattr(rs, "rope_type", None) or getattr(rs, "type", None)
    factor = getattr(rs, "factor", None)
    if rtype in ("linear", "dynamic"):
        extra[Keys.Rope.SCALING_TYPE] = "linear"
        extra[Keys.Rope.SCALING_FACTOR] = float(factor or 1.0)
    elif rtype == "yarn":
        extra[Keys.Rope.SCALING_TYPE] = "yarn"
        extra[Keys.Rope.SCALING_FACTOR] = float(factor or 1.0)
        octx = getattr(rs, "original_max_position_embeddings", None)
        if octx:
            extra[Keys.Rope.SCALING_ORIG_CTX_LEN] = int(octx)
    elif rtype == "llama3":
        # the engine's banded-interpolation path (ops/rope.py) rides the
        # yarn scaling type with orig_ctx + low/high freq factors
        extra[Keys.Rope.SCALING_TYPE] = "yarn"
        extra[Keys.Rope.SCALING_FACTOR] = float(factor or 8.0)
        extra[Keys.Rope.SCALING_LOW_FREQ_FACTOR] = float(getattr(rs, "low_freq_factor", 1.0))
        extra[Keys.Rope.SCALING_HIGH_FREQ_FACTOR] = float(getattr(rs, "high_freq_factor", 4.0))
        extra[Keys.Rope.SCALING_ORIG_CTX_LEN] = int(
            getattr(rs, "original_max_position_embeddings", 8192))
    elif rtype == "longrope":
        extra[Keys.Rope.SCALING_TYPE] = "longrope"
    return extra


def _llama_like(arch: str, **fixed):
    extra_fixed = fixed.pop("extra_kv", {})

    def conv(model, tv, out, quant_type):
        extra = {**_rope_extra_kv(model.config), **extra_fixed}
        return C.convert_hf_llama(model, tv, out, quant_type, arch=arch,
                                  extra_kv=extra or None, **fixed)
    return conv


def _granite_conv(model, tv, out, quant_type):
    hf = model.config
    extra = {
        "granite.logit_scale": getattr(hf, "logits_scaling", 1.0),
        "granite.embedding_scale": getattr(hf, "embedding_multiplier", 1.0),
        "granite.residual_scale": getattr(hf, "residual_multiplier", 1.0),
        "granite.attention.scale": getattr(hf, "attention_multiplier", 1.0),
    }
    return C.convert_hf_llama(model, tv, out, quant_type, arch="granite", extra_kv=extra)


def _gemma_family(arch):
    def conv(model, tv, out, quant_type):
        return C.convert_hf_gemma(model, tv, out, quant_type, arch=arch)
    return conv


# model_type (HF config.json) → converter(model, tokenizer_vocab, out, qt).
# Registered lazily so new converters in convert_hf.py appear automatically.
MODEL_TYPE_MAP: dict = {
    "llama": _llama_like("llama"),
    "mistral": _llama_like("llama"),
    "mixtral": _llama_like("llama"),
    "tinyllama": _llama_like("llama"),
    "smollm3": _llama_like("smollm3"),
    "arcee": _llama_like("arcee"),
    "xverse": _llama_like("xverse"),
    "ernie4_5": _llama_like("ernie4_5"),
    "qwen2": _llama_like("qwen2"),
    "qwen2_moe": _llama_like("qwen2moe"),
    "qwen3": _llama_like("qwen3"),
    "qwen3_moe": _llama_like("qwen3moe"),
    "olmoe": _llama_like("olmoe"),
    "granite": _granite_conv,
    "gemma": _gemma_family("gemma"),
    "gemma2": _gemma_family("gemma2"),
    "gemma3": _gemma_family("gemma3"),
    "gemma3_text": _gemma_family("gemma3"),
    "phi": lambda m, tv, o, q: C.convert_hf_phi(m, tv, o, q),
    "phi3": lambda m, tv, o, q: C.convert_hf_phi3(m, tv, o, q),
    "phimoe": lambda m, tv, o, q: C.convert_hf_phimoe(m, tv, o, q),
    "gpt2": lambda m, tv, o, q: C.convert_hf_gpt2(m, tv, o, q),
    "gptj": lambda m, tv, o, q: C.convert_hf_gptj(m, tv, o, q),
    "starcoder2": lambda m, tv, o, q: C.convert_hf_starcoder2(m, tv, o, q),
    "nemotron": lambda m, tv, o, q: C.convert_hf_nemotron(m, tv, o, q),
    "exaone4": lambda m, tv, o, q: C.convert_hf_exaone4(m, tv, o, q),
    "mpt": lambda m, tv, o, q: C.convert_hf_mpt(m, tv, o, q),
    "bloom": lambda m, tv, o, q: C.convert_hf_bloom(m, tv, o, q),
    "bert": lambda m, tv, o, q: C.convert_hf_bert(m, tv, o, q),
    "t5": lambda m, tv, o, q: C.convert_hf_t5(m, tv, o, q),
    "mamba": lambda m, tv, o, q: C.convert_hf_mamba(m, tv, o, q),
    "mamba2": lambda m, tv, o, q: C.convert_hf_mamba2(m, tv, o, q),
    "jamba": lambda m, tv, o, q: C.convert_hf_jamba(m, tv, o, q),
    "falcon_h1": lambda m, tv, o, q: C.convert_hf_falcon_h1(m, tv, o, q),
    "cohere": lambda m, tv, o, q: C.convert_hf_cohere(m, tv, o, q),
    "cohere2": lambda m, tv, o, q: C.convert_hf_cohere2(m, tv, o, q),
    "olmo2": lambda m, tv, o, q: C.convert_hf_olmo2(m, tv, o, q),
    "deepseek_v2": lambda m, tv, o, q: C.convert_hf_deepseek2(m, tv, o, q),
    "deepseek_v3": lambda m, tv, o, q: C.convert_hf_deepseek2(m, tv, o, q),
    "glm": lambda m, tv, o, q: C.convert_hf_chatglm(m, tv, o, q),
    "chatglm": lambda m, tv, o, q: C.convert_hf_chatglm(m, tv, o, q),
    "glm4": lambda m, tv, o, q: C.convert_hf_glm4(m, tv, o, q),
    "glm4_moe": lambda m, tv, o, q: C.convert_hf_moe_lead(m, tv, o, "glm4moe", q),
    "dots1": lambda m, tv, o, q: C.convert_hf_moe_lead(m, tv, o, "dots1", q),
    "bailing_moe": lambda m, tv, o, q: C.convert_hf_moe_lead(m, tv, o, "bailingmoe", q),
    "ernie4_5_moe": lambda m, tv, o, q: C.convert_hf_moe_lead(m, tv, o, "ernie4_5-moe", q),
    "granitemoe": lambda m, tv, o, q: C.convert_hf_granitemoe(m, tv, o, q),
    "granitemoeshared": lambda m, tv, o, q: C.convert_hf_granitemoe(m, tv, o, q),
    "granitemoehybrid": lambda m, tv, o, q: C.convert_hf_granitehybrid(m, tv, o, q),
    "bamba": lambda m, tv, o, q: C.convert_hf_granitehybrid(m, tv, o, q),
    "minicpm": lambda m, tv, o, q: C.convert_hf_minicpm(m, tv, o, q),
    "dbrx": lambda m, tv, o, q: C.convert_hf_dbrx(m, tv, o, q),
    "gpt_oss": lambda m, tv, o, q: C.convert_hf_gpt_oss(m, tv, o, q),
    "hunyuan_v1_dense": lambda m, tv, o, q: C.convert_hf_hunyuan(m, tv, o, "hunyuan-dense", q),
    "hunyuan_v1_moe": lambda m, tv, o, q: C.convert_hf_hunyuan(m, tv, o, "hunyuan-moe", q),
    "bitnet": lambda m, tv, o, q: C.convert_hf_bitnet(m, tv, o, q),
    "chameleon": lambda m, tv, o, q: C.convert_hf_chameleon(m, tv, o, q),
    "lfm2": lambda m, tv, o, q: C.convert_hf_lfm2(m, tv, o, q),
    "gemma3n": lambda m, tv, o, q: C.convert_hf_gemma3n(m, tv, o, q),
    "qwen": lambda m, tv, o, q: C.convert_hf_qwen_v1(m, tv, o, q),
    "qwen2_vl": lambda m, tv, o, q: C.convert_hf_qwen2vl(m, tv, o, q),
    "llama4": lambda m, tv, o, q: C.convert_hf_llama4(m, tv, o, q),
    # real-HF layouts with non-llama tensor naming (convert_extra.py)
    "exaone": CE.convert_hf_exaone,
    "baichuan": CE.convert_hf_baichuan,
    "orion": CE.convert_hf_orion,
    "stablelm": CE.convert_hf_stablelm,
    "stablelm_epoch": CE.convert_hf_stablelm,
    "internlm2": CE.convert_hf_internlm2,
    "plamo": CE.convert_hf_plamo,
    "gpt_refact": CE.convert_hf_refact,
    "jais": CE.convert_hf_jais,
    "codeshell": CE.convert_hf_codeshell,
    "deepseek": CE.convert_hf_deepseek_v1,
    "llada": CE.convert_hf_llada,
    "dream": CE.convert_hf_dream,
    "falcon": CE.convert_hf_falcon,
    "RefinedWeb": CE.convert_hf_falcon,
    "RefinedWebModel": CE.convert_hf_falcon,
    "gpt_neox": CE.convert_hf_gptneox,
    "gpt_bigcode": CE.convert_hf_gpt_bigcode,
    "olmo": CE.convert_hf_olmo,
    "grok": CE.convert_hf_grok,
    "grok-1": CE.convert_hf_grok,
    "arctic": CE.convert_hf_arctic,
    "smallthinker": CE.convert_hf_smallthinker,
    "openelm": CE.convert_hf_openelm,
    "deci": CE.convert_hf_deci,
    "deci_lm": CE.convert_hf_deci,
    "nemotron-nas": CE.convert_hf_deci,
    "minicpm3": CE.convert_hf_minicpm3,
    "plm": CE.convert_hf_plm,
    "rwkv6": CE.convert_hf_rwkv6,
    "rwkv7": CE.convert_hf_rwkv7,
    "rwkv6qwen2": CE.convert_hf_rwkv6qwen2,
    "rwkv_hybrid": CE.convert_hf_arwkv7,
    "arwkv7": CE.convert_hf_arwkv7,
    "nomic_bert": CE.convert_hf_nomic_bert,
    "neobert": CE.convert_hf_neobert,
    "plamo2": CE.convert_hf_plamo2,
    "roberta": CE.convert_hf_roberta,
    "camembert": CE.convert_hf_roberta,
    "distilbert": CE.convert_hf_distilbert,
    "falcon_mamba": lambda m, tv, o, q: C.convert_hf_mamba(m, tv, o, q, dt_b_c_rms=True),
    "internlm3": _llama_like("llama"),
    "mt5": lambda m, tv, o, q: C.convert_hf_t5(m, tv, o, q),
}

OUTTYPE = {
    "f32": GGMLType.F32,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0,
}


def convert_hf_auto(hf_dir: str | Path, out_path: str, outtype: str = "f16",
                    pre: str | None = None, vocab_only: bool = False) -> str:
    """Convert an HF model directory to GGUF, dispatching on model_type."""
    hf_dir = Path(hf_dir)
    cfg = json.loads((hf_dir / "config.json").read_text()) if (hf_dir / "config.json").exists() else {}
    model_type = cfg.get("model_type", "")
    if "WavTokenizerDec" in (cfg.get("architectures") or []):
        # audio codec: no tokenizer files, no model_type (reference
        # WavTokenizerDecModel registers on the architectures entry)
        return CE.convert_hf_wavtokenizer(load_hf_dir(hf_dir), None, out_path,
                                          OUTTYPE[outtype])
    tv = extract_hf_vocab(hf_dir, pre=pre)
    if vocab_only:
        w = GGUFWriter(out_path, model_type or "llama")
        w.add_string(Keys.General.NAME, hf_dir.name)
        C._write_vocab(w, tv)
        return w.write()
    archs = cfg.get("architectures") or []
    if model_type == "bert" and any("JinaBert" in a for a in archs):
        # jina-bert-v2 ships model_type "bert" with JinaBert* architectures
        conv = CE.convert_hf_jina_bert_v2
    else:
        conv = MODEL_TYPE_MAP.get(model_type)
    if conv is None:
        known = ", ".join(sorted(MODEL_TYPE_MAP))
        raise NotImplementedError(
            f"model_type {model_type!r} has no registered converter (known: {known})")
    shim = load_hf_dir(hf_dir)
    return conv(shim, tv, out_path, OUTTYPE[outtype])


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        "convert_auto", description="Convert a HuggingFace model directory to GGUF")
    ap.add_argument("model", help="path to the HF model directory")
    ap.add_argument("--outfile", default=None, help="output .gguf path")
    ap.add_argument("--outtype", default="f16", choices=sorted(OUTTYPE))
    ap.add_argument("--pre", default=None, help="override BPE pretokenizer family")
    ap.add_argument("--vocab-only", action="store_true", help="write tokenizer-only GGUF")
    args = ap.parse_args(argv)
    out = args.outfile or f"{Path(args.model).name}-{args.outtype}.gguf"
    path = convert_hf_auto(args.model, out, outtype=args.outtype, pre=args.pre,
                           vocab_only=args.vocab_only)
    print(path)


if __name__ == "__main__":
    main()
