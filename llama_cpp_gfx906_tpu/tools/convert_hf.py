"""HF checkpoint → GGUF converter (convert_hf_to_gguf.py capability).

Converts a transformers Llama/Mistral/Qwen2-family model (in memory or from
a local path) into a GGUF file readable by this engine *and* by llama.cpp:
tensor names map to the canonical ``blk.N.*`` scheme and Q/K projections
are permuted from HF half-rotation RoPE layout to the interleaved (ggml
NORM) layout, matching the public GGUF conventions.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-rotation layout → ggml interleaved layout (rows = out dim)."""
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


_LAYER_MAP = [
    ("input_layernorm.weight", "attn_norm.weight"),
    ("self_attn.q_proj.weight", "attn_q.weight"),
    ("self_attn.k_proj.weight", "attn_k.weight"),
    ("self_attn.v_proj.weight", "attn_v.weight"),
    ("self_attn.o_proj.weight", "attn_output.weight"),
    ("self_attn.q_proj.bias", "attn_q.bias"),
    ("self_attn.k_proj.bias", "attn_k.bias"),
    ("self_attn.v_proj.bias", "attn_v.bias"),
    ("self_attn.q_norm.weight", "attn_q_norm.weight"),
    ("self_attn.k_norm.weight", "attn_k_norm.weight"),
    ("post_attention_layernorm.weight", "ffn_norm.weight"),
    ("mlp.gate_proj.weight", "ffn_gate.weight"),
    ("mlp.up_proj.weight", "ffn_up.weight"),
    ("mlp.down_proj.weight", "ffn_down.weight"),
]


def convert_hf_llama(
    model,
    tokenizer_vocab: dict | None,
    out_path: str,
    quant_type: GGMLType = GGMLType.F16,
    arch: str = "llama",
    extra_kv: dict | None = None,
    permute: bool | None = None,  # q/k rope-layout permutation; default by arch
    layer_map: list | None = None,  # override _LAYER_MAP (per-arch tensor names)
    rope_dim: int | None = None,  # partial-rotary archs (stablelm rope_pct)
) -> str:
    """Write a transformers *LlamaForCausalLM-style* model to GGUF.

    ``model`` is the torch module (cpu); ``tokenizer_vocab`` optionally
    carries tokenizer metadata: {"model": "llama", "tokens": [...],
    "scores": [...], "token_types": [...], "bos": id, "eos": id, ...}.
    """
    hf_cfg = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    if permute is None:
        # NEOX-rope archs keep the HF layout; llama-family permutes to the
        # interleaved (ggml NORM) layout
        permute = not arch.startswith(("qwen", "stablelm", "olmo", "gemma"))

    n_head = hf_cfg.num_attention_heads
    n_kv = getattr(hf_cfg, "num_key_value_heads", n_head)
    head_dim = getattr(hf_cfg, "head_dim", None) or hf_cfg.hidden_size // n_head

    w = GGUFWriter(out_path, arch)
    w.add_string(Keys.General.NAME, getattr(hf_cfg, "name_or_path", "") or "hf-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf_cfg.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf_cfg.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf_cfg.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf_cfg.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    eps = next((getattr(hf_cfg, k) for k in
                ("rms_norm_eps", "norm_epsilon", "layer_norm_eps", "layer_norm_epsilon")
                if getattr(hf_cfg, k, None) is not None), 1e-5)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, eps)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, eps)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rope_dim or head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf_cfg, "rope_theta", 10000.0))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf_cfg.vocab_size)

    n_experts = getattr(hf_cfg, "num_local_experts", 0) or getattr(hf_cfg, "num_experts", 0)
    if n_experts:
        w.add_uint32(Keys.LLM.EXPERT_COUNT, n_experts)
        w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf_cfg.num_experts_per_tok)
        if getattr(hf_cfg, "moe_intermediate_size", 0):
            w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, hf_cfg.moe_intermediate_size)
        w.add_bool(Keys.LLM.EXPERT_WEIGHTS_NORM, bool(getattr(hf_cfg, "norm_topk_prob", True)))
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)

    _write_vocab(w, tokenizer_vocab)

    from ..gguf.constants import GGML_BLOCK_SIZES

    def qt(name: str, arr: np.ndarray) -> GGMLType:
        # norms/biases stay f32; rows not divisible by the block fall back
        if arr.ndim == 1 or "norm" in name:
            return GGMLType.F32
        blck, _ = GGML_BLOCK_SIZES[quant_type]
        if arr.shape[-1] % blck:
            return GGMLType.F16
        return quant_type

    emb = state["model.embed_tokens.weight"]
    w.add_tensor("token_embd.weight", emb, qt("token_embd.weight", emb))
    for i in range(hf_cfg.num_hidden_layers):
        for hf_suffix, gg_suffix in (layer_map or _LAYER_MAP):
            hf_name = f"model.layers.{i}.{hf_suffix}"
            if hf_name not in state:
                continue
            arr = state[hf_name]
            # biases permute with their projections (convert_hf_to_gguf.py
            # permutes q_proj/k_proj weight AND bias for NORM-rope archs)
            if permute and gg_suffix in ("attn_q.weight", "attn_q.bias"):
                arr = permute_qk(arr, n_head)
            elif permute and gg_suffix in ("attn_k.weight", "attn_k.bias"):
                arr = permute_qk(arr, n_kv)
            name = f"blk.{i}.{gg_suffix}"
            w.add_tensor(name, arr, qt(name, arr))
        # Qwen2MoE-style block: mlp.gate router + mlp.experts.* + shared expert
        q_gate = f"model.layers.{i}.mlp.gate.weight"
        if q_gate in state:
            w.add_tensor(f"blk.{i}.ffn_gate_inp.weight", state[q_gate], GGMLType.F32)
            n_exp = getattr(hf_cfg, "num_experts", 0)
            for hf_w, gg in [("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"), ("down_proj", "ffn_down_exps")]:
                stackd = np.stack([
                    state[f"model.layers.{i}.mlp.experts.{e}.{hf_w}.weight"]
                    for e in range(n_exp)
                ])
                name = f"blk.{i}.{gg}.weight"
                w.add_tensor(name, stackd, qt(name, stackd))
            sh = f"model.layers.{i}.mlp.shared_expert."
            if sh + "gate_proj.weight" in state:
                w.add_tensor(f"blk.{i}.ffn_gate_shexp.weight", state[sh + "gate_proj.weight"], qt("x", state[sh + "gate_proj.weight"]))
                w.add_tensor(f"blk.{i}.ffn_up_shexp.weight", state[sh + "up_proj.weight"], qt("x", state[sh + "up_proj.weight"]))
                w.add_tensor(f"blk.{i}.ffn_down_shexp.weight", state[sh + "down_proj.weight"], qt("x", state[sh + "down_proj.weight"]))
            shg = f"model.layers.{i}.mlp.shared_expert_gate.weight"
            if shg in state:
                w.add_tensor(f"blk.{i}.ffn_gate_inp_shexp.weight", state[shg], GGMLType.F32)

        # Mixtral-style sparse MoE block → stacked *_exps tensors
        gate_name = f"model.layers.{i}.block_sparse_moe.gate.weight"
        if gate_name in state:
            w.add_tensor(f"blk.{i}.ffn_gate_inp.weight", state[gate_name], GGMLType.F32)
            for hf_w, gg in [("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"), ("w2", "ffn_down_exps")]:
                stackd = np.stack(
                    [
                        state[f"model.layers.{i}.block_sparse_moe.experts.{e}.{hf_w}.weight"]
                        for e in range(n_experts)
                    ]
                )
                name = f"blk.{i}.{gg}.weight"
                w.add_tensor(name, stackd, qt(name, stackd))
    w.add_tensor("output_norm.weight", state["model.norm.weight"], GGMLType.F32)
    if "model.norm.bias" in state:
        w.add_tensor("output_norm.bias", state["model.norm.bias"], GGMLType.F32)
    if "lm_head.weight" in state:
        w.add_tensor("output.weight", state["lm_head.weight"], qt("output.weight", state["lm_head.weight"]))
    return w.write()


def _common_header(w: GGUFWriter, hf_cfg, n_head, n_kv, head_dim, eps_key, eps):
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf_cfg.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf_cfg.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf_cfg.num_hidden_layers)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(eps_key, eps)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf_cfg.vocab_size)


def _write_vocab(w: GGUFWriter, tv: dict | None):
    if not tv:
        return
    w.add_string(Keys.Tokenizer.MODEL, tv.get("model", "llama"))
    w.add_array(Keys.Tokenizer.LIST, tv["tokens"])
    if "scores" in tv:
        w.add_array(Keys.Tokenizer.SCORES, np.asarray(tv["scores"], np.float32))
    if "token_types" in tv:
        w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.asarray(tv["token_types"], np.int32))
    if tv.get("pre"):
        w.add_string(Keys.Tokenizer.PRE, tv["pre"])
    if tv.get("merges"):
        w.add_array(Keys.Tokenizer.MERGES, tv["merges"])
    for key, kv_key in [
        ("bos", Keys.Tokenizer.BOS_ID),
        ("eos", Keys.Tokenizer.EOS_ID),
        ("eot", Keys.Tokenizer.EOT_ID),
        ("sep", Keys.Tokenizer.SEP_ID),
        ("pad", Keys.Tokenizer.PAD_ID),
        ("unk", Keys.Tokenizer.UNK_ID),
        ("mask", Keys.Tokenizer.MASK_ID),
    ]:
        if tv.get(key) is not None:
            w.add_uint32(kv_key, tv[key])
    for key, kv_key in [
        ("add_bos", Keys.Tokenizer.ADD_BOS),
        ("add_eos", Keys.Tokenizer.ADD_EOS),
        ("add_space_prefix", Keys.Tokenizer.ADD_PREFIX),
    ]:
        if tv.get(key) is not None:
            w.add_bool(kv_key, bool(tv[key]))
    if tv.get("chat_template"):
        w.add_string(Keys.Tokenizer.CHAT_TEMPLATE, tv["chat_template"])


def convert_hf_gpt2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers GPT2LMHeadModel → GGUF (arch "gpt2").

    Conv1D weights are stored (in, out) in HF — transposed here to the GGUF
    (out, in) convention; qkv stays fused as attn_qkv (reference:
    llm_build_gpt2 splits it at graph-build time)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "gpt2")
    w.add_string(Keys.General.NAME, "gpt2-convert")
    _common_header(w, hf, n_head, n_head, head_dim, Keys.Attention.LAYERNORM_EPS, hf.layer_norm_epsilon)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, 4 * hf.hidden_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, force_f32=False):
        t = GGMLType.F32 if (force_f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F16
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["transformer.wte.weight"])
    add("position_embd.weight", state["transformer.wpe.weight"], force_f32=True)
    for i in range(hf.num_hidden_layers):
        p = f"transformer.h.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "ln_1.weight"])
        add(b + "attn_norm.bias", state[p + "ln_1.bias"])
        add(b + "attn_qkv.weight", state[p + "attn.c_attn.weight"].T.copy())
        add(b + "attn_qkv.bias", state[p + "attn.c_attn.bias"])
        add(b + "attn_output.weight", state[p + "attn.c_proj.weight"].T.copy())
        add(b + "attn_output.bias", state[p + "attn.c_proj.bias"])
        add(b + "ffn_norm.weight", state[p + "ln_2.weight"])
        add(b + "ffn_norm.bias", state[p + "ln_2.bias"])
        add(b + "ffn_up.weight", state[p + "mlp.c_fc.weight"].T.copy())
        add(b + "ffn_up.bias", state[p + "mlp.c_fc.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.c_proj.weight"].T.copy())
        add(b + "ffn_down.bias", state[p + "mlp.c_proj.bias"])
    add("output_norm.weight", state["transformer.ln_f.weight"])
    add("output_norm.bias", state["transformer.ln_f.bias"])
    return w.write()


def convert_hf_bert(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16, pooling: int = 1) -> str:
    """transformers BertModel / BertForSequenceClassification → GGUF
    (arch "bert", reference: BertModel in convert_hf_to_gguf.py + the
    LLM_ARCH_BERT tensor table).

    Sequence-classification heads map to the rank-head tensors the rerank
    endpoint consumes: ``classifier.dense``→cls, ``classifier(.out_proj)``→
    cls.output; a plain BertModel pooler maps to cls.
    ``pooling``: 1=mean, 2=cls, 3=last ({arch}.pooling_type).
    """
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    # strip the task-model prefix (BertForSequenceClassification → "bert.")
    state = {k[5:] if k.startswith("bert.") else k: v for k, v in state.items()}
    n_head = hf.num_attention_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "bert")
    w.add_string(Keys.General.NAME, "bert-convert")
    _common_header(w, hf, n_head, n_head, head_dim,
                   Keys.Attention.LAYERNORM_EPS, hf.layer_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.LLM.POOLING_TYPE, pooling)
    w.add_bool(Keys.Attention.CAUSAL, False)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, force_f32=False):
        t = GGMLType.F32 if (force_f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F16
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["embeddings.word_embeddings.weight"])
    add("position_embd.weight", state["embeddings.position_embeddings.weight"], force_f32=True)
    if "embeddings.token_type_embeddings.weight" in state:  # absent: distilbert
        add("token_types.weight", state["embeddings.token_type_embeddings.weight"], force_f32=True)
    add("token_embd_norm.weight", state["embeddings.LayerNorm.weight"])
    add("token_embd_norm.bias", state["embeddings.LayerNorm.bias"])
    for i in range(hf.num_hidden_layers):
        p = f"encoder.layer.{i}."
        b = f"blk.{i}."
        add(b + "attn_q.weight", state[p + "attention.self.query.weight"])
        add(b + "attn_q.bias", state[p + "attention.self.query.bias"])
        add(b + "attn_k.weight", state[p + "attention.self.key.weight"])
        add(b + "attn_k.bias", state[p + "attention.self.key.bias"])
        add(b + "attn_v.weight", state[p + "attention.self.value.weight"])
        add(b + "attn_v.bias", state[p + "attention.self.value.bias"])
        add(b + "attn_output.weight", state[p + "attention.output.dense.weight"])
        add(b + "attn_output.bias", state[p + "attention.output.dense.bias"])
        add(b + "attn_output_norm.weight", state[p + "attention.output.LayerNorm.weight"])
        add(b + "attn_output_norm.bias", state[p + "attention.output.LayerNorm.bias"])
        add(b + "ffn_up.weight", state[p + "intermediate.dense.weight"])
        add(b + "ffn_up.bias", state[p + "intermediate.dense.bias"])
        add(b + "ffn_down.weight", state[p + "output.dense.weight"])
        add(b + "ffn_down.bias", state[p + "output.dense.bias"])
        add(b + "layer_output_norm.weight", state[p + "output.LayerNorm.weight"])
        add(b + "layer_output_norm.bias", state[p + "output.LayerNorm.bias"])
    # rank / pooler heads
    if "classifier.dense.weight" in state:  # roberta-style two-stage head
        add("cls.weight", state["classifier.dense.weight"])
        add("cls.bias", state["classifier.dense.bias"])
        if "classifier.out_proj.weight" in state:
            add("cls.output.weight", state["classifier.out_proj.weight"])
            add("cls.output.bias", state["classifier.out_proj.bias"])
    elif "classifier.weight" in state:  # BertForSequenceClassification
        if "pooler.dense.weight" in state:
            add("cls.weight", state["pooler.dense.weight"])
            add("cls.bias", state["pooler.dense.bias"])
        add("cls.output.weight", state["classifier.weight"])
        add("cls.output.bias", state["classifier.bias"])
    elif "pooler.dense.weight" in state:
        add("cls.weight", state["pooler.dense.weight"])
        add("cls.bias", state["pooler.dense.bias"])
    return w.write()


def convert_hf_clip_vision(vision_state: dict, vision_cfg, projector: dict,
                           out_path: str, quant_type=GGMLType.F16,
                           feature_layer: int = -2, proj_dim: int = 0) -> str:
    """CLIP vision tower + llava projector → mmproj GGUF (names per
    tools/mtmd/clip-impl.h TN_*; keys clip.vision.*)."""
    w = GGUFWriter(out_path, "clip")
    w.add_string(Keys.General.NAME, "mmproj-convert")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_string("clip.projector_type", "mlp")
    w.add_uint32("clip.vision.image_size", vision_cfg.image_size)
    w.add_uint32("clip.vision.patch_size", vision_cfg.patch_size)
    w.add_uint32("clip.vision.embedding_length", vision_cfg.hidden_size)
    w.add_uint32("clip.vision.block_count", vision_cfg.num_hidden_layers)
    w.add_uint32("clip.vision.attention.head_count", vision_cfg.num_attention_heads)
    w.add_uint32("clip.vision.feed_forward_length", vision_cfg.intermediate_size)
    w.add_uint32("clip.vision.projection_dim", proj_dim)
    w.add_float32("clip.vision.attention.layer_norm_epsilon", vision_cfg.layer_norm_eps)
    w.add_kv("clip.vision.feature_layer", feature_layer)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim <= 1 or "ln" in name or arr.shape[-1] % 32 else quant_type
        w.add_tensor(name, np.ascontiguousarray(arr), t)

    vm = "vision_model."
    add("v.patch_embd.weight", vision_state[vm + "embeddings.patch_embedding.weight"])
    add("v.class_embd", vision_state[vm + "embeddings.class_embedding"])
    add("v.position_embd.weight", vision_state[vm + "embeddings.position_embedding.weight"])
    add("v.pre_ln.weight", vision_state[vm + "pre_layrnorm.weight"])
    add("v.pre_ln.bias", vision_state[vm + "pre_layrnorm.bias"])
    pairs = [
        ("layer_norm1.weight", "ln1.weight"), ("layer_norm1.bias", "ln1.bias"),
        ("layer_norm2.weight", "ln2.weight"), ("layer_norm2.bias", "ln2.bias"),
        ("self_attn.q_proj.weight", "attn_q.weight"), ("self_attn.q_proj.bias", "attn_q.bias"),
        ("self_attn.k_proj.weight", "attn_k.weight"), ("self_attn.k_proj.bias", "attn_k.bias"),
        ("self_attn.v_proj.weight", "attn_v.weight"), ("self_attn.v_proj.bias", "attn_v.bias"),
        ("self_attn.out_proj.weight", "attn_out.weight"), ("self_attn.out_proj.bias", "attn_out.bias"),
        ("mlp.fc1.weight", "ffn_up.weight"), ("mlp.fc1.bias", "ffn_up.bias"),
        ("mlp.fc2.weight", "ffn_down.weight"), ("mlp.fc2.bias", "ffn_down.bias"),
    ]
    for i in range(vision_cfg.num_hidden_layers):
        for hf_s, gg_s in pairs:
            add(f"v.blk.{i}.{gg_s}", vision_state[f"{vm}encoder.layers.{i}.{hf_s}"])
    for k, name in [("linear_1.weight", "mm.0.weight"), ("linear_1.bias", "mm.0.bias"),
                    ("linear_2.weight", "mm.2.weight"), ("linear_2.bias", "mm.2.bias")]:
        add(name, projector[k])
    return w.write()


def convert_hf_llava(llava_model, tokenizer_vocab, lm_path: str, mmproj_path: str,
                     quant_type=GGMLType.F16) -> tuple[str, str]:
    """transformers LlavaForConditionalGeneration → (LM GGUF, mmproj GGUF)."""
    import re

    full = {k: v.detach().cpu().float().numpy() for k, v in llava_model.state_dict().items()}
    # language model: strip the llava prefix so convert_hf_llama's names match
    lm_state = {}
    for k, v in full.items():
        m = re.match(r"^(?:model\.)?language_model\.(?:model\.)?(.+)$", k)
        if m:
            lm_state["model." + m.group(1)] = v
        elif k in ("lm_head.weight", "language_model.lm_head.weight"):
            lm_state["lm_head.weight"] = v

    class _FakeLM:
        config = llava_model.config.text_config

        @staticmethod
        def state_dict():
            import torch as _t

            return {k: _t.from_numpy(v) for k, v in lm_state.items()}

    convert_hf_llama(_FakeLM, tokenizer_vocab, lm_path, quant_type=quant_type)

    vision_state = {
        re.sub(r"^(?:model\.)?vision_tower\.", "", k): v
        for k, v in full.items()
        if "vision_tower." in k
    }
    projector = {
        re.sub(r"^(?:model\.)?multi_modal_projector\.", "", k): v
        for k, v in full.items()
        if "multi_modal_projector." in k
    }
    convert_hf_clip_vision(
        vision_state,
        llava_model.config.vision_config,
        projector,
        mmproj_path,
        quant_type=quant_type,
        feature_layer=getattr(llava_model.config, "vision_feature_layer", -2),
        proj_dim=llava_model.config.text_config.hidden_size,
    )
    return lm_path, mmproj_path


def convert_hf_gpt_oss(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers GptOssForCausalLM → GGUF (arch "gpt-oss").

    Fused interleaved gate_up expert weights are de-interleaved into
    ffn_gate_exps/ffn_up_exps (+ biases); attention sinks land in
    attn_sinks (reference table: llama-arch.cpp:1976-1993)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", hf.hidden_size // n_head)

    w = GGUFWriter(out_path, "gpt-oss")
    w.add_string(Keys.General.NAME, "gpt-oss-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, hf.num_local_experts)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
    w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Attention.SLIDING_WINDOW, hf.sliding_window or 0)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name or "sinks" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "post_attention_norm.weight", state[p + "post_attention_layernorm.weight"])
        for hf_n, gg in [("q_proj", "attn_q"), ("k_proj", "attn_k"), ("v_proj", "attn_v"), ("o_proj", "attn_output")]:
            add(b + f"{gg}.weight", state[p + f"self_attn.{hf_n}.weight"])
            if p + f"self_attn.{hf_n}.bias" in state:
                add(b + f"{gg}.bias", state[p + f"self_attn.{hf_n}.bias"])
        add(b + "attn_sinks.weight", state[p + "self_attn.sinks"])
        add(b + "ffn_gate_inp.weight", state[p + "mlp.router.weight"])
        add(b + "ffn_gate_inp.bias", state[p + "mlp.router.bias"])
        gu = state[p + "mlp.experts.gate_up_proj"]  # (E, D, 2F) input-major
        gub = state[p + "mlp.experts.gate_up_proj_bias"]  # (E, 2F)
        gate = np.ascontiguousarray(gu[:, :, 0::2].transpose(0, 2, 1))  # (E, F, D)
        up = np.ascontiguousarray(gu[:, :, 1::2].transpose(0, 2, 1))
        add(b + "ffn_gate_exps.weight", gate)
        add(b + "ffn_up_exps.weight", up)
        add(b + "ffn_gate_exps.bias", np.ascontiguousarray(gub[:, 0::2]))
        add(b + "ffn_up_exps.bias", np.ascontiguousarray(gub[:, 1::2]))
        down = state[p + "mlp.experts.down_proj"]  # (E, F, D) input-major
        add(b + "ffn_down_exps.weight", np.ascontiguousarray(down.transpose(0, 2, 1)))
        add(b + "ffn_down_exps.bias", state[p + "mlp.experts.down_proj_bias"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_t5(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers T5ForConditionalGeneration / T5EncoderModel → GGUF
    (arch "t5", or "t5encoder" when the checkpoint has no decoder —
    reference T5EncoderModel registration, convert_hf_to_gguf.py).

    Tensor naming per the reference T5 table (llama-arch.cpp:1452-1489);
    the relative-attention-bias table lives on block 0 only (shared)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    enc_only = not any(k.startswith("decoder.") for k in state)

    w = GGUFWriter(out_path, "t5encoder" if enc_only else "t5")
    w.add_string(Keys.General.NAME, "t5-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 512)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.d_model)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.d_ff)
    w.add_uint32(Keys.Attention.HEAD_COUNT, hf.num_heads)
    w.add_uint32(Keys.Attention.KEY_LENGTH, hf.d_kv)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, hf.d_kv)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.layer_norm_epsilon)
    w.add_uint32("{arch}.attention.relative_buckets_count", hf.relative_attention_num_buckets)
    w.add_uint32("{arch}.decoder_start_token_id", getattr(hf, "decoder_start_token_id", 0) or 0)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name or "rel_b" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["shared.weight"])

    def block(side, hf_side):
        for i in range(hf.num_layers):
            p = f"{hf_side}.block.{i}.layer."
            b = f"{side}.blk.{i}."
            sa = "SelfAttention"
            add(b + "attn_q.weight", state[p + f"0.{sa}.q.weight"])
            add(b + "attn_k.weight", state[p + f"0.{sa}.k.weight"])
            add(b + "attn_v.weight", state[p + f"0.{sa}.v.weight"])
            add(b + "attn_o.weight", state[p + f"0.{sa}.o.weight"])
            add(b + "attn_norm.weight", state[p + "0.layer_norm.weight"])
            if p + f"0.{sa}.relative_attention_bias.weight" in state:
                add(b + "attn_rel_b.weight", state[p + f"0.{sa}.relative_attention_bias.weight"])
            fl = "1" if side == "enc" else "2"
            ff = p + fl + ".DenseReluDense."
            if ff + "wi_0.weight" in state:  # v1.1 gated
                add(b + "ffn_gate.weight", state[ff + "wi_0.weight"])
                add(b + "ffn_up.weight", state[ff + "wi_1.weight"])
            else:
                add(b + "ffn_up.weight", state[ff + "wi.weight"])
            add(b + "ffn_down.weight", state[ff + "wo.weight"])
            add(b + "ffn_norm.weight", state[p + fl + ".layer_norm.weight"])
            if side == "dec":
                ca = "EncDecAttention"
                add(b + "cross_attn_q.weight", state[p + f"1.{ca}.q.weight"])
                add(b + "cross_attn_k.weight", state[p + f"1.{ca}.k.weight"])
                add(b + "cross_attn_v.weight", state[p + f"1.{ca}.v.weight"])
                add(b + "cross_attn_o.weight", state[p + f"1.{ca}.o.weight"])
                add(b + "cross_attn_norm.weight", state[p + "1.layer_norm.weight"])

    block("enc", "encoder")
    add("enc.output_norm.weight", state["encoder.final_layer_norm.weight"])
    if not enc_only:
        block("dec", "decoder")
        add("dec.output_norm.weight", state["decoder.final_layer_norm.weight"])
    if "lm_head.weight" in state and not np.array_equal(state["lm_head.weight"], state["shared.weight"]):
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_deepseek2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16,
                         arch: str = "deepseek2") -> str:
    """transformers DeepseekV2ForCausalLM → GGUF (arch "deepseek2").

    Follows the reference converter's MLA transforms
    (convert_hf_to_gguf.py DeepseekV2Model): kv_b_proj splits into
    attn_k_b (per-head, transposed to (rank, nope)) and attn_v_b;
    metadata key/value lengths describe the compressed MQA view.
    ``arch="minicpm3"`` reuses the layout (MiniCPM3Model spec) plus
    longrope factor tensors (rope_factors_{long,short}.weight)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    H = hf.num_attention_heads
    rope_d = hf.qk_rope_head_dim
    nope_d = hf.qk_nope_head_dim
    v_d = hf.v_head_dim
    rank = hf.kv_lora_rank

    w = GGUFWriter(out_path, arch)
    w.add_string(Keys.General.NAME, f"{arch}-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, 1)  # MLA == MQA over the latent
    w.add_uint32(Keys.Attention.KEY_LENGTH, rank + rope_d)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, rank)
    w.add_uint32(Keys.Attention.KEY_LENGTH_MLA, nope_d + rope_d)
    w.add_uint32(Keys.Attention.VALUE_LENGTH_MLA, v_d)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    if getattr(hf, "q_lora_rank", None):
        w.add_uint32(Keys.Attention.Q_LORA_RANK, hf.q_lora_rank)
    w.add_uint32(Keys.Attention.KV_LORA_RANK, rank)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rope_d)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, getattr(hf, "first_k_dense_replace", 0))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    n_experts = getattr(hf, "n_routed_experts", 0) or 0
    if n_experts:
        w.add_uint32(Keys.LLM.EXPERT_COUNT, n_experts)
        w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
        w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, hf.moe_intermediate_size)
        w.add_uint32(Keys.LLM.EXPERT_SHARED_COUNT, getattr(hf, "n_shared_experts", 0) or 0)
        w.add_float32(Keys.LLM.EXPERT_WEIGHTS_SCALE, getattr(hf, "routed_scaling_factor", 1.0))
        w.add_bool(Keys.LLM.EXPERT_WEIGHTS_NORM, bool(getattr(hf, "norm_topk_prob", False)))
        w.add_uint32(Keys.LLM.EXPERT_GATING_FUNC,
                     2 if getattr(hf, "scoring_func", "softmax") == "sigmoid" else 1)
    rs = getattr(hf, "rope_scaling", None)
    if rs is not None:
        lf = rs.get("long_factor") if isinstance(rs, dict) else getattr(rs, "long_factor", None)
        sf = rs.get("short_factor") if isinstance(rs, dict) else getattr(rs, "short_factor", None)
        octx = (rs.get("original_max_position_embeddings") if isinstance(rs, dict)
                else getattr(rs, "original_max_position_embeddings", None))
        if lf and sf:
            w.add_string(Keys.Rope.SCALING_TYPE, "longrope")
            if octx:
                w.add_uint32(Keys.Rope.SCALING_ORIG_CTX_LEN, int(octx))
    else:
        lf = sf = None
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    if lf and sf:
        w.add_tensor("rope_factors_long.weight", np.asarray(lf, np.float32), GGMLType.F32)
        w.add_tensor("rope_factors_short.weight", np.asarray(sf, np.float32), GGMLType.F32)
    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        if p + "self_attn.q_proj.weight" in state:  # lite
            add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        else:
            add(b + "attn_q_a.weight", state[p + "self_attn.q_a_proj.weight"])
            add(b + "attn_q_a_norm.weight", state[p + "self_attn.q_a_layernorm.weight"])
            add(b + "attn_q_b.weight", state[p + "self_attn.q_b_proj.weight"])
        add(b + "attn_kv_a_mqa.weight", state[p + "self_attn.kv_a_proj_with_mqa.weight"])
        add(b + "attn_kv_a_norm.weight", state[p + "self_attn.kv_a_layernorm.weight"])
        kv_b = state[p + "self_attn.kv_b_proj.weight"].reshape(H, nope_d + v_d, rank)
        k_b = np.ascontiguousarray(kv_b[:, :nope_d, :].transpose(0, 2, 1))  # (H, rank, nope)
        v_b = np.ascontiguousarray(kv_b[:, nope_d:, :])  # (H, v, rank)
        add(b + "attn_k_b.weight", k_b)
        add(b + "attn_v_b.weight", v_b)
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        if p + "mlp.gate_proj.weight" in state:  # dense layer
            add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
        else:  # MoE layer
            add(b + "ffn_gate_inp.weight", state[p + "mlp.gate.weight"])
            if p + "mlp.gate.e_score_correction_bias" in state:
                add(b + "exp_probs_b.bias", state[p + "mlp.gate.e_score_correction_bias"])
            for hf_n, gg in [("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"), ("down_proj", "ffn_down_exps")]:
                stackd = np.stack([
                    state[f"{p}mlp.experts.{e}.{hf_n}.weight"] for e in range(n_experts)
                ])
                add(b + gg + ".weight", stackd)
            add(b + "ffn_gate_shexp.weight", state[p + "mlp.shared_experts.gate_proj.weight"])
            add(b + "ffn_up_shexp.weight", state[p + "mlp.shared_experts.up_proj.weight"])
            add(b + "ffn_down_shexp.weight", state[p + "mlp.shared_experts.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_phi3(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Phi3ForCausalLM → GGUF (arch "phi3") keeping the fused
    attn_qkv and gate||up ffn_up tensors (the official phi-3 GGUF layout;
    runtime/weights.effective_tensors splits them at load)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "phi3")
    w.add_string(Keys.General.NAME, "phi3-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "attn_qkv.weight", state[p + "self_attn.qkv_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.gate_up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_gemma(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16,
                     arch: str = "gemma2") -> str:
    """transformers Gemma2/Gemma3 → GGUF.

    Gemma RMSNorms compute (1 + w): the converter adds 1 to every norm
    weight (same transform as the reference's GemmaModel.modify_tensors);
    NEOX rope — no q/k permutation."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", hf.hidden_size // n_head)

    w = GGUFWriter(out_path, arch)
    w.add_string(Keys.General.NAME, f"{arch}-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32(Keys.Attention.SLIDING_WINDOW, hf.sliding_window or 0)
    w.add_float32(Keys.Attention.SCALE, float(hf.query_pre_attn_scalar) ** -0.5)
    if arch == "gemma3":
        w.add_float32("{arch}.rope.local_freq_base", getattr(hf, "rope_local_base_freq", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        if "norm" in name:
            arr = arr + 1.0  # gemma (1 + w) convention
            w.add_tensor(name, arr, GGMLType.F32)
            return
        t = GGMLType.F32 if arr.ndim == 1 else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    pairs = [
        ("input_layernorm.weight", "attn_norm.weight"),
        ("post_attention_layernorm.weight", "post_attention_norm.weight"),
        ("pre_feedforward_layernorm.weight", "ffn_norm.weight"),
        ("post_feedforward_layernorm.weight", "post_ffw_norm.weight"),
        ("self_attn.q_proj.weight", "attn_q.weight"),
        ("self_attn.k_proj.weight", "attn_k.weight"),
        ("self_attn.v_proj.weight", "attn_v.weight"),
        ("self_attn.o_proj.weight", "attn_output.weight"),
        ("self_attn.q_norm.weight", "attn_q_norm.weight"),
        ("self_attn.k_norm.weight", "attn_k_norm.weight"),
        ("mlp.gate_proj.weight", "ffn_gate.weight"),
        ("mlp.up_proj.weight", "ffn_up.weight"),
        ("mlp.down_proj.weight", "ffn_down.weight"),
    ]
    for i in range(hf.num_hidden_layers):
        for hf_s, gg_s in pairs:
            name = f"model.layers.{i}.{hf_s}"
            if name in state:
                add(f"blk.{i}.{gg_s}", state[name])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state and not np.array_equal(
        state["lm_head.weight"], state["model.embed_tokens.weight"]
    ):
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_olmo2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Olmo2ForCausalLM → GGUF (arch "olmo2"):
    post-norm blocks, full-width q/k norms, NEOX rope (no permutation)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = getattr(hf, "num_key_value_heads", n_head)
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "olmo2")
    w.add_string(Keys.General.NAME, "olmo2-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    pairs = [
        ("self_attn.q_proj.weight", "attn_q.weight"),
        ("self_attn.k_proj.weight", "attn_k.weight"),
        ("self_attn.v_proj.weight", "attn_v.weight"),
        ("self_attn.o_proj.weight", "attn_output.weight"),
        ("self_attn.q_norm.weight", "attn_q_norm.weight"),
        ("self_attn.k_norm.weight", "attn_k_norm.weight"),
        ("post_attention_layernorm.weight", "post_attention_norm.weight"),
        ("post_feedforward_layernorm.weight", "post_ffw_norm.weight"),
        ("mlp.gate_proj.weight", "ffn_gate.weight"),
        ("mlp.up_proj.weight", "ffn_up.weight"),
        ("mlp.down_proj.weight", "ffn_down.weight"),
    ]
    for i in range(hf.num_hidden_layers):
        for hf_s, gg_s in pairs:
            name = f"model.layers.{i}.{hf_s}"
            if name in state:
                add(f"blk.{i}.{gg_s}", state[name])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_cohere(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers CohereForCausalLM → GGUF (arch "command-r").

    Shared-norm parallel residual; interleaved rope (no q/k permutation
    needed — Cohere's checkpoint layout matches ggml NORM mode)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "command-r")
    w.add_string(Keys.General.NAME, "commandr-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_EPS, hf.layer_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_float32(Keys.LLM.LOGIT_SCALE, hf.logit_scale)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_jamba(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers JambaForCausalLM → GGUF (arch "jamba").

    Hybrid layers: mamba blocks (with dt/B/C norms) interleaved with
    rope-less attention; dense or MoE FFN per layer (tensor table:
    llama-arch.cpp:1075-1100)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "jamba")
    w.add_string(Keys.General.NAME, "jamba-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, getattr(hf, "max_position_embeddings", 4096))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.SSM.CONV_KERNEL, hf.mamba_d_conv)
    w.add_uint32(Keys.SSM.INNER_SIZE, hf.mamba_expand * hf.hidden_size)
    w.add_uint32(Keys.SSM.STATE_SIZE, hf.mamba_d_state)
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, hf.mamba_dt_rank)
    if getattr(hf, "num_experts", 1) > 1:
        w.add_uint32(Keys.LLM.EXPERT_COUNT, hf.num_experts)
        w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        t = GGMLType.F32 if (f32 or arr.ndim == 1 or "norm" in name) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "pre_ff_layernorm.weight"])
        if p + "mamba.in_proj.weight" in state:
            add(b + "ssm_in.weight", state[p + "mamba.in_proj.weight"])
            add(b + "ssm_conv1d.weight", state[p + "mamba.conv1d.weight"].squeeze(1), f32=True)
            if p + "mamba.conv1d.bias" in state:
                add(b + "ssm_conv1d.bias", state[p + "mamba.conv1d.bias"])
            add(b + "ssm_x.weight", state[p + "mamba.x_proj.weight"])
            add(b + "ssm_dt.weight", state[p + "mamba.dt_proj.weight"])
            add(b + "ssm_dt.bias", state[p + "mamba.dt_proj.bias"])
            add(b + "ssm_a", -np.exp(state[p + "mamba.A_log"]), f32=True)
            add(b + "ssm_d", state[p + "mamba.D"], f32=True)
            add(b + "ssm_out.weight", state[p + "mamba.out_proj.weight"])
            add(b + "ssm_dt_norm.weight", state[p + "mamba.dt_layernorm.weight"])
            add(b + "ssm_b_norm.weight", state[p + "mamba.b_layernorm.weight"])
            add(b + "ssm_c_norm.weight", state[p + "mamba.c_layernorm.weight"])
        else:
            add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
            add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
            add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
            add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        if p + "feed_forward.router.weight" in state:  # MoE layer
            add(b + "ffn_gate_inp.weight", state[p + "feed_forward.router.weight"])
            n_exp = hf.num_experts
            for hf_n, gg in [("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"), ("down_proj", "ffn_down_exps")]:
                stackd = np.stack([
                    state[f"{p}feed_forward.experts.{e}.{hf_n}.weight"] for e in range(n_exp)
                ])
                add(b + gg + ".weight", stackd)
        else:
            add(b + "ffn_gate.weight", state[p + "feed_forward.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "feed_forward.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "feed_forward.down_proj.weight"])
    add("output_norm.weight", state["model.final_layernorm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_mamba(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16,
                     dt_b_c_rms: bool = False) -> str:
    """transformers MambaForCausalLM / FalconMambaForCausalLM → GGUF
    (arch "mamba").

    Mirrors the reference converter's transforms (convert_hf_to_gguf.py
    MambaModel, which also registers FalconMambaForCausalLM): A_log →
    -exp(A_log), conv1d weight squeezed to (d_inner, K); falcon-mamba
    additionally sets the {arch}.ssm.dt_b_c_rms flag (unweighted rms on
    the dt/B/C splits, convert_hf_to_gguf.py:5541)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    w = GGUFWriter(out_path, "mamba")
    w.add_string(Keys.General.NAME, "mamba-convert")
    if dt_b_c_rms:
        w.add_bool(Keys.SSM.DT_B_C_RMS, True)
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 2**20)  # recurrent: unbounded
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, 0)
    w.add_uint32(Keys.Attention.HEAD_COUNT, 0)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.layer_norm_epsilon)
    w.add_uint32(Keys.SSM.CONV_KERNEL, hf.conv_kernel)
    w.add_uint32(Keys.SSM.INNER_SIZE, hf.intermediate_size)
    w.add_uint32(Keys.SSM.STATE_SIZE, hf.state_size)
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, hf.time_step_rank)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        t = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["backbone.embeddings.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"backbone.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "norm.weight"])
        add(b + "ssm_in.weight", state[p + "mixer.in_proj.weight"])
        add(b + "ssm_conv1d.weight", state[p + "mixer.conv1d.weight"].squeeze(1), f32=True)
        if p + "mixer.conv1d.bias" in state:
            add(b + "ssm_conv1d.bias", state[p + "mixer.conv1d.bias"])
        add(b + "ssm_x.weight", state[p + "mixer.x_proj.weight"])
        add(b + "ssm_dt.weight", state[p + "mixer.dt_proj.weight"])
        add(b + "ssm_dt.bias", state[p + "mixer.dt_proj.bias"])
        add(b + "ssm_a", -np.exp(state[p + "mixer.A_log"]), f32=True)
        add(b + "ssm_d", state[p + "mixer.D"], f32=True)
        add(b + "ssm_out.weight", state[p + "mixer.out_proj.weight"])
    add("output_norm.weight", state["backbone.norm_f.weight"])
    if "lm_head.weight" in state and not np.array_equal(
        state["lm_head.weight"], state["backbone.embeddings.weight"]
    ):
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_mamba2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Mamba2ForCausalLM → GGUF (arch "mamba2").

    Mirrors the reference converter (convert_hf_to_gguf.py Mamba2Model):
    A_log → -exp(A_log) reshaped (H, 1), D reshaped (H, 1), conv1d weight
    squeezed, ssm_norm reshaped (G, d_inner/G), dt_rank key carries the
    head count."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    d_inner = getattr(hf, "intermediate_size", None) or 2 * hf.hidden_size
    n_group = getattr(hf, "n_groups", 1)
    n_head = getattr(hf, "num_heads", d_inner // getattr(hf, "head_dim", 64))

    w = GGUFWriter(out_path, "mamba2")
    w.add_string(Keys.General.NAME, "mamba2-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 2**20)  # recurrent: unbounded
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, 0)
    w.add_uint32(Keys.Attention.HEAD_COUNT, 0)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, getattr(hf, "layer_norm_epsilon", 1e-5))
    w.add_uint32(Keys.SSM.CONV_KERNEL, getattr(hf, "conv_kernel", 4))
    w.add_uint32(Keys.SSM.STATE_SIZE, getattr(hf, "state_size", 128))
    w.add_uint32(Keys.SSM.INNER_SIZE, d_inner)
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, n_head)
    w.add_uint32(Keys.SSM.GROUP_COUNT, n_group)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        t = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["backbone.embeddings.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"backbone.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "norm.weight"])
        add(b + "ssm_in.weight", state[p + "mixer.in_proj.weight"])
        add(b + "ssm_conv1d.weight", state[p + "mixer.conv1d.weight"].squeeze(1), f32=True)
        if p + "mixer.conv1d.bias" in state:
            add(b + "ssm_conv1d.bias", state[p + "mixer.conv1d.bias"])
        add(b + "ssm_dt.bias", state[p + "mixer.dt_bias"])
        add(b + "ssm_a", -np.exp(state[p + "mixer.A_log"]).reshape(n_head, 1), f32=True)
        add(b + "ssm_d", state[p + "mixer.D"].reshape(n_head, 1), f32=True)
        add(b + "ssm_norm.weight", state[p + "mixer.norm.weight"].reshape(n_group, d_inner // n_group), f32=True)
        add(b + "ssm_out.weight", state[p + "mixer.out_proj.weight"])
    add("output_norm.weight", state["backbone.norm_f.weight"])
    if "lm_head.weight" in state and not np.array_equal(
        state["lm_head.weight"], state["backbone.embeddings.weight"]
    ):
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_mpt(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers MptForCausalLM → GGUF (arch "mpt"): ALiBi, bias-free
    LayerNorms, fused Wqkv (plain [q;k;v] rows — split by the loader),
    ungated GELU FFN."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    D = hf.d_model
    n_head = hf.n_heads

    w = GGUFWriter(out_path, "mpt")
    w.add_string(Keys.General.NAME, "mpt-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_seq_len)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.n_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.expansion_ratio * D)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_head)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, 1e-5)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        tq = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, tq)

    add("token_embd.weight", state["transformer.wte.weight"])
    for i in range(hf.n_layers):
        p = f"transformer.blocks.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "norm_1.weight"])
        add(b + "ffn_norm.weight", state[p + "norm_2.weight"])
        add(b + "attn_qkv.weight", state[p + "attn.Wqkv.weight"])
        add(b + "attn_output.weight", state[p + "attn.out_proj.weight"])
        add(b + "ffn_up.weight", state[p + "ffn.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "ffn.down_proj.weight"])
    add("output_norm.weight", state["transformer.norm_f.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_bloom(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers BloomForCausalLM → GGUF (arch "bloom"): ALiBi, biased
    LayerNorms + post-embedding norm, per-head-interleaved fused qkv
    de-interleaved into attn_{q,k,v} (reference convert: BloomModel
    reshapes (H, 3, dh, D))."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    D = hf.hidden_size
    H = hf.n_head
    dh = D // H

    w = GGUFWriter(out_path, "bloom")
    w.add_string(Keys.General.NAME, "bloom-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 2048)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.n_layer)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, 4 * D)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, hf.layer_norm_epsilon)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        tq = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, tq)

    add("token_embd.weight", state["transformer.word_embeddings.weight"])
    add("token_embd_norm.weight", state["transformer.word_embeddings_layernorm.weight"])
    add("token_embd_norm.bias", state["transformer.word_embeddings_layernorm.bias"])
    for i in range(hf.n_layer):
        p = f"transformer.h.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_norm.bias", state[p + "input_layernorm.bias"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_norm.bias", state[p + "post_attention_layernorm.bias"])
        qkv = state[p + "self_attention.query_key_value.weight"].reshape(H, 3, dh, D)
        qkv_b = state[p + "self_attention.query_key_value.bias"].reshape(H, 3, dh)
        add(b + "attn_q.weight", np.ascontiguousarray(qkv[:, 0].reshape(D, D)))
        add(b + "attn_k.weight", np.ascontiguousarray(qkv[:, 1].reshape(D, D)))
        add(b + "attn_v.weight", np.ascontiguousarray(qkv[:, 2].reshape(D, D)))
        add(b + "attn_q.bias", np.ascontiguousarray(qkv_b[:, 0].reshape(D)))
        add(b + "attn_k.bias", np.ascontiguousarray(qkv_b[:, 1].reshape(D)))
        add(b + "attn_v.bias", np.ascontiguousarray(qkv_b[:, 2].reshape(D)))
        add(b + "attn_output.weight", state[p + "self_attention.dense.weight"])
        add(b + "attn_output.bias", state[p + "self_attention.dense.bias"])
        add(b + "ffn_up.weight", state[p + "mlp.dense_h_to_4h.weight"])
        add(b + "ffn_up.bias", state[p + "mlp.dense_h_to_4h.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.dense_4h_to_h.weight"])
        add(b + "ffn_down.bias", state[p + "mlp.dense_4h_to_h.bias"])
    add("output_norm.weight", state["transformer.ln_f.weight"])
    add("output_norm.bias", state["transformer.ln_f.bias"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_granitehybrid(model, tokenizer_vocab, out_path: str,
                             quant_type=GGMLType.F16) -> str:
    """transformers GraniteMoeHybridForCausalLM → GGUF ("granitehybrid").

    Interleaved mamba2/attention layers: the per-layer ``head_count_kv``
    array marks recurrent layers with 0 (reference hparams rule);
    mamba2 tensors get the Mamba2Model transforms (A → -exp(A_log) (H,1),
    ssm_norm (G, d_inner/G)); the fused shared_mlp input_linear splits
    into ffn_gate|ffn_up.  Granite multipliers ride metadata keys."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    d_inner = getattr(hf, "mamba_d_ssm", None) or hf.mamba_expand * hf.hidden_size
    n_group = hf.mamba_n_groups
    mamba_heads = hf.mamba_n_heads
    # Bamba names the per-layer schedule layers_block_type
    layer_types = list(getattr(hf, "layer_types", None)
                       or getattr(hf, "layers_block_type"))
    shared_ff = getattr(hf, "shared_intermediate_size", 0)

    w = GGUFWriter(out_path, "granitehybrid")
    w.add_string(Keys.General.NAME, "granitehybrid-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, shared_ff or hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_array(Keys.Attention.HEAD_COUNT_KV,
                np.asarray([n_kv if t == "attention" else 0 for t in layer_types], np.int32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_float32(Keys.LLM.EMBEDDING_SCALE, getattr(hf, "embedding_multiplier", 1.0))
    w.add_float32(Keys.LLM.RESIDUAL_SCALE, getattr(hf, "residual_multiplier", 1.0))
    w.add_float32(Keys.LLM.ATTENTION_SCALE, getattr(hf, "attention_multiplier", 0.0))
    w.add_float32(Keys.LLM.LOGIT_SCALE, getattr(hf, "logits_scaling", 1.0))
    w.add_uint32(Keys.SSM.CONV_KERNEL, hf.mamba_d_conv)
    w.add_uint32(Keys.SSM.STATE_SIZE, hf.mamba_d_state)
    w.add_uint32(Keys.SSM.INNER_SIZE, d_inner)
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, mamba_heads)
    w.add_uint32(Keys.SSM.GROUP_COUNT, n_group)
    n_exp = getattr(hf, "num_local_experts", 0)
    if n_exp:
        w.add_uint32(Keys.LLM.EXPERT_COUNT, n_exp)
        w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
        w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, hf.intermediate_size)
        w.add_bool(Keys.LLM.EXPERT_WEIGHTS_NORM, True)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        tq = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, tq)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        # Bamba names the FFN norm pre_ff_layernorm
        add(b + "ffn_norm.weight",
            state.get(p + "post_attention_layernorm.weight",
                      state.get(p + "pre_ff_layernorm.weight")))
        if layer_types[i] == "mamba":
            add(b + "ssm_in.weight", state[p + "mamba.in_proj.weight"])
            add(b + "ssm_conv1d.weight", state[p + "mamba.conv1d.weight"].squeeze(1), f32=True)
            if p + "mamba.conv1d.bias" in state:
                add(b + "ssm_conv1d.bias", state[p + "mamba.conv1d.bias"])
            add(b + "ssm_dt.bias", state[p + "mamba.dt_bias"])
            add(b + "ssm_a", -np.exp(state[p + "mamba.A_log"]).reshape(mamba_heads, 1), f32=True)
            add(b + "ssm_d", state[p + "mamba.D"].reshape(mamba_heads, 1), f32=True)
            if p + "mamba.norm.weight" in state:
                add(b + "ssm_norm.weight",
                    state[p + "mamba.norm.weight"].reshape(n_group, d_inner // n_group), f32=True)
            add(b + "ssm_out.weight", state[p + "mamba.out_proj.weight"])
        else:
            add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
            add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
            add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
            add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        if p + "block_sparse_moe.router.layer.weight" in state:  # MoE layer
            add(b + "ffn_gate_inp.weight", state[p + "block_sparse_moe.router.layer.weight"], f32=True)
            inp = state[p + "block_sparse_moe.input_linear.weight"]  # (E, 2ff, D)
            ff = inp.shape[1] // 2
            add(b + "ffn_gate_exps.weight", np.ascontiguousarray(inp[:, :ff]))
            add(b + "ffn_up_exps.weight", np.ascontiguousarray(inp[:, ff:]))
            add(b + "ffn_down_exps.weight", state[p + "block_sparse_moe.output_linear.weight"])
            sh = state[p + "shared_mlp.input_linear.weight"]
            sff = sh.shape[0] // 2
            add(b + "ffn_gate_shexp.weight", np.ascontiguousarray(sh[:sff]))
            add(b + "ffn_up_shexp.weight", np.ascontiguousarray(sh[sff:]))
            add(b + "ffn_down_shexp.weight", state[p + "shared_mlp.output_linear.weight"])
        elif p + "shared_mlp.input_linear.weight" in state:
            sh = state[p + "shared_mlp.input_linear.weight"]  # (2ff, D)
            sff = sh.shape[0] // 2
            add(b + "ffn_gate.weight", np.ascontiguousarray(sh[:sff]))
            add(b + "ffn_up.weight", np.ascontiguousarray(sh[sff:]))
            add(b + "ffn_down.weight", state[p + "shared_mlp.output_linear.weight"])
        else:  # Bamba: plain llama-style MLP under feed_forward.*
            add(b + "ffn_gate.weight", state[p + "feed_forward.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "feed_forward.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "feed_forward.down_proj.weight"])
    add("output_norm.weight",
        state.get("model.norm.weight", state.get("model.final_layernorm.weight")))
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_hunyuan(model, tokenizer_vocab, out_path: str, arch: str = "hunyuan-moe",
                       quant_type=GGMLType.F16) -> str:
    """transformers HunYuanMoEV1/HunYuanDenseV1 → GGUF ("hunyuan-moe" /
    "hunyuan-dense"): NEOX rope, post-rope per-head qk norms; the MoE
    variant routes softmax-top-k beside an always-on shared expert.
    Implemented by renaming the state dict into the qwen2moe shapes the
    generic llama converter already emits."""
    import copy as _copy

    hf = _copy.copy(model.config)
    if getattr(hf, "moe_topk", None) is not None and not isinstance(getattr(hf, "moe_topk", 0), int):
        hf.moe_topk = int(hf.moe_topk[0])
    if not getattr(hf, "num_experts_per_tok", 0):
        hf.num_experts_per_tok = int(getattr(hf, "moe_topk", 0) or 0)

    state = {}
    for k, v in model.state_dict().items():
        k = (k.replace("mlp.gate.wg.weight", "mlp.gate.weight")
              .replace("mlp.shared_mlp.", "mlp.shared_expert.")
              .replace("self_attn.query_layernorm.", "self_attn.q_norm.")
              .replace("self_attn.key_layernorm.", "self_attn.k_norm."))
        state[k] = v.detach().cpu().float()

    class _Shim:
        config = hf

        @staticmethod
        def state_dict():
            return state

    return convert_hf_llama(_Shim, tokenizer_vocab, out_path, quant_type=quant_type,
                            arch=arch, permute=False)


def convert_hf_moe_lead(model, tokenizer_vocab, out_path: str, arch: str,
                        quant_type=GGMLType.F16, permute: bool = False,
                        gating_func: int = 2) -> str:
    """transformers dense-lead-MoE models → GGUF: Glm4Moe / Dots1
    (sigmoid-routed, NEOX rope), Ernie4_5_Moe ("ernie4_5-moe": softmax
    routing + probs bias, NORM rope → permute=True, gating_func=1),
    bailingmoe-shaped state dicts (softmax, NORM rope)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = getattr(hf, "num_key_value_heads", n_head)
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    n_exp = getattr(hf, "n_routed_experts", None) or hf.moe_num_experts
    n_layers = hf.num_hidden_layers

    w = GGUFWriter(out_path, arch)
    w.add_string(Keys.General.NAME, f"{arch}-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, n_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT,
                 int(getattr(hf, "partial_rotary_factor", 1.0) * head_dim))
    w.add_uint32(Keys.LLM.EXPERT_COUNT, n_exp)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT,
                 getattr(hf, "num_experts_per_tok", None) or hf.moe_k)
    w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, hf.moe_intermediate_size)
    w.add_uint32(Keys.LLM.LEADING_DENSE_BLOCK_COUNT,
                 getattr(hf, "first_k_dense_replace", None)
                 if getattr(hf, "first_k_dense_replace", None) is not None
                 else getattr(hf, "moe_layer_start_index", 0))
    w.add_uint32(Keys.LLM.EXPERT_SHARED_COUNT,
                 getattr(hf, "n_shared_experts", None)
                 if getattr(hf, "n_shared_experts", None) is not None
                 else getattr(hf, "moe_num_shared_experts", 0))
    w.add_uint32(Keys.LLM.EXPERT_GATING_FUNC, gating_func)
    w.add_bool(Keys.LLM.EXPERT_WEIGHTS_NORM, bool(getattr(hf, "norm_topk_prob", True)))
    w.add_float32(Keys.LLM.EXPERT_WEIGHTS_SCALE, float(getattr(hf, "routed_scaling_factor", 1.0)))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        tq = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, tq)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    # glm4moe names the FFN pre-norm post_attention_norm in its table
    ffn_norm_gg = "post_attention_norm.weight" if arch == "glm4moe" else "ffn_norm.weight"
    for i in range(n_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + ffn_norm_gg, state[p + "post_attention_layernorm.weight"])
        wq = state[p + "self_attn.q_proj.weight"]
        wk = state[p + "self_attn.k_proj.weight"]
        if permute:  # NORM-rope archs: HF half-rotation → ggml interleaved
            wq = permute_qk(wq, n_head)
            wk = permute_qk(wk, n_kv)
        add(b + "attn_q.weight", wq)
        add(b + "attn_k.weight", wk)
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        for hf_n, gg in [("q_proj.bias", "attn_q.bias"), ("k_proj.bias", "attn_k.bias"),
                         ("v_proj.bias", "attn_v.bias"),
                         ("q_norm.weight", "attn_q_norm.weight"),
                         ("k_norm.weight", "attn_k_norm.weight")]:
            if p + "self_attn." + hf_n in state:
                arr = state[p + "self_attn." + hf_n]
                if permute and gg == "attn_q.bias":
                    arr = permute_qk(arr, n_head)
                elif permute and gg == "attn_k.bias":
                    arr = permute_qk(arr, n_kv)
                add(b + gg, arr)
        if p + "mlp.gate.weight" in state:  # MoE layer
            add(b + "ffn_gate_inp.weight", state[p + "mlp.gate.weight"], f32=True)
            for bias_name in ("mlp.gate.e_score_correction_bias",
                              "mlp.moe_statics.e_score_correction_bias"):
                if p + bias_name in state:
                    add(b + "exp_probs_b.bias",
                        state[p + bias_name].reshape(-1), f32=True)
            for hf_n, gg in [("gate_proj", "ffn_gate_exps"), ("up_proj", "ffn_up_exps"),
                             ("down_proj", "ffn_down_exps")]:
                stackd = np.stack([
                    state[f"{p}mlp.experts.{e}.{hf_n}.weight"] for e in range(n_exp)
                ])
                add(b + gg + ".weight", stackd)
            for hf_n, gg in [("gate_proj", "ffn_gate_shexp"), ("up_proj", "ffn_up_shexp"),
                             ("down_proj", "ffn_down_shexp")]:
                if f"{p}mlp.shared_experts.{hf_n}.weight" in state:
                    add(b + gg + ".weight", state[f"{p}mlp.shared_experts.{hf_n}.weight"])
        else:  # dense-lead layer
            add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_starcoder2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Starcoder2ForCausalLM → GGUF (arch "starcoder2"):
    LayerNorm(+bias) blocks, fully-biased attention, ungated GELU FFN
    (c_fc/c_proj).  NEOX rope — no q/k permutation."""
    lm = _LAYER_MAP + [
        ("input_layernorm.bias", "attn_norm.bias"),
        ("post_attention_layernorm.bias", "ffn_norm.bias"),
        ("self_attn.o_proj.bias", "attn_output.bias"),
        ("mlp.c_fc.weight", "ffn_up.weight"),
        ("mlp.c_fc.bias", "ffn_up.bias"),
        ("mlp.c_proj.weight", "ffn_down.weight"),
        ("mlp.c_proj.bias", "ffn_down.bias"),
    ]
    return convert_hf_llama(model, tokenizer_vocab, out_path, quant_type=quant_type,
                            arch="starcoder2", permute=False, layer_map=lm)


def convert_hf_nemotron(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers NemotronForCausalLM → GGUF (arch "nemotron"):
    LayerNorm(+bias), relu² ungated FFN, partial NEOX rope."""
    lm = _LAYER_MAP + [
        ("input_layernorm.bias", "attn_norm.bias"),
        ("post_attention_layernorm.bias", "ffn_norm.bias"),
    ]
    hf = model.config
    rope_dim = int(getattr(hf, "partial_rotary_factor", 0.5)
                   * (getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads))
    # layernorm1p: +1 baked into every norm weight (reference NemotronModel
    # modify_tensors) so the runtime uses plain LayerNorm
    state = {}
    for k, v in model.state_dict().items():
        v = v.detach().cpu().float()
        if k.endswith("norm.weight"):
            v = v + 1
        state[k] = v

    class _Shim:
        config = hf

        @staticmethod
        def state_dict():
            return state

    return convert_hf_llama(_Shim, tokenizer_vocab, out_path, quant_type=quant_type,
                            arch="nemotron", permute=False, layer_map=lm,
                            extra_kv={"nemotron.rope.dimension_count": rope_dim})


def convert_hf_exaone4(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Exaone4ForCausalLM → GGUF (arch "exaone4"):
    post-norm-only blocks (post_attention_layernorm → post_attention_norm,
    post_feedforward_layernorm → post_ffw_norm), per-head qk norms, NEOX."""
    lm = [
        ("self_attn.q_proj.weight", "attn_q.weight"),
        ("self_attn.k_proj.weight", "attn_k.weight"),
        ("self_attn.v_proj.weight", "attn_v.weight"),
        ("self_attn.o_proj.weight", "attn_output.weight"),
        ("self_attn.q_norm.weight", "attn_q_norm.weight"),
        ("self_attn.k_norm.weight", "attn_k_norm.weight"),
        ("post_attention_layernorm.weight", "post_attention_norm.weight"),
        ("post_feedforward_layernorm.weight", "post_ffw_norm.weight"),
        ("mlp.gate_proj.weight", "ffn_gate.weight"),
        ("mlp.up_proj.weight", "ffn_up.weight"),
        ("mlp.down_proj.weight", "ffn_down.weight"),
    ]
    return convert_hf_llama(model, tokenizer_vocab, out_path, quant_type=quant_type,
                            arch="exaone4", permute=False, layer_map=lm)


def convert_hf_idefics3_vision(model, out_path: str, scale_factor: int = 2) -> str:
    """Idefics3/SmolVLM vision tower + connector → mmproj GGUF
    (projector "idefics3": pixel shuffle + single fc — clip.cpp:521)."""
    tower = getattr(model, "vision_model", None) or getattr(getattr(model, "model", None), "vision_model", None) or model
    vcfg = tower.config
    ts = {k: v.detach().cpu().float().numpy() for k, v in tower.state_dict().items()}
    conn = getattr(model, "connector", None) or getattr(getattr(model, "model", None), "connector", None)

    from ..gguf.writer import GGUFWriter as _W

    w = _W(out_path, "clip")
    w.add_string("clip.projector_type", "idefics3")
    w.add_uint32("clip.vision.image_size", vcfg.image_size)
    w.add_uint32("clip.vision.patch_size", vcfg.patch_size)
    w.add_uint32("clip.vision.embedding_length", vcfg.hidden_size)
    w.add_uint32("clip.vision.block_count", vcfg.num_hidden_layers)
    w.add_uint32("clip.vision.attention.head_count", vcfg.num_attention_heads)
    w.add_uint32("clip.vision.feed_forward_length", vcfg.intermediate_size)
    w.add_float32("clip.vision.attention.layer_norm_epsilon",
                  getattr(vcfg, "layer_norm_eps", 1e-6))
    w.add_uint32("clip.vision.projector.scale_factor", scale_factor)

    def add(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    add("v.patch_embd.weight", ts["embeddings.patch_embedding.weight"])
    add("v.patch_embd.bias", ts["embeddings.patch_embedding.bias"])
    add("v.position_embd.weight", ts["embeddings.position_embedding.weight"])
    if "post_layernorm.weight" in ts:
        add("v.post_ln.weight", ts["post_layernorm.weight"])
        add("v.post_ln.bias", ts["post_layernorm.bias"])
    for i in range(vcfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        b = f"v.blk.{i}."
        add(b + "ln1.weight", ts[p + "layer_norm1.weight"])
        add(b + "ln1.bias", ts[p + "layer_norm1.bias"])
        add(b + "ln2.weight", ts[p + "layer_norm2.weight"])
        add(b + "ln2.bias", ts[p + "layer_norm2.bias"])
        for hf_n, gg in [("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("out_proj", "attn_out")]:
            add(b + gg + ".weight", ts[p + f"self_attn.{hf_n}.weight"])
            add(b + gg + ".bias", ts[p + f"self_attn.{hf_n}.bias"])
        add(b + "ffn_up.weight", ts[p + "mlp.fc1.weight"])
        add(b + "ffn_up.bias", ts[p + "mlp.fc1.bias"])
        add(b + "ffn_down.weight", ts[p + "mlp.fc2.weight"])
        add(b + "ffn_down.bias", ts[p + "mlp.fc2.bias"])
    if conn is not None:
        cs = {k: v.detach().cpu().float().numpy() for k, v in conn.state_dict().items()}
        fc = cs.get("modality_projection.proj.weight")
        add("mm.model.fc.weight", fc)
        w.add_uint32("clip.vision.projection_dim", fc.shape[0])
    else:
        w.add_uint32("clip.vision.projection_dim", vcfg.hidden_size)
    return w.write()


def convert_hf_internvl_vision(model, out_path: str, scale_factor: int = 2) -> str:
    """InternVL vision tower + mlp projector → mmproj GGUF (projector
    "internvl": pixel shuffle + LN/linear/gelu/linear — clip.cpp
    build_internvl; ls1/ls2 layer scales per block)."""
    tower = getattr(model, "vision_tower", None) or getattr(getattr(model, "model", None), "vision_tower", None) or model
    vcfg = tower.config
    ts = {k: v.detach().cpu().float().numpy() for k, v in tower.state_dict().items()}
    proj = getattr(model, "multi_modal_projector", None) or getattr(getattr(model, "model", None), "multi_modal_projector", None)

    from ..gguf.writer import GGUFWriter as _W

    img = vcfg.image_size[0] if isinstance(vcfg.image_size, (list, tuple)) else vcfg.image_size
    patch = vcfg.patch_size[0] if isinstance(vcfg.patch_size, (list, tuple)) else vcfg.patch_size
    w = _W(out_path, "clip")
    w.add_string("clip.projector_type", "internvl")
    w.add_uint32("clip.vision.image_size", img)
    w.add_uint32("clip.vision.patch_size", patch)
    w.add_uint32("clip.vision.embedding_length", vcfg.hidden_size)
    w.add_uint32("clip.vision.block_count", vcfg.num_hidden_layers)
    w.add_uint32("clip.vision.attention.head_count", vcfg.num_attention_heads)
    w.add_uint32("clip.vision.feed_forward_length", vcfg.intermediate_size)
    w.add_float32("clip.vision.attention.layer_norm_epsilon",
                  getattr(vcfg, "layer_norm_eps", 1e-6))
    w.add_uint32("clip.vision.projector.scale_factor", scale_factor)

    def add(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    add("v.patch_embd.weight", ts["embeddings.patch_embeddings.projection.weight"])
    add("v.patch_embd.bias", ts["embeddings.patch_embeddings.projection.bias"])
    add("v.class_embd", ts["embeddings.cls_token"].reshape(-1))
    add("v.position_embd.weight", ts["embeddings.position_embeddings"].reshape(
        -1, vcfg.hidden_size))
    if "layernorm.weight" in ts:
        add("v.post_ln.weight", ts["layernorm.weight"])
        add("v.post_ln.bias", ts["layernorm.bias"])
    for i in range(vcfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        b = f"v.blk.{i}."
        add(b + "ln1.weight", ts[p + "layernorm_before.weight"])
        add(b + "ln1.bias", ts[p + "layernorm_before.bias"])
        add(b + "ln2.weight", ts[p + "layernorm_after.weight"])
        add(b + "ln2.bias", ts[p + "layernorm_after.bias"])
        add(b + "ls1.weight", ts[p + "lambda_1"])
        add(b + "ls2.weight", ts[p + "lambda_2"])
        for hf_n, gg in [("q_proj", "attn_q"), ("k_proj", "attn_k"),
                         ("v_proj", "attn_v"), ("projection_layer", "attn_out")]:
            add(b + gg + ".weight", ts[p + f"attention.{hf_n}.weight"])
            if p + f"attention.{hf_n}.bias" in ts:
                add(b + gg + ".bias", ts[p + f"attention.{hf_n}.bias"])
        add(b + "ffn_up.weight", ts[p + "mlp.fc1.weight"])
        add(b + "ffn_up.bias", ts[p + "mlp.fc1.bias"])
        add(b + "ffn_down.weight", ts[p + "mlp.fc2.weight"])
        add(b + "ffn_down.bias", ts[p + "mlp.fc2.bias"])
    if proj is not None:
        psd = {k: v.detach().cpu().float().numpy() for k, v in proj.state_dict().items()}
        add("mm.0.weight", psd["layer_norm.weight"])
        add("mm.0.bias", psd["layer_norm.bias"])
        add("mm.1.weight", psd["linear_1.weight"])
        add("mm.1.bias", psd["linear_1.bias"])
        add("mm.3.weight", psd["linear_2.weight"])
        add("mm.3.bias", psd["linear_2.bias"])
        w.add_uint32("clip.vision.projection_dim", psd["linear_2.weight"].shape[0])
    else:
        w.add_uint32("clip.vision.projection_dim", vcfg.hidden_size)
    return w.write()


def convert_hf_audio_mmproj(model, out_path: str, projector: str = "qwen2a",
                            stack_factor: int = 8) -> str:
    """Whisper-style audio tower + projector → audio mmproj GGUF.

    ``model``: HF Qwen2AudioForConditionalGeneration (projector "qwen2a":
    avgpool(2) tower + single fc) or any module exposing a whisper encoder
    at ``.audio_tower`` and a linear/mlp projector at
    ``.multi_modal_projector``.  Names: clip-impl.h "a." prefix +
    ``mm.a.*`` (reference audio branch, clip.cpp:1445-1545)."""
    tower = getattr(model, "audio_tower", None) or getattr(getattr(model, "model", None), "audio_tower", None) or model
    proj = getattr(model, "multi_modal_projector", None) or getattr(getattr(model, "model", None), "multi_modal_projector", None)
    hf = tower.config
    ts = {k: v.detach().cpu().float().numpy() for k, v in tower.state_dict().items()}

    from ..gguf.writer import GGUFWriter as _W

    w = _W(out_path, "clip")
    w.add_string("clip.projector_type", projector)
    w.add_uint32("clip.audio.num_mel_bins", hf.num_mel_bins)
    w.add_uint32("clip.audio.embedding_length", hf.d_model)
    w.add_uint32("clip.audio.block_count", hf.encoder_layers)
    w.add_uint32("clip.audio.attention.head_count", hf.encoder_attention_heads)
    w.add_uint32("clip.audio.feed_forward_length", hf.encoder_ffn_dim)
    if projector in ("ultravox", "voxtral"):
        w.add_uint32("clip.audio.projector.stack_factor", stack_factor)

    def add(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    add("a.conv1d.1.weight", ts["conv1.weight"])
    add("a.conv1d.1.bias", ts["conv1.bias"])
    add("a.conv1d.2.weight", ts["conv2.weight"])
    add("a.conv1d.2.bias", ts["conv2.bias"])
    add("a.position_embd.weight", ts["embed_positions.weight"])
    add("a.post_ln.weight", ts["layer_norm.weight"])
    add("a.post_ln.bias", ts["layer_norm.bias"])
    for i in range(hf.encoder_layers):
        p = f"layers.{i}."
        b = f"a.blk.{i}."
        add(b + "ln1.weight", ts[p + "self_attn_layer_norm.weight"])
        add(b + "ln1.bias", ts[p + "self_attn_layer_norm.bias"])
        add(b + "attn_q.weight", ts[p + "self_attn.q_proj.weight"])
        add(b + "attn_q.bias", ts[p + "self_attn.q_proj.bias"])
        add(b + "attn_k.weight", ts[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", ts[p + "self_attn.v_proj.weight"])
        add(b + "attn_v.bias", ts[p + "self_attn.v_proj.bias"])
        add(b + "attn_out.weight", ts[p + "self_attn.out_proj.weight"])
        add(b + "attn_out.bias", ts[p + "self_attn.out_proj.bias"])
        add(b + "ln2.weight", ts[p + "final_layer_norm.weight"])
        add(b + "ln2.bias", ts[p + "final_layer_norm.bias"])
        add(b + "ffn_up.weight", ts[p + "fc1.weight"])
        add(b + "ffn_up.bias", ts[p + "fc1.bias"])
        add(b + "ffn_down.weight", ts[p + "fc2.weight"])
        add(b + "ffn_down.bias", ts[p + "fc2.bias"])
    if proj is not None:
        ps = {k: v.detach().cpu().float().numpy() for k, v in proj.state_dict().items()}
        if projector == "qwen2a":
            add("mm.a.fc.weight", ps["linear.weight"])
            add("mm.a.fc.bias", ps["linear.bias"])
        else:
            add("mm.a.mlp.1.weight", ps["linear_1.weight"])
            add("mm.a.mlp.2.weight", ps["linear_2.weight"])
    return w.write()


def convert_hf_pixtral_vision(model, out_path: str, img_break_id: int | None = None) -> str:
    """Pixtral vision tower + projector → mmproj GGUF (projector "pixtral").

    ``model`` is an HF Llava/Mistral3 conditional-generation model whose
    vision tower is PixtralVisionModel (or the bare tower).  Mirrors the
    reference mmproj converter: RMS-norm ViT with gated FFN and no learned
    positions; ``[IMG_BREAK]``'s LM embedding row is materialized as
    ``v.token_embd.img_break`` (clip-impl.h TN_TOK_IMG_BREAK); mistral-
    small-3.1 patch merger tensors are emitted when present."""
    from ..gguf.writer import GGUFWriter as _W

    vt = getattr(model, "vision_tower", None) or getattr(getattr(model, "model", None), "vision_tower", None) or model
    vcfg = vt.config
    proj = getattr(model, "multi_modal_projector", None) or getattr(getattr(model, "model", None), "multi_modal_projector", None)
    vs = {k: v.detach().cpu().float().numpy() for k, v in vt.state_dict().items()}

    w = _W(out_path, "clip")
    w.add_string("clip.projector_type", "pixtral")
    w.add_uint32("clip.vision.image_size", vcfg.image_size)
    w.add_uint32("clip.vision.patch_size", vcfg.patch_size)
    w.add_uint32("clip.vision.embedding_length", vcfg.hidden_size)
    w.add_uint32("clip.vision.block_count", vcfg.num_hidden_layers)
    w.add_uint32("clip.vision.attention.head_count", vcfg.num_attention_heads)
    w.add_uint32("clip.vision.feed_forward_length", vcfg.intermediate_size)
    w.add_float32("clip.vision.rope_theta", getattr(vcfg, "rope_theta", 10000.0))
    w.add_float32("clip.vision.attention.layer_norm_epsilon", 1e-5)

    def add(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    add("v.patch_embd.weight", vs["patch_conv.weight"])
    add("v.pre_ln.weight", vs["ln_pre.weight"])
    for i in range(vcfg.num_hidden_layers):
        p = f"transformer.layers.{i}."
        b = f"v.blk.{i}."
        add(b + "ln1.weight", vs[p + "attention_norm.weight"])
        add(b + "ln2.weight", vs[p + "ffn_norm.weight"])
        add(b + "attn_q.weight", vs[p + "attention.q_proj.weight"])
        add(b + "attn_k.weight", vs[p + "attention.k_proj.weight"])
        add(b + "attn_v.weight", vs[p + "attention.v_proj.weight"])
        add(b + "attn_out.weight", vs[p + "attention.o_proj.weight"])
        add(b + "ffn_gate.weight", vs[p + "feed_forward.gate_proj.weight"])
        add(b + "ffn_up.weight", vs[p + "feed_forward.up_proj.weight"])
        add(b + "ffn_down.weight", vs[p + "feed_forward.down_proj.weight"])

    if proj is not None:
        ps = {k: v.detach().cpu().float().numpy() for k, v in proj.state_dict().items()}
        add("mm.1.weight", ps["linear_1.weight"])
        add("mm.2.weight", ps["linear_2.weight"])
        if "linear_1.bias" in ps:
            add("mm.1.bias", ps["linear_1.bias"])
        if "linear_2.bias" in ps:
            add("mm.2.bias", ps["linear_2.bias"])
        if "patch_merger.merging_layer.weight" in ps:  # mistral small 3.1
            add("mm.patch_merger.weight", ps["patch_merger.merging_layer.weight"])
            add("mm.input_norm.weight", ps["norm.weight"])
            w.add_uint32("clip.vision.spatial_merge_size",
                         int(getattr(model.config, "spatial_merge_size", 2)))
        proj_out = ps["linear_2.weight"].shape[0]
    else:
        proj_out = vcfg.hidden_size
    w.add_uint32("clip.vision.projection_dim", proj_out)

    # [IMG_BREAK] embedding row from the LM's token embedding
    emb = None
    for mod in (getattr(model, "language_model", None),
                getattr(getattr(model, "model", None), "language_model", None)):
        if mod is not None:
            emb = mod.get_input_embeddings().weight.detach().cpu().float().numpy()
            break
    if emb is not None and img_break_id is not None:
        add("v.token_embd.img_break", emb[img_break_id])
    else:
        add("v.token_embd.img_break", np.zeros((proj_out,), np.float32))
    return w.write()


def convert_hf_qwen2vl(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Qwen2VLForConditionalGeneration (or its text model) →
    GGUF (arch "qwen2vl").

    Mirrors the reference converter (convert_hf_to_gguf.py Qwen2VLModel):
    the qwen2 tensor layout plus ``rope.dimension_sections`` =
    mrope_section padded to 4; vision tensors are skipped."""
    cfg = model.config
    text_cfg = getattr(cfg, "text_config", cfg)
    sections = list(
        (getattr(text_cfg, "rope_scaling", None) or {}).get("mrope_section", [])
    )
    sections += [0] * max(0, 4 - len(sections))

    # strip the multimodal wrapper: "model.language_model.*" → "model.*"
    state = {}
    for k, v in model.state_dict().items():
        if k.startswith(("visual.", "model.visual.")):
            continue
        k = k.replace("model.language_model.", "model.").replace("language_model.", "")
        state[k] = v

    class _TextShim:
        config = text_cfg

        @staticmethod
        def state_dict():
            return state

    # rope_scaling must not trigger the llama scaled-rope keys (mrope is a
    # layout, not a frequency scaling)
    import copy as _copy

    shim_cfg = _copy.copy(text_cfg)
    shim_cfg.rope_scaling = None
    _TextShim.config = shim_cfg
    return convert_hf_llama(
        _TextShim, tokenizer_vocab, out_path, quant_type=quant_type, arch="qwen2vl",
        extra_kv={"qwen2vl.rope.dimension_sections": [int(s) for s in sections]},
    )


def convert_hf_minicpm(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16,
                       scale_emb: float | None = None, scale_depth: float | None = None,
                       dim_model_base: float | None = None) -> str:
    """MiniCPM (llama-shaped state dict) → GGUF (arch "minicpm").

    Mirrors the reference converter (convert_hf_to_gguf.py MiniCPMModel):
    the llama tensor layout plus three scale keys —
    embedding_scale = scale_emb, residual_scale = scale_depth/√n_layers,
    logit_scale = hidden_size/dim_model_base.  Scale args default to the
    HF config's fields (MiniCPM checkpoints are trust_remote_code, so any
    llama-classed module plus explicit scales also works).  Longrope
    factor tensors are not emitted (reference generate_extra_tensors)."""
    hf = model.config
    scale_emb = scale_emb if scale_emb is not None else getattr(hf, "scale_emb", 1.0)
    scale_depth = scale_depth if scale_depth is not None else getattr(hf, "scale_depth", None)
    dim_model_base = dim_model_base if dim_model_base is not None else getattr(hf, "dim_model_base", hf.hidden_size)
    residual_scale = (scale_depth / hf.num_hidden_layers**0.5) if scale_depth else 1.0
    return convert_hf_llama(
        model, tokenizer_vocab, out_path, quant_type=quant_type, arch="minicpm",
        extra_kv={
            "minicpm.embedding_scale": float(scale_emb),
            "minicpm.residual_scale": float(residual_scale),
            "minicpm.logit_scale": float(hf.hidden_size / dim_model_base),
        },
    )


def convert_hf_falcon_h1(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers FalconH1ForCausalLM → GGUF (arch "falcon-h1").

    Mirrors the reference converter (convert_hf_to_gguf.py FalconH1Model):
    every MuP multiplier — embedding, lm_head, attention in/out, key, ssm
    in/out, per-section zxbcdt, mlp gate/down — is baked into the weights
    so the runtime graph is multiplier-free."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    d_inner = getattr(hf, "mamba_d_ssm", None) or hf.mamba_expand * hf.hidden_size
    n_group = hf.mamba_n_groups
    n_head = hf.mamba_n_heads
    d_state = hf.mamba_d_state
    GN = n_group * d_state
    head_dim = getattr(hf, "head_dim", hf.hidden_size // hf.num_attention_heads)

    w = GGUFWriter(out_path, "falcon-h1")
    w.add_string(Keys.General.NAME, "falcon-h1-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, getattr(hf, "max_position_embeddings", 0) or 2**18)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.num_hidden_layers)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, hf.num_attention_heads)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, hf.num_key_value_heads)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_uint32(Keys.SSM.CONV_KERNEL, hf.mamba_d_conv)
    w.add_uint32(Keys.SSM.STATE_SIZE, d_state)
    w.add_uint32(Keys.SSM.INNER_SIZE, d_inner)
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, n_head)
    w.add_uint32(Keys.SSM.GROUP_COUNT, n_group)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, f32=False):
        t = GGMLType.F32 if (f32 or arr.ndim == 1) else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"] * hf.embedding_multiplier)
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "pre_ff_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"] * hf.attention_in_multiplier)
        add(b + "attn_k.weight",
            state[p + "self_attn.k_proj.weight"] * hf.key_multiplier * hf.attention_in_multiplier)
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"] * hf.attention_in_multiplier)
        add(b + "attn_output.weight",
            state[p + "self_attn.o_proj.weight"] * hf.attention_out_multiplier)
        add(b + "ffn_gate.weight", state[p + "feed_forward.gate_proj.weight"] * hf.mlp_multipliers[0])
        add(b + "ffn_up.weight", state[p + "feed_forward.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "feed_forward.down_proj.weight"] * hf.mlp_multipliers[1])
        # mamba branch: ssm_in rows scaled per zxbcdt section
        # [z | x | B | C | dt] (reference FalconH1Model.modify_tensors)
        sin = state[p + "mamba.in_proj.weight"] * hf.ssm_in_multiplier
        zm = hf.ssm_multipliers
        sin[:d_inner] *= zm[0]
        sin[d_inner : 2 * d_inner] *= zm[1]
        sin[2 * d_inner : 2 * d_inner + GN] *= zm[2]
        sin[2 * d_inner + GN : 2 * d_inner + 2 * GN] *= zm[3]
        sin[2 * d_inner + 2 * GN :] *= zm[4]
        add(b + "ssm_in.weight", sin)
        add(b + "ssm_conv1d.weight", state[p + "mamba.conv1d.weight"].squeeze(1), f32=True)
        if p + "mamba.conv1d.bias" in state:
            add(b + "ssm_conv1d.bias", state[p + "mamba.conv1d.bias"])
        add(b + "ssm_dt.bias", state[p + "mamba.dt_bias"])
        add(b + "ssm_a", -np.exp(state[p + "mamba.A_log"]).reshape(n_head, 1), f32=True)
        add(b + "ssm_d", state[p + "mamba.D"].reshape(n_head, 1), f32=True)
        if p + "mamba.norm.weight" in state:
            add(b + "ssm_norm.weight",
                state[p + "mamba.norm.weight"].reshape(n_group, d_inner // n_group), f32=True)
        add(b + "ssm_out.weight", state[p + "mamba.out_proj.weight"] * hf.ssm_out_multiplier)
    add("output_norm.weight", state["model.final_layernorm.weight"])
    lm = state.get("lm_head.weight", state["model.embed_tokens.weight"])
    add("output.weight", lm * hf.lm_head_multiplier)
    return w.write()


def convert_hf_phi(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers PhiForCausalLM (phi-2 lineage) → GGUF (arch "phi2").

    Partial NEOX rotary: rope dim = partial_rotary_factor × head_dim; no
    q/k permutation (NEOX layout matches HF)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = getattr(hf, "num_key_value_heads", None) or n_head
    head_dim = hf.hidden_size // n_head
    rope_dim = int(getattr(hf, "partial_rotary_factor", 1.0) * head_dim)

    w = GGUFWriter(out_path, "phi2")
    w.add_string(Keys.General.NAME, "phi-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_EPS, hf.layer_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rope_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F16
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    pairs = [
        ("input_layernorm.weight", "attn_norm.weight"),
        ("input_layernorm.bias", "attn_norm.bias"),
        ("self_attn.q_proj.weight", "attn_q.weight"),
        ("self_attn.q_proj.bias", "attn_q.bias"),
        ("self_attn.k_proj.weight", "attn_k.weight"),
        ("self_attn.k_proj.bias", "attn_k.bias"),
        ("self_attn.v_proj.weight", "attn_v.weight"),
        ("self_attn.v_proj.bias", "attn_v.bias"),
        ("self_attn.dense.weight", "attn_output.weight"),
        ("self_attn.dense.bias", "attn_output.bias"),
        ("mlp.fc1.weight", "ffn_up.weight"),
        ("mlp.fc1.bias", "ffn_up.bias"),
        ("mlp.fc2.weight", "ffn_down.weight"),
        ("mlp.fc2.bias", "ffn_down.bias"),
    ]
    for i in range(hf.num_hidden_layers):
        for hf_suffix, gg_suffix in pairs:
            hf_name = f"model.layers.{i}.{hf_suffix}"
            if hf_name in state:
                add(f"blk.{i}.{gg_suffix}", state[hf_name])
    add("output_norm.weight", state["model.final_layernorm.weight"])
    add("output_norm.bias", state["model.final_layernorm.bias"])
    add("output.weight", state["lm_head.weight"])
    if "lm_head.bias" in state:
        add("output.bias", state["lm_head.bias"])
    return w.write()


def convert_hf_glm4(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Glm4ForCausalLM → GGUF (arch "glm4").

    Partial NORM rope (partial_rotary_factor), fused gate_up split into
    ffn_gate/ffn_up, post-attention + post-ffn RMS norms
    (reference: llm_build_glm4, src/llama-model.cpp:13613)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    rot = int(head_dim * getattr(hf, "partial_rotary_factor", 0.5))

    w = GGUFWriter(out_path, "glm4")
    w.add_string(Keys.General.NAME, "glm4-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rot)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    F = hf.intermediate_size
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        if p + "self_attn.q_proj.bias" in state:
            add(b + "attn_q.bias", state[p + "self_attn.q_proj.bias"])
            add(b + "attn_k.bias", state[p + "self_attn.k_proj.bias"])
            add(b + "attn_v.bias", state[p + "self_attn.v_proj.bias"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "post_attention_norm.weight", state[p + "post_self_attn_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        gu = state[p + "mlp.gate_up_proj.weight"]  # (2F, D): gate rows first
        add(b + "ffn_gate.weight", gu[:F])
        add(b + "ffn_up.weight", gu[F:])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
        add(b + "post_ffw_norm.weight", state[p + "post_mlp_layernorm.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_dbrx(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers DbrxForCausalLM → GGUF (arch "dbrx").

    Fused Wqkv stays fused (attn_qkv; the forward splits it), clamp_kqv
    metadata, fused expert mats w1/v1/w2 unstacked into
    ffn_{gate,up,down}_exps (reference: llm_build_dbrx)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    D = hf.d_model
    n_head = hf.n_heads
    n_kv = hf.attn_config.kv_n_heads
    head_dim = D // n_head
    E = hf.ffn_config.moe_num_experts
    F = hf.ffn_config.ffn_hidden_size

    w = GGUFWriter(out_path, "dbrx")
    w.add_string(Keys.General.NAME, "dbrx-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_seq_len)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, hf.n_layers)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, 1e-5)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.ffn_config.moe_top_k)
    w.add_bool(Keys.LLM.EXPERT_WEIGHTS_NORM, True)  # dbrx renormalizes top-k
    if hf.attn_config.clip_qkv:
        w.add_float32(Keys.Attention.CLAMP_KQV, hf.attn_config.clip_qkv)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, hf.attn_config.rope_theta)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["transformer.wte.weight"])
    for i in range(hf.n_layers):
        p = f"transformer.blocks.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "norm_attn_norm.norm_1.weight"])
        add(b + "attn_qkv.weight", state[p + "norm_attn_norm.attn.Wqkv.weight"])
        add(b + "attn_output.weight", state[p + "norm_attn_norm.attn.out_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "norm_attn_norm.norm_2.weight"])
        add(b + "ffn_gate_inp.weight", state[p + "ffn.router.layer.weight"])
        # fused experts: w1/v1 are (E·F, D); w2 is (E·F, D) with down being
        # the transpose per expert
        w1 = state[p + "ffn.experts.mlp.w1"].reshape(E, F, D)
        v1 = state[p + "ffn.experts.mlp.v1"].reshape(E, F, D)
        w2 = state[p + "ffn.experts.mlp.w2"].reshape(E, F, D).transpose(0, 2, 1)
        add(b + "ffn_gate_exps.weight", np.ascontiguousarray(w1))
        add(b + "ffn_up_exps.weight", np.ascontiguousarray(v1))
        add(b + "ffn_down_exps.weight", np.ascontiguousarray(w2))
    add("output_norm.weight", state["transformer.norm_f.weight"])
    add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_cohere2(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Cohere2ForCausalLM → GGUF (arch "cohere2"):
    command-r parallel blocks + iSWA pattern 4, rope only on sliding layers
    (reference: llm_build_cohere2_iswa)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = hf.hidden_size // n_head

    w = GGUFWriter(out_path, "cohere2")
    w.add_string(Keys.General.NAME, "cohere2-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_EPS, hf.layer_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_float32(Keys.LLM.LOGIT_SCALE, hf.logit_scale)
    w.add_uint32(Keys.Attention.SLIDING_WINDOW, hf.sliding_window)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_llama4(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers Llama4ForCausalLM (text) → GGUF (arch "llama4").

    Interleaved rope natively (no q/k permutation); fused expert
    gate_up_proj (E, D, 2F) split and transposed to GGUF (E, out, in);
    shared expert → *_shexp tensors (reference: llm_build_llama_iswa)."""
    hf = model.config
    if hasattr(hf, "text_config"):
        hf = hf.text_config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    state = {k[len("language_model."):] if k.startswith("language_model.") else k: v
             for k, v in state.items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    E = hf.num_local_experts
    Fe = hf.intermediate_size

    w = GGUFWriter(out_path, "llama4")
    w.add_string(Keys.General.NAME, "llama4-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size_mlp)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
    w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, Fe)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 500000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        if p + "feed_forward.router.weight" in state:
            add(b + "ffn_gate_inp.weight", state[p + "feed_forward.router.weight"])
            gu = state[p + "feed_forward.experts.gate_up_proj"]  # (E, D, 2F)
            gate = gu[:, :, :Fe].transpose(0, 2, 1)  # → (E, F, D)
            up = gu[:, :, Fe:].transpose(0, 2, 1)
            down = state[p + "feed_forward.experts.down_proj"].transpose(0, 2, 1)  # (E,F,D)→(E,D,F)
            add(b + "ffn_gate_exps.weight", np.ascontiguousarray(gate))
            add(b + "ffn_up_exps.weight", np.ascontiguousarray(up))
            add(b + "ffn_down_exps.weight", np.ascontiguousarray(down))
            sh = p + "feed_forward.shared_expert."
            add(b + "ffn_gate_shexp.weight", state[sh + "gate_proj.weight"])
            add(b + "ffn_up_shexp.weight", state[sh + "up_proj.weight"])
            add(b + "ffn_down_shexp.weight", state[sh + "down_proj.weight"])
        else:  # dense layer (interleave_moe_layer_step > 1)
            add(b + "ffn_gate.weight", state[p + "feed_forward.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "feed_forward.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "feed_forward.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_granitemoe(model, tokenizer_vocab, out_path: str, quant_type=GGMLType.F16) -> str:
    """transformers GraniteMoeForCausalLM → GGUF (arch "granitemoe"):
    granite scaling factors + fused input_linear (E, 2F, D) split into
    gate/up expert stacks (reference: llm_build_granite with MoE)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = hf.hidden_size // n_head
    E = hf.num_local_experts
    F = hf.intermediate_size

    w = GGUFWriter(out_path, "granitemoe")
    w.add_string(Keys.General.NAME, "granitemoe-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS, hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
    w.add_float32(Keys.LLM.EMBEDDING_SCALE, hf.embedding_multiplier)
    w.add_float32(Keys.LLM.LOGIT_SCALE, 1.0 / hf.logits_scaling)
    w.add_float32(Keys.LLM.RESIDUAL_SCALE, hf.residual_multiplier)
    w.add_float32(Keys.LLM.ATTENTION_SCALE, hf.attention_multiplier)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    shared_ff = getattr(hf, "shared_intermediate_size", 0)
    if shared_ff:  # granitemoeshared (GraniteMoeModel spec :7387-7393)
        w.add_uint32("granitemoe.expert_shared_feed_forward_length", shared_ff)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr, permute_heads=0):
        if permute_heads:
            arr = permute_qk(arr, permute_heads)
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"], permute_heads=n_head)
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"], permute_heads=n_kv)
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_gate_inp.weight", state[p + "block_sparse_moe.router.layer.weight"])
        il = state[p + "block_sparse_moe.input_linear.weight"]  # (E, 2F, D)
        add(b + "ffn_gate_exps.weight", np.ascontiguousarray(il[:, :F]))
        add(b + "ffn_up_exps.weight", np.ascontiguousarray(il[:, F:]))
        add(b + "ffn_down_exps.weight",
            np.ascontiguousarray(state[p + "block_sparse_moe.output_linear.weight"]))
        if p + "shared_mlp.input_linear.weight" in state:
            # granitemoeshared: fused (2*shared_F, D) shexp beside the experts
            sh = state[p + "shared_mlp.input_linear.weight"]
            sff = sh.shape[0] // 2
            add(b + "ffn_gate_shexp.weight", np.ascontiguousarray(sh[:sff]))
            add(b + "ffn_up_shexp.weight", np.ascontiguousarray(sh[sff:]))
            add(b + "ffn_down_shexp.weight", state[p + "shared_mlp.output_linear.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_gemma3_vision(model, out_path: str, mm_tokens_per_image: int = 256,
                             quant_type=GGMLType.F32) -> str:
    """Gemma3 SigLIP vision tower + multimodal projector → mmproj GGUF
    (clip.cpp PROJECTOR_TYPE_GEMMA3; tensor names per clip-impl.h).

    ``model`` is a Gemma3ForConditionalGeneration or anything exposing
    ``vision_tower.vision_model`` + ``multi_modal_projector``."""
    vt = model.vision_tower.vision_model
    proj = model.multi_modal_projector
    vc = vt.config
    state = {k: v.detach().cpu().float().numpy() for k, v in vt.state_dict().items()}

    w = GGUFWriter(out_path, "clip")
    w.add_string(Keys.General.NAME, "gemma3-mmproj-convert")
    w.add_string("clip.projector_type", "gemma3")
    w.add_uint32("clip.vision.image_size", vc.image_size)
    w.add_uint32("clip.vision.patch_size", vc.patch_size)
    w.add_uint32("clip.vision.embedding_length", vc.hidden_size)
    w.add_uint32("clip.vision.block_count", vc.num_hidden_layers)
    w.add_uint32("clip.vision.attention.head_count", vc.num_attention_heads)
    w.add_uint32("clip.vision.feed_forward_length", vc.intermediate_size)
    w.add_uint32("clip.vision.projection_dim",
                 proj.mm_input_projection_weight.shape[1])
    w.add_float32("clip.vision.attention.layer_norm_epsilon", vc.layer_norm_eps)
    w.add_uint32("clip.vision.mm_tokens_per_image", mm_tokens_per_image)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim <= 1 or "norm" in name or "ln" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, np.ascontiguousarray(arr), t)

    add("v.patch_embd.weight", state["embeddings.patch_embedding.weight"])
    add("v.patch_embd.bias", state["embeddings.patch_embedding.bias"])
    add("v.position_embd.weight", state["embeddings.position_embedding.weight"])
    for i in range(vc.num_hidden_layers):
        p = f"encoder.layers.{i}."
        b = f"v.blk.{i}."
        add(b + "ln1.weight", state[p + "layer_norm1.weight"])
        add(b + "ln1.bias", state[p + "layer_norm1.bias"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_q.bias", state[p + "self_attn.q_proj.bias"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_k.bias", state[p + "self_attn.k_proj.bias"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_v.bias", state[p + "self_attn.v_proj.bias"])
        add(b + "attn_out.weight", state[p + "self_attn.out_proj.weight"])
        add(b + "attn_out.bias", state[p + "self_attn.out_proj.bias"])
        add(b + "ln2.weight", state[p + "layer_norm2.weight"])
        add(b + "ln2.bias", state[p + "layer_norm2.bias"])
        add(b + "ffn_up.weight", state[p + "mlp.fc1.weight"])
        add(b + "ffn_up.bias", state[p + "mlp.fc1.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        add(b + "ffn_down.bias", state[p + "mlp.fc2.bias"])
    add("v.post_ln.weight", state["post_layernorm.weight"])
    add("v.post_ln.bias", state["post_layernorm.bias"])
    add("mm.input_projection.weight",
        proj.mm_input_projection_weight.detach().cpu().float().numpy())
    add("mm.soft_emb_norm.weight",
        proj.mm_soft_emb_norm.weight.detach().cpu().float().numpy())
    return w.write()


# ---------------------------------------------------------------------------
# Arch wave 5a converters
# ---------------------------------------------------------------------------

def convert_hf_qwen_v1(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """Qwen-v1-style checkpoint → GGUF (arch "qwen").

    Upstream qwen GGUFs carry a *fused* attn_qkv (+bias); a Qwen2-style
    module (separate q/k/v with biases) is fused here.  NEOX rope, no
    permutation (reference llm_build_qwen, src/llama-model.cpp:8018)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = getattr(hf, "num_key_value_heads", n_head)
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head

    w = GGUFWriter(out_path, "qwen")
    w.add_string(Keys.General.NAME, "qwen-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS,
                   hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        qkv = np.concatenate([state[p + "self_attn.q_proj.weight"],
                              state[p + "self_attn.k_proj.weight"],
                              state[p + "self_attn.v_proj.weight"]], axis=0)
        add(b + "attn_qkv.weight", qkv)
        qkvb = np.concatenate([state[p + "self_attn.q_proj.bias"],
                               state[p + "self_attn.k_proj.bias"],
                               state[p + "self_attn.v_proj.bias"]], axis=0)
        add(b + "attn_qkv.bias", qkvb)
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    add("output.weight", state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return w.write()


def convert_hf_gptj(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """transformers GPTJForCausalLM → GGUF (arch "gptj").

    Shared-norm parallel residual, partial interleaved rotary (rotary_dim),
    ungated tanh-GELU FFN with biases, biased lm_head.  The reference
    declares the arch (llama-arch.cpp:14) but ships no builder."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads if hasattr(hf, "num_attention_heads") else hf.n_head
    n_layer = getattr(hf, "num_hidden_layers", None) or hf.n_layer
    head_dim = hf.n_embd // n_head

    w = GGUFWriter(out_path, "gptj")
    w.add_string(Keys.General.NAME, "gptj-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.n_positions)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.n_embd)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, n_layer)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_head)
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, hf.layer_norm_epsilon)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, getattr(hf, "n_inner", None) or 4 * hf.n_embd)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, hf.rotary_dim)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["transformer.wte.weight"])
    for i in range(n_layer):
        p, b = f"transformer.h.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "ln_1.weight"])
        add(b + "attn_norm.bias", state[p + "ln_1.bias"])
        add(b + "attn_q.weight", state[p + "attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "attn.out_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.fc_in.weight"])
        add(b + "ffn_up.bias", state[p + "mlp.fc_in.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.fc_out.weight"])
        add(b + "ffn_down.bias", state[p + "mlp.fc_out.bias"])
    add("output_norm.weight", state["transformer.ln_f.weight"])
    add("output_norm.bias", state["transformer.ln_f.bias"])
    add("output.weight", state["lm_head.weight"])
    if "lm_head.bias" in state:
        add("output.bias", state["lm_head.bias"])
    return w.write()


def convert_hf_chatglm(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """transformers GlmForCausalLM (glm-4-hf / chatglm3 lineage) → GGUF
    (arch "chatglm").

    Partial interleaved (NORM) rope over half the head dim, qkv biases,
    fused gate_up written as a single 2F-row ffn_up (split at load per
    ggml_swiglu first-half-gates).  Reference llm_build_chatglm,
    src/llama-model.cpp:13480."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    rot = int(head_dim * getattr(hf, "partial_rotary_factor", 0.5))

    w = GGUFWriter(out_path, "chatglm")
    w.add_string(Keys.General.NAME, "chatglm-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS,
                   hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rot)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        for proj, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v")):
            bias = state.get(p + f"self_attn.{proj}_proj.bias")
            if bias is not None:
                add(b + f"{gg}.bias", bias)
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        # fused [gate|up] stays fused in the GGUF (upstream chatglm layout)
        add(b + "ffn_up.weight", state[p + "mlp.gate_up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_bitnet(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """transformers BitNetForCausalLM → GGUF (arch "bitnet").

    Inner sub-norms before the out/down projections; relu² FFN carried via
    the activation key (the reference builder hardcodes silu for the
    1bitLLM lineage — llm_build_bitnet, src/llama-model.cpp:12954).  HF
    checkpoints store float weights; TQ-quantized GGUFs additionally carry
    per-tensor .scale tensors which the engine multiplies back in."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head

    w = GGUFWriter(out_path, "bitnet")
    w.add_string(Keys.General.NAME, "bitnet-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS,
                   hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_string("bitnet.activation_function", getattr(hf, "hidden_act", "silu"))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_sub_norm.weight", state[p + "self_attn.attn_sub_norm.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_sub_norm.weight", state[p + "mlp.ffn_sub_norm.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_chameleon(model, tokenizer_vocab, out_path: str,
                         quant_type=GGMLType.F16) -> str:
    """transformers ChameleonForCausalLM → GGUF (arch "chameleon").

    Per-head LayerNorm q/k norms (weights permuted with their projections
    for the interleaved NORM rope); optional swin_norm for the 30B layout
    (llm_build_chameleon, src/llama-model.cpp:15505)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head

    w = GGUFWriter(out_path, "chameleon")
    w.add_string(Keys.General.NAME, "chameleon-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS,
                   hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_bool("chameleon.swin_norm", bool(getattr(hf, "swin_norm", False)))
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    def perm_norm(arr, nh):
        # per-head (H, Dh) affine params follow their projection's
        # interleave permutation along Dh
        flat = permute_qk(arr.reshape(-1), nh)
        return flat.reshape(arr.shape)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", permute_qk(state[p + "self_attn.q_proj.weight"], n_head))
        add(b + "attn_k.weight", permute_qk(state[p + "self_attn.k_proj.weight"], n_kv))
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_q_norm.weight", perm_norm(state[p + "self_attn.q_norm.weight"], n_head))
        add(b + "attn_q_norm.bias", perm_norm(state[p + "self_attn.q_norm.bias"], n_head))
        add(b + "attn_k_norm.weight", perm_norm(state[p + "self_attn.k_norm.weight"], n_kv))
        add(b + "attn_k_norm.bias", perm_norm(state[p + "self_attn.k_norm.bias"], n_kv))
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_lfm2(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """transformers Lfm2ForCausalLM → GGUF (arch "lfm2").

    Per-layer head_count_kv arrays mark conv layers (0); shortconv tensors
    keep the reference names (llama-arch.cpp lfm2 table :2008-2010)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    L = hf.num_hidden_layers
    layer_types = list(getattr(hf, "layer_types", ["full_attention"] * L))

    w = GGUFWriter(out_path, "lfm2")
    w.add_string(Keys.General.NAME, "lfm2-convert")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, hf.max_position_embeddings)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH,
                 getattr(hf, "block_ff_dim", None) or hf.intermediate_size)
    w.add_uint32(Keys.Attention.HEAD_COUNT, n_head)
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(
        [0 if t == "conv" else n_kv for t in layer_types], np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, head_dim)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, head_dim)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, getattr(hf, "norm_eps", 1e-5))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32("lfm2.shortconv.l_cache", getattr(hf, "conv_L_cache", 3))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "operator_norm.weight"])
        add(b + "ffn_norm.weight", state[p + "ffn_norm.weight"])
        if layer_types[i] == "conv":
            add(b + "shortconv.in_proj.weight", state[p + "conv.in_proj.weight"])
            conv = state[p + "conv.conv.weight"]  # (D, 1, L)
            add(b + "shortconv.conv.weight", conv.reshape(hf.hidden_size, -1))
            add(b + "shortconv.out_proj.weight", state[p + "conv.out_proj.weight"])
        else:
            add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
            add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
            add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
            add(b + "attn_output.weight", state[p + "self_attn.out_proj.weight"])
            add(b + "attn_q_norm.weight", state[p + "self_attn.q_layernorm.weight"])
            add(b + "attn_k_norm.weight", state[p + "self_attn.k_layernorm.weight"])
        add(b + "ffn_gate.weight", state[p + "feed_forward.w1.weight"])
        add(b + "ffn_up.weight", state[p + "feed_forward.w3.weight"])
        add(b + "ffn_down.weight", state[p + "feed_forward.w2.weight"])
    add("token_embd_norm.weight", state["model.embedding_norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_phimoe(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """transformers PhimoeForCausalLM → GGUF (arch "phimoe").

    LayerNorms with biases, biased qkv/o + lm_head, mixtral-shaped
    block_sparse_moe experts (reference llm_build_phi3 MoE branch)."""
    hf = model.config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    E = hf.num_local_experts

    w = GGUFWriter(out_path, "phimoe")
    w.add_string(Keys.General.NAME, "phimoe-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_EPS,
                   getattr(hf, "rms_norm_eps", 1e-5))
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, hf.intermediate_size)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 10000.0))
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, hf.num_experts_per_tok)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(hf.num_hidden_layers):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_norm.bias", state[p + "input_layernorm.bias"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        for proj, gg in (("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v")):
            bias = state.get(p + f"self_attn.{proj}_proj.bias")
            if bias is not None:
                add(b + f"{gg}.bias", bias)
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        if p + "self_attn.o_proj.bias" in state:
            add(b + "attn_output.bias", state[p + "self_attn.o_proj.bias"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_norm.bias", state[p + "post_attention_layernorm.bias"])
        add(b + "ffn_gate_inp.weight",
            state[p + "block_sparse_moe.gate.weight"])
        for hf_n, gg in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                         ("w2", "ffn_down_exps")):
            stacked = np.stack([
                state[f"{p}block_sparse_moe.experts.{e}.{hf_n}.weight"]
                for e in range(E)])
            add(b + gg + ".weight", stacked)
    add("output_norm.weight", state["model.norm.weight"])
    add("output_norm.bias", state["model.norm.bias"])
    add("output.weight", state["lm_head.weight"])
    if "lm_head.bias" in state:
        add("output.bias", state["lm_head.bias"])
    return w.write()


def convert_hf_gemma3n(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """transformers Gemma3nForCausalLM (text) → GGUF (arch "gemma3n").

    AltUp stacks, LAuReL, per-layer input embeddings, KV-shared trailing
    layers (tensor table llama-arch.cpp :989-1018)."""
    hf = model.config
    if hasattr(hf, "text_config"):
        hf = hf.text_config
    state = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    n_head = hf.num_attention_heads
    n_kv = hf.num_key_value_heads
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // n_head
    L = hf.num_hidden_layers
    A = hf.altup_num_inputs
    sp = getattr(hf, "activation_sparsity_pattern", None) or []
    n_sparse = sum(1 for v in sp if v and v > 0)

    w = GGUFWriter(out_path, "gemma3n")
    w.add_string(Keys.General.NAME, "gemma3n-convert")
    _common_header(w, hf, n_head, n_kv, head_dim, Keys.Attention.LAYERNORM_RMS_EPS,
                   hf.rms_norm_eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH,
                 hf.intermediate_size if isinstance(hf.intermediate_size, int)
                 else hf.intermediate_size[0])
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, head_dim)
    w.add_float32(Keys.Rope.FREQ_BASE, getattr(hf, "rope_theta", 1e6))
    w.add_uint32(Keys.Attention.SLIDING_WINDOW, getattr(hf, "sliding_window", 512))
    w.add_float32("gemma3n.final_logit_softcapping",
                  getattr(hf, "final_logit_softcapping", 30.0))
    w.add_uint32("gemma3n.altup.num_inputs", A)
    w.add_uint32("gemma3n.embedding_length_per_layer_input",
                 hf.hidden_size_per_layer_input)
    w.add_uint32("gemma3n.num_kv_shared_layers", hf.num_kv_shared_layers)
    w.add_uint32("gemma3n.activation_sparsity_layers", n_sparse)
    _write_vocab(w, tokenizer_vocab)

    def add(name, arr):
        t = GGMLType.F32 if arr.ndim == 1 or "norm" in name else (
            quant_type if arr.shape[-1] % 32 == 0 else GGMLType.F32
        )
        w.add_tensor(name, arr, t)

    add("token_embd.weight", state["model.embed_tokens.weight"])
    add("per_layer_token_embd.weight", state["model.embed_tokens_per_layer.weight"])
    add("per_layer_model_proj.weight", state["model.per_layer_model_projection.weight"])
    add("per_layer_proj_norm.weight", state["model.per_layer_projection_norm.weight"])
    add("altup_proj.weight", np.concatenate(
        [state[f"model.altup_projections.{i}.weight"] for i in range(A - 1)], axis=0))
    add("altup_unembd_proj.weight", np.concatenate(
        [state[f"model.altup_unembed_projections.{i}.weight"] for i in range(A - 1)], axis=0))
    first_shared = L - hf.num_kv_shared_layers
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_q_norm.weight", state[p + "self_attn.q_norm.weight"])
        if i < first_shared:
            add(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
            add(b + "attn_k_norm.weight", state[p + "self_attn.k_norm.weight"])
            add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "post_attention_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "pre_feedforward_layernorm.weight"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
        add(b + "post_ffw_norm.weight", state[p + "post_feedforward_layernorm.weight"])
        add(b + "laurel_l.weight", state[p + "laurel.linear_left.weight"])
        add(b + "laurel_r.weight", state[p + "laurel.linear_right.weight"])
        add(b + "laurel_post_norm.weight", state[p + "laurel.post_laurel_norm.weight"])
        add(b + "altup_router.weight", state[p + "altup.modality_router.weight"])
        add(b + "altup_router_norm.weight", state[p + "altup.router_norm.weight"])
        add(b + "altup_predict_coef.weight", state[p + "altup.prediction_coefs.weight"])
        add(b + "altup_correct_coef.weight", state[p + "altup.correction_coefs.weight"])
        add(b + "altup_correct_scale.weight", state[p + "altup.correct_output_scale"])
        add(b + "inp_gate.weight", state[p + "per_layer_input_gate.weight"])
        add(b + "proj.weight", state[p + "per_layer_projection.weight"])
        add(b + "post_norm.weight", state[p + "post_per_layer_input_norm.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()
