"""HF-layout converters for checkpoints with non-llama tensor naming.

Each function takes a real HuggingFace checkpoint layout (renaming,
de-fusing fused QKV blocks, splitting gate_up projections) and emits the
canonical GGUF ``blk.N.*`` scheme this engine and llama.cpp share.  The
name maps follow the public GGUF conventions (spec:
``gguf-py/gguf/tensor_mapping.py`` and the per-arch ``Model`` subclasses
of ``convert_hf_to_gguf.py`` in the reference); the implementations are
original and funnel through :func:`convert_hf.convert_hf_llama` wherever
the target layout is llama-shaped.
"""

from __future__ import annotations

import re

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter
from .convert_hf import (
    _common_header,
    _write_vocab,
    convert_hf_llama,
    permute_qk,
)

# ---------------------------------------------------------------------------
# shims
# ---------------------------------------------------------------------------


class _Shim:
    """Converter-facing stand-in: ``.config`` + ``.state_dict()``."""

    def __init__(self, config, state):
        self.config = config
        self._state = state

    def state_dict(self):
        return self._state


class _Cfg:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _to_t(arr):
    import torch

    return arr if hasattr(arr, "detach") else torch.as_tensor(np.asarray(arr))


def _np_state(model) -> dict:
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


def _rename(state: dict, rules: list[tuple[str, str]]) -> dict:
    """Regex-rename every key; unmatched keys pass through."""
    out = {}
    for k, v in state.items():
        nk = k
        for pat, rep in rules:
            nk = re.sub(pat, rep, nk)
        out[nk] = _to_t(v)
    return out


def _g(cfg, *names, default=None):
    for n in names:
        v = getattr(cfg, n, None)
        if v is not None:
            return v
    return default


def _llama_cfg(hf, **extra) -> _Cfg:
    """Normalize config attribute aliases into the llama-converter names."""
    n_head = _g(hf, "num_attention_heads", "n_head", "n_heads")
    kw = dict(
        num_attention_heads=n_head,
        num_key_value_heads=_g(hf, "num_key_value_heads", "n_kv_heads",
                               "num_kv_heads", default=n_head),
        hidden_size=_g(hf, "hidden_size", "n_embd", "d_model"),
        intermediate_size=_g(hf, "intermediate_size", "n_inner",
                             "mlp_hidden_size", "ffn_hidden_size", default=0),
        num_hidden_layers=_g(hf, "num_hidden_layers", "n_layer", "n_layers",
                             "num_layers"),
        max_position_embeddings=_g(hf, "max_position_embeddings", "n_positions",
                                   "max_sequence_length", default=2048),
        vocab_size=_g(hf, "vocab_size", "padded_vocab_size"),
        rope_theta=_g(hf, "rope_theta", "rotary_emb_base", default=10000.0),
        name_or_path=_g(hf, "name_or_path", default="hf-convert"),
    )
    eps = _g(hf, "rms_norm_eps", "layer_norm_epsilon", "layer_norm_eps",
             "norm_eps", default=1e-5)
    kw["rms_norm_eps"] = eps
    hd = _g(hf, "head_dim")
    if hd:
        kw["head_dim"] = hd
    kw.update(extra)
    return _Cfg(**kw)


_BIAS_LAYER_MAP = [
    ("input_layernorm.weight", "attn_norm.weight"),
    ("input_layernorm.bias", "attn_norm.bias"),
    ("self_attn.q_proj.weight", "attn_q.weight"),
    ("self_attn.q_proj.bias", "attn_q.bias"),
    ("self_attn.k_proj.weight", "attn_k.weight"),
    ("self_attn.k_proj.bias", "attn_k.bias"),
    ("self_attn.v_proj.weight", "attn_v.weight"),
    ("self_attn.v_proj.bias", "attn_v.bias"),
    ("self_attn.q_norm.weight", "attn_q_norm.weight"),
    ("self_attn.k_norm.weight", "attn_k_norm.weight"),
    ("self_attn.o_proj.weight", "attn_output.weight"),
    ("self_attn.o_proj.bias", "attn_output.bias"),
    ("post_attention_layernorm.weight", "ffn_norm.weight"),
    ("post_attention_layernorm.bias", "ffn_norm.bias"),
    ("mlp.gate_proj.weight", "ffn_gate.weight"),
    ("mlp.gate_proj.bias", "ffn_gate.bias"),
    ("mlp.up_proj.weight", "ffn_up.weight"),
    ("mlp.up_proj.bias", "ffn_up.bias"),
    ("mlp.down_proj.weight", "ffn_down.weight"),
    ("mlp.down_proj.bias", "ffn_down.bias"),
]


# ---------------------------------------------------------------------------
# llama-shaped renames
# ---------------------------------------------------------------------------


def convert_hf_exaone(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """ExaoneForCausalLM → GGUF arch "exaone" (NEOX rope).

    HF names transformer.h.N.{ln_1, attn.attention.*, ln_2,
    mlp.c_fc_0(gate)/c_fc_1(up)/c_proj} (spec: tensor_mapping.py exaone
    rows; llm_build_exaone src/llama-model.cpp:14052)."""
    state = _rename(model.state_dict(), [
        (r"^transformer\.wte\.", "model.embed_tokens."),
        (r"^transformer\.ln_f\.", "model.norm."),
        (r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm."),
        (r"^transformer\.h\.(\d+)\.ln_2\.", r"model.layers.\1.post_attention_layernorm."),
        (r"^transformer\.h\.(\d+)\.attn\.attention\.out_proj\.", r"model.layers.\1.self_attn.o_proj."),
        (r"^transformer\.h\.(\d+)\.attn\.attention\.", r"model.layers.\1.self_attn."),
        (r"^transformer\.h\.(\d+)\.mlp\.c_fc_0\.", r"model.layers.\1.mlp.gate_proj."),
        (r"^transformer\.h\.(\d+)\.mlp\.c_fc_1\.", r"model.layers.\1.mlp.up_proj."),
        (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.", r"model.layers.\1.mlp.down_proj."),
    ])
    if "lm_head.weight" not in state:
        state["lm_head.weight"] = state["model.embed_tokens.weight"]
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="exaone", permute=False)


def convert_hf_baichuan(model, tokenizer_vocab, out_path: str,
                        quant_type=GGMLType.F16) -> str:
    """BaichuanForCausalLM → GGUF arch "baichuan".

    Fused ``W_pack`` splits into thirds [q|k|v]; q/k permute to the
    interleaved NORM layout (13B+ is ALiBi where the per-head permutation
    cancels in q·k) — spec: BaichuanModel in convert_hf_to_gguf.py,
    llm_build_baichuan src/llama-model.cpp:6464."""
    import torch

    state = {k: _to_t(v) for k, v in model.state_dict().items()}
    out = {}
    for k, v in state.items():
        m = re.match(r"^model\.layers\.(\d+)\.self_attn\.W_pack\.weight$", k)
        if m:
            D = v.shape[0] // 3
            p = f"model.layers.{m.group(1)}.self_attn."
            out[p + "q_proj.weight"] = v[:D]
            out[p + "k_proj.weight"] = v[D:2 * D]
            out[p + "v_proj.weight"] = v[2 * D:]
        else:
            out[k] = v
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, out), tokenizer_vocab, out_path,
                            quant_type, arch="baichuan", permute=True)


_ORION_MAP = [p for p in _BIAS_LAYER_MAP if "q_norm" not in p[0] and "k_norm" not in p[0]]


def convert_hf_orion(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """OrionForCausalLM → GGUF arch "orion" (LayerNorm+bias blocks, NEOX
    rope) — spec: llm_build_orion src/llama-model.cpp:9614."""
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, {k: _to_t(v) for k, v in model.state_dict().items()}),
                            tokenizer_vocab, out_path, quant_type, arch="orion",
                            permute=False, layer_map=_ORION_MAP)


def convert_hf_stablelm(model, tokenizer_vocab, out_path: str,
                        quant_type=GGMLType.F16) -> str:
    """StableLmForCausalLM → GGUF arch "stablelm" (partial rotary via
    rope.dimension_count, LayerNorm biases, optional qkv biases) — spec:
    StableLMModel in convert_hf_to_gguf.py."""
    hf = model.config
    cfg = _llama_cfg(hf)
    hd = cfg.hidden_size // cfg.num_attention_heads
    rope_dim = int(hd * _g(hf, "partial_rotary_factor", "rope_pct", default=0.25))
    return convert_hf_llama(_Shim(cfg, {k: _to_t(v) for k, v in model.state_dict().items()}),
                            tokenizer_vocab, out_path, quant_type, arch="stablelm",
                            permute=False, layer_map=_BIAS_LAYER_MAP,
                            rope_dim=rope_dim)


def convert_hf_internlm2(model, tokenizer_vocab, out_path: str,
                         quant_type=GGMLType.F16) -> str:
    """InternLM2ForCausalLM → GGUF arch "internlm2".

    Fused ``attention.wqkv`` is grouped per kv-head as [g q-heads | k | v];
    de-grouped to separate q/k/v then permuted to the interleaved layout
    (spec: InternLM2Model.modify_tensors in convert_hf_to_gguf.py)."""
    hf = model.config
    cfg = _llama_cfg(hf)
    n_head, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = getattr(cfg, "head_dim", None) or cfg.hidden_size // n_head
    g = n_head // n_kv
    out = {}
    for k, v in model.state_dict().items():
        v = _to_t(v)
        m = re.match(r"^model\.layers\.(\d+)\.attention\.wqkv\.weight$", k)
        if m:
            p = f"model.layers.{m.group(1)}.self_attn."
            w = v.reshape(n_kv, g + 2, hd, -1)
            out[p + "q_proj.weight"] = w[:, :g].reshape(n_head * hd, -1)
            out[p + "k_proj.weight"] = w[:, g].reshape(n_kv * hd, -1)
            out[p + "v_proj.weight"] = w[:, g + 1].reshape(n_kv * hd, -1)
            continue
        k = re.sub(r"^model\.tok_embeddings\.", "model.embed_tokens.", k)
        k = re.sub(r"^output\.", "lm_head.", k)
        k = re.sub(r"\.attention_norm\.", ".input_layernorm.", k)
        k = re.sub(r"\.attention\.wo\.", ".self_attn.o_proj.", k)
        k = re.sub(r"\.ffn_norm\.", ".post_attention_layernorm.", k)
        k = re.sub(r"\.feed_forward\.w1\.", ".mlp.gate_proj.", k)
        k = re.sub(r"\.feed_forward\.w3\.", ".mlp.up_proj.", k)
        k = re.sub(r"\.feed_forward\.w2\.", ".mlp.down_proj.", k)
        out[k] = v
    return convert_hf_llama(_Shim(cfg, out), tokenizer_vocab, out_path,
                            quant_type, arch="internlm2", permute=True)


_PLAMO_MAP = [
    ("input_layernorm.weight", "attn_norm.weight"),
    ("self_attn.q_proj.weight", "attn_q.weight"),
    ("self_attn.k_proj.weight", "attn_k.weight"),
    ("self_attn.v_proj.weight", "attn_v.weight"),
    ("self_attn.o_proj.weight", "attn_output.weight"),
    ("mlp.gate_proj.weight", "ffn_gate.weight"),
    ("mlp.up_proj.weight", "ffn_up.weight"),
    ("mlp.down_proj.weight", "ffn_down.weight"),
]


def convert_hf_plamo(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """PlamoForCausalLM → GGUF arch "plamo" (shared-norm parallel residual,
    NEOX rope) — spec: llm_build_plamo src/llama-model.cpp:9275; HF names
    model.layers.layers.N.* (tensor_mapping.py plamo rows)."""
    state = _rename(model.state_dict(), [
        (r"^model\.layers\.layers\.(\d+)\.norm\.", r"model.layers.\1.input_layernorm."),
        (r"^model\.layers\.layers\.(\d+)\.", r"model.layers.\1."),
    ])
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="plamo", permute=False,
                            layer_map=_PLAMO_MAP)


def convert_hf_refact(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """GPTRefactForCausalLM → GGUF arch "refact" (RMS + ALiBi MQA).

    ``attn.kv`` splits into k/v (1 kv head), ``mlp.gate_up_proj`` splits
    at ff_dim — spec: RefactModel.modify_tensors
    convert_hf_to_gguf.py:1825-1851."""
    hf = model.config
    D = _g(hf, "n_embd", "hidden_size")
    inner = 4 * D
    ff = 256 * ((int(2 * inner / 3) + 255) // 256)
    n_head = _g(hf, "n_head", "num_attention_heads")
    hd = D // n_head
    out = {}
    for k, v in model.state_dict().items():
        v = _to_t(v)
        m = re.match(r"^transformer\.h\.(\d+)\.attn\.kv\.weight$", k)
        if m:
            p = f"model.layers.{m.group(1)}.self_attn."
            out[p + "k_proj.weight"] = v[:hd]
            out[p + "v_proj.weight"] = v[hd:]
            continue
        m = re.match(r"^transformer\.h\.(\d+)\.mlp\.gate_up_proj\.weight$", k)
        if m:
            p = f"model.layers.{m.group(1)}.mlp."
            out[p + "gate_proj.weight"] = v[:ff]
            out[p + "up_proj.weight"] = v[ff:]
            continue
        k = re.sub(r"^transformer\.wte\.", "model.embed_tokens.", k)
        k = re.sub(r"^transformer\.ln_f\.", "model.norm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_2\.", r"model.layers.\1.post_attention_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.attn\.q\.", r"model.layers.\1.self_attn.q_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.attn\.c_proj\.", r"model.layers.\1.self_attn.o_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_proj\.", r"model.layers.\1.mlp.down_proj.", k)
        out[k] = v
    if "lm_head.weight" not in out:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    cfg = _llama_cfg(hf, num_key_value_heads=1, intermediate_size=ff)
    return convert_hf_llama(_Shim(cfg, out), tokenizer_vocab, out_path,
                            quant_type, arch="refact", permute=False,
                            layer_map=_PLAMO_MAP + [
                                ("post_attention_layernorm.weight", "ffn_norm.weight")])


def convert_hf_jais(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """JAISLMHeadModel → GGUF arch "jais" (gpt2-style Conv1D transposed
    weights, fused c_attn, ALiBi, swiglu c_fc2=gate/c_fc=up) — spec:
    JaisModel in convert_hf_to_gguf.py; llm_build_jais
    src/llama-model.cpp:13385."""
    import torch

    hf = model.config
    D = _g(hf, "n_embd", "hidden_size")
    out = {}
    for k, v in model.state_dict().items():
        v = _to_t(v)
        if k.endswith(".weight") and v.ndim == 2 and ".wte" not in k \
                and "relative_pe" not in k and "lm_head" not in k:
            v = v.t().contiguous()  # Conv1D stores (in, out)
        m = re.match(r"^transformer\.h\.(\d+)\.attn\.c_attn\.(weight|bias)$", k)
        if m:
            p, kind = f"model.layers.{m.group(1)}.self_attn.", m.group(2)
            out[p + f"q_proj.{kind}"] = v[:D] if kind == "weight" else v[:D]
            out[p + f"k_proj.{kind}"] = v[D:2 * D]
            out[p + f"v_proj.{kind}"] = v[2 * D:]
            continue
        if "relative_pe" in k:
            continue  # ALiBi slopes are recomputed, not stored
        k = re.sub(r"^transformer\.wte\.", "model.embed_tokens.", k)
        k = re.sub(r"^transformer\.ln_f\.", "model.norm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_2\.", r"model.layers.\1.post_attention_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.attn\.c_proj\.", r"model.layers.\1.self_attn.o_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_fc2\.", r"model.layers.\1.mlp.gate_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_fc\.", r"model.layers.\1.mlp.up_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_proj\.", r"model.layers.\1.mlp.down_proj.", k)
        out[k] = v
    if "lm_head.weight" not in out:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    cfg = _llama_cfg(hf)
    return convert_hf_llama(_Shim(cfg, out), tokenizer_vocab, out_path,
                            quant_type, arch="jais", permute=False,
                            layer_map=_BIAS_LAYER_MAP)


def convert_hf_codeshell(model, tokenizer_vocab, out_path: str,
                         quant_type=GGMLType.F16) -> str:
    """CodeShellForCausalLM → GGUF arch "codeshell" (gpt-bigcode body +
    NEOX rope, fused MQA c_attn [q|k|v] rows, ungated GELU FFN) — spec:
    CodeShellModel in convert_hf_to_gguf.py; llm_build_codeshell
    src/llama-model.cpp:9500."""
    hf = model.config
    n_head = _g(hf, "n_head", "num_attention_heads")
    n_kv = _g(hf, "num_query_groups", "num_key_value_heads", default=1)
    D = _g(hf, "n_embd", "hidden_size")
    hd = D // n_head
    out = {}
    for k, v in model.state_dict().items():
        v = _to_t(v)
        m = re.match(r"^transformer\.h\.(\d+)\.attn\.c_attn\.(weight|bias)$", k)
        if m:
            p, kind = f"model.layers.{m.group(1)}.self_attn.", m.group(2)
            Dq, Dkv = n_head * hd, n_kv * hd
            out[p + f"q_proj.{kind}"] = v[:Dq]
            out[p + f"k_proj.{kind}"] = v[Dq:Dq + Dkv]
            out[p + f"v_proj.{kind}"] = v[Dq + Dkv:Dq + 2 * Dkv]
            continue
        k = re.sub(r"^transformer\.wte\.", "model.embed_tokens.", k)
        k = re.sub(r"^transformer\.ln_f\.", "model.norm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_1\.", r"model.layers.\1.input_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.ln_2\.", r"model.layers.\1.post_attention_layernorm.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.attn\.c_proj\.", r"model.layers.\1.self_attn.o_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_fc\.", r"model.layers.\1.mlp.up_proj.", k)
        k = re.sub(r"^transformer\.h\.(\d+)\.mlp\.c_proj\.", r"model.layers.\1.mlp.down_proj.", k)
        out[k] = v
    if "lm_head.weight" not in out:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    cfg = _llama_cfg(hf, num_key_value_heads=n_kv)
    no_gate = [p for p in _BIAS_LAYER_MAP if "ffn_gate" not in p[1]]
    return convert_hf_llama(_Shim(cfg, out), tokenizer_vocab, out_path,
                            quant_type, arch="codeshell", permute=False,
                            layer_map=no_gate)


def convert_hf_deepseek_v1(model, tokenizer_vocab, out_path: str,
                           quant_type=GGMLType.F16) -> str:
    """DeepseekForCausalLM (v1) → GGUF arch "deepseek" (dense-lead MoE,
    plural ``shared_experts``) — spec: DeepseekModel in
    convert_hf_to_gguf.py."""
    hf = model.config
    state = _rename(model.state_dict(), [
        (r"\.mlp\.shared_experts\.", ".mlp.shared_expert."),
    ])
    extra = {
        Keys.LLM.LEADING_DENSE_BLOCK_COUNT: int(_g(hf, "first_k_dense_replace", default=0)),
        Keys.LLM.EXPERT_SHARED_COUNT: int(_g(hf, "n_shared_experts", default=0)),
    }
    cfg = _llama_cfg(hf, num_experts=_g(hf, "n_routed_experts", default=0),
                     moe_intermediate_size=_g(hf, "moe_intermediate_size", default=0),
                     num_experts_per_tok=_g(hf, "num_experts_per_tok", default=0),
                     norm_topk_prob=_g(hf, "norm_topk_prob", default=False))
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="deepseek", permute=True,
                            extra_kv=extra)


def convert_hf_llada(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """LLaDAModelLM → GGUF arch "llada" (diffusion LM, llama block under
    OLMo-lineage names model.transformer.blocks.N.*) — spec: LLaDAModel
    in convert_hf_to_gguf.py:3039-3090 and tensor_mapping.py llada rows."""
    state = _rename(model.state_dict(), [
        (r"^model\.transformer\.wte\.", "model.embed_tokens."),
        (r"^model\.transformer\.ln_f\.", "model.norm."),
        (r"^model\.transformer\.ff_out\.", "lm_head."),
        (r"^model\.transformer\.blocks\.(\d+)\.attn_norm\.", r"model.layers.\1.input_layernorm."),
        (r"^model\.transformer\.blocks\.(\d+)\.ff_norm\.", r"model.layers.\1.post_attention_layernorm."),
        (r"^model\.transformer\.blocks\.(\d+)\.q_proj\.", r"model.layers.\1.self_attn.q_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.k_proj\.", r"model.layers.\1.self_attn.k_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.v_proj\.", r"model.layers.\1.self_attn.v_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.attn_out\.", r"model.layers.\1.self_attn.o_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.ff_proj\.", r"model.layers.\1.mlp.gate_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.up_proj\.", r"model.layers.\1.mlp.up_proj."),
        (r"^model\.transformer\.blocks\.(\d+)\.ff_out\.", r"model.layers.\1.mlp.down_proj."),
    ])
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="llada", permute=True)


def convert_hf_dream(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """DreamForCausalLM → GGUF arch "dream" (diffusion LM over the qwen2
    block shape; NEOX rope so no permutation) — spec: DreamModel in
    convert_hf_to_gguf.py."""
    cfg = _llama_cfg(model.config)
    return convert_hf_llama(_Shim(cfg, {k: _to_t(v) for k, v in model.state_dict().items()}),
                            tokenizer_vocab, out_path, quant_type, arch="dream",
                            permute=False)


# ---------------------------------------------------------------------------
# fused-QKV classics with bespoke GGUF layouts
# ---------------------------------------------------------------------------


def _qt_fn(quant_type):
    from ..gguf.constants import GGML_BLOCK_SIZES

    blck, _ = GGML_BLOCK_SIZES[quant_type]

    def qt(name, arr):
        if arr.ndim == 1 or "norm" in name:
            return GGMLType.F32
        return quant_type if arr.shape[-1] % blck == 0 else GGMLType.F16
    return qt


def convert_hf_falcon(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """FalconForCausalLM (7B layout: single norm, parallel residual) →
    GGUF arch "falcon".

    Fused ``query_key_value`` is grouped per kv-head [g q | k | v];
    de-grouped to contiguous q/k/v (spec: FalconModel.modify_tensors in
    convert_hf_to_gguf.py). The two-norm 40B layout (ln_attn/ln_mlp) is
    not supported by the engine's falcon graph and raises."""
    hf = model.config
    state = _np_state(model)
    if any("ln_attn" in k for k in state):
        raise NotImplementedError("falcon 40B two-norm layout (ln_attn/ln_mlp)")
    n_head = _g(hf, "num_attention_heads", "n_head")
    if _g(hf, "new_decoder_architecture", default=False):
        n_kv = _g(hf, "num_kv_heads", "n_head_kv", default=n_head)
    elif _g(hf, "multi_query", default=False):
        n_kv = 1
    else:
        n_kv = n_head
    D = _g(hf, "hidden_size", "n_embd")
    hd = D // n_head
    g = n_head // n_kv
    L = _g(hf, "num_hidden_layers", "n_layer")
    eps = _g(hf, "layer_norm_epsilon", default=1e-5)

    w = GGUFWriter(out_path, "falcon")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="falcon-convert"))
    cfg = _Cfg(max_position_embeddings=_g(hf, "max_position_embeddings", default=2048),
               hidden_size=D, num_hidden_layers=L, vocab_size=hf.vocab_size)
    _common_header(w, cfg, n_head, n_kv, hd, Keys.Attention.LAYERNORM_EPS, eps)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "ffn_hidden_size", default=4 * D))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, hd)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rope_theta", default=10000.0))
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["transformer.word_embeddings.weight"])
    for i in range(L):
        p, b = f"transformer.h.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_norm.bias", state[p + "input_layernorm.bias"])
        qkv = state[p + "self_attention.query_key_value.weight"]
        wq = qkv.reshape(n_kv, g + 2, hd, D)
        add(b + "attn_q.weight", wq[:, :g].reshape(n_head * hd, D))
        add(b + "attn_k.weight", wq[:, g].reshape(n_kv * hd, D))
        add(b + "attn_v.weight", wq[:, g + 1].reshape(n_kv * hd, D))
        add(b + "attn_output.weight", state[p + "self_attention.dense.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.dense_h_to_4h.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.dense_4h_to_h.weight"])
    add("output_norm.weight", state["transformer.ln_f.weight"])
    add("output_norm.bias", state["transformer.ln_f.bias"])
    add("output.weight", state.get("lm_head.weight",
                                   state["transformer.word_embeddings.weight"]))
    return w.write()


def convert_hf_gptneox(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """GPTNeoXForCausalLM → GGUF arch "gptneox".

    Fused ``query_key_value`` interleaves q/k/v *per head* ((nh, 3, hd)
    rows); de-interleaved to contiguous q/k/v (+biases) — spec:
    GPTNeoXModel.modify_tensors in convert_hf_to_gguf.py."""
    hf = model.config
    state = _np_state(model)
    n_head = _g(hf, "num_attention_heads")
    D = _g(hf, "hidden_size")
    hd = D // n_head
    L = _g(hf, "num_hidden_layers")

    w = GGUFWriter(out_path, "gptneox")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="gptneox-convert"))
    cfg = _Cfg(max_position_embeddings=_g(hf, "max_position_embeddings", default=2048),
               hidden_size=D, num_hidden_layers=L, vocab_size=hf.vocab_size)
    _common_header(w, cfg, n_head, n_head, hd, Keys.Attention.LAYERNORM_EPS,
                   _g(hf, "layer_norm_eps", default=1e-5))
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "intermediate_size", default=4 * D))
    rot = int(hd * _g(hf, "rotary_pct", default=1.0))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rot)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rotary_emb_base", "rope_theta", default=10000.0))
    w.add_bool("gptneox.use_parallel_residual", bool(_g(hf, "use_parallel_residual", default=True)))
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["gpt_neox.embed_in.weight"])
    for i in range(L):
        p, b = f"gpt_neox.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "attn_norm.bias", state[p + "input_layernorm.bias"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "ffn_norm.bias", state[p + "post_attention_layernorm.bias"])
        qkv = state[p + "attention.query_key_value.weight"].reshape(n_head, 3, hd, D)
        add(b + "attn_q.weight", qkv[:, 0].reshape(n_head * hd, D))
        add(b + "attn_k.weight", qkv[:, 1].reshape(n_head * hd, D))
        add(b + "attn_v.weight", qkv[:, 2].reshape(n_head * hd, D))
        qkvb = state[p + "attention.query_key_value.bias"].reshape(n_head, 3, hd)
        add(b + "attn_q.bias", qkvb[:, 0].reshape(-1))
        add(b + "attn_k.bias", qkvb[:, 1].reshape(-1))
        add(b + "attn_v.bias", qkvb[:, 2].reshape(-1))
        add(b + "attn_output.weight", state[p + "attention.dense.weight"])
        add(b + "attn_output.bias", state[p + "attention.dense.bias"])
        add(b + "ffn_up.weight", state[p + "mlp.dense_h_to_4h.weight"])
        add(b + "ffn_up.bias", state[p + "mlp.dense_h_to_4h.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.dense_4h_to_h.weight"])
        add(b + "ffn_down.bias", state[p + "mlp.dense_4h_to_h.bias"])
    add("output_norm.weight", state["gpt_neox.final_layer_norm.weight"])
    add("output_norm.bias", state["gpt_neox.final_layer_norm.bias"])
    add("output.weight", state.get("embed_out.weight", state["gpt_neox.embed_in.weight"]))
    return w.write()


def convert_hf_gpt_bigcode(model, tokenizer_vocab, out_path: str,
                           quant_type=GGMLType.F16) -> str:
    """GPTBigCodeForCausalLM (starcoder v1) → GGUF arch "starcoder".

    MQA ``c_attn`` is already contiguous [q|k|v] so stays fused as
    attn_qkv (the loader splits it); learned positions ride
    position_embd — spec: StarCoderModel in convert_hf_to_gguf.py."""
    hf = model.config
    state = _np_state(model)
    n_head = _g(hf, "n_head", "num_attention_heads")
    n_kv = 1 if _g(hf, "multi_query", default=True) else n_head
    D = _g(hf, "n_embd", "hidden_size")
    L = _g(hf, "n_layer", "num_hidden_layers")

    w = GGUFWriter(out_path, "starcoder")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="starcoder-convert"))
    cfg = _Cfg(max_position_embeddings=_g(hf, "n_positions", default=2048),
               hidden_size=D, num_hidden_layers=L, vocab_size=hf.vocab_size)
    _common_header(w, cfg, n_head, n_kv, D // n_head, Keys.Attention.LAYERNORM_EPS,
                   _g(hf, "layer_norm_epsilon", default=1e-5))
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "n_inner", default=4 * D))
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["transformer.wte.weight"])
    add("position_embd.weight", state["transformer.wpe.weight"])
    for i in range(L):
        p, b = f"transformer.h.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "ln_1.weight"])
        add(b + "attn_norm.bias", state[p + "ln_1.bias"])
        add(b + "attn_qkv.weight", state[p + "attn.c_attn.weight"])
        add(b + "attn_qkv.bias", state[p + "attn.c_attn.bias"])
        add(b + "attn_output.weight", state[p + "attn.c_proj.weight"])
        add(b + "attn_output.bias", state[p + "attn.c_proj.bias"])
        add(b + "ffn_norm.weight", state[p + "ln_2.weight"])
        add(b + "ffn_norm.bias", state[p + "ln_2.bias"])
        add(b + "ffn_up.weight", state[p + "mlp.c_fc.weight"])
        add(b + "ffn_up.bias", state[p + "mlp.c_fc.bias"])
        add(b + "ffn_down.weight", state[p + "mlp.c_proj.weight"])
        add(b + "ffn_down.bias", state[p + "mlp.c_proj.bias"])
    add("output_norm.weight", state["transformer.ln_f.weight"])
    add("output_norm.bias", state["transformer.ln_f.bias"])
    add("output.weight", state.get("lm_head.weight", state["transformer.wte.weight"]))
    return w.write()


# ---------------------------------------------------------------------------
# wave 2: olmo / grok / arctic / smallthinker
# ---------------------------------------------------------------------------


def convert_hf_olmo(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """OlmoForCausalLM (v1) → GGUF arch "olmo".

    OLMo's non-parametric LayerNorm stores no tensors; ones-weights are
    synthesized so the engine's LayerNorm path computes the identical
    standardization.  clip_qkv rides attention.clamp_kqv — spec: OlmoModel
    in convert_hf_to_gguf.py:5819; llm_build_olmo src/llama-model.cpp:11740."""
    import torch

    hf = model.config
    state = {k: _to_t(v) for k, v in model.state_dict().items()}
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    ones = torch.ones(D)
    for i in range(L):
        p = f"model.layers.{i}."
        state.setdefault(p + "input_layernorm.weight", ones)
        state.setdefault(p + "post_attention_layernorm.weight", ones)
    state.setdefault("model.norm.weight", ones)
    extra = {}
    clip = _g(hf, "clip_qkv")
    if clip:
        extra[Keys.Attention.CLAMP_KQV] = float(clip)
    cfg = _llama_cfg(hf)
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="olmo", permute=True,
                            extra_kv=extra or None)


_GROK_MAP = None  # built lazily below


def convert_hf_grok(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """GrokForCausalLM → GGUF arch "grok" (GELU MoE, post-attention +
    post-ffn norms, tied head).

    HF names transformer.decoder_layer.N.{rms_norm..rms_norm_3,
    multi_head_attention.*, router, moe.X.{linear,linear_1,linear_v}}
    (spec: GrokModel convert_hf_to_gguf.py:2619 + tensor_mapping grok
    rows; llm_build_grok src/llama-model.cpp:6821)."""
    state = _rename(model.state_dict(), [
        (r"^transformer\.in_out_embed\.", "model.embed_tokens."),
        (r"^transformer\.rms_norm\.", "model.norm."),
        (r"^transformer\.decoder_layer\.(\d+)\.rms_norm\.", r"model.layers.\1.input_layernorm."),
        (r"^transformer\.decoder_layer\.(\d+)\.rms_norm_1\.", r"model.layers.\1.post_attn_norm."),
        (r"^transformer\.decoder_layer\.(\d+)\.rms_norm_2\.", r"model.layers.\1.post_attention_layernorm."),
        (r"^transformer\.decoder_layer\.(\d+)\.rms_norm_3\.", r"model.layers.\1.layer_out_norm."),
        (r"^transformer\.decoder_layer\.(\d+)\.multi_head_attention\.query\.", r"model.layers.\1.self_attn.q_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.multi_head_attention\.key\.", r"model.layers.\1.self_attn.k_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.multi_head_attention\.value\.", r"model.layers.\1.self_attn.v_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.multi_head_attention\.linear\.", r"model.layers.\1.self_attn.o_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.router\.", r"model.layers.\1.mlp.gate."),
        (r"^transformer\.decoder_layer\.(\d+)\.moe\.(\d+)\.linear\.", r"model.layers.\1.mlp.experts.\2.gate_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.moe\.(\d+)\.linear_v\.", r"model.layers.\1.mlp.experts.\2.up_proj."),
        (r"^transformer\.decoder_layer\.(\d+)\.moe\.(\d+)\.linear_1\.", r"model.layers.\1.mlp.experts.\2.down_proj."),
    ])
    from .convert_hf import _LAYER_MAP

    lm = _LAYER_MAP + [
        ("post_attn_norm.weight", "attn_output_norm.weight"),
        ("layer_out_norm.weight", "layer_output_norm.weight"),
    ]
    hf = model.config
    cfg = _llama_cfg(hf,
                     num_experts=_g(hf, "num_local_experts", "num_experts", default=0),
                     num_experts_per_tok=_g(hf, "num_experts_per_tok", default=2))
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="grok", permute=False,
                            layer_map=lm)


def convert_hf_arctic(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """ArcticForCausalLM → GGUF arch "arctic" (dense residual FFN +
    parallel MoE branch on the layer input).

    residual_mlp.w1/w3/w2 are the dense FFN; block_sparse_moe rides the
    mixtral stacker; residual_layernorm → ffn_norm and the HF
    post_attention_layernorm → ffn_norm_exps (spec: ArcticModel
    convert_hf_to_gguf.py:6004 + arch-override rows tensor_mapping.py:1436;
    llm_build_arctic src/llama-model.cpp:12391)."""
    state = _rename(model.state_dict(), [
        # order matters: stash the MoE-branch norm before renaming the
        # dense-residual norm onto post_attention_layernorm (→ ffn_norm)
        (r"\.post_attention_layernorm\.", ".moe_norm."),
        (r"\.residual_layernorm\.", ".post_attention_layernorm."),
        (r"\.residual_mlp\.w1\.", ".mlp.gate_proj."),
        (r"\.residual_mlp\.w3\.", ".mlp.up_proj."),
        (r"\.residual_mlp\.w2\.", ".mlp.down_proj."),
    ])
    from .convert_hf import _LAYER_MAP

    lm = _LAYER_MAP + [("moe_norm.weight", "ffn_norm_exps.weight")]
    hf = model.config
    cfg = _llama_cfg(hf,
                     num_local_experts=_g(hf, "num_local_experts", default=0),
                     num_experts_per_tok=_g(hf, "num_experts_per_tok", default=2))
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="arctic", permute=True,
                            layer_map=lm)


def convert_hf_smallthinker(model, tokenizer_vocab, out_path: str,
                            quant_type=GGMLType.F16) -> str:
    """SmallThinkerForCausalLM → GGUF arch "smallthinker" (gated-ReLU MoE,
    pre-norm router, optional dense-first iSWA).

    block_sparse_moe.primary_router → ffn_gate_inp, experts.X.{gate,up,
    down} stack via the qwen2moe path (spec: SmallThinkerModel
    convert_hf_to_gguf.py:8298; llm_build_smallthinker
    src/llama-model.cpp:17918)."""
    state = _rename(model.state_dict(), [
        (r"\.block_sparse_moe\.primary_router\.", ".mlp.gate."),
        (r"\.block_sparse_moe\.experts\.(\d+)\.gate\.", r".mlp.experts.\1.gate_proj."),
        (r"\.block_sparse_moe\.experts\.(\d+)\.up\.", r".mlp.experts.\1.up_proj."),
        (r"\.block_sparse_moe\.experts\.(\d+)\.down\.", r".mlp.experts.\1.down_proj."),
    ])
    hf = model.config
    n_exp = _g(hf, "num_experts", "moe_num_primary_experts", default=0)
    used = _g(hf, "num_experts_per_tok", "moe_num_active_primary_experts", default=2)
    mff = _g(hf, "moe_ffn_hidden_size", default=0)
    extra = {
        Keys.LLM.EXPERT_GATING_FUNC:
            1 if _g(hf, "moe_primary_router_apply_softmax", default=False) else 2,
    }
    layout = _g(hf, "sliding_window_layout") or []
    if any(layout):
        sw = _g(hf, "sliding_window_size", default=0)
        if sw:
            extra[Keys.Attention.SLIDING_WINDOW] = int(sw)
    cfg = _llama_cfg(hf, num_experts=n_exp, num_experts_per_tok=used,
                     moe_intermediate_size=mff,
                     intermediate_size=_g(hf, "intermediate_size",
                                          "moe_ffn_hidden_size", default=0))
    return convert_hf_llama(_Shim(cfg, state), tokenizer_vocab, out_path,
                            quant_type, arch="smallthinker", permute=False,
                            extra_kv=extra)


# ---------------------------------------------------------------------------
# wave 3: ragged per-layer archs (openelm / deci)
# ---------------------------------------------------------------------------


def _make_divisible(v, divisor: int) -> int:
    # apple's rounding rule (configuration_openelm.py make_divisible)
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def convert_hf_openelm(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """OpenELMForCausalLM → GGUF arch "openelm" (per-layer head counts and
    FFN widths as header arrays, fused qkv kept fused, per-head q/k norms,
    tied head) — spec: OpenELMModel convert_hf_to_gguf.py:5929;
    llm_build_openelm src/llama-model.cpp:12116."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "model_dim", "hidden_size")
    L = _g(hf, "num_transformer_layers", "num_hidden_layers")
    hd = _g(hf, "head_dim")
    heads = list(_g(hf, "num_query_heads"))
    kvs = list(_g(hf, "num_kv_heads"))
    div = _g(hf, "ffn_dim_divisor", default=256)
    ffs = [_make_divisible(m * D, div) for m in _g(hf, "ffn_multipliers")]

    w = GGUFWriter(out_path, "openelm")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="openelm-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_context_length", default=2048))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_array(Keys.LLM.FEED_FORWARD_LENGTH, np.asarray(ffs, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT, np.asarray(heads, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(kvs, np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, hd)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, hd)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-6)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, hd)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rope_freq_constant", default=10000.0))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["transformer.token_embeddings.weight"])
    for i in range(L):
        p, b = f"transformer.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "attn_norm.weight"])
        add(b + "attn_qkv.weight", state[p + "attn.qkv_proj.weight"])
        add(b + "attn_q_norm.weight", state[p + "attn.q_norm.weight"])
        add(b + "attn_k_norm.weight", state[p + "attn.k_norm.weight"])
        add(b + "attn_output.weight", state[p + "attn.out_proj.weight"])
        add(b + "ffn_norm.weight", state[p + "ffn_norm.weight"])
        gate_up = state[p + "ffn.proj_1.weight"]
        add(b + "ffn_gate.weight", gate_up[:ffs[i]])
        add(b + "ffn_up.weight", gate_up[ffs[i]:])
        add(b + "ffn_down.weight", state[p + "ffn.proj_2.weight"])
    add("output_norm.weight", state["transformer.norm.weight"])
    if "lm_head.weight" in state:
        add("output.weight", state["lm_head.weight"])
    return w.write()


def convert_hf_deci(model, tokenizer_vocab, out_path: str,
                    quant_type=GGMLType.F16) -> str:
    """DeciLMForCausalLM (NAS llama) → GGUF arch "deci".

    Handles both layouts: Llama-3_1-Nemotron block_configs (per-layer
    n_heads_in_group / replace_with_linear / ffn_mult → head-count and
    FFN-width header arrays) and DeciLM-7B num_key_value_heads_per_layer.
    q/k permute per-layer with that layer's counts; linear-attention
    layers carry a lone ``self_attn.linear_attn`` → attn_output — spec:
    DeciModel convert_hf_to_gguf.py:2401; llm_build_deci
    src/llama-model.cpp:6308."""
    hf = model.config
    state = _np_state(model)
    n_head = _g(hf, "num_attention_heads")
    D = _g(hf, "hidden_size")
    hd = _g(hf, "head_dim") or D // n_head
    L = _g(hf, "num_hidden_layers")
    blocks = _g(hf, "block_configs")
    if blocks is not None:
        heads, kvs, ffs = [], [], []
        for bc in blocks:
            attn = bc["attention"] if isinstance(bc, dict) else bc.attention
            ffn = bc["ffn"] if isinstance(bc, dict) else bc.ffn
            gv = (lambda o, k: o.get(k) if isinstance(o, dict) else getattr(o, k, None))
            nig = gv(attn, "n_heads_in_group")
            if nig is None:
                heads.append(n_head if gv(attn, "replace_with_linear") else 0)
                kvs.append(0)
            else:
                heads.append(n_head)
                kvs.append(n_head // nig)
            mult = gv(ffn, "ffn_mult")
            if mult is None:
                ffs.append(0)
            else:
                inner = int(2 * mult * D / 3)
                ffs.append(inner + (-inner) % 256)
    else:
        heads = [n_head] * L
        kvs = list(_g(hf, "num_key_value_heads_per_layer",
                      default=[_g(hf, "num_key_value_heads", default=n_head)] * L))
        ffs = [_g(hf, "intermediate_size")] * L

    w = GGUFWriter(out_path, "deci")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="deci-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_position_embeddings", default=2048))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_array(Keys.LLM.FEED_FORWARD_LENGTH, np.asarray(ffs, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT, np.asarray(heads, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(kvs, np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, hd)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, hd)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, _g(hf, "rms_norm_eps", default=1e-5))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, hd)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rope_theta", default=10000.0))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        nh, nkv = heads[i], kvs[i]
        if p + "input_layernorm.weight" in state:
            add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        if nh > 0 and nkv > 0:
            add(b + "attn_q.weight", permute_qk(state[p + "self_attn.q_proj.weight"], nh))
            add(b + "attn_k.weight", permute_qk(state[p + "self_attn.k_proj.weight"], nkv))
            add(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
            add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        elif nh > 0:  # linear attention: lone replacement projection
            add(b + "attn_output.weight", state[p + "self_attn.linear_attn.weight"])
        if ffs[i] and p + "mlp.gate_proj.weight" in state:
            add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
            add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
            add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
            add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    add("output.weight", state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return w.write()


# ---------------------------------------------------------------------------
# wave 4: MLA archs (minicpm3 / plm)
# ---------------------------------------------------------------------------


def convert_hf_minicpm3(model, tokenizer_vocab, out_path: str,
                        quant_type=GGMLType.F16) -> str:
    """MiniCPM3ForCausalLM → GGUF arch "minicpm3": deepseek2's MLA layout
    (q_a/q_b low-rank, kv_b split into k_b/v_b) under minicpm3 keys, plus
    longrope factor tensors — spec: MiniCPM3Model
    convert_hf_to_gguf.py:2796; llm_build_minicpm3
    src/llama-model.cpp:9868."""
    from .convert_hf import convert_hf_deepseek2

    return convert_hf_deepseek2(model, tokenizer_vocab, out_path, quant_type,
                                arch="minicpm3")


def convert_hf_plm(model, tokenizer_vocab, out_path: str,
                   quant_type=GGMLType.F16) -> str:
    """PLMForCausalLM → GGUF arch "plm" (MLA without the q low-rank,
    ungated relu² FFN).

    kv_b_proj splits per head into attn_k_b (transposed to (rank, nope))
    and attn_v_b like deepseek2 — spec: PLMModel
    convert_hf_to_gguf.py:6459; llm_build_plm src/llama-model.cpp:15834."""
    hf = model.config
    state = _np_state(model)
    H = _g(hf, "num_attention_heads")
    rope_d = _g(hf, "qk_rope_head_dim")
    nope_d = _g(hf, "qk_nope_head_dim")
    v_d = _g(hf, "v_head_dim")
    rank = _g(hf, "kv_lora_rank")
    L = _g(hf, "num_hidden_layers")

    w = GGUFWriter(out_path, "plm")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="plm-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_position_embeddings", default=2048))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, _g(hf, "hidden_size"))
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "intermediate_size"))
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, 1)
    w.add_uint32(Keys.Attention.KEY_LENGTH, nope_d + rope_d)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, v_d)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, _g(hf, "rms_norm_eps", default=1e-5))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rope_d)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rope_theta", default=10000.0))
    w.add_uint32(Keys.Attention.KV_LORA_RANK, rank)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, arr, qt(name, arr))

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        add(b + "attn_kv_a_mqa.weight", state[p + "self_attn.kv_a_proj_with_mqa.weight"])
        add(b + "attn_kv_a_norm.weight", state[p + "self_attn.kv_a_layernorm.weight"])
        kv_b = state[p + "self_attn.kv_b_proj.weight"].reshape(H, nope_d + v_d, rank)
        add(b + "attn_k_b.weight",
            np.ascontiguousarray(kv_b[:, :nope_d, :].transpose(0, 2, 1)))
        add(b + "attn_v_b.weight", np.ascontiguousarray(kv_b[:, nope_d:, :]))
        add(b + "attn_output.weight", state[p + "self_attn.o_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    add("output.weight", state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return w.write()


# ---------------------------------------------------------------------------
# wave 5: RWKV family
# ---------------------------------------------------------------------------


def _rwkv_vocab_header(w, D, L, ff, eps, S, vocab, tokenizer_vocab, arch,
                       rms=False, n_kv=None):
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 1 << 20)  # not context limited
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, ff)
    w.add_uint32(Keys.Attention.HEAD_COUNT, D // S)
    if n_kv is not None:
        w.add_uint32(Keys.Attention.HEAD_COUNT_KV, n_kv)
    if rms:
        w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, eps)
    else:
        w.add_float32(Keys.Attention.LAYERNORM_EPS, eps)
    w.add_uint32(f"{arch}.wkv.head_size", S)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, vocab)
    _write_vocab(w, tokenizer_vocab)


def convert_hf_rwkv6(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """RWKV6 (Finch) HF layout ``rwkv.blocks.N.*`` → GGUF arch "rwkv6".

    time_maa_{w,k,v,r,g} fuse into one (5,1,D) lerp tensor, the low-rank
    projections transpose to GGUF (out,in) and time_maa_w2 permutes to
    (5,D,extra) — spec: Rwkv6Model convert_hf_to_gguf.py:5197.  The
    reference's fp16 rescale_every weight division is intentionally NOT
    applied: this engine runs the wkv state in fp32 and computes the
    unscaled function directly (the residual scale is absorbed by the
    final LayerNorm)."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    S = _g(hf, "head_size", default=64)
    eps = _g(hf, "layer_norm_epsilon", default=1e-5)
    ff = _g(hf, "intermediate_size") or int((D * 3.5) // 32 * 32)

    w = GGUFWriter(out_path, "rwkv6")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="rwkv6-convert"))
    _rwkv_vocab_header(w, D, L, ff, eps, S, hf.vocab_size, tokenizer_vocab, "rwkv6")
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr), qt(name, arr))

    add("token_embd.weight", state["rwkv.embeddings.weight"])
    add("token_embd_norm.weight", state["rwkv.blocks.0.pre_ln.weight"])
    add("token_embd_norm.bias", state["rwkv.blocks.0.pre_ln.bias"])
    for i in range(L):
        p, b = f"rwkv.blocks.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "ln1.weight"])
        add(b + "attn_norm.bias", state[p + "ln1.bias"])
        add(b + "attn_norm_2.weight", state[p + "ln2.weight"])
        add(b + "attn_norm_2.bias", state[p + "ln2.bias"])
        a = p + "attention."
        add(b + "time_mix_lerp_x.weight", state[a + "time_maa_x"].squeeze())
        fused = np.stack([state[a + f"time_maa_{c}"].squeeze()[None, :]
                          for c in "wkvrg"])  # (5, 1, D)
        add(b + "time_mix_lerp_fused.weight", fused)
        add(b + "time_mix_w1.weight", state[a + "time_maa_w1"].T)
        add(b + "time_mix_w2.weight", state[a + "time_maa_w2"].transpose(0, 2, 1))
        add(b + "time_mix_decay.weight", state[a + "time_decay"].squeeze())
        add(b + "time_mix_decay_w1.weight", state[a + "time_decay_w1"].T)
        add(b + "time_mix_decay_w2.weight", state[a + "time_decay_w2"].T)
        add(b + "time_mix_first.weight", state[a + "time_faaaa"])
        for hf_n, gg in (("receptance", "time_mix_receptance"),
                         ("key", "time_mix_key"), ("value", "time_mix_value"),
                         ("gate", "time_mix_gate"), ("output", "time_mix_output")):
            add(b + gg + ".weight", state[a + hf_n + ".weight"])
        add(b + "time_mix_ln.weight", state[a + "ln_x.weight"])
        add(b + "time_mix_ln.bias", state[a + "ln_x.bias"])
        f = p + "feed_forward."
        add(b + "channel_mix_lerp_k.weight", state[f + "time_maa_k"].squeeze())
        add(b + "channel_mix_lerp_r.weight", state[f + "time_maa_r"].squeeze())
        add(b + "channel_mix_key.weight", state[f + "key.weight"])
        add(b + "channel_mix_receptance.weight", state[f + "receptance.weight"])
        add(b + "channel_mix_value.weight", state[f + "value.weight"])
    add("output_norm.weight", state["rwkv.ln_out.weight"])
    add("output_norm.bias", state["rwkv.ln_out.bias"])
    add("output.weight", state.get("head.weight", state["rwkv.embeddings.weight"]))
    return w.write()


_Q6_PERM = [3, 1, 2, 0, 4]  # HF rkvwg → GGUF wkvrg component order


def convert_hf_rwkv6qwen2(model, tokenizer_vocab, out_path: str,
                          quant_type=GGMLType.F16) -> str:
    """RWKV6Qwen2ForCausalLM (qrwkv) → GGUF arch "rwkv6qwen2": rwkv6
    time-mix inside a qwen2 shell.  The fused low-rank tensors store
    components in rkvwg order; permuted here to the wkvrg GGUF order —
    spec: RWKV6Qwen2Model convert_hf_to_gguf.py:5270."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    n_head = _g(hf, "num_attention_heads")
    S = D // n_head
    ff = _g(hf, "intermediate_size")

    w = GGUFWriter(out_path, "rwkv6qwen2")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="rwkv6qwen2-convert"))
    _rwkv_vocab_header(w, D, L, ff, _g(hf, "rms_norm_eps", default=1e-5), S,
                       hf.vocab_size, tokenizer_vocab, "rwkv6qwen2", rms=True,
                       n_kv=_g(hf, "num_key_value_heads", default=n_head))
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr), qt(name, arr))

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        a = p + "self_attn."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        add(b + "time_mix_lerp_x.weight", state[a + "time_maa_x"].squeeze())
        fused = np.stack([state[a + f"time_maa_{c}"].squeeze()[None, :]
                          for c in "wkvrg"])
        add(b + "time_mix_lerp_fused.weight", fused)
        w1 = state[a + "time_maa_w1"].T  # (5R, D), rkvwg groups
        R = w1.shape[0] // 5
        add(b + "time_mix_w1.weight",
            w1.reshape(5, R, -1)[_Q6_PERM].reshape(5 * R, -1))
        w2 = state[a + "time_maa_w2"].transpose(0, 2, 1)  # (5, D, R)
        add(b + "time_mix_w2.weight", w2[_Q6_PERM])
        add(b + "time_mix_decay.weight", state[a + "time_decay"].squeeze())
        add(b + "time_mix_decay_w1.weight", state[a + "time_decay_w1"].T)
        add(b + "time_mix_decay_w2.weight", state[a + "time_decay_w2"].T)
        for hf_n, gg in (("q_proj", "time_mix_receptance"),
                         ("k_proj", "time_mix_key"), ("v_proj", "time_mix_value"),
                         ("gate", "time_mix_gate"), ("o_proj", "time_mix_output")):
            add(b + gg + ".weight", state[a + hf_n + ".weight"])
            if a + hf_n + ".bias" in state:
                add(b + gg + ".bias", state[a + hf_n + ".bias"])
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    add("output.weight", state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return w.write()


def _v7_time_mix(add, b, st, a, i, has_gate=True, fla=False):
    """Shared rwkv7 time-mix emission.  ``a`` is the HF attention prefix;
    ``fla`` marks fla-hub lora layouts (already (out,in), no transpose) —
    spec: Rwkv7Model.modify_tensors convert_hf_to_gguf.py:5324."""
    comps = "rwkva" + ("g" if has_gate else "")
    if a + "x_x" in st:
        fused = st[a + "x_x"].reshape(len(comps), 1, 1, -1)
    else:
        fused = np.stack([st[a + f"x_{c}"].squeeze()[None, None, :] for c in comps])
    add(b + "time_mix_lerp_fused.weight", fused)

    def lora(hf_lo, hf_hi, hf_base, gg):
        if a + hf_lo in st:  # plain layout: (D,R)/(R,D), transpose both
            add(b + gg + "1.weight", st[a + hf_lo].T)
            add(b + gg + "2.weight", st[a + hf_hi].T)
            if hf_base and a + hf_base in st:
                add(b + gg + "0.weight", st[a + hf_base].squeeze())
        else:  # fla _lora.lora.{0,2} layout: already (out,in)
            nm = hf_lo.split("1")[0]
            add(b + gg + "1.weight", st[a + nm + "_lora.lora.0.weight"])
            add(b + gg + "2.weight", st[a + nm + "_lora.lora.2.weight"])
            bias = a + nm + "_lora.lora.2.bias"
            if hf_base and bias in st:
                add(b + gg + "0.weight", st[bias].squeeze())

    lora("w1", "w2", "w0", "time_mix_w")
    lora("a1", "a2", "a0", "time_mix_a")
    if i > 0 and (a + "v1" in st or a + "v_lora.lora.0.weight" in st):
        lora("v1", "v2", "v0", "time_mix_v")
    if has_gate:
        lora("g1", "g2", None, "time_mix_g")
    add(b + "time_mix_k_k.weight", st[a + "k_k"].squeeze())
    add(b + "time_mix_k_a.weight", st[a + "k_a"].squeeze())
    add(b + "time_mix_r_k.weight", st[a + "r_k"].reshape(-1))
    for hf_names, gg in ((("receptance", "r_proj"), "time_mix_receptance"),
                         (("key", "k_proj"), "time_mix_key"),
                         (("value", "v_proj"), "time_mix_value"),
                         (("output", "o_proj"), "time_mix_output")):
        for n in hf_names:
            if a + n + ".weight" in st:
                add(b + gg + ".weight", st[a + n + ".weight"])
                break
    for n in ("ln_x", "g_norm"):
        if a + n + ".weight" in st:
            add(b + "time_mix_ln.weight", st[a + n + ".weight"])
            add(b + "time_mix_ln.bias", st[a + n + ".bias"])
            break


def convert_hf_rwkv7(model, tokenizer_vocab, out_path: str,
                     quant_type=GGMLType.F16) -> str:
    """RWKV7 (Goose) ``model.layers.N.*`` → GGUF arch "rwkv7" — spec:
    Rwkv7Model convert_hf_to_gguf.py:5324 (x_* fused lerp, low-rank
    w/a/v/g pairs, layer-0 dummy v ignored, r_k flattened)."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    S = _g(hf, "head_size", "head_dim", default=64)
    eps = _g(hf, "layer_norm_epsilon", "norm_eps", default=1e-5)
    ff = _g(hf, "intermediate_size") or D * 4

    w = GGUFWriter(out_path, "rwkv7")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="rwkv7-convert"))
    _rwkv_vocab_header(w, D, L, ff, eps, S, hf.vocab_size, tokenizer_vocab, "rwkv7")
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr), qt(name, arr))

    emb = state.get("model.embeddings.weight", state.get("model.embed_tokens.weight"))
    add("token_embd.weight", emb)
    pre = ("model.pre_ln.weight" if "model.pre_ln.weight" in state
           else "model.layers.0.pre_norm.weight")
    add("token_embd_norm.weight", state[pre])
    add("token_embd_norm.bias", state[pre[:-6] + "bias"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        a = p + ("attention." if p + "attention.ln_x.weight" in state
                 or p + "attention.r_k" in state else "attn.")
        if p + "ln1.weight" in state:
            add(b + "attn_norm.weight", state[p + "ln1.weight"])
            add(b + "attn_norm.bias", state[p + "ln1.bias"])
        ln2 = p + ("ln2" if p + "ln2.weight" in state else "feed_forward_norm")
        add(b + "attn_norm_2.weight", state[ln2 + ".weight"])
        add(b + "attn_norm_2.bias", state[ln2 + ".bias"])
        _v7_time_mix(add, b, state, a, i)
        f = p + ("feed_forward." if p + "feed_forward.key.weight" in state else "ffn.")
        add(b + "channel_mix_lerp_k.weight", state[f + "x_k"].squeeze())
        add(b + "channel_mix_key.weight", state[f + "key.weight"])
        add(b + "channel_mix_value.weight", state[f + "value.weight"])
    add("output_norm.weight", state["model.ln_out.weight"])
    add("output_norm.bias", state["model.ln_out.bias"])
    add("output.weight", state.get("head.weight",
                                   state.get("lm_head.weight", emb)))
    return w.write()


def convert_hf_arwkv7(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """RwkvHybridForCausalLM (ARWKV) → GGUF arch "arwkv7": rwkv7 time-mix
    (under self_attn.time_mixer.*) inside a qwen-style RMS/gated-FFN
    shell — spec: ARwkv7Model convert_hf_to_gguf.py:5443."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    S = _g(hf, "head_size", default=64)
    ff = _g(hf, "intermediate_size")
    has_gate = bool(_g(hf, "wkv_has_gate", default=True))

    w = GGUFWriter(out_path, "arwkv7")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="arwkv7-convert"))
    _rwkv_vocab_header(w, D, L, ff, _g(hf, "rms_norm_eps", default=1e-5), S,
                       hf.vocab_size, tokenizer_vocab, "arwkv7", rms=True)
    qt = _qt_fn(quant_type)

    def add(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr), qt(name, arr))

    add("token_embd.weight", state["model.embed_tokens.weight"])
    for i in range(L):
        p, b = f"model.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "input_layernorm.weight"])
        add(b + "ffn_norm.weight", state[p + "post_attention_layernorm.weight"])
        _v7_time_mix(add, b, state, p + "self_attn.time_mixer.", i,
                     has_gate=has_gate)
        add(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"])
        add(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
    add("output_norm.weight", state["model.norm.weight"])
    add("output.weight", state.get("lm_head.weight", state["model.embed_tokens.weight"]))
    return w.write()


# ---------------------------------------------------------------------------
# wave 6: encoder families (nomic-bert, neo-bert, jina-bert-v2) + plamo2
# ---------------------------------------------------------------------------


def convert_hf_nomic_bert(model, tokenizer_vocab, out_path: str,
                          quant_type=GGMLType.F16) -> str:
    """NomicBertModel → GGUF arch "nomic-bert" / "nomic-bert-moe".

    Spec: NomicBertModel (convert_hf_to_gguf.py:4752) — fused Wqkv stays
    fused, swiglu fc11/fc12 become ffn_up/ffn_gate (dense), MoE experts
    w1 viewed (E, n_inner, n_embd) and w2 additionally transposed to
    (E, n_embd, n_inner); the trained-context clamp mirrors the
    reference's n_positions/max_trained_positions table."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "n_embd", "hidden_size")
    L = _g(hf, "n_layer", "num_hidden_layers")
    H = _g(hf, "n_head", "num_attention_heads")
    FF = _g(hf, "n_inner", "intermediate_size")
    every = _g(hf, "moe_every_n_layers", default=0) or 0
    arch = "nomic-bert-moe" if every else "nomic-bert"

    npos = _g(hf, "n_positions", default=2048)
    mtp = _g(hf, "max_trained_positions", default=2048)
    if npos == 8192 and mtp == 2048:
        npos = 2048  # nomic-embed-text v1/v1.5
    elif npos == 2048 and mtp == 2048:
        npos = 512  # nomic-embed-text-v2-moe

    w = GGUFWriter(out_path, arch)
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="nomic-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, npos)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, FF)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, D // H)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, D // H)
    w.add_float32(Keys.Attention.LAYERNORM_EPS,
                  _g(hf, "layer_norm_epsilon", default=1e-12))
    w.add_bool(Keys.Attention.CAUSAL, False)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rotary_emb_base", default=10000.0))
    if every:
        w.add_uint32(f"{arch}.moe_every_n_layers", every)
        w.add_uint32(Keys.LLM.EXPERT_COUNT, _g(hf, "num_experts"))
        w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, _g(hf, "moe_top_k", default=2))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr, f32=False):
        arr = np.ascontiguousarray(arr)
        w.add_tensor(name, arr, GGMLType.F32 if f32 else qt(name, arr))

    add("token_embd.weight", state["embeddings.word_embeddings.weight"])
    if "embeddings.token_type_embeddings.weight" in state:
        add("token_types.weight", state["embeddings.token_type_embeddings.weight"], f32=True)
    add("token_embd_norm.weight", state["emb_ln.weight"], f32=True)
    add("token_embd_norm.bias", state["emb_ln.bias"], f32=True)
    for i in range(L):
        p, b = f"encoder.layers.{i}.", f"blk.{i}."
        add(b + "attn_qkv.weight", state[p + "attn.Wqkv.weight"])
        if p + "attn.Wqkv.bias" in state:
            add(b + "attn_qkv.bias", state[p + "attn.Wqkv.bias"], f32=True)
        add(b + "attn_output.weight", state[p + "attn.out_proj.weight"])
        if p + "attn.out_proj.bias" in state:
            add(b + "attn_output.bias", state[p + "attn.out_proj.bias"], f32=True)
        add(b + "attn_output_norm.weight", state[p + "norm1.weight"], f32=True)
        add(b + "attn_output_norm.bias", state[p + "norm1.bias"], f32=True)
        add(b + "layer_output_norm.weight", state[p + "norm2.weight"], f32=True)
        add(b + "layer_output_norm.bias", state[p + "norm2.bias"], f32=True)
        if p + "mlp.experts.mlp.w1" in state:  # MoE layer
            E = _g(hf, "num_experts")
            add(b + "ffn_gate_inp.weight", state[p + "mlp.router.layer.weight"])
            w1 = state[p + "mlp.experts.mlp.w1"].reshape(E, FF, D)
            add(b + "ffn_up_exps.weight", w1)
            w2 = state[p + "mlp.experts.mlp.w2"].reshape(E, FF, D)
            add(b + "ffn_down_exps.weight", w2.transpose(0, 2, 1))
        elif p + "mlp.fc11.weight" in state:  # dense swiglu
            add(b + "ffn_up.weight", state[p + "mlp.fc11.weight"])
            add(b + "ffn_gate.weight", state[p + "mlp.fc12.weight"])
            add(b + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        else:  # dense ungated GELU (moe models' even layers)
            add(b + "ffn_up.weight", state[p + "mlp.fc1.weight"])
            if p + "mlp.fc1.bias" in state:
                add(b + "ffn_up.bias", state[p + "mlp.fc1.bias"], f32=True)
            add(b + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        if p + "mlp.fc2.bias" in state:
            add(b + "ffn_down.bias", state[p + "mlp.fc2.bias"], f32=True)
    return w.write()


def convert_hf_neobert(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """NeoBERT → GGUF arch "neo-bert" (spec: NeoBert,
    convert_hf_to_gguf.py:4834 — "model." prefix stripped, "decoder."
    LM-head tensors dropped, fused qkv and fused w12 [gate|up] kept;
    n_ff is the actual swiglu width, i.e. w12 rows / 2)."""
    hf = model.config
    state = {k[6:] if k.startswith("model.") else k: v
             for k, v in _np_state(model).items() if not k.startswith("decoder.")}
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    H = _g(hf, "num_attention_heads")
    w12 = state["transformer_encoder.0.ffn.w12.weight"]
    FF = w12.shape[0] // 2

    w = GGUFWriter(out_path, "neo-bert")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="neobert-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_length",
                                             "max_position_embeddings", default=4096))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, FF)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, D // H)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, D // H)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, _g(hf, "norm_eps", default=1e-6))
    w.add_bool(Keys.Attention.CAUSAL, False)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.POOLING_TYPE, 2)  # CLS
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr, f32=False):
        arr = np.ascontiguousarray(arr)
        w.add_tensor(name, arr, GGMLType.F32 if f32 else qt(name, arr))

    add("token_embd.weight", state["encoder.weight"])
    for i in range(L):
        p, b = f"transformer_encoder.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "attention_norm.weight"], f32=True)
        add(b + "attn_qkv.weight", state[p + "qkv.weight"])
        add(b + "attn_output.weight", state[p + "wo.weight"])
        add(b + "ffn_norm.weight", state[p + "ffn_norm.weight"], f32=True)
        add(b + "ffn_up.weight", state[p + "ffn.w12.weight"])
        add(b + "ffn_down.weight", state[p + "ffn.w3.weight"])
    add("output_norm.weight", state["layer_norm.weight"], f32=True)
    return w.write()


def convert_hf_jina_bert_v2(model, tokenizer_vocab, out_path: str,
                            quant_type=GGMLType.F16) -> str:
    """JinaBertModel (model_type "bert" + JinaBert* architectures) → GGUF
    arch "jina-bert-v2" (spec: JinaBertV2Model convert_hf_to_gguf.py:5911
    + the tensor table src/llama-model.cpp:2705-2748).  ALiBi encoder —
    no position table is emitted; the gated-GELU FFN keeps the fused
    [act|linear] gated_layers/up_gated_layer as ffn_up, or splits
    gated_layers_w/_v into ffn_gate/ffn_up (legacy layout)."""
    hf = model.config
    state = _np_state(model)
    state = {k[5:] if k.startswith("bert.") else k: v for k, v in state.items()}
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    H = _g(hf, "num_attention_heads")

    w = GGUFWriter(out_path, "jina-bert-v2")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="jina-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_position_embeddings", default=8192))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "intermediate_size"))
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, D // H)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, D // H)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, _g(hf, "layer_norm_eps", default=1e-12))
    w.add_bool(Keys.Attention.CAUSAL, False)
    w.add_uint32(Keys.LLM.POOLING_TYPE, 1)  # mean
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr, f32=False):
        arr = np.ascontiguousarray(arr)
        w.add_tensor(name, arr, GGMLType.F32 if f32 else qt(name, arr))

    add("token_embd.weight", state["embeddings.word_embeddings.weight"])
    if "embeddings.token_type_embeddings.weight" in state:
        add("token_types.weight", state["embeddings.token_type_embeddings.weight"], f32=True)
    add("token_embd_norm.weight", state["embeddings.LayerNorm.weight"], f32=True)
    add("token_embd_norm.bias", state["embeddings.LayerNorm.bias"], f32=True)
    for i in range(L):
        p, b = f"encoder.layer.{i}.", f"blk.{i}."
        for hf_n, gg in (("attention.self.query", "attn_q"),
                         ("attention.self.key", "attn_k"),
                         ("attention.self.value", "attn_v"),
                         ("attention.output.dense", "attn_output")):
            add(b + gg + ".weight", state[p + hf_n + ".weight"])
            add(b + gg + ".bias", state[p + hf_n + ".bias"], f32=True)
        for hf_n, gg in (("attention.self.layer_norm_q", "attn_q_norm"),
                         ("attention.self.layer_norm_k", "attn_k_norm"),
                         ("attention.output.LayerNorm", "attn_output_norm"),
                         ("layer_norm_1", "attn_norm_2")):
            if p + hf_n + ".weight" in state:
                add(b + gg + ".weight", state[p + hf_n + ".weight"], f32=True)
                add(b + gg + ".bias", state[p + hf_n + ".bias"], f32=True)
        if p + "mlp.gated_layers_w.weight" in state:  # legacy split layout
            add(b + "ffn_gate.weight", state[p + "mlp.gated_layers_w.weight"])
            add(b + "ffn_up.weight", state[p + "mlp.gated_layers_v.weight"])
        elif p + "mlp.gated_layers.weight" in state:
            add(b + "ffn_up.weight", state[p + "mlp.gated_layers.weight"])
        else:  # jina-v2-code fused layout
            add(b + "ffn_up.weight", state[p + "mlp.up_gated_layer.weight"])
        down = "mlp.wo" if p + "mlp.wo.weight" in state else "mlp.down_layer"
        add(b + "ffn_down.weight", state[p + down + ".weight"])
        if p + down + ".bias" in state:
            add(b + "ffn_down.bias", state[p + down + ".bias"], f32=True)
        for hf_n in ("mlp.layernorm", "layer_norm_2"):
            if p + hf_n + ".weight" in state:
                add(b + "layer_output_norm.weight", state[p + hf_n + ".weight"], f32=True)
                add(b + "layer_output_norm.bias", state[p + hf_n + ".bias"], f32=True)
                break
    if "pooler.dense.weight" in state:
        add("cls.weight", state["pooler.dense.weight"])
        add("cls.bias", state["pooler.dense.bias"], f32=True)
    return w.write()


def convert_hf_plamo2(model, tokenizer_vocab, out_path: str,
                      quant_type=GGMLType.F16) -> str:
    """Plamo2ForCausalLM → GGUF arch "plamo2" (spec: Plamo2Model
    convert_hf_to_gguf.py:4019).  Transforms: A_log → -exp, conv1d
    squeezed to 2-D, the five residual-norm offsets (+1 on
    pre_mixer/pre_mlp/final norm, +1/5 post_mixer, +1/5^1.5 post_mlp),
    q/k per-head norm renames, and the per-layer head_count_kv array that
    marks mamba layers with 0 (mamba_step pattern)."""
    hf = model.config
    state = _np_state(model)
    D = _g(hf, "hidden_size")
    L = _g(hf, "num_hidden_layers")
    H = _g(hf, "num_attention_heads", default=32)
    HKV = _g(hf, "num_key_value_heads", default=4)
    Dh = _g(hf, "hidden_size_per_head", default=128)
    n_ssm_head = _g(hf, "mamba_num_heads", default=64)
    d_inner = n_ssm_head * Dh

    step = _g(hf, "mamba_step", default=2)
    enabled = _g(hf, "mamba_enabled", default=True)
    kv_arr = []
    for i in range(L):
        if not enabled:
            kv_arr.append(HKV)
            continue
        if L <= step // 2:
            is_mamba = i != L - 1
        else:
            is_mamba = (i % step) != (step // 2)
        kv_arr.append(0 if is_mamba else HKV)

    w = GGUFWriter(out_path, "plamo2")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="plamo2-convert"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, _g(hf, "max_position_embeddings", default=2048))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, _g(hf, "intermediate_size", default=13312))
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(kv_arr, np.int32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, _g(hf, "rms_norm_eps", default=1e-6))
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, _g(hf, "rope_theta", default=10000.0))
    w.add_uint32(Keys.SSM.STATE_SIZE, _g(hf, "mamba_d_state", default=64))
    w.add_uint32(Keys.SSM.CONV_KERNEL, _g(hf, "mamba_d_conv", default=4))
    w.add_uint32(Keys.SSM.TIME_STEP_RANK, n_ssm_head)
    w.add_uint32(Keys.SSM.INNER_SIZE, d_inner)
    w.add_uint32(Keys.SSM.GROUP_COUNT, 1)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    _write_vocab(w, tokenizer_vocab)
    qt = _qt_fn(quant_type)

    def add(name, arr, f32=False):
        arr = np.ascontiguousarray(arr)
        w.add_tensor(name, arr, GGMLType.F32 if f32 else qt(name, arr))

    emb = state["model.embed_tokens.weight"]
    add("token_embd.weight", emb)
    for i in range(L):
        p, b = f"model.layers.layers.{i}.", f"blk.{i}."
        add(b + "attn_norm.weight", state[p + "pre_mixer_norm.weight"] + 1.0, f32=True)
        add(b + "post_attention_norm.weight",
            state[p + "post_mixer_norm.weight"] + 1.0 / 5, f32=True)
        add(b + "ffn_norm.weight", state[p + "pre_mlp_norm.weight"] + 1.0, f32=True)
        add(b + "post_ffw_norm.weight",
            state[p + "post_mlp_norm.weight"] + 1.0 / (5 ** 1.5), f32=True)
        add(b + "ffn_up.weight", state[p + "mlp.gate_up_proj.weight"])
        add(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"])
        m = p + "mixer."
        if m + "in_proj.weight" in state:  # mamba layer
            add(b + "ssm_in.weight", state[m + "in_proj.weight"])
            add(b + "ssm_conv1d.weight", np.squeeze(state[m + "conv1d.weight"]))
            add(b + "ssm_x.weight", state[m + "bcdt_proj.weight"])
            add(b + "ssm_dt.weight", state[m + "dt_proj.weight"])
            add(b + "ssm_dt.bias", state[m + "dt_bias"], f32=True)
            add(b + "ssm_a", -np.exp(state[m + "A_log"]), f32=True)
            add(b + "ssm_d", state[m + "D"], f32=True)
            add(b + "ssm_dt_norm.weight", state[m + "dt_norm_weight"], f32=True)
            add(b + "ssm_b_norm.weight", state[m + "B_norm_weight"], f32=True)
            add(b + "ssm_c_norm.weight", state[m + "C_norm_weight"], f32=True)
            add(b + "ssm_out.weight", state[m + "out_proj.weight"])
        else:  # attention layer
            add(b + "attn_qkv.weight", state[m + "qkv_proj.weight"])
            add(b + "attn_output.weight", state[m + "o_proj.weight"])
            add(b + "attn_q_norm.weight", state[m + "q_weight"], f32=True)
            add(b + "attn_k_norm.weight", state[m + "k_weight"], f32=True)
    add("output_norm.weight", state["model.norm.weight"] + 1.0, f32=True)
    add("output.weight", state.get("lm_head.weight", emb))
    return w.write()


def convert_hf_roberta(model, tokenizer_vocab, out_path: str,
                       quant_type=GGMLType.F16) -> str:
    """RobertaModel / CamembertModel / roberta rerankers → GGUF arch
    "bert" (spec: RobertaModel convert_hf_to_gguf.py:4709 — strip the
    "roberta." prefix, chop the first 1+pad_token_id position-embedding
    rows so position 0 lands on the row the HF model actually uses)."""
    from .convert_hf import convert_hf_bert

    hf = model.config
    state = {k[8:] if k.startswith("roberta.") else k: v
             for k, v in _np_state(model).items()}
    pad = _g(hf, "pad_token_id")
    if pad is not None and "embeddings.position_embeddings.weight" in state:
        off = 1 + int(pad)
        state["embeddings.position_embeddings.weight"] = \
            state["embeddings.position_embeddings.weight"][off:]
        if getattr(hf, "max_position_embeddings", None) is not None:
            hf = _Cfg(**{**hf.__dict__,
                         "max_position_embeddings": hf.max_position_embeddings - off})
    return convert_hf_bert(_Shim(hf, {k: _to_t(v) for k, v in state.items()}),
                           tokenizer_vocab, out_path, quant_type)


_DISTILBERT_MAP = [
    ("attention.q_lin", "attention.self.query"),
    ("attention.k_lin", "attention.self.key"),
    ("attention.v_lin", "attention.self.value"),
    ("attention.out_lin", "attention.output.dense"),
    ("sa_layer_norm", "attention.output.LayerNorm"),
    ("ffn.lin1", "intermediate.dense"),
    ("ffn.lin2", "output.dense"),
    ("output_layer_norm", "output.LayerNorm"),
]


def convert_hf_distilbert(model, tokenizer_vocab, out_path: str,
                          quant_type=GGMLType.F16) -> str:
    """DistilBertModel → GGUF arch "bert" (spec: DistilBertModel
    convert_hf_to_gguf.py:4689 + the distillbert rows of
    tensor_mapping.py: transformer.layer.N.{q_lin,sa_layer_norm,ffn.lin*}
    renames; vocab_* MLM-head tensors dropped; no token types)."""
    from .convert_hf import convert_hf_bert

    hf = model.config
    raw = {k[11:] if k.startswith("distilbert.") else k: v
           for k, v in _np_state(model).items()}
    state = {}
    for k, v in raw.items():
        if k.startswith("vocab_"):
            continue  # MLM head
        if k.startswith("transformer.layer."):
            rest = k[len("transformer.layer."):]
            i, _, tail = rest.partition(".")
            for hf_n, bert_n in _DISTILBERT_MAP:
                if tail.startswith(hf_n + "."):
                    tail = bert_n + tail[len(hf_n):]
                    break
            state[f"encoder.layer.{i}.{tail}"] = v
        else:
            state[k] = v
    cfg = _Cfg(num_attention_heads=_g(hf, "n_heads", "num_attention_heads"),
               hidden_size=_g(hf, "dim", "hidden_size"),
               num_hidden_layers=_g(hf, "n_layers", "num_hidden_layers"),
               intermediate_size=_g(hf, "hidden_dim", "intermediate_size"),
               layer_norm_eps=1e-12,
               max_position_embeddings=_g(hf, "max_position_embeddings", default=512),
               vocab_size=hf.vocab_size,
               name_or_path=_g(hf, "name_or_path", default="distilbert-convert"))
    return convert_hf_bert(_Shim(cfg, {k: _to_t(v) for k, v in state.items()}),
                           tokenizer_vocab, out_path, quant_type)


def convert_hf_wavtokenizer(model, tokenizer_vocab, out_path: str,
                            quant_type=GGMLType.F16) -> str:
    """WavTokenizerDec (HF export of WavTokenizer-large) → GGUF
    "wavtokenizer-dec".

    Spec: WavTokenizerDecModel (reference convert_hf_to_gguf.py:3478-3513)
    + the tensor_mapping wavtokenizer rows + reference key layout
    (llama-model.cpp:481-487: embedding_length = spectrogram dim from
    hidden_size, features_length = codebook dim).  Codebook bookkeeping
    tensors (cluster_size / embed_avg / inited) are dropped; no vocab
    (_set_vocab_none).  ``tokenizer_vocab`` is ignored.
    """
    hf = model.config
    state = model.state_dict()
    w = GGUFWriter(out_path, "wavtokenizer-dec")
    w.add_string(Keys.General.NAME, _g(hf, "name_or_path", default="wavtokenizer"))
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH,
                 _g(hf, "max_position_embeddings", default=8192))
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, hf.hidden_size)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, _g(hf, "n_layer", default=12))
    w.add_uint32(Keys.LLM.VOCAB_SIZE, hf.vocab_size)
    w.add_uint32("wavtokenizer-dec.features_length", hf.n_embd_features)
    w.add_uint32("wavtokenizer-dec.feed_forward_length",
                 _g(hf, "n_ff", default=2304))
    w.add_float32(Keys.Attention.LAYERNORM_EPS,
                  _g(hf, "layer_norm_epsilon", default=1e-6))
    w.add_float32("wavtokenizer-dec.attention.group_norm_epsilon",
                  _g(hf, "group_norm_epsilon", default=1e-6))
    w.add_uint32("wavtokenizer-dec.attention.group_norm_groups",
                 _g(hf, "group_norm_groups", default=32))
    w.add_uint32("wavtokenizer-dec.posnet.embedding_length", hf.posnet.n_embd)
    w.add_uint32("wavtokenizer-dec.posnet.block_count", hf.posnet.n_layer)
    w.add_uint32("wavtokenizer-dec.convnext.embedding_length",
                 hf.convnext.n_embd)
    w.add_uint32("wavtokenizer-dec.convnext.block_count", hf.convnext.n_layer)
    w.add_bool("wavtokenizer-dec.attention.causal", False)

    # which posnet blocks are attention blocks (their "norm" is attn_norm)
    attn_blocks = {
        int(m.group(1)) for k in state
        for m in [re.match(r"backbone\.posnet\.(\d+)\.q\.", k)] if m
    }
    renames = [
        (r"^backbone\.embedding\.", "token_embd."),
        (r"^backbone\.embed\.", "conv1d."),
        (r"^backbone\.norm\.", "token_embd_norm."),
        (r"^backbone\.final_layer_norm\.", "output_norm."),
        (r"^head\.out\.", "output."),
        (r"^backbone\.posnet\.(\d+)\.proj_out\.", r"posnet.\1.attn_output."),
        (r"^backbone\.posnet\.(\d+)\.([qkv])\.", r"posnet.\1.attn_\2."),
        (r"^backbone\.posnet\.(\d+)\.", r"posnet.\1."),
        (r"^backbone\.convnext\.(\d+)\.dwconv\.", r"convnext.\1.dw."),
        (r"^backbone\.convnext\.(\d+)\.pwconv1\.", r"convnext.\1.pw1."),
        (r"^backbone\.convnext\.(\d+)\.pwconv2\.", r"convnext.\1.pw2."),
        (r"^backbone\.convnext\.(\d+)\.", r"convnext.\1."),
    ]
    for name, t in state.items():
        if name.endswith(("codebook.cluster_size", "codebook.embed_avg",
                          "codebook.inited")):
            continue
        new = name
        for pat, rep in renames:
            new2 = re.sub(pat, rep, new)
            if new2 != new:
                new = new2
                break
        m = re.match(r"posnet\.(\d+)\.norm\.", new)
        if m and int(m.group(1)) in attn_blocks:
            new = new.replace(f"posnet.{m.group(1)}.norm.",
                              f"posnet.{m.group(1)}.attn_norm.")
        arr = np.asarray(t.float().numpy() if hasattr(t, "float") else t,
                         np.float32)
        # honor --outtype for matrix weights; 1D norms/biases stay F32
        # (the reference's F16 conversion rule)
        if quant_type == GGMLType.F16 and arr.ndim >= 2:
            w.add_tensor(new, arr.astype(np.float16), GGMLType.F16)
        else:
            w.add_tensor(new, arr, GGMLType.F32)
    return w.write()
