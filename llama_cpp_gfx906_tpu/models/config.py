"""Model hyperparameters read from GGUF metadata.

The TPU-native analog of the reference's ``llama_hparams`` loading
(``src/llama-model.cpp:453`` ``load_hparams``) — but as a frozen dataclass
consumed by pure functions, not a mutable struct on a C++ model object.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from ..gguf.constants import Keys, RopeScalingType
from ..gguf.reader import GGUFModelReader, GGUFReader

_ROPE_SCALING_NAMES = {
    "none": RopeScalingType.NONE,
    "linear": RopeScalingType.LINEAR,
    "yarn": RopeScalingType.YARN,
    "longrope": RopeScalingType.LONGROPE,
}


@dataclass(frozen=True)
class ModelConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    rms_eps: float = 1e-5
    rope_dim: int = 0  # 0 → full head_dim
    rope_base: float = 10000.0
    rope_interleaved: bool = True  # ggml NORM mode (llama); False = NEOX halves
    rope_scaling: RopeScalingType = RopeScalingType.NONE
    rope_scale: float = 1.0
    rope_orig_ctx: int = 0
    rope_yarn_log_mul: float = 0.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    attn_bias: bool = False  # qwen2-style qkv bias
    tie_embeddings: bool = False
    # sliding-window attention (Gemma/Mistral style); 0 = disabled
    sliding_window: int = 0
    swa_pattern: int = 1  # every n-th layer is full-attention (iSWA)
    # MoE
    n_experts: int = 0
    n_experts_used: int = 0
    expert_ff: int = 0
    expert_weights_norm: bool = False
    expert_weights_scale: float = 1.0
    # normalization details
    post_attn_norm: bool = False  # gemma2/3 extra norms
    post_ffn_norm: bool = False
    qk_norm: bool = False  # qwen3/gemma3 per-head q/k rmsnorm
    qk_norm_layer: bool = False  # chameleon: per-head LayerNorm (+bias) q/k norms
    qk_norm_after_rope: bool = False  # hunyuan: norms applied post-rotation
    alibi: bool = False  # mpt/bloom/baichuan-13b positional bias
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    embedding_scale: float = 1.0  # gemma multiplies embeddings by sqrt(n_embd)
    attn_scale: float = 0.0  # 0 → 1/sqrt(head_dim)
    act_fn: str = "silu"  # "silu" | "gelu" | "gelu_tanh" | "relu" | "relu2"
    # architecture-shape switches (cover gpt2/phi/neox/starcoder families)
    norm_type: str = "rms"  # "rms" | "layer" (LayerNorm, with optional bias)
    pos_emb: str = "rope"  # "rope" | "learned" | "none"
    parallel_residual: bool = False  # phi2/gpt-neox/gpt-j: attn+ffn share input
    ffn_gated: bool = True  # False = classic 2-matrix MLP (gpt2/phi/bert)
    # SSM (mamba family) hyperparameters ({arch}.ssm.* GGUF keys)
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0  # mamba1: dt low-rank; mamba2: head count (reference :11163)
    ssm_n_group: int = 1  # mamba2 B/C group count ({arch}.ssm.group_count)
    ssm_dt_b_c_rms: bool = False  # falcon-mamba: unweighted rms on dt/B/C
    # MLA (deepseek2 family) hyperparameters
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    v_head_dim: int = 0
    n_layer_dense_lead: int = 0
    n_shared_experts: int = 0
    expert_gating_func: int = 1  # 1=softmax, 2=sigmoid (LLAMA_EXPERT_GATING_FUNC_*)
    moe_topk_softmax: bool = False  # gpt-oss: softmax over selected logits
    swiglu_limit: float = 7.0  # ggml_swiglu_oai clamp
    wkv_head_size: int = 0  # rwkv6/7 ({arch}.wkv.head_size)
    logit_scale: float = 1.0  # command-r / granite final-logit multiplier
    residual_scale: float = 1.0  # granite residual_multiplier
    pre_norm: bool = True  # False = olmo2-style post-norm blocks
    qk_norm_full: bool = False  # olmo2: q/k norms over the full projection
    mrope_sections: tuple = ()  # qwen2vl M-RoPE frequency-pair sections (t,h,w,e)
    rope_local_base: float = 0.0  # gemma3: separate rope base for SWA layers
    # per-layer rope skipping (reference n_no_rope_layer_step): every n-th
    # layer (1-indexed) is NoPE — llama4/smollm3; 0 disables
    nope_interval: int = 0
    rope_swa_only: bool = False  # cohere2: rope only on sliding-window layers
    qk_norm_l2: bool = False  # llama4: weightless L2 qk norm
    # llama4 attn_temperature_tuning on NoPE layers:
    # q *= log1p(floor(pos / floor_scale)) * scale + 1
    attn_temp_scale: float = 0.0
    attn_temp_floor: float = 8192.0
    clamp_kqv: float = 0.0  # dbrx: clamp qkv projections to ±clamp_kqv
    moe_scale_input: bool = False  # llama4: gate scales the expert INPUT
    moe_gate_prenorm: bool = False  # smallthinker: router reads the layer input
    # smallthinker NoPE rule: layer il is NoPE when il % n == 0 (note the
    # zero-based variant vs nope_interval's (il+1) % n); 0 disables
    nope_interval_zero: int = 0
    # dense-first iSWA variant (set_swa_pattern(n, true)): SWA iff il%n != 0
    swa_pattern_zero: bool = False
    # deci / NAS archs (llm_build_deci): per-layer GQA ratios vary → expand
    # K/V heads to MHA at load (exact — GQA just shares KV); missing
    # per-layer tensors (attention-free / FFN-free layers) zero-fill
    kv_expand: bool = False
    ragged_zero_fill: bool = False
    # per-layer "linear attention" flags (n_head>0, n_head_kv==0): the
    # block is wo(norm(x)) with no attention
    attn_linear_layers: tuple = ()
    # gemma3n (AltUp) statics
    n_altup: int = 0
    n_embd_altup: int = 0
    n_kv_shared: int = 0
    n_sparsity_layers: int = 0
    # NOTE: must stay hashable — it is a static jit argument

    @property
    def rope_layers(self) -> tuple[bool, ...]:
        """Per-layer rope flags: True = apply rope.  Mirrors the reference's
        ``(il + 1) % n_no_rope_layer_step != 0`` NoPE pattern (llama4/
        smollm3, llama-model.cpp:6153/:17497) and cohere2's rope-on-SWA-only
        rule (llm_build_cohere2_iswa)."""
        flags = [True] * self.n_layers
        if self.nope_interval > 0:
            flags = [(il + 1) % self.nope_interval != 0 for il in range(self.n_layers)]
        if self.nope_interval_zero > 0:
            # smallthinker: rope iff il % step != 0 (llm_build_smallthinker)
            flags = [il % self.nope_interval_zero != 0 for il in range(self.n_layers)]
        if self.rope_swa_only:
            swa = self.swa_layers
            flags = [f and swa[il] for il, f in enumerate(flags)]
        return tuple(flags)

    @property
    def swa_layers(self) -> tuple[bool, ...]:
        """Per-layer sliding-window flags (iSWA pattern): True = windowed.
        Mirrors llama_hparams::is_swa(il) — with pattern n, every n-th
        layer (the last of each group) is full attention."""
        if self.sliding_window <= 0:
            return tuple(False for _ in range(self.n_layers))
        n = max(self.swa_pattern, 1)
        if n == 1:
            return tuple(True for _ in range(self.n_layers))
        if self.swa_pattern_zero:  # dense-first (llama_hparams::set_swa_pattern)
            return tuple(il % n != 0 for il in range(self.n_layers))
        return tuple((il + 1) % n != 0 for il in range(self.n_layers))

    @property
    def n_q_per_kv(self) -> int:
        return self.n_heads // self.n_kv_heads

    def with_(self, **kw) -> "ModelConfig":
        return replace(self, **kw)


def config_from_gguf(reader: GGUFReader | GGUFModelReader) -> ModelConfig:
    arch = reader.architecture
    get = reader.get

    def g(key, default=None):
        v = get(key, arch=arch)
        return default if v is None else v

    n_embd = int(g(Keys.LLM.EMBEDDING_LENGTH))

    def _maxed(v, default=0):
        """Scalar or per-layer array (hybrid/ragged archs) → max int."""
        if v is None:
            return default
        if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0):
            return max(int(x) for x in v)
        return int(v)

    n_heads = _maxed(g(Keys.Attention.HEAD_COUNT), 0)  # 0 for recurrent archs
    # hybrid archs store a per-layer array; 0 marks recurrent layers
    # (reference: hparams.n_head_kv(il) == 0 → is_recurrent)
    n_kv = _maxed(g(Keys.Attention.HEAD_COUNT_KV), n_heads)
    head_dim = int(g(Keys.Attention.KEY_LENGTH, n_embd // max(n_heads, 1)))
    n_vocab = g(Keys.LLM.VOCAB_SIZE)
    if n_vocab is None:
        n_vocab = len(get(Keys.Tokenizer.LIST) or [])

    scaling = _ROPE_SCALING_NAMES.get(str(g(Keys.Rope.SCALING_TYPE, "none")), RopeScalingType.NONE)

    cfg = ModelConfig(
        arch=arch,
        n_layers=int(g(Keys.LLM.BLOCK_COUNT)),
        n_embd=n_embd,
        n_heads=n_heads,
        n_kv_heads=n_kv,
        head_dim=head_dim,
        n_ff=_maxed(g(Keys.LLM.FEED_FORWARD_LENGTH), 0),
        n_vocab=int(n_vocab),
        n_ctx_train=int(g(Keys.LLM.CONTEXT_LENGTH, 2048)),
        rms_eps=float(g(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)),
        rope_dim=int(g(Keys.Rope.DIMENSION_COUNT, head_dim)),
        rope_base=float(g(Keys.Rope.FREQ_BASE, 10000.0)),
        rope_scaling=scaling,
        rope_scale=float(g(Keys.Rope.SCALING_FACTOR, 1.0)),
        rope_orig_ctx=int(g(Keys.Rope.SCALING_ORIG_CTX_LEN, 0)),
        rope_low_freq_factor=float(g(Keys.Rope.SCALING_LOW_FREQ_FACTOR, 1.0)),
        rope_high_freq_factor=float(g(Keys.Rope.SCALING_HIGH_FREQ_FACTOR, 4.0)),
        sliding_window=int(g(Keys.Attention.SLIDING_WINDOW, 0)),
        n_experts=int(g(Keys.LLM.EXPERT_COUNT, 0)),
        n_experts_used=int(g(Keys.LLM.EXPERT_USED_COUNT, 0)),
        expert_ff=int(g(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, 0)),
        # mixtral/qwen-family renormalize the selected expert probabilities
        expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, True)),
        expert_weights_scale=float(g(Keys.LLM.EXPERT_WEIGHTS_SCALE, 1.0)),
    )

    # per-arch adjustments (graph-builder differences live in models/*.py;
    # cf. the 82 llm_build_* structs at reference llama-model.cpp:5969-18037)
    if arch in ("qwen2", "qwen2moe"):
        cfg = cfg.with_(attn_bias=True, rope_interleaved=False)
    elif arch == "qwen2vl":
        # qwen2 graph + M-RoPE over (t, h, w[, e]) position streams
        # (reference llm_build_qwen2vl, src/llama-model.cpp:8457; sections
        # key read at :852)
        sections = g(Keys.Rope.DIMENSION_SECTIONS, None)
        has_sections = sections is not None and len(sections) > 0
        cfg = cfg.with_(
            attn_bias=True, rope_interleaved=False,
            mrope_sections=tuple(int(s) for s in sections) if has_sections else (),
        )
    elif arch in ("qwen3", "qwen3moe"):
        cfg = cfg.with_(qk_norm=True, rope_interleaved=False)
    elif arch == "gemma3n":
        # AltUp/LAuReL multi-stream blocks with iSWA(5) + KV-shared trailing
        # layers (llm_build_gemma3n_iswa, src/llama-model.cpp:10455; hparams
        # :1111 — swa base 10000, attention scale 1.0).  Embedding and
        # per-layer scalings live in models/gemma3n.forward.
        cfg = cfg.with_(
            rope_interleaved=False,
            swa_pattern=5,
            attn_scale=1.0,
            rope_local_base=10000.0,
            final_logit_softcap=float(g("{arch}.final_logit_softcapping", 30.0)),
            n_altup=int(g("{arch}.altup.num_inputs", 4)),
            n_embd_altup=int(g("{arch}.embedding_length_per_layer_input", 256)),
            n_kv_shared=int(g("{arch}.num_kv_shared_layers", 0)),
            n_sparsity_layers=int(g("{arch}.activation_sparsity_layers", 10)),
        )
    elif arch.startswith("gemma"):
        cfg = cfg.with_(
            rope_interleaved=False,
            act_fn="gelu",
            embedding_scale=float(n_embd) ** 0.5,
            post_attn_norm=True,
            post_ffn_norm=arch in ("gemma2", "gemma3"),
            qk_norm=arch == "gemma3",
            swa_pattern={"gemma2": 2, "gemma3": 6}.get(arch, 1),
            attn_scale=float(g(Keys.Attention.SCALE, 0.0)),
        )
        if arch == "gemma3":
            cfg = cfg.with_(rope_local_base=float(g("{arch}.rope.local_freq_base", 10000.0)))
        if arch == "gemma2":
            cfg = cfg.with_(attn_logit_softcap=50.0, final_logit_softcap=30.0)
    elif arch == "mixtral" or (arch == "llama" and cfg.n_experts > 0):
        pass  # MoE handled by tensor presence
    elif arch in ("gpt2", "starcoder"):
        # learned positions, LayerNorm(+bias), ungated gelu MLP, fused qkv
        # (reference: llm_build_gpt2 / llm_build_starcoder)
        cfg = cfg.with_(
            norm_type="layer",
            pos_emb="learned",
            ffn_gated=False,
            act_fn="gelu",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "phi2":
        # parallel attn+FFN residual, LayerNorm, partial NEOX rotary
        # (reference: llm_build_phi2)
        cfg = cfg.with_(
            norm_type="layer",
            parallel_residual=True,
            ffn_gated=False,
            act_fn="gelu",
            rope_interleaved=False,
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "phi3":
        # fused qkv + fused gate||up handled by effective_tensors
        # (reference: llm_build_phi3)
        cfg = cfg.with_(rope_interleaved=False)
    elif arch == "gptneox":
        cfg = cfg.with_(
            norm_type="layer",
            ffn_gated=False,
            act_fn="gelu",
            rope_interleaved=False,
            parallel_residual=bool(g("{arch}.use_parallel_residual", True)),
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "stablelm":
        cfg = cfg.with_(
            norm_type="layer",
            rope_interleaved=False,
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "falcon":
        cfg = cfg.with_(
            norm_type="layer",
            parallel_residual=True,
            ffn_gated=False,
            act_fn="gelu",
            rope_interleaved=False,
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "gpt-oss":
        # iSWA (alternating), attention sinks, swiglu_oai MoE with biases
        # (reference: llm_build_openai_moe_iswa, llama-model.cpp:17610)
        cfg = cfg.with_(
            rope_interleaved=False,
            swa_pattern=2,
            moe_topk_softmax=True,
            act_fn="swiglu_oai",
        )
    elif arch == "deepseek2":
        # MLA + fine-grained MoE (reference: llm_build_deepseek2,
        # llama-model.cpp:12691; metadata keys per convert_hf DeepseekV2Model)
        key_mla = int(g(Keys.Attention.KEY_LENGTH_MLA, 0))
        val_mla = int(g("{arch}.attention.value_length_mla", 0))
        cfg = cfg.with_(
            rope_interleaved=True,  # HF deepseek checkpoints use paired dims
            q_lora_rank=int(g(Keys.Attention.Q_LORA_RANK, 0)),
            kv_lora_rank=int(g(Keys.Attention.KV_LORA_RANK, 512)),
            qk_nope_head_dim=(key_mla - cfg.rope_dim) if key_mla else 128,
            v_head_dim=val_mla or 128,
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_gating_func=int(g(Keys.LLM.EXPERT_GATING_FUNC, 1)),
            rope_yarn_log_mul=float(g(Keys.Rope.SCALING_YARN_LOG_MUL, 0.0)),
            attn_scale=float(key_mla) ** -0.5 if key_mla else 0.0,
        )
    elif arch in ("glm4moe", "dots1"):
        # dense-lead MoE with standard GQA attention: NEOX rope, optional
        # qkv bias/qk norms, expert-probs bias, shared expert(s)
        # (reference llm_build_glm4_moe / llm_build_dots1)
        cfg = cfg.with_(
            rope_interleaved=False,
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_gating_func=int(g(Keys.LLM.EXPERT_GATING_FUNC, 1)),
            expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, True)),
            expert_weights_scale=float(g(Keys.LLM.EXPERT_WEIGHTS_SCALE, 1.0)),
        )
    elif arch in ("hunyuan-moe", "hunyuan-dense"):
        # NEOX rope then per-head qk norms (post-rope!); hunyuan-moe adds an
        # always-on shared expert beside the routed experts
        # (reference llm_build_hunyuan_moe / llm_build_hunyuan_dense)
        cfg = cfg.with_(
            rope_interleaved=False,
            qk_norm=True,
            qk_norm_after_rope=True,
            expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, True)) if arch == "hunyuan-moe" else False,
        )
    elif arch == "mpt":
        # ALiBi, LayerNorm (bias-free by default), ungated GELU FFN, no
        # positional embedding (reference llm_build_mpt)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            pos_emb="none",
            alibi=True,
            ffn_gated=False,
            act_fn="gelu_erf",
        )
    elif arch == "bloom":
        # ALiBi, biased LayerNorms incl. a post-embedding norm, fused qkv
        # (split at convert), tanh-GELU FFN (reference llm_build_bloom)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            pos_emb="none",
            alibi=True,
            attn_bias=True,
            ffn_gated=False,
            act_fn="gelu_tanh",
        )
    elif arch == "granitehybrid":
        # interleaved mamba2/attention layers (recurrent iff per-layer
        # head_count_kv == 0), NoPE attention unless rope finetuned, granite
        # multipliers (reference llm_build_granite_hybrid)
        rope_ft = bool(g("{arch}.rope.scaling.finetuned", False))
        cfg = cfg.with_(
            pos_emb="rope" if rope_ft else "none",
            embedding_scale=float(g(Keys.LLM.EMBEDDING_SCALE, 1.0)),
            attn_scale=float(g(Keys.LLM.ATTENTION_SCALE, 0.0)),
            residual_scale=float(g(Keys.LLM.RESIDUAL_SCALE, 1.0)),
            logit_scale=1.0 / float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 128)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, (2 * n_embd) // 64)),
            ssm_n_group=int(g(Keys.SSM.GROUP_COUNT, 1)),
        )
    elif arch == "minicpm3":
        # MLA attention + MiniCPM scaling (reference llm_build_minicpm3
        # :9868 — scale_embd=12, scale_depth=1.4, n_embd_base=256 hardcoded)
        key_mla3 = int(g(Keys.Attention.KEY_LENGTH_MLA, 0))
        cfg = cfg.with_(
            rope_interleaved=False,
            q_lora_rank=int(g(Keys.Attention.Q_LORA_RANK, 0)),
            kv_lora_rank=int(g(Keys.Attention.KV_LORA_RANK, 256)),
            qk_nope_head_dim=(key_mla3 - cfg.rope_dim) if key_mla3 else 64,
            v_head_dim=int(g("{arch}.attention.value_length_mla", 0)) or 64,
            embedding_scale=12.0,
            residual_scale=1.4 / max(int(g(Keys.LLM.BLOCK_COUNT)), 1) ** 0.5,
            logit_scale=256.0 / n_embd,
            attn_scale=float(key_mla3) ** -0.5 if key_mla3 else 0.0,
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_gating_func=int(g(Keys.LLM.EXPERT_GATING_FUNC, 1)),
        )
    elif arch == "olmo":
        # v1: non-parametric LayerNorm (converter writes ones-weights) and
        # optional qkv clamp; NORM rope (reference llm_build_olmo,
        # src/llama-model.cpp:11740; clamp at :11764)
        cfg = cfg.with_(
            norm_type="layer",
            clamp_kqv=float(g(Keys.Attention.CLAMP_KQV, 0.0)),
        )
    elif arch == "olmo2":
        # post-norm blocks + full-width q/k norms (reference: llm_build_olmo2)
        cfg = cfg.with_(
            pre_norm=False,
            post_attn_norm=True,
            post_ffn_norm=True,
            qk_norm_full=True,
            rope_interleaved=False,
        )
    elif arch == "command-r":
        # shared-norm parallel residual, LayerNorm (no bias), logit scale,
        # interleaved rope (reference: llm_build_command_r)
        cfg = cfg.with_(
            norm_type="layer",
            parallel_residual=True,
            rope_interleaved=True,
            logit_scale=float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "granite":
        # llama graph + 4 scale factors (reference: llm_build_granite)
        cfg = cfg.with_(
            embedding_scale=float(g(Keys.LLM.EMBEDDING_SCALE, 1.0)),
            attn_scale=float(g(Keys.LLM.ATTENTION_SCALE, 0.0)),
            residual_scale=float(g(Keys.LLM.RESIDUAL_SCALE, 1.0)),
            logit_scale=1.0 / float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
        )
    elif arch == "rwkv7":
        cfg = cfg.with_(
            pos_emb="none",
            norm_type="layer",
            wkv_head_size=int(g("{arch}.wkv.head_size", 64)),
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch == "rwkv6":
        cfg = cfg.with_(
            pos_emb="none",
            norm_type="layer",
            wkv_head_size=int(g("{arch}.wkv.head_size", 64)),
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        )
    elif arch in ("rwkv6qwen2", "arwkv7"):
        # RWKV time-mix inside a qwen-style gated-FFN transformer shell
        # (llm_build_rwkv6qwen2 :14628 / llm_build_arwkv7 :14978) — RMS
        # norms, one token-shift row per layer
        cfg = cfg.with_(
            pos_emb="none",
            wkv_head_size=int(g("{arch}.wkv.head_size", 64)),
        )
    elif arch == "jamba":
        cfg = cfg.with_(
            pos_emb="none",
            expert_weights_norm=False,
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 16)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, (n_embd + 15) // 16)),
        )
    elif arch == "olmoe":
        # NEOX rope, full-projection q/k norms, softmax-normalized top-k
        # (reference llm_build_olmoe)
        cfg = cfg.with_(rope_interleaved=False, qk_norm_full=True,
                        expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, False)))
    elif arch == "glm4":
        # partial NORM rope + post-attention/post-ffn norms (llm_build_glm4)
        cfg = cfg.with_(post_attn_norm=True, post_ffn_norm=True,
                        attn_bias=True)
    elif arch == "dbrx":
        # fused qkv with clamp, NEOX rope, LayerNorm, MoE (llm_build_dbrx)
        cfg = cfg.with_(
            rope_interleaved=False,
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            clamp_kqv=float(g(Keys.Attention.CLAMP_KQV, 0.0)),
        )
    elif arch == "cohere2":
        # command-r parallel-residual blocks; iSWA pattern 4 with rope only
        # on the sliding layers (llm_build_cohere2_iswa)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            parallel_residual=True,
            logit_scale=float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
            swa_pattern=4,
            rope_swa_only=True,
            tie_embeddings=True,
        )
    elif arch == "smollm3":
        # llama with every 4th layer NoPE (llm_build_smollm3)
        cfg = cfg.with_(nope_interval=4)
    elif arch == "llama4":
        # iSWA (chunked in the reference; standard window approximation
        # here), NoPE every 4th layer with attn-temperature tuning, L2 qk
        # norm on rope layers, sigmoid-gated MoE + always-on shared expert
        # (llm_build_llama_iswa)
        cfg = cfg.with_(
            nope_interval=4,
            swa_pattern=4 if cfg.sliding_window > 0 else 1,
            # reference hardcodes these (llama-hparams.h:148-149)
            qk_norm_l2=True,
            attn_temp_scale=0.1,
            attn_temp_floor=8192.0,
            expert_gating_func=2,  # sigmoid
            expert_weights_norm=False,
            moe_scale_input=True,
        )
    elif arch == "starcoder2":
        # LayerNorm + full biases, NEOX rope, ungated GELU FFN
        # (reference llm_build_starcoder2, src/llama-model.cpp:10880)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            attn_bias=True,
            rope_interleaved=False,
            ffn_gated=False,
            act_fn="gelu_tanh",
        )
    elif arch == "nemotron":
        # LayerNorm(+1? no — plain), relu² ungated FFN, partial NEOX rope
        # (reference llm_build_nemotron, src/llama-model.cpp:13923)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            rope_interleaved=False,
            ffn_gated=False,
            act_fn="relu2",
        )
    elif arch == "exaone4":
        # post-norm-only blocks (attention/FFN on the raw residual stream,
        # RMS norms on the branch outputs) + per-head qk norms, NEOX rope
        # (reference llm_build_exaone4, src/llama-model.cpp:14184)
        cfg = cfg.with_(
            pre_norm=False,
            post_attn_norm=True,
            post_ffn_norm=True,
            qk_norm=True,
            rope_interleaved=False,
        )
    elif arch == "arcee":
        # llama graph with an ungated relu² FFN (llm_build_arcee :17039)
        cfg = cfg.with_(ffn_gated=False, act_fn="relu2")
    elif arch == "xverse":
        pass  # plain llama graph with NORM rope (llm_build_xverse)
    elif arch == "exaone":
        # llama graph + NEOX rope + optional qkv/o biases
        # (reference llm_build_exaone, src/llama-model.cpp:14052)
        cfg = cfg.with_(rope_interleaved=False)
    elif arch == "baichuan":
        # 7B (32 layers): NORM rope; 13B (40 layers): no rope, ALiBi —
        # the reference keys the same split off LLM_TYPE from n_layer
        # (llm_build_baichuan, src/llama-model.cpp:6464 type switch :6506)
        if cfg.n_layers >= 40:
            cfg = cfg.with_(pos_emb="none", alibi=True)
    elif arch == "qwen":
        # qwen v1: fused qkv with bias (split at load), NEOX rope
        # (reference llm_build_qwen, src/llama-model.cpp:8018)
        cfg = cfg.with_(attn_bias=True, rope_interleaved=False)
    elif arch == "codeshell":
        # starcoder body (LayerNorm+bias, fused MQA qkv+bias, ungated GELU)
        # but NEOX rope instead of learned positions
        # (reference llm_build_codeshell, src/llama-model.cpp:9500)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            rope_interleaved=False,
            ffn_gated=False,
            act_fn="gelu",
        )
    elif arch == "orion":
        # LayerNorm (with bias) + NEOX rope + gated silu FFN
        # (reference llm_build_orion, src/llama-model.cpp:9614)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            rope_interleaved=False,
        )
    elif arch == "plamo":
        # shared-norm parallel residual (attn and FFN both read attn_norm
        # output; out = x + attn + ffn), NEOX full-dim rope
        # (reference llm_build_plamo, src/llama-model.cpp:9275)
        cfg = cfg.with_(parallel_residual=True, rope_interleaved=False)
    elif arch == "refact":
        # RMS norms + ALiBi (f_max_alibi_bias=8), gated silu FFN, no rope
        # (reference llm_build_refact, src/llama-model.cpp:7217; NONE rope
        # group :18617)
        cfg = cfg.with_(pos_emb="none", alibi=True)
    elif arch == "jais":
        # LayerNorm, ALiBi, fused qkv+bias, *gated* silu FFN with biases,
        # attention scale 1/head_dim (not rsqrt)
        # (reference llm_build_jais, src/llama-model.cpp:13385 — kq_scale
        # 1.0f/float(n_embd_head) :13429)
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            pos_emb="none",
            alibi=True,
            attn_scale=1.0 / float(head_dim),
        )
    elif arch == "chatglm":
        # RMS norms, optionally-fused qkv (+bias), *partial* NORM rope
        # (rope_dim = head_dim/2 in upstream GGUFs), split-swiglu FFN (one
        # ffn_up holding [gate|up] halves, split at load)
        # (reference llm_build_chatglm, src/llama-model.cpp:13480)
        pass  # all covered by metadata + tensor presence
    elif arch == "grok":
        # NEOX rope, embedding scale 78.38367…, kq_scale 1.0, GELU MoE with
        # post-attention/post-ffn RMS norms, logit scale 1/sqrt(3)
        # (reference llm_build_grok, src/llama-model.cpp:6821 — constants
        # hardcoded at :6834/:6975)
        cfg = cfg.with_(
            rope_interleaved=False,
            embedding_scale=78.38367176906169,
            attn_scale=1.0,
            logit_scale=0.5773502691896257,
            post_attn_norm=True,
            post_ffn_norm=True,
            act_fn="gelu",
            expert_weights_norm=True,
        )
    elif arch == "arctic":
        # llama blocks + a parallel MoE branch on the *layer input* through
        # its own norm (ffn_norm_exps); dense FFN keeps the usual residual
        # (reference llm_build_arctic, src/llama-model.cpp:12391)
        cfg = cfg.with_(expert_weights_norm=True)
    elif arch == "smallthinker":
        # MoE with gated-ReLU experts, router fed the *pre-norm* layer
        # input; optional dense-first iSWA(4) with il%4==0 NoPE
        # (reference llm_build_smallthinker, src/llama-model.cpp:17918;
        # hparams :1853-1868)
        cfg = cfg.with_(
            rope_interleaved=False,
            act_fn="relu",
            moe_gate_prenorm=True,
            expert_weights_norm=True,
            expert_gating_func=int(g(Keys.LLM.EXPERT_GATING_FUNC, 1)),
        )
        if cfg.sliding_window > 0:
            cfg = cfg.with_(swa_pattern=4, swa_pattern_zero=True,
                            nope_interval_zero=4)
    elif arch == "plm":
        # MLA attention without the q low-rank (wq direct), NORM rope,
        # ungated relu² FFN (reference llm_build_plm,
        # src/llama-model.cpp:15834; hparams :1412)
        key_plm = int(g(Keys.Attention.KEY_LENGTH, 0))
        cfg = cfg.with_(
            rope_interleaved=True,
            kv_lora_rank=int(g(Keys.Attention.KV_LORA_RANK, 512)),
            qk_nope_head_dim=(key_plm - cfg.rope_dim) if key_plm else 96,
            v_head_dim=int(g("{arch}.attention.value_length", 0)) or 128,
            ffn_gated=False,
            act_fn="relu2",
            attn_scale=float(key_plm) ** -0.5 if key_plm else 0.0,
            # no MoE: every layer loads/scans through the dense group
            n_layer_dense_lead=int(g(Keys.LLM.BLOCK_COUNT)),
        )
    elif arch == "deepseek":
        # v1: llama attention + dense-lead MoE, softmax routing without
        # top-k renorm, scaled experts + added shared experts
        # (reference llm_build_deepseek, src/llama-model.cpp:12529;
        # hparams :1369-1381)
        cfg = cfg.with_(
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, False)),
            expert_weights_scale=float(g(Keys.LLM.EXPERT_WEIGHTS_SCALE, 1.0)),
        )
    elif arch == "bailingmoe":
        # dense-lead MoE with shared experts, NORM rope, optional qkv bias
        # (reference llm_build_bailingmoe, src/llama-model.cpp:16006;
        # hparams :1717-1725)
        cfg = cfg.with_(
            rope_interleaved=True,
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, False)),
            expert_weights_scale=float(g(Keys.LLM.EXPERT_WEIGHTS_SCALE, 1.0)),
        )
    elif arch == "ernie4_5-moe":
        # dense-lead then interleaved MoE layers (step must be 1 for the
        # two-scan layout) with optional shared expert
        # (reference llm_build_ernie4_5_moe, src/llama-model.cpp:16430)
        step = int(g("{arch}.interleave_moe_layer_step", 1))
        if step != 1:
            raise ValueError("ernie4_5-moe: interleave_moe_layer_step > 1 "
                             "not supported (two-scan layout)")
        cfg = cfg.with_(
            rope_interleaved=True,
            n_layer_dense_lead=int(g(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, 0)),
            n_shared_experts=int(g(Keys.LLM.EXPERT_SHARED_COUNT, 0)),
            expert_weights_norm=bool(g(Keys.LLM.EXPERT_WEIGHTS_NORM, True)),
        )
    elif arch == "deci":
        # NAS llama variants: per-layer head counts (incl. attention-free
        # n_head==0 and linear-attention n_head_kv==0 layers) and FFN
        # widths (llm_build_deci, src/llama-model.cpp:6308).  Varying GQA
        # ratios load as MHA via exact K/V-head replication.
        heads_arr = g(Keys.Attention.HEAD_COUNT, n_heads)
        kv_arr = g(Keys.Attention.HEAD_COUNT_KV, n_kv)
        if not (isinstance(heads_arr, (list, tuple)) or getattr(heads_arr, "ndim", 0)):
            heads_arr = [int(heads_arr)] * cfg.n_layers
        if not (isinstance(kv_arr, (list, tuple)) or getattr(kv_arr, "ndim", 0)):
            kv_arr = [int(kv_arr)] * cfg.n_layers
        heads_arr = [int(x) for x in heads_arr]
        kv_arr = [int(x) for x in kv_arr]
        ratios = {h // k for h, k in zip(heads_arr, kv_arr) if h > 0 and k > 0}
        linear = tuple(h > 0 and k == 0 for h, k in zip(heads_arr, kv_arr))
        cfg = cfg.with_(
            ragged_zero_fill=True,
            attn_linear_layers=linear if any(linear) else (),
            attn_scale=float(g(Keys.Attention.SCALE, 0.0)),
        )
        if len(ratios) > 1:
            cfg = cfg.with_(kv_expand=True, n_kv_heads=cfg.n_heads)
    elif arch == "dream":
        # diffusion LM with the qwen2 block shape (qkv biases, NEOX rope),
        # run bidirectionally by runtime.diffusion (llm_build_dream :8254)
        cfg = cfg.with_(attn_bias=True, rope_interleaved=False)
    elif arch == "llada":
        # diffusion LM with the llama block shape, NORM rope, non-causal
        # (llm_build_llada :8357)
        pass
    elif arch == "phimoe":
        # phi-3.5-MoE: the phi3 builder + top-2 softmax MoE; LayerNorm with
        # biases, NEOX rope with optional LongRoPE factors, biased lm_head
        # (reference llm_build_phi3<iswa> dispatch :18245, moe branch
        # :9230-9246).  Routing follows the reference's plain normalized
        # top-k (build_moe_ffn), not HF's training-time sparsemixer.
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            rope_interleaved=False,
            expert_weights_norm=True,
        )
    elif arch == "lfm2":
        # hybrid gated-shortconv + attention (per-layer head_count_kv==0 →
        # conv layer); qk norms + NEOX rope on attention layers
        # (reference llm_build_lfm2, src/llama-model.cpp:17740; L_cache
        # hparam :1841)
        cfg = cfg.with_(
            rope_interleaved=False,
            qk_norm=True,
            ssm_d_conv=int(g("{arch}.shortconv.l_cache", 3)),
        )
    elif arch == "openelm":
        # per-layer head counts / FFN widths (zero-padded to uniform at
        # load), fused per-layer qkv, per-head q/k rms norms, NEOX rope
        # (reference llm_build_openelm, src/llama-model.cpp:12116)
        cfg = cfg.with_(rope_interleaved=False, qk_norm=True)
    elif arch == "bitnet":
        # ternary-weight transformer: per-tensor weight scales + inner
        # sub-norms before the out/down projections, NEOX rope
        # (reference llm_build_bitnet, src/llama-model.cpp:12954).  The
        # reference hardcodes silu; HF BitNetForCausalLM checkpoints use
        # relu² — carried via the converter's activation key.
        act = str(g("{arch}.activation_function", "silu"))
        cfg = cfg.with_(rope_interleaved=False, act_fn=act)
    elif arch == "chameleon":
        # per-head *LayerNorm* q/k norms (+bias); 30B "swin" variant norms
        # the branch outputs instead of inputs
        # (reference llm_build_chameleon, src/llama-model.cpp:15505)
        cfg = cfg.with_(qk_norm=True, qk_norm_layer=True)
        if bool(g("{arch}.swin_norm", False)):
            cfg = cfg.with_(pre_norm=False, post_attn_norm=True,
                            post_ffn_norm=True)
    elif arch == "gptj":
        # shared-norm parallel residual, partial *interleaved* rope
        # (rotate_every_two), ungated tanh-GELU FFN with biases, biased
        # lm_head.  The reference declares the arch (llama-arch.cpp:14)
        # but ships no builder; semantics follow the original GPT-J.
        cfg = cfg.with_(
            norm_type="layer",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
            parallel_residual=True,
            ffn_gated=False,
            act_fn="gelu_tanh",
        )
    elif arch == "minicpm":
        # the granite builder with rope always on (reference: LLM_ARCH_MINICPM
        # → llm_build_granite, src/llama-model.cpp:18431; NORM rope :18641).
        # scale keys: embedding_scale=scale_emb,
        # residual_scale=scale_depth/sqrt(n_layers),
        # logit_scale=hidden/dim_model_base (divided out at the head)
        cfg = cfg.with_(
            embedding_scale=float(g(Keys.LLM.EMBEDDING_SCALE, 1.0)),
            attn_scale=float(g(Keys.LLM.ATTENTION_SCALE, 0.0)),
            residual_scale=float(g(Keys.LLM.RESIDUAL_SCALE, 1.0)),
            logit_scale=1.0 / float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
        )
    elif arch == "granitemoe":
        cfg = cfg.with_(
            embedding_scale=float(g(Keys.LLM.EMBEDDING_SCALE, 1.0)),
            residual_scale=float(g(Keys.LLM.RESIDUAL_SCALE, 1.0)),
            logit_scale=float(g(Keys.LLM.LOGIT_SCALE, 1.0)),
            attn_scale=float(g(Keys.LLM.ATTENTION_SCALE, 0.0)),
            expert_weights_norm=True,
        )
    elif arch == "ernie4_5":
        pass  # plain llama graph with NORM rope (llm_build_ernie4_5)
    elif arch == "bert":
        cfg = cfg.with_(
            norm_type="layer",
            pos_emb="learned",
            act_fn="gelu_erf",
            ffn_gated=False,
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-12)),
        )
    elif arch == "jina-bert-v2":
        # ALiBi attention (f_max_alibi_bias=8, no position inputs) and a
        # gated-GELU FFN — llm_build_bert JINA_BERT_V2 branches
        # (src/llama-model.cpp:760-766, :7465-7471)
        cfg = cfg.with_(
            norm_type="layer",
            pos_emb="none",
            alibi=True,
            act_fn="gelu",
            ffn_gated=True,
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-12)),
        )
    elif arch in ("nomic-bert", "nomic-bert-moe"):
        cfg = cfg.with_(
            norm_type="layer",
            pos_emb="rope",
            rope_interleaved=False,  # NEOX
            act_fn="silu",
            ffn_gated=arch == "nomic-bert",
            rms_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-12)),
        )
    elif arch == "neo-bert":
        # pre-norm RMS encoder, fused qkv, interleaved (NORM) rope,
        # split-swiglu FFN (llm_build_neo_bert, src/llama-model.cpp:7502)
        cfg = cfg.with_(pos_emb="rope", rope_interleaved=True)
    elif arch == "mamba":
        cfg = cfg.with_(
            pos_emb="none",
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 16)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, (n_embd + 15) // 16)),
            ssm_dt_b_c_rms=bool(g(Keys.SSM.DT_B_C_RMS, False)),
        )
    elif arch == "falcon-h1":
        # parallel attention+mamba2 layers; NEOX rope; all Falcon-H1
        # multipliers are baked into the weights at convert time
        # (reference llm_build_falcon_h1, src/llama-model.cpp:16600)
        cfg = cfg.with_(
            rope_interleaved=False,
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 128)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, (2 * n_embd) // 64)),
            ssm_n_group=int(g(Keys.SSM.GROUP_COUNT, 1)),
        )
    elif arch == "plamo2":
        # hybrid SSD + qk-normed attention (per-layer head_count_kv==0 →
        # mamba layer); double-norm blocks, split-swiglu FFN, NEOX rope
        # (reference llm_build_plamo2, src/llama-model.cpp:16726; hparams
        # :988)
        cfg = cfg.with_(
            rope_interleaved=False,
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 64)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, 32)),
            ssm_n_group=int(g(Keys.SSM.GROUP_COUNT, 1)) or 1,
        )
    elif arch == "mamba2":
        # dt_rank carries the head count; d_state defaults large (128)
        # (reference LLM_ARCH_MAMBA2 hparams, src/llama-model.cpp:1172)
        cfg = cfg.with_(
            pos_emb="none",
            ssm_d_conv=int(g(Keys.SSM.CONV_KERNEL, 4)),
            ssm_d_inner=int(g(Keys.SSM.INNER_SIZE, 2 * n_embd)),
            ssm_d_state=int(g(Keys.SSM.STATE_SIZE, 128)),
            ssm_dt_rank=int(g(Keys.SSM.TIME_STEP_RANK, (2 * n_embd) // 64)),
            ssm_n_group=int(g(Keys.SSM.GROUP_COUNT, 1)),
        )
    return cfg
