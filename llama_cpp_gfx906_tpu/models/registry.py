"""Model-family registry: arch string → (forward, cache factory, loader).

The TPU analog of the reference's graph dispatch (`llama_model::build_graph`
switch at src/llama-model.cpp:18147 + `create_memory` at :18038): attention
archs share one generalized forward (models/llama.py) with a KV-cache
memory; recurrent archs (mamba) use the recurrent-state memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from .config import ModelConfig

# archs whose graphs the generalized attention forward covers
ATTENTION_ARCHS = {
    "llama", "llama2", "llama3", "llama4", "mistral", "mixtral", "tinyllama",
    "qwen2", "qwen2moe", "qwen3", "qwen3moe",
    "gemma", "gemma2", "gemma3",
    "gpt2", "starcoder", "phi2", "phi3", "gptneox", "stablelm", "falcon",
    "olmo", "olmoe", "smollm", "smollm3", "internlm2",
    "granite", "granitemoe", "glm4", "dbrx", "cohere2", "command-r", "minicpm",
    "ernie4_5", "gpt-oss", "olmo2",
    "starcoder2", "nemotron", "exaone4", "arcee", "xverse", "qwen2vl",
    "hunyuan-moe", "hunyuan-dense", "mpt", "bloom",
    "exaone", "baichuan", "qwen", "codeshell", "orion", "plamo", "refact",
    "jais", "chatglm", "gptj", "grok", "arctic", "smallthinker",
    "bitnet", "chameleon", "openelm", "deci", "phimoe",
}

RECURRENT_ARCHS = {"mamba"}
MAMBA2_ARCHS = {"mamba2"}
FALCON_H1_ARCHS = {"falcon-h1"}
HYBRID_ARCHS = {"jamba"}
GRANITE_HYBRID_ARCHS = {"granitehybrid"}
LFM2_ARCHS = {"lfm2"}
PLAMO2_ARCHS = {"plamo2"}
GEMMA3N_ARCHS = {"gemma3n"}
RWKV_ARCHS = {"rwkv6"}
RWKV7_ARCHS = {"rwkv7"}
RWKV_HYBRID_ARCHS = {"rwkv6qwen2", "arwkv7"}
MLA_ARCHS = {"deepseek2", "minicpm3", "plm"}
MOE_LEAD_ARCHS = {"glm4moe", "dots1", "bailingmoe", "ernie4_5-moe", "deepseek"}


@dataclass(frozen=True)
class ModelFamily:
    name: str
    forward: Callable
    make_cache: Callable  # (cfg, batch, max_seq, dtype) -> cache pytree
    load_params: Callable  # (reader, cfg, dtype, device_put_fn, keep_quantized)


def _llama_family() -> ModelFamily:
    from ..runtime.weights import load_llama_params, load_llama_params_quantized
    from .llama import KVCache, forward

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        if keep_quantized:
            return load_llama_params_quantized(reader, cfg, dtype, device_put_fn)
        return load_llama_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="llama",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: KVCache.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _mamba_family() -> ModelFamily:
    from .mamba import MambaState, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="mamba",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: MambaState.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _mamba2_family() -> ModelFamily:
    from .mamba2 import Mamba2State, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="mamba2",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: Mamba2State.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _falcon_h1_family() -> ModelFamily:
    from .falcon_h1 import FalconH1State, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="falcon-h1",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: FalconH1State.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _deepseek2_family() -> ModelFamily:
    from .deepseek2 import MLACache, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="deepseek2",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: MLACache.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


ENC_DEC_ARCHS = {"t5", "t5encoder"}
# diffusion LMs — iterative-denoising generation via runtime.diffusion
DIFFUSION_ARCHS = {"dream", "llada"}
# bidirectional encoders (embeddings / rerank) — served by
# runtime.encoder.EncoderEngine, not the causal Engine
ENCODER_ARCHS = {"bert", "nomic-bert", "jina-bert-v2", "nomic-bert-moe", "neo-bert"}


def _jamba_family() -> ModelFamily:
    from .jamba import HybridState, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="jamba",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: HybridState.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _rwkv6_family() -> ModelFamily:
    from .rwkv6 import RWKVState, forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="rwkv6",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: RWKVState.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def _rwkv7_family() -> ModelFamily:
    from .rwkv6 import RWKVState
    from .rwkv7 import forward, load_params

    def load(reader, cfg, dtype, device_put_fn=None, keep_quantized=True):
        return load_params(reader, cfg, dtype, device_put_fn)

    return ModelFamily(
        name="rwkv7",
        forward=forward,
        make_cache=lambda cfg, batch, max_seq, dtype: RWKVState.create(cfg, batch, max_seq, dtype),
        load_params=load,
    )


def get_family(cfg: ModelConfig) -> ModelFamily:
    if cfg.arch == "wavtokenizer-dec":
        # audio-codec decoder, not a causal LM: no KV/decode loop — load it
        # through models/wavtokenizer.py via tools/tts.py (the reference
        # also special-cases it in the tts tool)
        raise ValueError(
            "wavtokenizer-dec is an audio decoder; use "
            "llama_cpp_gfx906_tpu.tools.tts / models.wavtokenizer, not Engine")
    if cfg.arch in RECURRENT_ARCHS:
        return _mamba_family()
    if cfg.arch in MAMBA2_ARCHS:
        return _mamba2_family()
    if cfg.arch in FALCON_H1_ARCHS:
        return _falcon_h1_family()
    if cfg.arch in RWKV_ARCHS:
        return _rwkv6_family()
    if cfg.arch in RWKV7_ARCHS:
        return _rwkv7_family()
    if cfg.arch in RWKV_HYBRID_ARCHS:
        from .rwkv_hybrid import RWKVHybridState, forward as rh_fwd, load_params as rh_load

        return ModelFamily(
            name="rwkv_hybrid",
            forward=rh_fwd,
            make_cache=lambda cfg, batch, max_seq, dtype: RWKVHybridState.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                rh_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in HYBRID_ARCHS:
        return _jamba_family()
    if cfg.arch in GEMMA3N_ARCHS:
        from .gemma3n import Gemma3nState, forward as g3n_fwd, load_params as g3n_load

        return ModelFamily(
            name="gemma3n",
            forward=g3n_fwd,
            make_cache=lambda cfg, batch, max_seq, dtype: Gemma3nState.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                g3n_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in PLAMO2_ARCHS:
        from .plamo2 import PLaMo2State, forward as p2_fwd, load_params as p2_load

        return ModelFamily(
            name="plamo2",
            forward=p2_fwd,
            make_cache=lambda cfg, batch, max_seq, dtype: PLaMo2State.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                p2_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in LFM2_ARCHS:
        from .lfm2 import LFM2State, forward as lfm2_fwd, load_params as lfm2_load

        return ModelFamily(
            name="lfm2",
            forward=lfm2_fwd,
            make_cache=lambda cfg, batch, max_seq, dtype: LFM2State.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                lfm2_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in GRANITE_HYBRID_ARCHS:
        from .granite_hybrid import GraniteHybridState, forward as gh_fwd, load_params as gh_load

        return ModelFamily(
            name="granitehybrid",
            forward=gh_fwd,
            make_cache=lambda cfg, batch, max_seq, dtype: GraniteHybridState.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                gh_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in MLA_ARCHS:
        return _deepseek2_family()
    if cfg.arch in MOE_LEAD_ARCHS:
        from ..models.llama import KVCache
        from .moe_lead import forward as ml_forward, load_params as ml_load

        return ModelFamily(
            name="moe_lead",
            forward=ml_forward,
            make_cache=lambda cfg, batch, max_seq, dtype: KVCache.create(cfg, batch, max_seq, dtype),
            load_params=lambda reader, cfg, dtype, device_put_fn=None, keep_quantized=True:
                ml_load(reader, cfg, dtype, device_put_fn),
        )
    if cfg.arch in DIFFUSION_ARCHS:
        raise ValueError(
            "diffusion LMs decode by iterative denoising, not the causal "
            "Engine; use llama_cpp_gfx906_tpu.runtime.diffusion.DiffusionEngine"
        )
    if cfg.arch in ENC_DEC_ARCHS:
        raise ValueError(
            "encoder-decoder models don't fit the causal Engine; use "
            "llama_cpp_gfx906_tpu.models.t5.T5Model.from_gguf instead"
        )
    if cfg.arch in ENCODER_ARCHS:
        raise ValueError(
            "bidirectional encoders don't fit the causal Engine; use "
            "llama_cpp_gfx906_tpu.runtime.encoder.EncoderEngine.from_gguf"
        )
    # default: any arch with attention tensors runs on the generalized
    # attention forward — unknown archs get a best-effort llama treatment,
    # matching the reference's behavior of failing at tensor-load time
    return _llama_family()
