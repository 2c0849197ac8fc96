"""Declarative CLI flag registry with env mirrors and per-tool scoping.

The analog of the reference's ``common/arg.cpp`` (~300 flags registered
once with ``.set_env("LLAMA_ARG_*")`` mirrors and per-example scoping,
:1350-2067): every tool builds its parser from ONE table, each flag can be
defaulted from its environment variable, and ``--completion-bash`` emits a
shell completion script (``common_params_print_completion`` analog).

Usage:
    from llama_cpp_gfx906_tpu.common.args import build_parser
    ap = build_parser("server", description="...")
    ap.add_argument(...)          # tool-specific extras still compose
    args = ap.parse_args()
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Flag:
    names: tuple  # ("-m", "--model")
    dest: str
    help: str
    scopes: frozenset  # tools that register this flag
    env: str | None = None  # LLAMA_ARG_* mirror
    type: object = str
    default: object = None
    choices: tuple | None = None
    action: str | None = None  # "store_true" etc.
    repeatable: bool = False


ALL = frozenset({"cli", "server", "bench", "perplexity", "quantize", "embedding"})
GEN = frozenset({"cli", "server"})


def _f(names, dest, help, scopes=ALL, **kw):
    return Flag(tuple(names), dest, help,
                scopes if isinstance(scopes, frozenset) else frozenset(scopes), **kw)


# the reference's commonly-used set (common/arg.cpp), with the same
# LLAMA_ARG_* env mirrors
REGISTRY: list[Flag] = [
    _f(["-m", "--model"], "model", "model GGUF path", env="LLAMA_ARG_MODEL"),
    _f(["-c", "--ctx-size"], "ctx_size", "context window (tokens)",
       env="LLAMA_ARG_CTX_SIZE", type=int, default=2048),
    _f(["-n", "--n-predict", "--predict"], "n_predict", "tokens to generate",
       env="LLAMA_ARG_N_PREDICT", type=int, default=128, scopes=GEN),
    _f(["-b", "--batch-size"], "n_batch", "prompt tokens per engine step",
       env="LLAMA_ARG_BATCH", type=int, default=256),
    _f(["-p", "--prompt"], "prompt", "prompt text", scopes={"cli", "perplexity"}),
    _f(["-f", "--file"], "file", "read the prompt from a file",
       scopes={"cli", "perplexity"}),
    _f(["-s", "--seed"], "seed", "RNG seed", env="LLAMA_ARG_SEED",
       type=int, default=-1, scopes=GEN),
    _f(["--temp"], "temp", "sampling temperature", type=float, default=0.8,
       scopes=GEN),
    _f(["--top-k"], "top_k", "top-k sampling", type=int, default=40, scopes=GEN),
    _f(["--top-p"], "top_p", "top-p (nucleus) sampling", type=float,
       default=0.95, scopes=GEN),
    _f(["--min-p"], "min_p", "min-p sampling", type=float, default=0.05,
       scopes=GEN),
    _f(["--repeat-penalty"], "repeat_penalty", "repetition penalty",
       type=float, default=1.0, scopes=GEN),
    _f(["--repeat-last-n"], "repeat_last_n", "penalty window", type=int,
       default=64, scopes=GEN),
    _f(["--grammar"], "grammar", "GBNF grammar constraint", scopes=GEN),
    _f(["--grammar-file"], "grammar_file", "GBNF grammar file", scopes=GEN),
    _f(["-ngl", "--gpu-layers", "--n-gpu-layers"], "n_gpu_layers",
       "accepted for llama.cpp CLI compatibility (all layers always run "
       "on the TPU)", env="LLAMA_ARG_N_GPU_LAYERS", type=int, default=999),
    _f(["--repack-int8"], "repack_int8",
       "losslessly repack 4-bit weights to int8 at load: 2x weight memory "
       "for the DMA-bound GEMV path (identical outputs, faster decode)",
       env="LLAMA_ARG_REPACK_INT8", action="store_true",
       scopes={"cli", "server"}),
    _f(["-ctk", "--cache-type-k"], "cache_type_k",
       "KV cache storage type (q8 halves KV memory)",
       env="LLAMA_ARG_CACHE_TYPE_K", choices=("f32", "bf16", "q8")),
    _f(["-ctv", "--cache-type-v"], "cache_type_v",
       "accepted for compatibility; K and V share one storage type here",
       env="LLAMA_ARG_CACHE_TYPE_V", choices=("f32", "bf16", "q8")),
    _f(["--lora"], "lora", "LoRA adapter GGUF (repeatable)",
       repeatable=True, scopes=GEN),
    _f(["--lora-scale"], "lora_scale", "LoRA adapter scale", type=float,
       default=1.0, scopes=GEN),
    _f(["--control-vector"], "control_vector",
       "control vector GGUF (repeatable)", repeatable=True, scopes={"cli"}),
    _f(["--control-vector-scale"], "control_vector_scale",
       "control vector strength", type=float, default=1.0, scopes={"cli"}),
    _f(["--host"], "host", "server bind address", env="LLAMA_ARG_HOST",
       default="127.0.0.1", scopes={"server"}),
    _f(["--port"], "port", "server port", env="LLAMA_ARG_PORT", type=int,
       default=8080, scopes={"server"}),
    _f(["-np", "--parallel"], "n_slots", "concurrent request slots",
       env="LLAMA_ARG_N_PARALLEL", type=int, default=4, scopes={"server"}),
    _f(["--api-key"], "api_key", "require this bearer token",
       env="LLAMA_API_KEY", scopes={"server"}),
    _f(["--mmproj"], "mmproj", "multimodal projector GGUF",
       env="LLAMA_ARG_MMPROJ", scopes={"server", "cli"}),
    _f(["-md", "--model-draft"], "draft_model",
       "draft model GGUF for speculative decoding",
       env="LLAMA_ARG_MODEL_DRAFT", scopes=GEN),
    _f(["--draft-max", "--draft"], "draft_max", "max draft tokens",
       env="LLAMA_ARG_DRAFT_MAX", type=int, default=4, scopes=GEN),
    _f(["--no-context-shift"], "no_ctx_shift",
       "stop with 'length' at the context limit instead of shifting",
       env="LLAMA_ARG_NO_CONTEXT_SHIFT", action="store_true",
       scopes={"server", "cli"}),
    _f(["-fa", "--flash-attn"], "flash_attn",
       "accepted for compatibility (fused attention kernels are always on)",
       env="LLAMA_ARG_FLASH_ATTN", action="store_true"),
    _f(["--rope-scaling"], "rope_scaling", "rope scaling override",
       env="LLAMA_ARG_ROPE_SCALING_TYPE",
       choices=("none", "linear", "yarn", "longrope")),
    _f(["--rope-freq-base"], "rope_freq_base", "rope base override",
       env="LLAMA_ARG_ROPE_FREQ_BASE", type=float),
    _f(["--rope-freq-scale"], "rope_freq_scale", "rope scale override",
       env="LLAMA_ARG_ROPE_FREQ_SCALE", type=float),
    _f(["--platform"], "platform", "force the JAX platform",
       choices=("cpu", "tpu")),
    _f(["--verbose", "-v"], "verbose", "verbose logging",
       action="store_true"),
]


def flags_for(scope: str) -> list[Flag]:
    return [fl for fl in REGISTRY if scope in fl.scopes]


def _env_default(flag: Flag):
    if flag.env and flag.env in os.environ:
        raw = os.environ[flag.env]
        if flag.action == "store_true":
            return raw not in ("0", "false", "")
        if flag.type is int:
            return int(raw)
        if flag.type is float:
            return float(raw)
        return raw
    return None


def build_parser(scope: str, description: str = "",
                 require_model: bool = True) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    for fl in flags_for(scope):
        kw: dict = {"dest": fl.dest, "help": fl.help}
        envd = _env_default(fl)
        if fl.action:
            kw["action"] = fl.action
            kw["default"] = envd if envd is not None else False
        else:
            kw["type"] = fl.type
            kw["default"] = envd if envd is not None else fl.default
            if fl.choices:
                kw["choices"] = fl.choices
            if fl.repeatable:
                kw["action"] = "append"
                kw.pop("type", None)
                kw["default"] = []
        if fl.dest == "model" and require_model and envd is None:
            kw["required"] = True
        ap.add_argument(*fl.names, **kw)
    ap.add_argument("--completion-bash", action="store_true",
                    help="print a bash completion script and exit")
    return ap


def maybe_print_completion(args, scope: str, prog: str) -> bool:
    """--completion-bash handler (arg.cpp --completion-bash analog)."""
    if not getattr(args, "completion_bash", False):
        return False
    opts = []
    for fl in flags_for(scope):
        opts.extend(fl.names)
    print(f"""_{prog.replace('-', '_')}_completions() {{
    local cur="${{COMP_WORDS[COMP_CWORD]}}"
    COMPREPLY=( $(compgen -W "{' '.join(opts)}" -- "$cur") )
}}
complete -F _{prog.replace('-', '_')}_completions {prog}""")
    return True
