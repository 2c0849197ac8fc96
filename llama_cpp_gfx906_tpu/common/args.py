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
    nargs: object = None  # e.g. 2 for FILE SCALE pairs


ALL = frozenset({"cli", "server", "bench", "perplexity", "quantize",
                 "embedding", "imatrix", "cvector", "tts", "finetune",
                 "retrieval", "passkey", "lookup", "diffusion"})
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
       env="LLAMA_ARG_N_PREDICT", type=int, default=128,
       scopes=GEN | {"tts", "lookup"}),
    _f(["-b", "--batch-size"], "n_batch", "prompt tokens per engine step",
       env="LLAMA_ARG_BATCH", type=int, default=256),
    _f(["-p", "--prompt"], "prompt", "prompt text",
       scopes={"cli", "perplexity", "embedding", "tts", "diffusion",
               "lookup", "passkey"}),
    _f(["-f", "--file"], "file", "read the prompt from a file",
       scopes={"cli", "perplexity", "embedding", "imatrix", "finetune",
               "retrieval"}),
    _f(["-s", "--seed"], "seed", "RNG seed", env="LLAMA_ARG_SEED",
       type=int, default=-1, scopes=GEN | {"diffusion", "tts", "finetune"}),
    _f(["--temp"], "temp", "sampling temperature", type=float, default=0.8,
       scopes=GEN | {"tts"}),
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
    # ---- sampling (common_params_sampling surface) ------------------------
    _f(["--typical"], "typical", "locally-typical sampling p", type=float,
       default=1.0, scopes=GEN),
    _f(["--mirostat"], "mirostat", "mirostat version (0=off, 1, 2)",
       type=int, default=0, scopes=GEN),
    _f(["--mirostat-lr"], "mirostat_eta", "mirostat learning rate (eta)",
       type=float, default=0.1, scopes=GEN),
    _f(["--mirostat-ent"], "mirostat_tau", "mirostat target entropy (tau)",
       type=float, default=5.0, scopes=GEN),
    _f(["--xtc-probability"], "xtc_probability",
       "XTC removal probability", type=float, default=0.0, scopes=GEN),
    _f(["--xtc-threshold"], "xtc_threshold", "XTC probability threshold",
       type=float, default=0.1, scopes=GEN),
    _f(["--top-nsigma"], "top_n_sigma",
       "top-n-sigma cutoff (<0 disables)", type=float, default=-1.0,
       scopes=GEN),
    _f(["--dynatemp-range"], "dynatemp_range",
       "dynamic temperature range (0 = off)", type=float, default=0.0,
       scopes=GEN),
    _f(["--dynatemp-exp"], "dynatemp_exponent",
       "dynamic temperature exponent", type=float, default=1.0, scopes=GEN),
    _f(["--presence-penalty"], "presence_penalty",
       "presence penalty (0 = off)", type=float, default=0.0, scopes=GEN),
    _f(["--frequency-penalty"], "frequency_penalty",
       "frequency penalty (0 = off)", type=float, default=0.0, scopes=GEN),
    _f(["--dry-multiplier"], "dry_multiplier",
       "DRY repetition penalty multiplier (0 = off)", type=float,
       default=0.0, scopes=GEN),
    _f(["--dry-base"], "dry_base", "DRY exponential base", type=float,
       default=1.75, scopes=GEN),
    _f(["--dry-allowed-length"], "dry_allowed_length",
       "DRY allowed repeat length", type=int, default=2, scopes=GEN),
    _f(["--dry-penalty-last-n"], "dry_penalty_last_n",
       "DRY penalty window (-1 = ctx)", type=int, default=-1, scopes=GEN),
    _f(["--dry-sequence-breaker"], "dry_sequence_breakers",
       "DRY sequence-breaker string (repeatable)", repeatable=True,
       scopes=GEN),
    _f(["-l", "--logit-bias"], "logit_bias",
       "TOKEN_ID(+|-)BIAS logit bias, e.g. 15043+1 (repeatable)",
       repeatable=True, scopes=GEN),
    _f(["--ignore-eos"], "ignore_eos",
       "ignore end-of-generation tokens and keep sampling",
       action="store_true", scopes=GEN),
    _f(["--min-keep"], "min_keep",
       "minimum candidates every sampler must keep", type=int, default=1,
       scopes=GEN),
    _f(["-j", "--json-schema"], "json_schema",
       "JSON schema to constrain output (converted to grammar)",
       scopes=GEN),
    _f(["--json-schema-file"], "json_schema_file",
       "JSON schema file to constrain output", scopes=GEN),
    _f(["--samplers"], "samplers",
       "accepted for compatibility (the chain already applies the "
       "reference's default sampler order)", scopes=GEN),
    # ---- prompt / generation (tools/main surface) -------------------------
    _f(["-e", "--escape"], "escape",
       "process prompt escape sequences (\\n, \\t, \\x..)",
       action="store_true", scopes={"cli", "perplexity", "embedding"}),
    _f(["-sys", "--system-prompt"], "system_prompt",
       "system prompt prepended via the model's chat template",
       scopes={"cli"}),
    _f(["-r", "--reverse-prompt"], "reverse_prompt",
       "stop generation when this string appears (repeatable)",
       repeatable=True, scopes={"cli"}),
    _f(["--keep", "--n-keep"], "n_keep",
       "tokens to keep from the initial prompt on context shift",
       type=int, default=0, scopes={"cli", "server"}),
    _f(["--special"], "special",
       "accepted for compatibility (special tokens always render in "
       "the stream)", action="store_true", scopes={"cli"}),
    _f(["--no-warmup"], "no_warmup",
       "skip the startup warmup run (server: the compile-the-hot-paths "
       "request before /health reports ok)",
       action="store_true", scopes={"cli", "embedding", "server"}),
    # ---- interactive / conversation (tools/main REPL surface) -------------
    _f(["-i", "--interactive"], "interactive",
       "interactive mode: control returns to the user at EOG / reverse "
       "prompts / the -n limit", action="store_true", scopes={"cli"}),
    _f(["-if", "--interactive-first"], "interactive_first",
       "interactive mode, waiting for user input before generating",
       action="store_true", scopes={"cli"}),
    _f(["-cnv", "--conversation"], "conversation",
       "chat through the model's template (implies interactive; -p / -sys "
       "becomes the system prompt).  Auto-enabled on a TTY when the model "
       "ships a chat template", action="store_true", scopes={"cli"}),
    _f(["-no-cnv", "--no-conversation"], "no_conversation",
       "force plain completion even when a chat template exists",
       action="store_true", scopes={"cli"}),
    _f(["-st", "--single-turn"], "single_turn",
       "conversation mode: answer one user turn, then exit",
       action="store_true", scopes={"cli"}),
    _f(["--in-prefix"], "in_prefix",
       "string prepended to every user input (plain interactive mode)",
       default="", scopes={"cli"}),
    _f(["--in-suffix"], "in_suffix",
       "string appended after every user input (plain interactive mode)",
       default="", scopes={"cli"}),
    _f(["--in-prefix-bos"], "in_prefix_bos",
       "prefix a BOS token to user input", action="store_true",
       scopes={"cli"}),
    _f(["-mli", "--multiline-input"], "multiline_input",
       "start input in multiline mode (a lone trailing \\ toggles; in "
       "multiline mode Enter inserts a newline)", action="store_true",
       scopes={"cli"}),
    _f(["-co", "--color"], "color",
       "ANSI colors: prompt dim, user input bold, generation green",
       action="store_true", scopes={"cli"}),
    _f(["--verbose-prompt"], "verbose_prompt",
       "print the tokenized prompt (id -> piece) to stderr before "
       "generating", action="store_true", scopes={"cli"}),
    _f(["--prompt-cache-all"], "prompt_cache_all",
       "also cache generated tokens in the --prompt-cache session file",
       action="store_true", scopes={"cli"}),
    _f(["--prompt-cache-ro"], "prompt_cache_ro",
       "use the --prompt-cache session file read-only",
       action="store_true", scopes={"cli"}),
    _f(["-sysf", "--system-prompt-file"], "system_prompt_file",
       "read the system prompt from a file", scopes={"cli"}),
    # ---- long context -----------------------------------------------------
    _f(["--rope-scale"], "rope_scale_factor",
       "RoPE context scaling factor N (positions compressed N-fold)",
       env="LLAMA_ARG_ROPE_SCALE", type=float),
    _f(["--yarn-orig-ctx"], "yarn_orig_ctx",
       "YaRN original training context", env="LLAMA_ARG_YARN_ORIG_CTX",
       type=int),
    _f(["--yarn-ext-factor"], "yarn_ext_factor",
       "accepted for compatibility (llama3-style smooth YaRN "
       "interpolation is used)", env="LLAMA_ARG_YARN_EXT_FACTOR",
       type=float),
    _f(["--yarn-attn-factor"], "yarn_attn_factor",
       "accepted for compatibility", env="LLAMA_ARG_YARN_ATTN_FACTOR",
       type=float),
    _f(["--yarn-beta-fast"], "yarn_beta_fast",
       "accepted for compatibility", env="LLAMA_ARG_YARN_BETA_FAST",
       type=float),
    _f(["--yarn-beta-slow"], "yarn_beta_slow",
       "accepted for compatibility", env="LLAMA_ARG_YARN_BETA_SLOW",
       type=float),
    _f(["-gan", "--grp-attn-n"], "grp_attn_n",
       "self-extend group size (position compression factor)",
       env="LLAMA_ARG_GRP_ATTN_N", type=int, default=1, scopes={"cli"}),
    _f(["-gaw", "--grp-attn-w"], "grp_attn_w",
       "self-extend window width", env="LLAMA_ARG_GRP_ATTN_W", type=int,
       default=512, scopes={"cli"}),
    _f(["--swa-full"], "swa_full",
       "accepted for compatibility (full-size SWA cache is the default; "
       "--swa-ring enables the small ring)", action="store_true",
       scopes={"cli", "server"}),
    _f(["--swa-ring"], "swa_ring",
       "window-sized ring cache for SWA layers (memory saver)",
       action="store_true", scopes={"cli"}),
    _f(["--cache-reuse"], "cache_reuse",
       "accepted for compatibility (prefix KV reuse is always on)",
       env="LLAMA_ARG_CACHE_REUSE", type=int, scopes={"server"}),
    # ---- model load -------------------------------------------------------
    _f(["--override-kv"], "override_kv",
       "override GGUF metadata: KEY=TYPE:VALUE with TYPE in "
       "int/float/bool/str (repeatable)", repeatable=True),
    _f(["--no-mmap"], "no_mmap",
       "accepted for compatibility (weights always stream to device "
       "memory)", env="LLAMA_ARG_NO_MMAP", action="store_true"),
    _f(["--mlock"], "mlock", "accepted for compatibility",
       env="LLAMA_ARG_MLOCK", action="store_true"),
    _f(["-t", "--threads"], "threads",
       "accepted for compatibility (XLA owns host threading)",
       env="LLAMA_ARG_THREADS", type=int, default=-1),
    _f(["-tb", "--threads-batch"], "threads_batch",
       "accepted for compatibility", type=int, default=-1),
    _f(["-ub", "--ubatch-size"], "ubatch_size",
       "accepted for compatibility (prompt chunking follows "
       "--batch-size)", env="LLAMA_ARG_UBATCH", type=int, default=512),
    _f(["--check-tensors"], "check_tensors",
       "validate tensor data while loading", action="store_true"),
    _f(["-mu", "--model-url"], "model_url",
       "rejected: this environment has no network egress; download the "
       "GGUF out of band", env="LLAMA_ARG_MODEL_URL"),
    _f(["-hf", "-hfr", "--hf-repo"], "hf_repo",
       "rejected: this environment has no network egress",
       env="LLAMA_ARG_HF_REPO"),
    _f(["-hff", "--hf-file"], "hf_file",
       "rejected: this environment has no network egress",
       env="LLAMA_ARG_HF_FILE"),
    _f(["--device"], "device",
       "accepted for compatibility (JAX owns device selection)",
       env="LLAMA_ARG_DEVICE"),
    _f(["--list-devices"], "list_devices",
       "print available accelerator devices and exit",
       action="store_true"),
    _f(["-sm", "--split-mode"], "split_mode",
       "multi-device partitioning: none | layer | row (layer and row both "
       "build a tensor-parallel device mesh — GSPMD subsumes the "
       "distinction; see mesh_from_args)",
       env="LLAMA_ARG_SPLIT_MODE", choices=("none", "layer", "row")),
    _f(["-ts", "--tensor-split"], "tensor_split",
       "comma-separated per-device weights; under SPMD only the COUNT of "
       "non-zero entries matters (shards are uniform) — e.g. 1,1 uses two "
       "devices",
       env="LLAMA_ARG_TENSOR_SPLIT"),
    _f(["-mg", "--main-gpu"], "main_gpu",
       "accepted for compatibility", env="LLAMA_ARG_MAIN_GPU", type=int,
       default=0),
    # ---- chat / templates -------------------------------------------------
    _f(["--chat-template"], "chat_template",
       "builtin chat template name or inline Jinja override",
       env="LLAMA_ARG_CHAT_TEMPLATE", scopes={"server", "cli"}),
    _f(["--chat-template-file"], "chat_template_file",
       "file with a Jinja chat template override",
       env="LLAMA_ARG_CHAT_TEMPLATE_FILE", scopes={"server", "cli"}),
    _f(["--jinja"], "jinja",
       "render chat templates with the Jinja engine",
       env="LLAMA_ARG_JINJA", action="store_true", scopes={"server", "cli"}),
    # ---- server -----------------------------------------------------------
    _f(["-a", "--alias"], "alias", "model name reported by the API",
       env="LLAMA_ARG_ALIAS", scopes={"server"}),
    _f(["--api-prefix"], "api_prefix",
       "prefix every HTTP route with this path",
       env="LLAMA_ARG_API_PREFIX", default="", scopes={"server"}),
    _f(["--timeout"], "timeout", "server read/write timeout (seconds)",
       env="LLAMA_ARG_TIMEOUT", type=int, default=600, scopes={"server"}),
    _f(["--no-webui"], "no_webui", "disable the built-in chat UI at /",
       env="LLAMA_ARG_NO_WEBUI", action="store_true", scopes={"server"}),
    _f(["--embeddings"], "embeddings",
       "accepted for compatibility (/v1/embeddings is always served)",
       env="LLAMA_ARG_EMBEDDINGS", action="store_true", scopes={"server"}),
    _f(["--reranking"], "reranking",
       "accepted for compatibility (serve /rerank via --rerank-model)",
       env="LLAMA_ARG_RERANKING", action="store_true", scopes={"server"}),
    _f(["--metrics"], "metrics",
       "accepted for compatibility (/metrics is always served)",
       env="LLAMA_ARG_ENDPOINT_METRICS", action="store_true",
       scopes={"server"}),
    _f(["--slots"], "slots",
       "accepted for compatibility (/slots is always served)",
       env="LLAMA_ARG_ENDPOINT_SLOTS", action="store_true",
       scopes={"server"}),
    _f(["--slot-save-path"], "slot_save_path",
       "directory for slot state save/restore files", scopes={"server"}),
    _f(["-cb", "--cont-batching"], "cont_batching",
       "accepted for compatibility (continuous batching is always on)",
       env="LLAMA_ARG_CONT_BATCHING", action="store_true",
       scopes={"server"}),
    _f(["-nocb", "--no-cont-batching"], "no_cont_batching",
       "accepted for compatibility", env="LLAMA_ARG_NO_CONT_BATCHING",
       action="store_true", scopes={"server"}),
    _f(["--draft-min", "--draft-n-min"], "draft_min",
       "accepted for compatibility (the draft proposal length is fixed "
       "at --draft-max)", env="LLAMA_ARG_DRAFT_MIN", type=int, default=1,
       scopes=GEN),
    _f(["--draft-p-min"], "draft_p_min",
       "accepted for compatibility (stochastic verification needs no "
       "probability floor)", env="LLAMA_ARG_DRAFT_P_MIN", type=float,
       default=0.75, scopes=GEN),
    # ---- perplexity / evals ----------------------------------------------
    _f(["--hellaswag"], "hellaswag", "HellaSwag eval data file",
       scopes={"perplexity"}),
    _f(["--winogrande"], "winogrande", "Winogrande eval data file",
       scopes={"perplexity"}),
    _f(["--multiple-choice"], "multiple_choice",
       "multiple-choice eval data file", scopes={"perplexity"}),
    _f(["--kl-divergence-base"], "kl_divergence_base",
       "base-model logits file for KL divergence", scopes={"perplexity"}),
    _f(["--chunks"], "chunks", "max evaluation chunks", type=int,
       scopes={"perplexity", "imatrix"}),
    # ---- embeddings -------------------------------------------------------
    _f(["--pooling"], "pooling", "embedding pooling mode",
       env="LLAMA_ARG_POOLING", choices=("none", "mean", "cls", "last"),
       default="mean", scopes={"embedding", "server"}),
    _f(["--embd-normalize"], "embd_normalize",
       "normalization: -1=none, 2=L2 (reference numbering)", type=int,
       default=2, scopes={"embedding"}),
    _f(["--embd-output-format"], "embd_output_format",
       "output format: '' (plain), 'json', 'json+', 'array'",
       default="", scopes={"embedding"}),
    _f(["--embd-separator"], "embd_separator",
       "prompt separator string", default="\n", scopes={"embedding"}),
    _f(["--cls-separator"], "cls_separator",
       "separator for paired classification inputs", default="\t",
       scopes={"embedding"}),
    _f(["--attention"], "attention_type",
       "attention used for embeddings: causal or non-causal",
       env="LLAMA_ARG_ATTENTION", choices=("causal", "non-causal"),
       scopes={"embedding", "server"}),
    _f(["--embedding"], "embedding",
       "accepted for compatibility (alias of --embeddings)",
       action="store_true", scopes={"server"}),
    _f(["--rerank"], "rerank",
       "accepted for compatibility (alias of --reranking)",
       action="store_true", scopes={"server"}),
    # ---- perplexity task knobs (perplexity.cpp analog) ---------------------
    _f(["--hellaswag-tasks"], "hellaswag_tasks",
       "number of HellaSwag tasks", type=int, default=400,
       scopes={"perplexity"}),
    _f(["--winogrande-tasks"], "winogrande_tasks",
       "number of Winogrande tasks", type=int, default=0,
       scopes={"perplexity"}),
    _f(["--multiple-choice-tasks"], "multiple_choice_tasks",
       "number of multiple-choice tasks", type=int, default=0,
       scopes={"perplexity"}),
    _f(["--kl-divergence"], "kl_divergence",
       "compute KL divergence against --kl-divergence-base logits",
       action="store_true", scopes={"perplexity"}),
    _f(["--save-all-logits", "--kl-divergence-base-out"], "save_all_logits",
       "save evaluation logits to this file (base for later KL runs)",
       scopes={"perplexity"}),
    _f(["--ppl-stride"], "ppl_stride",
       "stride between perplexity windows (0 = chunk size)", type=int,
       default=0, scopes={"perplexity"}),
    _f(["--ppl-output-type"], "ppl_output_type",
       "0: ppl per chunk; 1: cumulative nll pairs", type=int, default=0,
       scopes={"perplexity"}),
    _f(["--binary-file"], "binary_file",
       "evaluation data is a binary token-id file", action="store_true",
       scopes={"perplexity"}),
    _f(["--from-chunk"], "from_chunk",
       "skip evaluation chunks before this index", type=int, default=0,
       scopes={"perplexity"}),
    # ---- imatrix -----------------------------------------------------------
    _f(["-o", "--output", "--output-file"], "output", "output file path",
       scopes={"imatrix", "cvector", "tts", "finetune"}),
    _f(["--chunk-size"], "chunk_size", "tokens per evaluation chunk",
       type=int, default=512, scopes={"imatrix", "retrieval"}),
    _f(["--output-frequency"], "output_frequency",
       "save the in-progress imatrix every N chunks", type=int, default=10,
       scopes={"imatrix"}),
    _f(["--save-frequency"], "save_frequency",
       "save a numbered imatrix copy every N chunks (0 = off)", type=int,
       default=0, scopes={"imatrix", "finetune"}),
    _f(["--process-output"], "process_output",
       "collect statistics for the output tensor too", action="store_true",
       scopes={"imatrix"}),
    _f(["--no-ppl"], "no_ppl", "skip the perplexity report during collection",
       action="store_true", scopes={"imatrix"}),
    _f(["--show-statistics"], "show_statistics",
       "print per-tensor imatrix statistics and exit", action="store_true",
       scopes={"imatrix"}),
    _f(["--parse-special"], "parse_special",
       "parse special tokens in the input text", action="store_true",
       scopes={"imatrix", "cli"}),
    _f(["--in-file"], "in_file", "extra input file (repeatable)",
       repeatable=True, scopes={"imatrix", "perplexity"}),
    # ---- cvector-generator -------------------------------------------------
    _f(["--positive-file"], "positive_file",
       "file of positive prompts, one per line", scopes={"cvector"}),
    _f(["--negative-file"], "negative_file",
       "file of negative prompts, one per line", scopes={"cvector"}),
    _f(["--pca-batch"], "pca_batch",
       "accepted for compatibility (the full PCA fits device memory here)",
       type=int, default=100, scopes={"cvector"}),
    _f(["--pca-iter"], "pca_iter", "power-iteration steps for PCA",
       type=int, default=1000, scopes={"cvector"}),
    _f(["--method"], "cvector_method", "direction method: pca or mean",
       choices=("pca", "mean"), default="pca", scopes={"cvector"}),
    _f(["--control-vector-layer-range"], "control_vector_layer_range",
       "apply control vectors to this inclusive layer range: START END",
       type=int, nargs=2, scopes={"cli"}),
    _f(["--control-vector-scaled"], "control_vector_scaled",
       "control vector with strength: FILE SCALE (repeatable)",
       repeatable=True, nargs=2, scopes={"cli"}),
    # ---- tts ---------------------------------------------------------------
    _f(["-mv", "--model-vocoder"], "model_vocoder",
       "WavTokenizer vocoder GGUF", scopes={"tts"}),
    _f(["--tts-speaker-file"], "tts_speaker_file",
       "speaker profile json for voice cloning", scopes={"tts"}),
    _f(["--tts-use-guide-tokens"], "tts_use_guide_tokens",
       "constrain word codes with guide tokens", action="store_true",
       scopes={"tts"}),
    # ---- speculative / draft model -----------------------------------------
    _f(["--draft-n", "--draft-max-alias"], "draft_n",
       "alias of --draft-max (reference flag name)", type=int,
       scopes=GEN),
    _f(["--draft-p-split"], "draft_p_split",
       "accepted for compatibility (tree-split speculation is not used; "
       "the verifier accepts by exact/stochastic match)", type=float,
       default=0.1, scopes=GEN),
    _f(["-cd", "--ctx-size-draft"], "ctx_size_draft",
       "draft model context (0 = same as target)",
       env="LLAMA_ARG_CTX_SIZE_DRAFT", type=int, default=0, scopes=GEN),
    _f(["-ctkd", "--cache-type-k-draft"], "cache_type_k_draft",
       "draft model KV cache type", env="LLAMA_ARG_CACHE_TYPE_K_DRAFT",
       choices=("f32", "bf16", "q8"), scopes=GEN),
    _f(["-ctvd", "--cache-type-v-draft"], "cache_type_v_draft",
       "accepted for compatibility (K and V share one storage type)",
       env="LLAMA_ARG_CACHE_TYPE_V_DRAFT", choices=("f32", "bf16", "q8"),
       scopes=GEN),
    _f(["-devd", "--device-draft"], "device_draft",
       "accepted for compatibility (JAX owns device placement)",
       scopes=GEN),
    _f(["-ngld", "--gpu-layers-draft", "--n-gpu-layers-draft"],
       "n_gpu_layers_draft",
       "accepted for compatibility (all draft layers run on the TPU)",
       env="LLAMA_ARG_N_GPU_LAYERS_DRAFT", type=int, default=999,
       scopes=GEN),
    _f(["--spec-replace"], "spec_replace",
       "translate TARGET to DRAFT string during speculation (repeatable)",
       repeatable=True, scopes=GEN),
    # ---- finetune ----------------------------------------------------------
    _f(["--epochs"], "epochs", "training epochs", type=int, default=2,
       scopes={"finetune"}),
    _f(["-lr", "--learning-rate"], "learning_rate", "AdamW/SGD alpha",
       type=float, default=1e-5, scopes={"finetune"}),
    _f(["-lr-min", "--learning-rate-min"], "learning_rate_min",
       "final learning rate after decay", type=float, default=0.0,
       scopes={"finetune"}),
    _f(["-decay-epochs", "--learning-rate-decay-epochs"],
       "learning_rate_decay_epochs",
       "cosine-decay the learning rate over this many epochs (0 = off)",
       type=float, default=0.0, scopes={"finetune"}),
    _f(["-opt", "--optimizer"], "optimizer", "adamw or sgd",
       choices=("adamw", "sgd"), default="adamw", scopes={"finetune"}),
    _f(["-wd", "--weight-decay"], "weight_decay",
       "AdamW weight decay", type=float, default=0.0, scopes={"finetune"}),
    _f(["-val-split", "--val-split"], "val_split",
       "fraction of data used for validation", type=float, default=0.05,
       scopes={"finetune"}),
    # ---- retrieval / passkey / lookup --------------------------------------
    _f(["--context-file"], "context_file",
       "corpus file to chunk and embed (repeatable)", repeatable=True,
       scopes={"retrieval"}),
    _f(["--chunk-separator"], "chunk_separator",
       "string to chunk the corpus on", default="\n", scopes={"retrieval"}),
    _f(["--junk"], "junk", "filler repetitions around the passkey",
       type=int, default=250, scopes={"passkey"}),
    _f(["--pos"], "pos", "passkey position (-1 = random)", type=int,
       default=-1, scopes={"passkey"}),
    _f(["-lcs", "--lookup-cache-static"], "lookup_cache_static",
       "static ngram cache file for lookup decoding",
       scopes=GEN | {"lookup"}),
    _f(["-lcd", "--lookup-cache-dynamic"], "lookup_cache_dynamic",
       "dynamic ngram cache file (updated as tokens generate)",
       scopes=GEN | {"lookup"}),
    # ---- diffusion LMs ------------------------------------------------------
    _f(["--diffusion-steps"], "diffusion_steps", "denoising steps",
       type=int, default=128, scopes={"diffusion"}),
    _f(["--diffusion-algorithm"], "diffusion_algorithm",
       "remasking rule", choices=("confidence", "random", "low_confidence",
                                  "entropy", "margin"),
       default="confidence", scopes={"diffusion"}),
    _f(["--diffusion-block-length"], "diffusion_block_length",
       "block length for the block schedule", type=int, default=32,
       scopes={"diffusion"}),
    _f(["--diffusion-visual"], "diffusion_visual",
       "print the canvas at each denoising step", action="store_true",
       scopes={"diffusion"}),
    _f(["--diffusion-eps"], "diffusion_eps",
       "timestep epsilon for the timestep schedule", type=float,
       default=1e-3, scopes={"diffusion"}),
    _f(["--diffusion-alg-temp"], "diffusion_alg_temp",
       "algorithm temperature (confidence noising)", type=float,
       default=0.0, scopes={"diffusion"}),
    _f(["--diffusion-add-gumbel-noise"], "diffusion_add_gumbel_noise",
       "add gumbel noise to confidences", action="store_true",
       scopes={"diffusion"}),
    _f(["--diffusion-cfg-scale"], "diffusion_cfg_scale",
       "classifier-free-guidance scale", type=float, default=0.0,
       scopes={"diffusion"}),
    # ---- multimodal ---------------------------------------------------------
    _f(["--image"], "image", "image file for multimodal prompts "
       "(repeatable)", repeatable=True, scopes={"cli"}),
    _f(["--audio"], "audio", "audio file for multimodal prompts "
       "(repeatable)", repeatable=True, scopes={"cli"}),
    _f(["--no-mmproj"], "no_mmproj",
       "disable the multimodal projector even if the model ships one",
       env="LLAMA_ARG_NO_MMPROJ", action="store_true", scopes=GEN),
    _f(["--no-mmproj-offload"], "no_mmproj_offload",
       "accepted for compatibility (the projector always runs on the TPU)",
       env="LLAMA_ARG_NO_MMPROJ_OFFLOAD", action="store_true", scopes=GEN),
    # ---- logging (common/log.cpp analog) ------------------------------------
    _f(["--log-file"], "log_file", "tee logs to this file",
       env="LLAMA_LOG_FILE"),
    _f(["--log-disable"], "log_disable", "disable log output",
       action="store_true"),
    _f(["--log-colors"], "log_colors", "color log output",
       env="LLAMA_LOG_COLORS", action="store_true"),
    _f(["--log-prefix"], "log_prefix", "prefix log lines with severity",
       env="LLAMA_LOG_PREFIX", action="store_true"),
    _f(["--log-timestamps"], "log_timestamps",
       "prefix log lines with timestamps", env="LLAMA_LOG_TIMESTAMPS",
       action="store_true"),
    _f(["-lv", "--verbosity", "--log-verbosity"], "verbosity",
       "log verbosity threshold", env="LLAMA_LOG_VERBOSITY", type=int,
       default=0),
    _f(["--log-verbose"], "log_verbose", "set verbosity to maximum",
       action="store_true"),
    _f(["--no-perf"], "no_perf", "skip the perf report",
       env="LLAMA_ARG_NO_PERF", action="store_true", scopes=GEN),
    # ---- CPU/affinity & offload compat set (TPU: XLA owns scheduling) -------
    _f(["-C", "--cpu-mask"], "cpu_mask",
       "accepted for compatibility (XLA owns host thread scheduling)"),
    _f(["-Cr", "--cpu-range"], "cpu_range",
       "accepted for compatibility (XLA owns host thread scheduling)"),
    _f(["--cpu-strict"], "cpu_strict",
       "accepted for compatibility (XLA owns host thread scheduling)",
       type=int, default=0),
    _f(["--poll"], "poll",
       "accepted for compatibility (XLA owns host thread scheduling)",
       type=int, default=50),
    _f(["--prio"], "prio",
       "accepted for compatibility (XLA owns host thread scheduling)",
       type=int, default=0),
    _f(["-Cb", "--cpu-mask-batch"], "cpu_mask_batch",
       "accepted for compatibility", scopes=GEN),
    _f(["-Crb", "--cpu-range-batch"], "cpu_range_batch",
       "accepted for compatibility", scopes=GEN),
    _f(["--cpu-strict-batch"], "cpu_strict_batch",
       "accepted for compatibility", type=int, default=0, scopes=GEN),
    _f(["--poll-batch"], "poll_batch", "accepted for compatibility",
       type=int, default=50, scopes=GEN),
    _f(["--prio-batch"], "prio_batch", "accepted for compatibility",
       type=int, default=0, scopes=GEN),
    _f(["--cpu-mask-draft"], "cpu_mask_draft", "accepted for compatibility",
       scopes=GEN),
    _f(["--cpu-range-draft"], "cpu_range_draft",
       "accepted for compatibility", scopes=GEN),
    _f(["--cpu-strict-draft"], "cpu_strict_draft",
       "accepted for compatibility", type=int, default=0, scopes=GEN),
    _f(["--poll-draft"], "poll_draft", "accepted for compatibility",
       type=int, default=50, scopes=GEN),
    _f(["--prio-draft"], "prio_draft", "accepted for compatibility",
       type=int, default=0, scopes=GEN),
    _f(["--cpu-mask-batch-draft"], "cpu_mask_batch_draft",
       "accepted for compatibility", scopes=GEN),
    _f(["--cpu-range-batch-draft"], "cpu_range_batch_draft",
       "accepted for compatibility", scopes=GEN),
    _f(["--cpu-strict-batch-draft"], "cpu_strict_batch_draft",
       "accepted for compatibility", type=int, default=0, scopes=GEN),
    _f(["--poll-batch-draft"], "poll_batch_draft",
       "accepted for compatibility", type=int, default=50, scopes=GEN),
    _f(["--prio-batch-draft"], "prio_batch_draft",
       "accepted for compatibility", type=int, default=0, scopes=GEN),
    _f(["-tbd", "--threads-batch-draft"], "threads_batch_draft",
       "accepted for compatibility", type=int, default=-1, scopes=GEN),
    _f(["-td", "--threads-draft"], "threads_draft",
       "accepted for compatibility", type=int, default=-1, scopes=GEN),
    _f(["--numa"], "numa",
       "accepted for compatibility (no NUMA policy applies to the TPU "
       "host path)", choices=("distribute", "isolate", "numactl")),
    _f(["-nkvo", "--no-kv-offload"], "no_kv_offload",
       "accepted for compatibility (the KV cache lives in device HBM)",
       env="LLAMA_ARG_NO_KV_OFFLOAD", action="store_true"),
    _f(["--no-op-offload"], "no_op_offload",
       "accepted for compatibility", action="store_true"),
    _f(["--no-repack"], "no_repack",
       "accepted for compatibility (weight repacking is opt-in via "
       "--repack-int8)", action="store_true"),
    _f(["--cpu-moe", "-cmoe"], "cpu_moe",
       "accepted for compatibility (experts stay in device HBM; shard "
       "over a mesh for capacity)", env="LLAMA_ARG_CPU_MOE",
       action="store_true", scopes=GEN),
    _f(["--n-cpu-moe", "-ncmoe"], "n_cpu_moe",
       "accepted for compatibility", env="LLAMA_ARG_N_CPU_MOE",
       type=int, default=0, scopes=GEN),
    _f(["--cpu-moe-draft", "-cmoed"], "cpu_moe_draft",
       "accepted for compatibility", env="LLAMA_ARG_CPU_MOE_DRAFT",
       action="store_true", scopes=GEN),
    _f(["--n-cpu-moe-draft", "-ncmoed"], "n_cpu_moe_draft",
       "accepted for compatibility", env="LLAMA_ARG_N_CPU_MOE_DRAFT",
       type=int, default=0, scopes=GEN),
    _f(["--override-tensor", "-ot"], "override_tensor",
       "accepted for compatibility (no per-tensor backend placement; "
       "use sharding specs)", repeatable=True),
    _f(["--override-tensor-draft", "-otd"], "override_tensor_draft",
       "accepted for compatibility", repeatable=True, scopes=GEN),
    _f(["-dt", "--defrag-thold"], "defrag_thold",
       "accepted for compatibility (slot rows never fragment)",
       env="LLAMA_ARG_DEFRAG_THOLD", type=float, default=0.1),
    _f(["--kv-unified", "-kvu"], "kv_unified",
       "accepted for compatibility (the batched cache is unified with a "
       "shared-prefix segment by design)", env="LLAMA_ARG_KV_SPLIT",
       action="store_true", scopes=GEN),
    _f(["--swa-checkpoints"], "swa_checkpoints",
       "accepted for compatibility (SWA rows stay resident: branching is "
       "exact without checkpoints)", env="LLAMA_ARG_SWA_CHECKPOINTS",
       type=int, default=3, scopes=GEN),
    _f(["--offline"], "offline",
       "force offline mode (this build is always offline: no model "
       "downloads)", env="LLAMA_OFFLINE", action="store_true"),
    _f(["--hf-token", "-hft"], "hf_token",
       "accepted for compatibility (zero-egress build: downloads are "
       "rejected)", env="HF_TOKEN"),
    _f(["--rpc"], "rpc",
       "accepted for compatibility; distributed serving uses "
       "jax.distributed (parallel/distributed.py), not RPC servers",
       env="LLAMA_ARG_RPC"),
    # ---- server extras ------------------------------------------------------
    _f(["--api-key-file"], "api_key_file",
       "file with one accepted API key per line", scopes={"server"}),
    _f(["--ssl-key-file"], "ssl_key_file",
       "TLS private key PEM for HTTPS", env="LLAMA_ARG_SSL_KEY_FILE",
       scopes={"server"}),
    _f(["--ssl-cert-file"], "ssl_cert_file",
       "TLS certificate PEM for HTTPS", env="LLAMA_ARG_SSL_CERT_FILE",
       scopes={"server"}),
    _f(["--threads-http"], "threads_http",
       "accepted for compatibility (the asyncio loop replaces the HTTP "
       "thread pool)", env="LLAMA_ARG_THREADS_HTTP", type=int, default=-1,
       scopes={"server"}),
    _f(["--no-slots"], "no_slots", "disable the /slots endpoint",
       env="LLAMA_ARG_NO_ENDPOINT_SLOTS", action="store_true",
       scopes={"server"}),
    _f(["--props"], "props",
       "allow changing global generation defaults via POST /props",
       env="LLAMA_ARG_ENDPOINT_PROPS", action="store_true",
       scopes={"server"}),
    _f(["--slot-prompt-similarity", "-sps"], "slot_prompt_similarity",
       "minimum prefix similarity to reuse a slot's KV for a new prompt",
       type=float, default=0.5, scopes={"server"}),
    _f(["--no-prefill-assistant"], "no_prefill_assistant",
       "return the final assistant message as a new turn instead of "
       "continuing it", env="LLAMA_ARG_NO_PREFILL_ASSISTANT",
       action="store_true", scopes={"server"}),
    _f(["--reasoning-format"], "reasoning_format",
       "how <think> content returns: none|auto|deepseek",
       env="LLAMA_ARG_THINK", choices=("none", "auto", "deepseek"),
       default="auto", scopes={"server"}),
    _f(["--reasoning-budget"], "reasoning_budget",
       "max thinking tokens (-1 = unlimited, 0 = disable thinking)",
       env="LLAMA_ARG_THINK_BUDGET", type=int, default=-1,
       scopes={"server"}),
    _f(["--chat-template-kwargs"], "chat_template_kwargs",
       "JSON object of extra chat-template variables",
       env="LLAMA_CHAT_TEMPLATE_KWARGS", scopes={"server"}),
    # ---- cli extras ---------------------------------------------------------
    _f(["--simple-io"], "simple_io",
       "accepted for compatibility (plain stdio is the only console mode)",
       action="store_true", scopes={"cli"}),
    _f(["--no-escape"], "no_escape", "do not process prompt escapes",
       action="store_true", scopes={"cli", "perplexity"}),
    _f(["--print-token-count"], "print_token_count",
       "print the running token count every N tokens", type=int,
       default=-1, scopes={"cli"}),
    _f(["--spm-infill"], "spm_infill",
       "use suffix/prefix/middle order for infill (SPM models)",
       action="store_true", scopes={"cli", "server"}),
    _f(["--sequences"], "sequences", "number of sequences to decode",
       type=int, default=1, scopes={"bench"}),
    _f(["--version"], "show_version",
       "print the package version and exit", action="store_true"),
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
        if fl.dest == "show_version":
            # argparse version action exits before required-arg checks,
            # so --version works without -m (matching the reference)
            from .. import __version__

            ap.add_argument(*fl.names, action="version",
                            version=f"%(prog)s {__version__} "
                                    "(llama.cpp-gfx906 TPU-native)")
            continue
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
            if fl.nargs is not None:
                kw["nargs"] = fl.nargs
            if fl.repeatable:
                kw["action"] = "append"
                if fl.nargs is None:
                    kw.pop("type", None)
                kw["default"] = []
        if fl.dest == "model" and require_model and envd is None:
            kw["required"] = True
        ap.add_argument(*fl.names, **kw)
    ap.add_argument("--completion-bash", action="store_true",
                    help="print a bash completion script and exit")
    return ap


def maybe_print_completion(args, scope: str, prog: str) -> bool:
    """--completion-bash handler (arg.cpp --completion-bash analog);
    --version is an argparse version action handled at parse time."""
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


def mesh_from_args(args):
    """Map --split-mode/--tensor-split onto a ``("data", "model")`` Mesh.

    The product surface of the reference's multi-GPU flags
    (``llama-model.cpp:1908-1975``, ``include/llama.h:186-187``), mapped
    onto SPMD: both ``layer`` and ``row`` modes become a tensor-parallel
    mesh over the available devices (GSPMD decides per-op partitioning —
    the layer/row distinction is the ggml scheduler's, not XLA's).
    ``--tensor-split`` selects HOW MANY devices participate (non-zero
    entries); non-uniform proportions are ignored with a warning since
    SPMD shards uniformly.  Returns None (single-device) when fewer than
    two devices would participate or split-mode is ``none``.
    """
    import logging

    import jax

    sm = (getattr(args, "split_mode", None) or "").lower()
    ts = getattr(args, "tensor_split", None)
    if sm == "none":
        return None
    if not sm and not ts:
        return None  # default: single device, no mesh
    devices = jax.devices()
    if ts:
        fracs = [float(x) for x in str(ts).split(",") if x.strip()]
        n_use = min(len(devices), sum(1 for f in fracs if f > 0))
        nz = sorted({f for f in fracs if f > 0})
        if len(nz) > 1:
            logging.getLogger(__name__).warning(
                "--tensor-split proportions %s are non-uniform; SPMD "
                "shards uniformly over %d devices", ts, n_use)
    else:
        n_use = len(devices)
    if n_use <= 1:
        return None
    from ..parallel.sharding import make_mesh

    return make_mesh(n_model=n_use, n_data=1, devices=devices[:n_use])
