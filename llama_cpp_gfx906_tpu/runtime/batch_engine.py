"""Continuous-batching inference engine (server backend).

The TPU-native analog of the reference server's slot machinery +
``update_slots`` loop (``tools/server/server.cpp:3017-3482``) on top of
``llama_decode``'s ubatch pipeline:

- N slots share one batched KV cache (L, N, S, Hkv, Dh) in HBM; each slot
  advances at its own ``n_past`` (the unified-cache ``find_slot`` cell scan
  becomes a fixed slot index — idiomatic for static XLA shapes).
- Prompt prefill runs as a bucketed single-sequence forward whose K/V are
  scattered into the slot's rows (one compile per bucket ≙ graph reuse).
- One decode step advances *all* slots in a single (B, 1) forward; sampling
  happens on-device (ops/sampling_ops) so only token ids cross the host
  boundary.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward
from ..ops.sampling_ops import CAND, sample_tokens
from .engine import PREFILL_BUCKETS, bucket_len

RECENT = 64  # repetition-penalty window kept on device


class SlotState(enum.Enum):
    IDLE = 0
    GENERATING = 1
    PREFILLING = 2  # prompt chunks still streaming in (server.cpp:3132-3476)


@dataclass
class SamplerConfig:
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    penalty_repeat: float = 1.0
    seed: int | None = None
    # constrained decoding: a GBNF grammar string or a JSON schema dict
    # (server `grammar` / `response_format` fields; reference server.cpp
    # params_from_json_cmpl -> sampling grammar)
    grammar: str | None = None
    json_schema: dict | None = None
    # per-token logprobs (OpenAI `logprobs` / reference `n_probs`); slots
    # requesting them ride the host-logits path
    n_probs: int = 0


@dataclass
class Slot:
    id: int
    state: SlotState = SlotState.IDLE
    request_id: str = ""
    prompt_ids: list[int] = field(default_factory=list)
    generated: list[int] = field(default_factory=list)
    n_predict: int = 0
    n_past: int = 0
    current_token: int = 0
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    stop_reason: str | None = None
    # per-request failure isolation: a slot whose sampling/grammar raised
    # finishes with stop_reason "error" + the message here, instead of the
    # exception killing the whole engine step (reference send_error +
    # slot release, server.cpp update_slots error paths)
    error_msg: str | None = None
    t_start: float = 0.0
    t_first_token: float = 0.0
    chain: object | None = None  # persistent SamplerChain for grammar slots
    # prompt cache: tokens whose K/V rows survive in this slot after release
    # (reference: server prompt caching w/ common-prefix reuse, server.cpp:3248)
    cache_tokens: list[int] = field(default_factory=list)
    # chunked prefill progress: prompt tokens not yet run, and the slot's
    # current KV fill while PREFILLING
    pending: list[int] = field(default_factory=list)
    # multimodal prefill: remaining embedding rows (server vision API);
    # aligned with `pending` placeholder tokens
    pending_embeds: object = None  # np.ndarray (n, D) | None
    no_cache: bool = False  # embed prompts aren't prefix-reusable
    n_keep: int = 0  # context-shift anchor (reference n_keep)
    n_shifted: int = 0  # total tokens discarded by context shifts
    n_truncated: int = 0  # prompt tokens dropped at admission
    # per generated token: {"token", "logprob", "top": [(tok, lp), ...]}
    logprobs: list = field(default_factory=list)
    # per-request adapter scales {adapter_index: scale} (reference server
    # per-slot `lora` field); None → base model
    lora: dict | None = None

    def reset(self):
        self.state = SlotState.IDLE
        self.request_id = ""
        # only rows [0, n_past) actually hold K/V (the final sampled token
        # was never forwarded) — trim so prefix matching can't reuse a row
        # that was never written; a shifted context no longer maps rows to
        # token history, so it is not reusable at all
        if self.n_shifted or self.no_cache:
            self.cache_tokens = []
        else:
            self.cache_tokens = (self.prompt_ids + self.generated)[: self.n_past]
        self.pending_embeds = None
        self.no_cache = False
        self.prompt_ids = []
        self.generated = []
        self.pending = []
        self.n_past = 0
        self.n_keep = 0
        self.n_shifted = 0
        self.n_truncated = 0
        self.logprobs = []
        self.stop_reason = None
        self.error_msg = None
        self.chain = None


class BatchedEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        tokenizer,
        n_slots: int = 8,
        max_seq: int = 2048,
        dtype=jnp.bfloat16,
        seed: int = 0,
        spec_ngram: bool = False,  # ngram-lookup speculation for greedy slots
        n_draft: int = 4,
        n_chunk: int = 256,  # prompt tokens prefill per engine step (n_batch)
        ctx_shift: bool = True,  # StreamingLLM shift instead of "length" stop
        draft: tuple | None = None,  # (draft_cfg, draft_params) — draft-model
        # speculation (reference: server.cpp:3656-3755); must share the vocab
        kv_cache_dtype=None,  # "q8" for int8 KV (llama.h type_k/type_v)
        prefill_budget: int | None = None,  # prompt tokens prefilled per
        # engine step ACROSS slots (reference n_batch); None → every
        # prefilling slot advances one chunk (n_chunk × n_slots)
        mesh=None,  # ("data", "model") Mesh: serve tensor-parallel.  The
        # caller loads params through parallel.sharding.make_device_put_fn
        # + quant_matmul.mark_xla_only; here the slot KV cache is sharded
        # (heads on "model") and XLA inserts the collectives.
        decode_burst: int | None = None,  # steady-state decode steps fused
        # into ONE dispatch (sampled feedback + repetition window stay on
        # device).  The reference samples on host per token — cheap over
        # PCIe, ruinous over a dispatch-latency link.  None → 8 on TPU,
        # 1 (off) elsewhere; LCG_DECODE_BURST overrides.  Bursts apply
        # only when every slot is in plain generation (no grammar/probs/
        # speculative/prefilling slot) so per-token host control is not
        # needed; tokens stream in burst-sized groups.
    ):
        from .engine import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.max_seq = max_seq
        self.dtype = dtype
        self.slots = [Slot(i) for i in range(n_slots)]
        self.spec_ngram = spec_ngram
        self.n_draft = n_draft
        self.n_chunk = n_chunk
        self.prefill_budget = (prefill_budget if prefill_budget is not None
                               else max(n_chunk, 1) * max(n_slots, 1))
        self.ctx_shift = ctx_shift
        if decode_burst is None:
            import os as _os

            env = _os.environ.get("LCG_DECODE_BURST")
            if env is not None:
                decode_burst = max(int(env), 1)
            else:
                decode_burst = 8 if jax.default_backend() == "tpu" else 1
        self.decode_burst = max(int(decode_burst), 1)
        self._prefill_rr = 0  # round-robin cursor over PREFILLING slots
        self.draft = draft
        if draft is not None:
            d_cfg, d_params = draft
            if d_cfg.n_vocab != cfg.n_vocab:
                raise ValueError(
                    "draft model must share the target's vocabulary "
                    "(reference: common_speculative_are_compatible)"
                )
            self.draft_cfg, self.draft_params = d_cfg, d_params
            self.draft_kv = KVCache.create(d_cfg, n_slots, max_seq, dtype)
            # tokens whose K/V rows exist in each slot's draft cache
            self.draft_ctx: list[list[int]] = [[] for _ in range(n_slots)]
        if spec_ngram:
            from .ngram_cache import NgramCache

            self.ngram_caches = [NgramCache() for _ in range(n_slots)]
        self.kv = KVCache.create(cfg, n_slots, max_seq, kv_cache_dtype or dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel.sharding import kv_pspec

            spec = kv_pspec(cfg, mesh.shape["model"], shard_batch=False)
            if isinstance(self.kv.k, jnp.ndarray):
                self.kv = KVCache(
                    k=jax.device_put(self.kv.k, NamedSharding(mesh, spec)),
                    v=jax.device_put(self.kv.v, NamedSharding(mesh, spec)),
                    n_past=self.kv.n_past)
        self.system_ids: list[int] = []  # shared-prefix tokens (set_system_prompt)
        self.n_past_host = np.zeros(n_slots, np.int32)
        self.recent = np.full((n_slots, RECENT), -1, np.int32)
        # per-request LoRA: rank-slice gains per slot (attach_lora)
        self.lora_ranks: list[int] = []
        self.slot_gain: np.ndarray | None = None
        self.rng_key = jax.random.PRNGKey(seed)
        self.metrics = {
            "n_prompt_tokens": 0,
            "n_prompt_tokens_cached": 0,
            "n_spec_drafted": 0,
            "n_spec_accepted": 0,
            "n_generated_tokens": 0,
            "t_prefill_s": 0.0,
            "t_decode_s": 0.0,
            "n_requests": 0,
        }

        @partial(jax.jit, static_argnames=("cfg",))
        def _prefill(params, cfg, tokens, n_tokens):
            """Single-sequence bucketed prefill; returns (last_logits, k, v)."""
            kv = KVCache.create(cfg, 1, tokens.shape[1], dtype)
            logits, kv = forward(params, cfg, tokens, kv, n_tokens)
            last = logits[0, n_tokens[0] - 1]
            return last, kv.k, kv.v

        @partial(jax.jit, donate_argnames=("kv_k", "kv_v"))
        def _insert(kv_k, kv_v, new_k, new_v, slot):
            """Scatter a prefilled sequence's K/V rows into the slot."""
            k = jax.lax.dynamic_update_slice(kv_k, new_k.astype(kv_k.dtype), (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(kv_v, new_v.astype(kv_v.dtype), (0, slot, 0, 0, 0))
            return k, v

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
        def _decode(params, cfg, tokens, kv, key, temp, top_k, top_p, min_p, pen, recent, gain=None):
            logits, kv = forward(params, cfg, tokens, kv, lora_gain=gain)
            toks = sample_tokens(
                logits[:, -1].astype(jnp.float32), key, temp, top_k, top_p, min_p, pen, recent
            )
            return toks, kv

        @partial(jax.jit, static_argnames=("cfg", "n_steps"),
                 donate_argnames=("kv",))
        def _decode_burst(params, cfg, tokens, kv, key, temp, top_k, top_p,
                          min_p, pen, recent, n_steps, gain=None):
            """``n_steps`` decode iterations fused into one dispatch:
            sampled feedback, the KV advance and the repetition window all
            stay on device — one host round trip per burst instead of per
            token (each dispatch costs tens of ms over the tunnel; a real
            pod still pays ~1 ms launch + logit sync per step)."""
            def body(carry, key_i):
                tok, kv, rec = carry
                logits, kv = forward(params, cfg, tok, kv, lora_gain=gain)
                toks = sample_tokens(
                    logits[:, -1].astype(jnp.float32), key_i, temp, top_k,
                    top_p, min_p, pen, rec)
                rec = jnp.concatenate([rec[:, 1:], toks[:, None]], axis=1)
                return (toks[:, None].astype(jnp.int32), kv, rec), toks

            keys = jax.random.split(key, n_steps)
            (_, kv, _), toks = jax.lax.scan(
                body, (tokens, kv, recent), keys)
            return toks, kv  # toks (n_steps, B)

        self._decode_burst_fn = _decode_burst

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
        def _decode_logits(params, cfg, tokens, kv, gain=None):
            """Grammar path: return full last-token logits for host sampling."""
            logits, kv = forward(params, cfg, tokens, kv, lora_gain=gain)
            return logits[:, -1].astype(jnp.float32), kv

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
        def _decode_logits_chunk(params, cfg, tokens, kv, gain=None):
            """Speculative verify: all per-position logits for a (B, 1+K) chunk."""
            logits, kv = forward(params, cfg, tokens, kv, lora_gain=gain)
            return logits.astype(jnp.float32), kv

        def _tree_slot_slice(a, slot):
            """One slot's (L,1,S,H,D) view of every cache leaf — works for
            plain arrays and QuantKV pytrees alike."""
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=1), a
            )

        def _tree_slot_put(a, x, slot):
            return jax.tree_util.tree_map(
                lambda c, n: jax.lax.dynamic_update_slice_in_dim(c, n, slot, axis=1), a, x
            )

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_k", "kv_v"))
        def _prefill_suffix(params, cfg, kv_k, kv_v, tokens, n_tokens, slot, n_match,
                            gain=None, shared_k=None, shared_v=None):
            """Chunked-prefill step: run one prompt chunk through the slot's
            existing KV rows (positions offset by the fill level n_match).
            Also serves the prefix-cache path (server.cpp:3248)."""
            kv1 = KVCache(_tree_slot_slice(kv_k, slot), _tree_slot_slice(kv_v, slot),
                          jnp.full((1,), n_match, jnp.int32),
                          shared_k=shared_k, shared_v=shared_v)
            logits, kv1 = forward(params, cfg, tokens, kv1, n_tokens, lora_gain=gain)
            k = _tree_slot_put(kv_k, kv1.k, slot)
            v = _tree_slot_put(kv_v, kv1.v, slot)
            return logits[0, n_tokens[0] - 1], k, v

        @partial(jax.jit, static_argnames=("cfg", "n_sel"), donate_argnames=("kv",))
        def _decode_mixed(params, cfg, tokens, kv, key, temp, top_k, top_p,
                          min_p, pen, recent, sel, n_sel, gain=None):
            """Decode with per-slot sampling isolation: every slot samples on
            device; additionally the ``n_sel`` slots listed in ``sel`` get
            their full logits rows shipped to host (grammar-constrained
            slots re-sample there through their persistent chain).  Keeps
            the on-device sampling win for unconstrained slots
            (reference: per-slot sampler chains, server.cpp:3616)."""
            logits, kv = forward(params, cfg, tokens, kv, lora_gain=gain)
            last = logits[:, -1].astype(jnp.float32)
            toks = sample_tokens(last, key, temp, top_k, top_p, min_p, pen, recent)
            return toks, last[sel], kv

        @partial(jax.jit, donate_argnames=("k", "v"))
        def _shift_slot(k, v, slot, n_past, keep, discard):
            """Per-slot context shift inside the batched cache: drop
            ``discard`` rows after the first ``keep`` for one slot, slide
            the tail left, and re-rope moved keys (server.cpp:3049-3090).
            q8 caches shift too: V rows move as int8+scale; K rows
            round-trip through f32 for the re-rope, matching the
            reference's build_rope_shift on quantized caches."""
            from ..ops.kv_quant import QuantKV, quantize_rows, take_rows
            from ..ops.rope import rope_frequencies, rope_shift_rows

            S = k.shape[2]
            rows = jnp.arange(S)
            src = jnp.where(rows < keep, rows, jnp.minimum(rows + discard, S - 1))
            moved = (rows >= keep) & (rows < n_past - discard)
            deltas = jnp.where(moved, -discard, 0).astype(jnp.int32)[None, :]

            def slot_slice(a):
                return jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)  # (L,1,S,H,D)

            def slot_put(a, x):
                return jax.lax.dynamic_update_slice_in_dim(a, x, slot, axis=1)

            if isinstance(k, QuantKV):
                vq = take_rows(QuantKV(slot_slice(v.q), slot_slice(v.s)), src, axis=2)
                kq = take_rows(QuantKV(slot_slice(k.q), slot_slice(k.s)), src, axis=2)
                kf = kq.q.astype(jnp.float32) * kq.s
                if self.cfg.pos_emb == "rope":
                    inv_freq = jnp.asarray(rope_frequencies(self.cfg))
                    kf = rope_shift_rows(kf, deltas, inv_freq, self.cfg.rope_interleaved)
                k2 = quantize_rows(kf)
                return (
                    QuantKV(slot_put(k.q, k2.q), slot_put(k.s, k2.s)),
                    QuantKV(slot_put(v.q, vq.q), slot_put(v.s, vq.s)),
                )
            k2 = jnp.take(slot_slice(k), src, axis=2)
            v2 = jnp.take(slot_slice(v), src, axis=2)
            if self.cfg.pos_emb == "rope":
                inv_freq = jnp.asarray(rope_frequencies(self.cfg))
                k2 = rope_shift_rows(k2, deltas, inv_freq, self.cfg.rope_interleaved)
            return slot_put(k, k2), slot_put(v, v2)

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_k", "kv_v"))
        def _prefill_suffix_embeds(params, cfg, kv_k, kv_v, embeds, n_tokens,
                                   slot, n_match, gain=None,
                                   shared_k=None, shared_v=None):
            """Chunked prefill from precomputed embeddings (server vision
            API: image features spliced into the prompt — mtmd chunks).
            Threads the shared system-prompt segment like the token path —
            prefilling without it would rope this slot's rows offset from
            the positions decode later uses."""
            kv1 = KVCache(_tree_slot_slice(kv_k, slot), _tree_slot_slice(kv_v, slot),
                          jnp.full((1,), n_match, jnp.int32),
                          shared_k=shared_k, shared_v=shared_v)
            tokens = jnp.zeros(embeds.shape[:2], jnp.int32)
            logits, kv1 = forward(params, cfg, tokens, kv1, n_tokens, embeds=embeds,
                                  lora_gain=gain)
            k = _tree_slot_put(kv_k, kv1.k, slot)
            v = _tree_slot_put(kv_v, kv1.v, slot)
            return logits[0, n_tokens[0] - 1], k, v

        self._prefill_suffix_embeds = _prefill_suffix_embeds

        @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
        def _decode_argmax(params, cfg, tokens, kv):
            """Greedy batched decode step (the draft model's proposal loop)."""
            logits, kv = forward(params, cfg, tokens, kv)
            return logits[:, -1].argmax(-1).astype(jnp.int32), kv

        @partial(jax.jit, static_argnames=("cfg", "n_steps"),
                 donate_argnames=("kv",))
        def _decode_argmax_scan(params, cfg, tokens, kv, n_steps):
            """The whole K-token draft proposal in ONE dispatch: greedy
            feedback stays on device (lax.scan), only the (K, B) token
            matrix leaves the chip.  Replaces K per-token host round trips
            — ruinous over the tunnel (reference drafts on-host too, but
            its device is on PCIe: common_speculative.cpp:270-292)."""
            def body(carry, _):
                toks, kv = carry
                logits, kv = forward(params, cfg, toks, kv)
                nxt = logits[:, -1].argmax(-1).astype(jnp.int32)
                return (nxt[:, None], kv), nxt

            (_, kv), drafts = jax.lax.scan(
                body, (tokens, kv), None, length=n_steps
            )
            return drafts, kv  # (K, B)

        self._decode_argmax = _decode_argmax
        self._decode_argmax_scan = _decode_argmax_scan
        self._prefill = _prefill
        self._insert = _insert
        self._decode = _decode
        self._decode_logits = _decode_logits
        self._decode_logits_chunk = _decode_logits_chunk
        self._prefill_suffix = _prefill_suffix
        self._decode_mixed = _decode_mixed
        self._shift_slot = _shift_slot

    # -- shared-prefix (cross-slot) KV ----------------------------------------

    def set_system_prompt(self, ids: list[int]):
        """Prefill a shared prompt ONCE and attend it from every slot.

        The cross-slot analog of the reference's multi-seq KV cells
        (llama-kv-cache-unified.cpp:752-951): N slots with one system
        prompt store its rows once instead of N times, and skip its
        prefill per request.  Must be set while all slots are idle."""
        if any(s.state != SlotState.IDLE for s in self.slots):
            raise RuntimeError("set_system_prompt requires all slots idle")
        # q8 main cache composes with the shared segment: the shared rows
        # are computed fresh at bf16 (small, engine-wide singletons) and
        # attention concatenates their scores with the dequantized main
        # cache (ops/attention.py shared_k path; the reference stores the
        # system prompt in the same quantized cells,
        # llama-kv-cache-unified.cpp).
        if not ids:
            self.system_ids = []
            self.kv = KVCache(self.kv.k, self.kv.v, self.kv.n_past)
            return
        padded = max(bucket_len(len(ids)), 1)
        toks = np.zeros((1, padded), np.int32)
        toks[0, : len(ids)] = ids
        _, k, v = self._prefill(self.params, self.cfg, jnp.asarray(toks),
                                jnp.asarray([len(ids)], jnp.int32))
        self.system_ids = list(ids)
        self.kv = KVCache(
            self.kv.k, self.kv.v, self.kv.n_past,
            shared_k=k[:, :, : len(ids)], shared_v=v[:, :, : len(ids)],
        )
        for s in self.slots:
            s.cache_tokens = []  # old per-slot caches used absolute rows

    # -- slot management ------------------------------------------------------

    def free_slot(self) -> Slot | None:
        for s in self.slots:
            if s.state == SlotState.IDLE:
                return s
        return None

    def _pick_slot(self, prompt_ids: list[int]) -> tuple[Slot | None, int]:
        """Idle slot with the longest cached common prefix (server.cpp
        prompt-cache slot selection)."""
        best, best_m = None, -1
        for s in self.slots:
            if s.state != SlotState.IDLE:
                continue
            m = 0
            limit = min(len(s.cache_tokens), len(prompt_ids) - 1)
            while m < limit and s.cache_tokens[m] == prompt_ids[m]:
                m += 1
            if m > best_m:
                best, best_m = s, m
        return best, max(best_m, 0)

    @property
    def n_active(self) -> int:
        return sum(s.state == SlotState.GENERATING for s in self.slots)

    @property
    def busy(self) -> bool:
        """Any slot still prefilling or generating."""
        return any(s.state != SlotState.IDLE for s in self.slots)

    def attach_lora(self, paths: list[str]):
        """Load adapter GGUFs for per-request selection (reference server
        --lora + per-request `lora` scales).  Call before serving; each
        request picks scales via ``add_request(..., lora={idx: scale})``;
        slots without a ``lora`` field run the pure base model (gain 0)."""
        from .lora import LoraAdapter, apply_lora_set

        adapters = [LoraAdapter.from_gguf(p) for p in paths]
        self.params, self.lora_ranks = apply_lora_set(self.params, adapters)
        self.slot_gain = np.zeros((self.n_slots, sum(self.lora_ranks)), np.float32)

    def _gain_all(self):
        return None if self.slot_gain is None else jnp.asarray(self.slot_gain)

    def _gain_row(self, slot_id: int):
        return None if self.slot_gain is None else jnp.asarray(self.slot_gain[slot_id : slot_id + 1])

    def add_request(
        self,
        prompt_ids: list[int],
        n_predict: int,
        sampler: SamplerConfig | None = None,
        request_id: str = "",
        n_keep: int = 0,
        truncate: bool = True,
        prompt_embeds=None,  # np (len(prompt_ids), D): multimodal prefill
        lora: dict | None = None,  # {adapter_index: scale} (attach_lora order)
    ) -> Slot | None:
        """Assign a prompt to a free slot; returns None when saturated.

        The prompt does NOT prefill here: it streams in ``n_chunk``-token
        chunks from :meth:`step`, interleaved with decode, so one long
        prompt never stalls the other slots' token cadence (reference:
        update_slots prompt chunking, server.cpp:3104-3476).  Reuses the
        slot's cached KV prefix when the new prompt extends a previous one
        (server.cpp:3248-3266)."""
        unbounded = n_predict <= 0  # reference -1 = until ctx/stop
        if unbounded:
            n_predict = self.max_seq
        if self.system_ids and prompt_embeds is None:
            n_sys = len(self.system_ids)
            if prompt_ids[:n_sys] == self.system_ids and len(prompt_ids) > n_sys:
                # shared-prefix rows already live in the shared segment:
                # strip them — zero prefill cost, zero per-slot storage
                prompt_ids = prompt_ids[n_sys:]
                self.metrics["n_prompt_tokens_cached"] += n_sys
                self.metrics["n_prompt_tokens"] += n_sys
        if prompt_embeds is not None:
            # embed prompts bypass the prefix cache (rows aren't reusable
            # by token identity) and never truncate
            slot = self.free_slot()
            if slot is None:
                return None
            if len(prompt_ids) >= self.max_seq:
                raise ValueError(
                    f"prompt ({len(prompt_ids)}) >= max_seq {self.max_seq}"
                )
            n_match = 0
        else:
            slot, n_match = self._pick_slot(prompt_ids)
        if slot is None:
            return None
        n_truncated = 0
        if prompt_embeds is None and len(prompt_ids) >= self.max_seq:
            if not truncate:
                raise ValueError(f"prompt ({len(prompt_ids)}) >= max_seq {self.max_seq}")
            # middle truncation (reference server.cpp prompt truncation):
            # keep n_keep head tokens + the newest tail, leaving room to
            # generate
            room = max(1, min(n_predict, self.max_seq // 4))
            target = self.max_seq - room
            # clamp n_keep below the target (reference server clamps the
            # same way) — n_keep >= target would wrap the tail slice and
            # yield a "truncated" prompt longer than max_seq
            keep = min(n_keep, max(target - 1, 0))
            head = prompt_ids[:keep]
            tail = prompt_ids[-(target - keep):]
            n_truncated = len(prompt_ids) - len(head) - len(tail)
            prompt_ids = head + tail
            n_match = min(n_match, keep)
        elif (len(prompt_ids) + n_predict > self.max_seq
              and not self.ctx_shift and not unbounded):
            raise ValueError(
                f"prompt ({len(prompt_ids)}) + n_predict ({n_predict}) > max_seq {self.max_seq}"
            )
        sampler = sampler or SamplerConfig()
        slot.state = SlotState.PREFILLING
        slot.request_id = request_id
        slot.prompt_ids = list(prompt_ids)
        slot.generated = []
        slot.pending = prompt_ids[n_match:]
        slot.n_predict = n_predict
        slot.n_past = n_match
        slot.n_keep = n_keep
        slot.n_shifted = 0
        slot.n_truncated = n_truncated
        slot.pending_embeds = (
            np.asarray(prompt_embeds, np.float32) if prompt_embeds is not None else None
        )
        slot.no_cache = prompt_embeds is not None
        slot.logprobs = []
        slot.lora = dict(lora) if lora else None
        if self.slot_gain is not None:
            from .lora import make_gain

            self.slot_gain[slot.id] = make_gain(self.lora_ranks, slot.lora or {})
        elif lora:
            raise ValueError("per-request lora requires attach_lora() first")
        slot.sampler = sampler
        slot.chain = self._make_chain(sampler)
        slot.stop_reason = None
        slot.t_start = time.perf_counter()
        self.n_past_host[slot.id] = n_match
        self.metrics["n_prompt_tokens_cached"] += n_match
        self.metrics["n_prompt_tokens"] += len(prompt_ids)
        self.metrics["n_requests"] += 1
        return slot

    def _advance_prefill(self) -> list[tuple[Slot, int, bool]]:
        """Advance EVERY prefilling slot one chunk per engine step, up to a
        shared per-step token budget (the reference packs prompt chunks
        from many slots into each batch, server.cpp:3132-3476 — chunking
        round-robin one slot per step would queue TTFT linearly under
        concurrent prompt load).  Completed prompts sample their first
        token and flip to GENERATING."""
        out: list[tuple[Slot, int, bool]] = []
        budget = self.prefill_budget
        start = self._prefill_rr
        self._prefill_rr += 1
        slots_round = [s for s in self.slots if s.state == SlotState.PREFILLING]
        # rotate the start point so truncated budgets stay fair
        if slots_round:
            off = start % len(slots_round)
            slots_round = slots_round[off:] + slots_round[:off]
        for slot in slots_round:
            if budget <= 0:
                break
            took, res = self._prefill_one(slot)
            budget -= took
            out.extend(res)
        return out

    def _prefill_one(self, slot: Slot) -> tuple[int, list[tuple[Slot, int, bool]]]:
        """One prompt chunk for ``slot``; returns (tokens_run, results)."""
        t0 = time.perf_counter()
        # align n_past to the chunk grid after the first (prefix-cache) chunk:
        # padded writes then always end ≤ max_seq (no dynamic_update_slice
        # clamping over live rows) and pad sizes stay on the bucket grid
        # (bounded compile count)
        take = min(self.n_chunk - slot.n_past % self.n_chunk, len(slot.pending))
        chunk = slot.pending[:take]
        ns = len(chunk)
        padded = min(max(bucket_len(ns), 1), self.max_seq - slot.n_past)
        if slot.pending_embeds is not None:
            emb = np.zeros((1, padded, slot.pending_embeds.shape[-1]), np.float32)
            emb[0, :ns] = slot.pending_embeds[:ns]
            slot.pending_embeds = slot.pending_embeds[ns:]
            last_logits, k, v = self._prefill_suffix_embeds(
                self.params, self.cfg, self.kv.k, self.kv.v, jnp.asarray(emb),
                jnp.asarray([ns], jnp.int32), jnp.asarray(slot.id, jnp.int32),
                jnp.asarray(slot.n_past, jnp.int32), self._gain_row(slot.id),
                self.kv.shared_k, self.kv.shared_v,
            )
        else:
            toks = np.zeros((1, padded), np.int32)
            toks[0, :ns] = chunk
            last_logits, k, v = self._prefill_suffix(
                self.params, self.cfg, self.kv.k, self.kv.v, jnp.asarray(toks),
                jnp.asarray([ns], jnp.int32), jnp.asarray(slot.id, jnp.int32),
                jnp.asarray(slot.n_past, jnp.int32), self._gain_row(slot.id),
                self.kv.shared_k, self.kv.shared_v,
            )
        self.kv = KVCache(k, v, n_past=self.kv.n_past,
                          shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        slot.pending = slot.pending[ns:]
        slot.n_past += ns
        self.n_past_host[slot.id] = slot.n_past
        self.metrics["t_prefill_s"] += time.perf_counter() - t0
        if slot.pending:
            return ns, []

        # prompt complete → sample the first token on host (single row)
        try:
            if slot.chain is not None:
                first = slot.chain.sample(np.asarray(last_logits), slot.prompt_ids)
                slot.chain.accept(
                    first, is_eog=first in self.tokenizer.vocab.special.eog_ids()
                )
            else:
                first = self._sample_host(np.asarray(last_logits), slot.prompt_ids, slot.sampler)
        except Exception as e:  # e.g. unsatisfiable grammar: fail THIS slot
            slot.stop_reason = "error"
            slot.error_msg = f"{type(e).__name__}: {e}"
            slot.state = SlotState.GENERATING
            return ns, [(slot, -1, True)]
        self._record_logprobs(slot, np.asarray(last_logits), first)
        slot.state = SlotState.GENERATING
        slot.generated = [first]
        slot.current_token = first
        slot.t_first_token = time.perf_counter()
        if self.spec_ngram:
            self.ngram_caches[slot.id].update(slot.prompt_ids + [first])
        n = len(slot.prompt_ids)
        self.recent[slot.id] = -1
        self.recent[slot.id, -min(RECENT, n + 1):] = (slot.prompt_ids + [first])[-RECENT:]
        self.metrics["n_generated_tokens"] += 1
        finished = self._check_finished(slot, first)
        return ns, [(slot, first, finished)]

    def _maybe_shift(self, slot: Slot):
        """StreamingLLM context shift when the slot is about to overflow
        (reference: server.cpp:3049-3090 — keep n_keep, drop half the rest)."""
        n_left = slot.n_past - slot.n_keep
        n_discard = max(n_left // 2, 1)
        k, v = self._shift_slot(
            self.kv.k, self.kv.v, jnp.asarray(slot.id, jnp.int32),
            jnp.asarray(slot.n_past, jnp.int32),
            jnp.asarray(slot.n_keep, jnp.int32),
            jnp.asarray(n_discard, jnp.int32),
        )
        self.kv = KVCache(k, v, n_past=self.kv.n_past,
                          shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        slot.n_past -= n_discard
        slot.n_shifted += n_discard
        self.n_past_host[slot.id] = slot.n_past
        if self.draft is not None:
            # row/position mapping changed: force a full draft resync
            self.draft_ctx[slot.id] = []

    def _make_chain(self, sc: SamplerConfig):
        """Persistent sampler chain — needed when the slot carries grammar
        state across steps; None for the stateless on-device fast path."""
        if sc.grammar is None and sc.json_schema is None:
            return None
        from ..grammar import Grammar, grammar_vocab_from_tokenizer, json_schema_to_gbnf
        from ..sampling.samplers import SamplerChain, SamplerParams

        src = sc.grammar if sc.grammar is not None else json_schema_to_gbnf(sc.json_schema)
        chain = SamplerChain(
            SamplerParams(
                temp=sc.temp, top_k=sc.top_k, top_p=sc.top_p, min_p=sc.min_p,
                penalty_repeat=sc.penalty_repeat, greedy=sc.temp <= 0,
                seed=sc.seed if sc.seed is not None else 0xFFFFFFFF,
            ),
            self.cfg.n_vocab,
        )
        chain.set_grammar(Grammar.from_string(src), grammar_vocab_from_tokenizer(self.tokenizer))
        return chain

    @staticmethod
    def _record_logprobs(slot: Slot, logits: np.ndarray, token: int):
        """OpenAI-style logprob record from a raw logits row."""
        n = slot.sampler.n_probs
        if n <= 0:
            return
        lf = logits.astype(np.float64)
        lf = lf - lf.max()
        logp = lf - np.log(np.exp(lf).sum())
        top_idx = np.argpartition(-logp, min(n, len(logp) - 1))[:n]
        top_idx = top_idx[np.argsort(-logp[top_idx])]
        slot.logprobs.append({
            "token": int(token),
            "logprob": float(logp[token]),
            "top": [(int(t), float(logp[t])) for t in top_idx],
        })

    def _sample_host(self, logits: np.ndarray, prev: list[int],
                     sc: SamplerConfig, n_pos: int | None = None) -> int:
        from ..sampling.samplers import SamplerChain, SamplerParams

        # a fresh chain per token must NOT reuse the request's fixed seed
        # verbatim — every position would draw the same uniform and seeded
        # sampling degenerates to fixed-quantile picking; mix the absolute
        # position in (deterministic per (seed, position), like the
        # reference's per-sample rng advance)
        seed = sc.seed if sc.seed is not None else 0xFFFFFFFF
        if seed != 0xFFFFFFFF:
            pos = len(prev) if n_pos is None else n_pos
            seed = (seed + pos * 0x9E3779B1) & 0xFFFFFFFE
        chain = SamplerChain(
            SamplerParams(
                temp=sc.temp,
                top_k=sc.top_k,
                top_p=sc.top_p,
                min_p=sc.min_p,
                penalty_repeat=sc.penalty_repeat,
                greedy=sc.temp <= 0,
                seed=seed,
            ),
            self.cfg.n_vocab,
        )
        return chain.sample(logits, prev)

    def _check_finished(self, slot: Slot, token: int) -> bool:
        eog = self.tokenizer.vocab.special.eog_ids()
        if token in eog:
            slot.stop_reason = "stop"
        elif len(slot.generated) >= slot.n_predict:
            slot.stop_reason = "length"
        elif slot.n_past + 1 >= self.max_seq and not self.ctx_shift:
            slot.stop_reason = "length"
        return slot.stop_reason is not None

    # -- decode ---------------------------------------------------------------

    def step(self) -> list[tuple[Slot, int, bool]]:
        """One engine iteration: a decode step for every generating slot,
        interleaved with one prompt chunk for one prefilling slot
        (reference update_slots ordering: decode tokens share the batch
        with prompt chunks, server.cpp:3104-3476).

        Returns [(slot, new_token, finished)] for slots that produced a
        token this step (including first tokens of freshly-completed
        prompts)."""
        results = self._advance_prefill()
        active = []
        for s in self.slots:
            if s.state != SlotState.GENERATING or s.stop_reason is not None:
                continue
            if s.generated and len(s.generated) >= s.n_predict:
                # budget already consumed (a restored mid-state at its
                # limit): finish without sampling a token past it
                s.stop_reason = "length"
                continue
            active.append(s)
        if not active:
            return results
        spec_room = self.n_draft if (self.spec_ngram or self.draft is not None) else 0
        if self.ctx_shift:
            for s in active:
                if s.n_past + 1 + spec_room >= self.max_seq:
                    self._maybe_shift(s)
        if any(s.chain is not None or s.sampler.n_probs > 0 for s in active):
            return results + self._step_mixed(active)
        # the (B, 1+K) verify forward writes K+1 rows at EVERY slot's
        # n_past; a PREFILLING (or idle-with-cache) slot near max_seq would
        # get its dynamic_update_slice start clamped backwards and its live
        # prompt rows overwritten — all rows must have K+1 rows of headroom
        spec_safe = all(
            s.n_past + 1 + self.n_draft < self.max_seq for s in self.slots)
        if (
            self.draft is not None
            and spec_safe
            and all(s.n_shifted == 0 for s in active)
        ):
            return results + self._step_spec_draft(active)
        if (
            self.spec_ngram
            # drafts are verified by raw argmax, which matches the sampler
            # chain only when no logit transforms apply (greedy + no
            # repetition penalty); reference verifies through the full chain
            and all(
                s.sampler.temp <= 0 and s.sampler.penalty_repeat == 1.0
                for s in active
            )
            and spec_safe
        ):
            return results + self._step_speculative(active)
        t0 = time.perf_counter()

        # steady-state burst: fuse K decode steps into one dispatch when no
        # slot needs per-token host control.  Every slot needs K rows of
        # headroom (each scan step writes a row at every slot's n_past);
        # a PREFILLING slot would have its first tokens delayed by the
        # whole burst, so bursts wait for an all-generating engine.
        burst = self.decode_burst
        if burst > 1 and (
                any(s.state == SlotState.PREFILLING for s in self.slots)
                or any(s.n_past + burst >= self.max_seq
                       for s in self.slots)):
            burst = 1
        # burst length stays FIXED at K: n_steps is a static arg, so a
        # tail-sized burst (remaining n_predict < K) would compile a new
        # program — 20-40 s over a tunneled chip vs at most K-1 truncated
        # decode steps (~ms).  Overshoot rows die above n_past.

        tokens = np.zeros((self.n_slots, 1), np.int32)
        temp = np.zeros(self.n_slots, np.float32)
        top_k = np.zeros(self.n_slots, np.int32)
        top_p = np.ones(self.n_slots, np.float32)
        min_p = np.zeros(self.n_slots, np.float32)
        pen = np.ones(self.n_slots, np.float32)
        for s in active:
            tokens[s.id, 0] = s.current_token
            temp[s.id] = s.sampler.temp
            top_k[s.id] = min(s.sampler.top_k, CAND) if s.sampler.top_k > 0 else CAND
            top_p[s.id] = s.sampler.top_p
            min_p[s.id] = s.sampler.min_p
            pen[s.id] = s.sampler.penalty_repeat

        self.rng_key, sub = jax.random.split(self.rng_key)
        kv = KVCache(self.kv.k, self.kv.v, jnp.asarray(self.n_past_host),
                     shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        if burst > 1:
            toks_dev, kv = self._decode_burst_fn(
                self.params, self.cfg, jnp.asarray(tokens), kv, sub,
                jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p),
                jnp.asarray(min_p), jnp.asarray(pen),
                jnp.asarray(self.recent), burst, self._gain_all(),
            )
            self.kv = kv
            toks_burst = np.asarray(toks_dev)  # (burst, B)
            n_emitted = 0
            for s in active:
                for i in range(burst):
                    tok = int(toks_burst[i, s.id])
                    s.n_past += 1
                    s.generated.append(tok)
                    s.current_token = tok
                    self.recent[s.id] = np.roll(self.recent[s.id], -1)
                    self.recent[s.id, -1] = tok
                    finished = self._check_finished(slot=s, token=tok)
                    results.append((s, tok, finished))
                    n_emitted += 1
                    if finished:
                        # rows written beyond the stop are dead (masked by
                        # n_past) and get overwritten on slot reuse
                        break
                self.n_past_host[s.id] = s.n_past
            self.metrics["t_decode_s"] += time.perf_counter() - t0
            self.metrics["n_generated_tokens"] += n_emitted
            return results
        toks_dev, kv = self._decode(
            self.params, self.cfg, jnp.asarray(tokens), kv, sub,
            jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p),
            jnp.asarray(min_p), jnp.asarray(pen), jnp.asarray(self.recent),
            self._gain_all(),
        )
        self.kv = kv
        new_tokens = np.asarray(toks_dev)

        for s in active:
            tok = int(new_tokens[s.id])
            s.n_past += 1
            self.n_past_host[s.id] = s.n_past
            s.generated.append(tok)
            s.current_token = tok
            self.recent[s.id] = np.roll(self.recent[s.id], -1)
            self.recent[s.id, -1] = tok
            finished = self._check_finished(slot=s, token=tok)
            results.append((s, tok, finished))
        self.metrics["t_decode_s"] += time.perf_counter() - t0
        self.metrics["n_generated_tokens"] += len(active)
        return results

    def _sync_draft(self, slot: Slot, required: list[int]):
        """Replay the draft model's KV so rows cover exactly ``required``
        (common-prefix reuse, the analog of the reference's draft-context
        shift/reuse in common_speculative.cpp:232-279)."""
        ctx = self.draft_ctx[slot.id]
        m = 0
        limit = min(len(ctx), len(required))
        while m < limit and ctx[m] == required[m]:
            m += 1
        pos = m
        while pos < len(required):
            take = min(self.n_chunk - pos % self.n_chunk, len(required) - pos)
            chunk = required[pos : pos + take]
            padded = min(max(bucket_len(take), 1), self.max_seq - pos)
            toks = np.zeros((1, padded), np.int32)
            toks[0, :take] = chunk
            _, k, v = self._prefill_suffix(
                self.draft_params, self.draft_cfg, self.draft_kv.k, self.draft_kv.v,
                jnp.asarray(toks), jnp.asarray([take], jnp.int32),
                jnp.asarray(slot.id, jnp.int32), jnp.asarray(pos, jnp.int32),
            )
            self.draft_kv = KVCache(k, v, n_past=self.draft_kv.n_past)
            pos += take
        self.draft_ctx[slot.id] = list(required)

    def _step_spec_draft(self, active: list[Slot]) -> list[tuple[Slot, int, bool]]:
        """Draft-model speculation across slots (reference: the server's
        speculative branch, server.cpp:3656-3755).

        The draft proposes K tokens per slot with a batched greedy loop;
        the target verifies all slots in one (B, 1+K) forward; acceptance
        is stochastic — each position re-samples through the slot's own
        sampler and keeps the draft token only on agreement
        (common_sampler_sample_and_accept_n), so any sampler config is
        eligible, not just greedy."""
        t0 = time.perf_counter()
        K = self.n_draft
        for s in active:
            hist = s.prompt_ids + s.generated
            self._sync_draft(s, hist[:-1])

        draft_n_past = np.zeros(self.n_slots, np.int32)
        cur = np.zeros((self.n_slots, 1), np.int32)
        for s in active:
            draft_n_past[s.id] = len(self.draft_ctx[s.id])
            cur[s.id, 0] = s.current_token
        dkv = KVCache(self.draft_kv.k, self.draft_kv.v, jnp.asarray(draft_n_past))
        drafts_dev, dkv = self._decode_argmax_scan(
            self.draft_params, self.draft_cfg, jnp.asarray(cur), dkv, n_steps=K
        )
        drafts_h = np.asarray(drafts_dev)  # (K, B) — single host sync
        drafts: dict[int, list[int]] = {
            s.id: [int(t) for t in drafts_h[:, s.id]] for s in active
        }
        self.draft_kv = KVCache(dkv.k, dkv.v, n_past=self.draft_kv.n_past)
        for s in active:  # rows now hold hist + drafts[:-1]
            self.draft_ctx[s.id] = (
                s.prompt_ids + s.generated + drafts[s.id][:-1]
            )

        # target verifies [cur] + drafts in one chunk
        tokens = np.zeros((self.n_slots, 1 + K), np.int32)
        for s in active:
            tokens[s.id] = [s.current_token] + drafts[s.id]
        kv = KVCache(self.kv.k, self.kv.v, jnp.asarray(self.n_past_host),
                     shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        logits_dev, kv = self._decode_logits_chunk(
            self.params, self.cfg, jnp.asarray(tokens), kv, self._gain_all()
        )
        self.kv = kv
        logits = np.asarray(logits_dev)  # (B, 1+K, V)
        eog = self.tokenizer.vocab.special.eog_ids()

        results = []
        for s in active:
            d = drafts[s.id]
            prev = s.prompt_ids + s.generated
            accepted: list[int] = []
            for i, dt in enumerate(d):
                tok_i = self._sample_host(
                    logits[s.id, i], (prev + accepted)[-RECENT:], s.sampler,
                    n_pos=len(prev) + len(accepted),
                )
                if tok_i != dt:
                    accepted.append(tok_i)  # target's correction, always kept
                    break
                accepted.append(dt)
                self.metrics["n_spec_accepted"] += 1
            else:
                accepted.append(
                    self._sample_host(
                        logits[s.id, K], (prev + accepted)[-RECENT:], s.sampler,
                        n_pos=len(prev) + len(accepted),
                    )
                )
            self.metrics["n_spec_drafted"] += len(d)
            final: list[int] = []
            limit = max(1, s.n_predict - len(s.generated))
            for t_new in accepted[:limit]:
                final.append(t_new)
                if t_new in eog:
                    break
            s.n_past += len(final)
            self.n_past_host[s.id] = s.n_past
            for t_new in final:
                s.generated.append(t_new)
                self.recent[s.id] = np.roll(self.recent[s.id], -1)
                self.recent[s.id, -1] = t_new
            s.current_token = final[-1]
            finished = self._check_finished(slot=s, token=final[-1])
            for t_new in final[:-1]:
                results.append((s, t_new, False))
            results.append((s, final[-1], finished))
        self.metrics["t_decode_s"] += time.perf_counter() - t0
        self.metrics["n_generated_tokens"] += len(results)
        return results

    def _step_speculative(self, active: list[Slot]) -> list[tuple[Slot, int, bool]]:
        """Ngram-lookup speculation across slots (reference: the server's
        per-slot speculative branch, server.cpp:3656, with ngram drafts —
        examples/lookup — instead of a draft model).

        All slots run a fixed (B, 1+n_draft) verify forward; per-slot
        acceptance rewinds n_past (greedy slots only, so verification is
        exact argmax matching)."""
        import jax.numpy as jnp

        t0 = time.perf_counter()
        K = self.n_draft
        tokens = np.zeros((self.n_slots, 1 + K), np.int32)
        drafts: dict[int, list[int]] = {}
        for s in active:
            hist = s.prompt_ids + s.generated
            d = self.ngram_caches[s.id].draft(hist, K)
            drafts[s.id] = d
            row = [s.current_token] + d + [s.current_token] * (K - len(d))
            tokens[s.id] = row

        kv = KVCache(self.kv.k, self.kv.v, jnp.asarray(self.n_past_host),
                     shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        logits_dev, kv = self._decode_logits_chunk(
            self.params, self.cfg, jnp.asarray(tokens), kv, self._gain_all()
        )
        self.kv = kv
        logits = np.asarray(logits_dev)  # (B, 1+K, V)
        eog = self.tokenizer.vocab.special.eog_ids()

        results = []
        for s in active:
            d = drafts[s.id]
            # greedy acceptance walk: draft[i] is kept iff it equals the
            # argmax after consuming [cur] + draft[:i]
            accepted = 0
            for i, dt in enumerate(d):
                if int(np.argmax(logits[s.id, i])) == dt:
                    accepted += 1
                else:
                    break
            toks_out = d[:accepted] + [int(np.argmax(logits[s.id, accepted]))]
            # respect n_predict and stop at the first EOG
            limit = max(1, s.n_predict - len(s.generated))
            toks_out = toks_out[:limit]
            for i, t_new in enumerate(toks_out):
                if t_new in eog:
                    toks_out = toks_out[: i + 1]
                    break
            self.metrics["n_spec_drafted"] += len(d)
            self.metrics["n_spec_accepted"] += max(len(toks_out) - 1, 0)

            s.n_past += len(toks_out)
            self.n_past_host[s.id] = s.n_past
            for t_new in toks_out:
                s.generated.append(t_new)
                self.recent[s.id] = np.roll(self.recent[s.id], -1)
                self.recent[s.id, -1] = t_new
            s.current_token = toks_out[-1]
            self.ngram_caches[s.id].update((s.prompt_ids + s.generated)[-16:])
            finished = self._check_finished(slot=s, token=toks_out[-1])
            for t_new in toks_out[:-1]:
                results.append((s, t_new, False))
            results.append((s, toks_out[-1], finished))
        self.metrics["t_decode_s"] += time.perf_counter() - t0
        self.metrics["n_generated_tokens"] += len(results)
        return results

    def _step_mixed(self, active: list[Slot]) -> list[tuple[Slot, int, bool]]:
        """Decode step with per-slot sampling isolation: grammar-constrained
        slots receive their logits row on host (chain sampling with PDA
        state), every other slot keeps on-device sampling.  One grammar
        request no longer drags the whole batch onto the host path
        (reference: per-slot sampler chains, server.cpp:3616-3652)."""
        t0 = time.perf_counter()
        host_slots = [
            s for s in active if s.chain is not None or s.sampler.n_probs > 0
        ]
        # bucket the gather size to bound compiled variants
        n_sel = 1
        while n_sel < len(host_slots):
            n_sel *= 2
        n_sel = min(n_sel, self.n_slots)
        sel = np.zeros(n_sel, np.int32)
        for i, s in enumerate(host_slots):
            sel[i] = s.id

        tokens = np.zeros((self.n_slots, 1), np.int32)
        temp = np.zeros(self.n_slots, np.float32)
        top_k = np.full(self.n_slots, CAND, np.int32)
        top_p = np.ones(self.n_slots, np.float32)
        min_p = np.zeros(self.n_slots, np.float32)
        pen = np.ones(self.n_slots, np.float32)
        for s in active:
            tokens[s.id, 0] = s.current_token
            temp[s.id] = s.sampler.temp
            top_k[s.id] = min(s.sampler.top_k, CAND) if s.sampler.top_k > 0 else CAND
            top_p[s.id] = s.sampler.top_p
            min_p[s.id] = s.sampler.min_p
            pen[s.id] = s.sampler.penalty_repeat

        self.rng_key, sub = jax.random.split(self.rng_key)
        kv = KVCache(self.kv.k, self.kv.v, jnp.asarray(self.n_past_host),
                     shared_k=self.kv.shared_k, shared_v=self.kv.shared_v)
        toks_dev, sel_logits, kv = self._decode_mixed(
            self.params, self.cfg, jnp.asarray(tokens), kv, sub,
            jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p),
            jnp.asarray(min_p), jnp.asarray(pen), jnp.asarray(self.recent),
            jnp.asarray(sel), n_sel, self._gain_all(),
        )
        self.kv = kv
        new_tokens = np.asarray(toks_dev)
        sel_logits = np.asarray(sel_logits)
        eog = self.tokenizer.vocab.special.eog_ids()

        results = []
        for s in active:
            if s in host_slots:
                row = host_slots.index(s)
                prev = (s.prompt_ids + s.generated)[-RECENT:]
                try:
                    if s.chain is not None:
                        tok = s.chain.sample(sel_logits[row], prev)
                        s.chain.accept(tok, is_eog=tok in eog)
                    else:
                        tok = self._sample_host(
                            sel_logits[row], prev, s.sampler,
                            n_pos=len(s.prompt_ids) + len(s.generated))
                except Exception as e:  # grammar dead-end etc: fail THIS slot
                    s.stop_reason = "error"
                    s.error_msg = f"{type(e).__name__}: {e}"
                    results.append((s, -1, True))
                    continue
                self._record_logprobs(s, sel_logits[row], tok)
            else:
                tok = int(new_tokens[s.id])
            s.n_past += 1
            self.n_past_host[s.id] = s.n_past
            s.generated.append(tok)
            s.current_token = tok
            self.recent[s.id] = np.roll(self.recent[s.id], -1)
            self.recent[s.id, -1] = tok
            finished = self._check_finished(slot=s, token=tok)
            results.append((s, tok, finished))
        self.metrics["t_decode_s"] += time.perf_counter() - t0
        self.metrics["n_generated_tokens"] += len(active)
        return results

    def release(self, slot: Slot):
        slot.reset()
        if self.slot_gain is not None:
            self.slot_gain[slot.id] = 0.0  # freed slots decode as base model
        # Idle slots still ride every batched forward as dummy rows: each
        # decode step writes 1 (or 1+n_draft) garbage K/V rows at the idle
        # slot's n_past.  Park n_past just past the cached prefix — far
        # enough from max_seq that dynamic_update_slice can't clamp back
        # into rows the prompt cache may later reuse.
        guard = 1 + (self.n_draft if (self.spec_ngram or self.draft is not None) else 0)
        keep = min(len(slot.cache_tokens), self.max_seq - guard)
        slot.cache_tokens = slot.cache_tokens[:keep]
        self.n_past_host[slot.id] = keep

    def warmup(self) -> None:
        """Compile the hot serving programs before traffic arrives.

        The reference warms up with a throwaway decode at init
        (common_init_from_params; disabled by --no-warmup).  Here one tiny
        greedy request runs to completion, which traces the smallest
        prefill bucket, the fused burst decode and the single-step decode;
        with the persistent compile cache every later restart replays
        these from disk.  Metrics and the slot's prompt cache are cleared
        so /metrics and prefix reuse start clean."""
        bos = self.tokenizer.vocab.special.bos or 0
        for n, burst in ((self.decode_burst + 1, self.decode_burst), (2, 1)):
            saved, self.decode_burst = self.decode_burst, burst
            try:
                slot = self.add_request([int(bos)] * 4, n,
                                        SamplerConfig(temp=0.0), "warmup")
                if slot is None:  # saturated engine: nothing to warm
                    return
                slot.no_cache = True  # reset() drops the warmup prefix rows
                for _ in range(n * 4):
                    if any(fin for s, _t, fin in self.step() if s is slot):
                        break
                self.release(slot)
            finally:
                self.decode_burst = saved
        for k in self.metrics:
            self.metrics[k] = 0.0 if isinstance(self.metrics[k], float) else 0

    # -- state save/restore (llama_state_seq_* analog) ------------------------

    def save_slot_state(self, slot_id: int) -> dict:
        """Export a slot's KV rows + bookkeeping (llama_state_seq_get_data).

        Quantized (q8) caches serialize their int8 payload and f32 scale
        planes verbatim — bit-faithful round-trip, like the reference's
        quantized cell serialization (llama-kv-cache-unified.cpp:
        1831-2402)."""
        from ..ops.kv_quant import QuantKV

        s = self.slots[slot_id]
        n = s.n_past
        out = {
            "n_past": n,
            "prompt_ids": list(s.prompt_ids),
            "generated": list(s.generated),
        }
        if isinstance(self.kv.k, QuantKV):
            out["kv_format"] = "q8"
            out["k_q"] = np.asarray(self.kv.k.q[:, slot_id, :n])
            out["k_s"] = np.asarray(self.kv.k.s[:, slot_id, :n])
            out["v_q"] = np.asarray(self.kv.v.q[:, slot_id, :n])
            out["v_s"] = np.asarray(self.kv.v.s[:, slot_id, :n])
        else:
            out["k"] = np.asarray(self.kv.k[:, slot_id, :n])
            out["v"] = np.asarray(self.kv.v[:, slot_id, :n])
        return out

    def load_slot_state(self, slot_id: int, state: dict):
        """Import a previously saved sequence into a slot."""
        from ..ops.kv_quant import QuantKV

        n = int(state["n_past"])
        pad = self.max_seq - n
        is_q8_cache = isinstance(self.kv.k, QuantKV)
        is_q8_state = state.get("kv_format") == "q8"
        if is_q8_cache != is_q8_state:
            raise ValueError(
                f"slot state kv_format {'q8' if is_q8_state else 'dense'!s} "
                f"does not match the engine cache "
                f"({'q8' if is_q8_cache else 'dense'})")

        def padded(a):  # (L, n, H, Dlast) → (L, 1, max_seq, H, Dlast)
            return jnp.pad(jnp.asarray(a),
                           ((0, 0), (0, pad), (0, 0), (0, 0)))[:, None]

        if is_q8_cache:
            new_k = QuantKV(q=padded(state["k_q"]), s=padded(state["k_s"]))
            new_v = QuantKV(q=padded(state["v_q"]), s=padded(state["v_s"]))
            put = lambda c, x: jax.lax.dynamic_update_slice(
                c, x.astype(c.dtype), (0, slot_id, 0, 0, 0))
            k = jax.tree_util.tree_map(put, self.kv.k, new_k)
            v = jax.tree_util.tree_map(put, self.kv.v, new_v)
        else:
            k, v = self._insert(self.kv.k, self.kv.v,
                                padded(state["k"]), padded(state["v"]),
                                slot_id)
        self.kv = KVCache(
            k, v,
            n_past=self.kv.n_past,
            # the engine-wide shared system-prompt segment must survive a
            # per-slot restore
            shared_k=self.kv.shared_k, shared_v=self.kv.shared_v,
        )
        s = self.slots[slot_id]
        # a state captured from an idle/released slot restores as idle
        # (reference: restoring an empty sequence is a no-op slot)
        history = list(state["generated"]) or list(state["prompt_ids"])
        s.state = SlotState.GENERATING if history else SlotState.IDLE
        s.prompt_ids = list(state["prompt_ids"])
        s.generated = list(state["generated"])
        s.n_past = n
        s.current_token = history[-1] if history else 0
        self.n_past_host[slot_id] = n
        # repetition-penalty window reflects the restored history
        self.recent[slot_id] = -1
        if history:
            tail = history[-RECENT:]
            self.recent[slot_id, -len(tail):] = tail
