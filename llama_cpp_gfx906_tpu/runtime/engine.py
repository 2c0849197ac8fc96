"""Single-model inference engine: load → prefill → decode loop.

The TPU-native counterpart of ``llama_context`` + the llama-cli decode loop
(reference ``src/llama-context.cpp:946`` ``decode``; ``tools/main``):
instead of building a ggml graph per ubatch and scheduling it over
backends, prefill and decode are two jit-compiled programs over static
shape buckets (the graph-reuse check at ``llama-context.cpp:728`` becomes
an XLA compile-cache hit), and the KV cache is donated so decode updates
it in place in HBM.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModelReader
from ..models.config import ModelConfig, config_from_gguf
from ..models.llama import KVCache, forward
from ..sampling.samplers import SamplerChain, SamplerParams
from ..tokenizers import Tokenizer, tokenizer_from_gguf
from .weights import load_llama_params

# prefill length buckets — pad prompts up to the next bucket to bound the
# number of compiled programs (reference analog: ubatch shaping)
PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucket_len(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return ((n + 4095) // 4096) * 4096


_COMPILE_CACHE_ON = False


def enable_persistent_compile_cache() -> None:
    """Turn on XLA's on-disk compilation cache for this process.

    A fresh engine process re-traces every prefill bucket and decode
    program; on a tunneled TPU each remote compile costs 20-40 s, so a
    server restart pays minutes before steady state.  The reference ships
    its kernels precompiled in the binary — the XLA analog is the
    persistent compilation cache, which makes every restart warm.  Dir:
    ``LCG_COMPILE_CACHE_DIR`` (default ``/tmp/lcg_jax_cache``); disable
    with ``LCG_NO_COMPILE_CACHE=1``."""
    global _COMPILE_CACHE_ON
    if _COMPILE_CACHE_ON or os.environ.get("LCG_NO_COMPILE_CACHE"):
        return
    try:
        backend = jax.default_backend()
        if backend != "tpu":
            # CPU compiles are cheap, and test processes with different
            # virtual topologies sharing one cache dir can segfault on
            # executable deserialization — cache only where it pays
            _COMPILE_CACHE_ON = True
            return
        base = os.environ.get("LCG_COMPILE_CACHE_DIR", "/tmp/lcg_jax_cache")
        jax.config.update("jax_compilation_cache_dir", f"{base}-{backend}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # unsupported backend/config: cache is best-effort
    _COMPILE_CACHE_ON = True


class ModelLoadCancelled(RuntimeError):
    """Raised when ``progress_callback`` returns False mid-load (the
    reference's cancellable llama_progress_callback, llama.h:276-279)."""


@dataclass
class PerfCounters:
    """llama_perf_context analog (llama.h:1419)."""

    t_load_s: float = 0.0
    t_prefill_s: float = 0.0
    t_decode_s: float = 0.0
    n_prefill: int = 0
    n_decode: int = 0

    def summary(self) -> dict:
        return {
            "load_s": round(self.t_load_s, 3),
            "prefill_tok_s": round(self.n_prefill / self.t_prefill_s, 2) if self.t_prefill_s else 0.0,
            "decode_tok_s": round(self.n_decode / self.t_decode_s, 2) if self.t_decode_s else 0.0,
            "n_prefill": self.n_prefill,
            "n_decode": self.n_decode,
        }


@dataclass
class Engine:
    cfg: ModelConfig
    params: dict
    tokenizer: Tokenizer
    max_seq: int = 2048
    batch_size: int = 1
    kv_dtype: object = jnp.bfloat16
    # iSWA memory saver: SWA layers get a window-sized ring instead of
    # max_seq rows (reference llama-kv-cache-unified-iswa.cpp)
    swa_ring: bool = False
    # multi-chip: ("data", "model") Mesh — weights arrive TP-sharded (see
    # from_gguf), the KV cache is sharded by kv_pspec, and XLA inserts the
    # collectives (the product surface of the reference's
    # --split-mode/--tensor-split, llama-model.cpp:1908-1975)
    mesh: object = None
    perf: PerfCounters = field(default_factory=PerfCounters)

    def __post_init__(self):
        from ..models.registry import ModelFamily, get_family

        self.family = get_family(self.cfg)
        if self.swa_ring:
            if self.cfg.sliding_window <= 0 or self.family.name != "llama":
                raise ValueError("swa_ring needs an iSWA attention arch")
            from ..models.llama_iswa import ISWACache, forward_iswa

            self.family = ModelFamily(
                name="llama_iswa",
                forward=forward_iswa,
                make_cache=lambda cfg, batch, max_seq, dtype:
                    ISWACache.create(cfg, batch, max_seq, dtype),
                load_params=self.family.load_params,
            )
        self._forward = jax.jit(
            self.family.forward,
            static_argnames=("cfg", "return_hidden"),
            donate_argnames=("kv",),
        )
        self.kv = self._shard_cache(
            self.family.make_cache(self.cfg, self.batch_size, self.max_seq,
                                   self.kv_dtype))

    def _shard_cache(self, kv):
        """Place a fresh cache on the mesh (KV heads on "model")."""
        if self.mesh is None:
            return kv
        import dataclasses

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import kv_pspec

        n_model = self.mesh.shape["model"]
        updates = {}
        for name in ("k", "v"):
            arr = getattr(kv, name, None)
            if isinstance(arr, jnp.ndarray) and arr.ndim == 5:
                updates[name] = jax.device_put(
                    arr, NamedSharding(self.mesh,
                                       kv_pspec(self.cfg, n_model,
                                                shard_batch=False)))
        if hasattr(kv, "n_past"):
            updates["n_past"] = jax.device_put(
                kv.n_past, NamedSharding(self.mesh, P()))
        try:
            return dataclasses.replace(kv, **updates) if updates else kv
        except TypeError:
            return kv  # non-dataclass cache families stay as created

    # -- construction -------------------------------------------------------

    @classmethod
    def from_gguf(
        cls,
        path: str,
        max_seq: int = 2048,
        batch_size: int = 1,
        dtype=jnp.bfloat16,
        device_put_fn=None,
        keep_quantized: bool = True,
        kv_cache_dtype=None,  # None → dtype; "q8" → int8 KV (type_k/type_v)
        swa_ring: bool = False,
        repack_int8: bool = False,  # lossless 4-bit → int8 weight repack:
        # 2× weight HBM for ~1.6× the packed-byte DMA rate.  Since the
        # nib4c chunk-local packing streams 4-bit natively at HALF the
        # bytes, the repack is now an ablation/compat knob, not the fast
        # path — leave it off.
        kq_fold: bool | None = None,  # keep the k-quant superblock scale
        # structure on device (int8 sub-scales + per-256 f32 d) instead of
        # f32 per group — ~13% fewer streamed bytes per decode token on a
        # Q4_K_M mix, bit-identical values.  DEFAULT ON (None → True): the
        # streamed megakernel and GEMV kernel consume folded scales
        # natively in both int8 and nib4c formats, and every other path
        # unfolds inline in XLA (fuses into the dequant consumer).  The
        # reference ships its gfx906 kernels on by default
        # (GGML_HIP_GFX906_OPTIMIZED); so do we.
        progress_callback=None,  # f(fraction)->bool; False cancels the load
        # (the llama_progress_callback contract, llama.h:276-279 /
        # test-model-load-cancel): raises ModelLoadCancelled
        kv_overrides: dict | None = None,  # GGUF metadata overrides applied
        # before hparam parsing (llama_model_kv_override, llama.h:242-253)
        cfg_overrides: dict | None = None,  # direct ModelConfig field
        # overrides (cparams analog: rope_base, rope_scaling, ...)
        mesh=None,  # jax.sharding.Mesh ("data", "model"): tensor-parallel
        # load — weights stream straight into sharded buffers
        # (parallel.sharding.make_device_put_fn) and quantized matmuls take
        # the GSPMD-partitioned XLA path.  The product surface of the
        # reference's --split-mode row / --tensor-split
        # (llama-model.cpp:1908-1975); build one with
        # parallel.sharding.make_mesh or common.args.mesh_from_args.
    ) -> "Engine":
        enable_persistent_compile_cache()
        t0 = time.perf_counter()
        reader = GGUFModelReader(path)
        if kv_overrides:
            reader.set_overrides(kv_overrides)
        cfg = config_from_gguf(reader)
        if cfg_overrides:
            cfg = cfg.with_(**cfg_overrides)
        if mesh is not None and device_put_fn is None:
            from ..parallel.sharding import make_device_put_fn

            device_put_fn = make_device_put_fn(mesh, cfg)
        tok = tokenizer_from_gguf(reader.readers[0])
        from ..models.registry import get_family

        if progress_callback is not None:
            # fraction by BYTES uploaded: loaders upload one stacked layer
            # group per put call, so call counts would sit near zero then
            # jump — byte fractions track the actual transfer
            total_bytes = max(
                sum(t.n_bytes for t in reader.tensors.values()), 1)
            inner = device_put_fn
            seen = {"bytes": 0}

            def device_put_fn(arr, name, _inner=inner):  # noqa: F811
                seen["bytes"] += getattr(arr, "nbytes", 0)
                if progress_callback(min(seen["bytes"] / total_bytes, 1.0)) is False:
                    raise ModelLoadCancelled(
                        f"model load cancelled at tensor {name!r}")
                return _inner(arr, name) if _inner is not None else jnp.asarray(arr)

            # a pure progress wrapper must not change the weight layout
            # (weights.py defaults fuse=False for sharding device_put_fns)
            if inner is None:
                device_put_fn.keep_fused = True

        from ..ops import quant_matmul as _qmm

        if kq_fold is None:
            kq_fold = _qmm.LOADER_KQ_FOLD_DEFAULT  # default-on (see comment)
        prev_fold = _qmm.FOLD_KQ_SCALES
        _qmm.FOLD_KQ_SCALES = kq_fold
        try:
            params = get_family(cfg).load_params(
                reader, cfg, dtype, device_put_fn, keep_quantized=keep_quantized
            )
        finally:
            _qmm.FOLD_KQ_SCALES = prev_fold
        if progress_callback is not None:
            progress_callback(1.0)
        if repack_int8:
            from ..ops.quant_matmul import repack_params_int8

            params = repack_params_int8(params)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from ..ops.quant_matmul import mark_xla_only

            params = mark_xla_only(params)
        eng = cls(cfg=cfg, params=params, tokenizer=tok, max_seq=max_seq,
                  batch_size=batch_size, kv_dtype=kv_cache_dtype or dtype,
                  swa_ring=swa_ring, mesh=mesh)
        eng.perf.t_load_s = time.perf_counter() - t0
        return eng

    # -- low-level steps ----------------------------------------------------

    def reset(self):
        self.kv = self._shard_cache(self.family.make_cache(
            self.cfg, self.batch_size, self.max_seq, self.kv_dtype))

    def prefill(self, token_ids: list[int]) -> np.ndarray:
        """Run the prompt through; returns last-token logits (V,)."""
        n = len(token_ids)
        padded = bucket_len(n)
        toks = np.zeros((self.batch_size, padded), np.int32)
        toks[0, :n] = token_ids
        t0 = time.perf_counter()
        logits, self.kv = self._forward(
            self.params, self.cfg, jnp.asarray(toks), self.kv,
            jnp.full((self.batch_size,), n, jnp.int32),
        )
        out = np.asarray(logits[0, n - 1])
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def set_n_past(self, n: int):
        """Rewind (or advance) the sequence position — KV rows beyond ``n``
        become dead and are overwritten by subsequent writes (the analog of
        ``llama_memory_seq_rm`` tail removal for speculative rollback).
        Works on every cache family (iSWA ring, quantized, hybrid) and
        preserves self-extend position state."""
        import dataclasses

        self.kv = dataclasses.replace(
            self.kv, n_past=jnp.full((self.batch_size,), n, jnp.int32))

    @property
    def n_past(self) -> int:
        return int(self.kv.n_past[0])

    def decode_chunk(self, token_ids: list[int], chunk_pad: int = 16) -> np.ndarray:
        """Decode several tokens in one forward; returns logits (len, V).

        Used by speculative verification: the target scores the draft's
        tokens in a single pass."""
        n = len(token_ids)
        padded = max(chunk_pad, bucket_len(n)) if n > chunk_pad else chunk_pad
        toks = np.zeros((self.batch_size, padded), np.int32)
        toks[0, :n] = token_ids
        t0 = time.perf_counter()
        logits, self.kv = self._forward(
            self.params, self.cfg, jnp.asarray(toks), self.kv,
            jnp.full((self.batch_size,), n, jnp.int32),
        )
        out = np.asarray(logits[0, :n])
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += n
        return out

    def embed(self, text: str, pooling: str = "mean", normalize: bool = True) -> np.ndarray:
        """Pooled sequence embedding (build_pooling analog: mean/cls/last)."""
        ids = self.tokenizer.tokenize(text, add_special=True, parse_special=True)
        n = len(ids)
        padded = bucket_len(n)
        toks = np.zeros((self.batch_size, padded), np.int32)
        toks[0, :n] = ids
        kv = self._shard_cache(
            self.family.make_cache(self.cfg, self.batch_size, padded,
                                   self.kv_dtype))
        hidden, _ = self._forward(
            self.params, self.cfg, jnp.asarray(toks), kv,
            jnp.full((self.batch_size,), n, jnp.int32), return_hidden=True,
        )
        h = np.asarray(hidden[0, :n])  # (n, D)
        if pooling == "none":
            e = h  # per-token embeddings (reference LLAMA_POOLING_TYPE_NONE)
        elif pooling == "mean":
            e = h.mean(axis=0)
        elif pooling == "cls":
            e = h[0]
        else:  # "last"
            e = h[-1]
        if normalize:
            if e.ndim == 2:  # per-token rows normalize independently
                e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            else:
                e = e / max(np.linalg.norm(e), 1e-12)
        return e

    def decode_one(self, token_id: int) -> np.ndarray:
        """Advance one token; returns next-token logits (V,)."""
        toks = jnp.full((self.batch_size, 1), token_id, jnp.int32)
        t0 = time.perf_counter()
        logits, self.kv = self._forward(self.params, self.cfg, toks, self.kv, None)
        out = np.asarray(logits[0, 0])
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += 1
        return out

    # -- fused multi-token decode (device-side sampling loop) ----------------
    #
    # The reference's decode loop round-trips every token through the host
    # (llama_decode → llama_sampler_sample, tools/main/main.cpp) — cheap over
    # PCIe, ruinous over a network-tunneled TPU where each step ships a full
    # (V,) f32 logits row off-chip.  Here a lax.scan runs forward → on-device
    # sample → feed-back for ``n_steps`` tokens per dispatch; only int32 token
    # ids leave the device.  Greedy and the hot stochastic samplers
    # (temp/top-k/top-p/min-p/repeat-penalty) are exact on this path; the
    # feature-complete host chain (grammar, mirostat, DRY …) stays on
    # ``generate``.

    def _fused_loop_fn(self):
        if getattr(self, "_fused_loop", None) is None:
            from functools import partial as _partial

            fwd = self.family.forward

            @_partial(jax.jit, static_argnames=("cfg", "n_steps"),
                      donate_argnames=("kv",))
            def loop(params, cfg, tok0, kv, key, temp, top_k, top_p, min_p,
                     penalty_repeat, recent, n_steps):
                from ..ops.sampling_ops import sample_tokens

                def body(carry, key_i):
                    tok, kv, recent = carry
                    logits, kv = fwd(params, cfg, tok[:, None], kv, None)
                    nxt = sample_tokens(
                        logits[:, 0].astype(jnp.float32), key_i, temp, top_k,
                        top_p, min_p, penalty_repeat, recent,
                    )
                    recent = jnp.concatenate([recent[:, 1:], nxt[:, None]], axis=1)
                    return (nxt, kv, recent), nxt

                keys = jax.random.split(key, n_steps)
                (tok, kv, recent), toks = jax.lax.scan(body, (tok0, kv, recent), keys)
                return toks, kv

            self._fused_loop = loop
        return self._fused_loop

    def decode_fused(
        self,
        token_id: int,
        n_steps: int = 32,
        sampler: SamplerParams | None = None,
        recent_ids: list[int] | None = None,
        key=None,
    ) -> list[int]:
        """Feed ``token_id`` and decode ``n_steps`` tokens in ONE device
        dispatch (on-device sampling; see class comment above).  Advances the
        cache by ``n_steps``; returns the sampled token ids."""
        sp = sampler or SamplerParams(greedy=True)
        greedy = sp.greedy or sp.temp <= 0
        B = self.batch_size
        recent = np.full((B, 64), -1, np.int32)
        if recent_ids and sp.penalty_repeat != 1.0:
            tail = list(recent_ids)[-64:]
            recent[0, -len(tail):] = tail
        if key is None:
            seed = sp.seed if sp.seed != 0xFFFFFFFF else 0
            key = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        toks, self.kv = self._fused_loop_fn()(
            self.params, self.cfg,
            jnp.full((B,), token_id, jnp.int32), self.kv, key,
            jnp.full((B,), 0.0 if greedy else sp.temp, jnp.float32),
            jnp.full((B,), 0 if greedy else sp.top_k, jnp.int32),
            jnp.full((B,), 1.0 if greedy else sp.top_p, jnp.float32),
            jnp.full((B,), 0.0 if greedy else sp.min_p, jnp.float32),
            jnp.full((B,), sp.penalty_repeat, jnp.float32),
            jnp.asarray(recent), n_steps=n_steps,
        )
        out = [int(t) for t in np.asarray(toks[:, 0])]
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += n_steps
        return out

    def generate_fused(
        self,
        prompt: str,
        n_predict: int = 64,
        sampler: SamplerParams | None = None,
        stop_on_eog: bool = True,
        stream_cb=None,
        chunk: int = 32,
        abort_callback=None,  # checked between fused chunks
    ) -> tuple[str, list[int]]:
        """``generate`` on the fused decode path: one device dispatch per
        ``chunk`` tokens instead of per token.  EOG is checked on the host
        between chunks; surplus KV rows past the stop point are rewound."""
        sp = sampler or SamplerParams(greedy=True)
        ids = self.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
        if len(ids) + n_predict > self.max_seq:
            raise ValueError(
                f"prompt ({len(ids)}) + n_predict ({n_predict}) exceeds max_seq {self.max_seq}"
            )
        self.reset()
        logits = self.prefill(ids)
        chain = SamplerChain(sp, self.cfg.n_vocab)
        first = chain.sample(logits, ids)
        eog = self.tokenizer.vocab.special.eog_ids()
        out_ids: list[int] = [first]
        if stop_on_eog and first in eog:
            return "", []
        if stream_cb is not None:
            stream_cb(first)
        key = jax.random.PRNGKey(sp.seed if sp.seed != 0xFFFFFFFF else 0)
        while len(out_ids) < n_predict:
            if abort_callback is not None and abort_callback():
                break
            key, sub = jax.random.split(key)
            n_before = self.n_past
            toks = self.decode_fused(
                out_ids[-1], n_steps=chunk, sampler=sp,
                recent_ids=ids + out_ids, key=sub,
            )
            stop_j = None
            for j, t in enumerate(toks):
                if (stop_on_eog and t in eog) or len(out_ids) + j + 1 > n_predict:
                    stop_j = j
                    break
            if stop_j is not None:
                kept = toks[:stop_j]
                # feeds consumed: tok0 + kept — rewind the surplus KV rows
                self.set_n_past(n_before + 1 + len(kept))
                if stop_on_eog and stop_j < len(toks) and toks[stop_j] in eog:
                    out_ids.extend(kept)
                    if stream_cb is not None:
                        for t in kept:
                            stream_cb(t)
                    break
                toks = kept
            out_ids.extend(toks)
            if stream_cb is not None:
                for t in toks:
                    stream_cb(t)
        out_ids = out_ids[:n_predict]
        return self.tokenizer.detokenize(out_ids), out_ids

    # -- adapters (llama_adapter_lora / cvec analogs) -------------------------

    def apply_lora_file(self, path: str, scale: float = 1.0):
        """Attach a LoRA adapter GGUF (llama_set_adapter_lora analog)."""
        from .lora import LoraAdapter, apply_lora
        from .weights import unfuse_projections

        if any(k in self.params["layers"] for k in ("wqkv_fused", "wqk_fused", "wgateup_fused")):
            # adapters target per-projection names — split the fused mats
            self.params = dict(self.params)
            self.params["layers"] = unfuse_projections(self.params["layers"], self.cfg)
        self.params = apply_lora(self.params, LoraAdapter.from_gguf(path), scale)

    def clear_lora(self):
        from .lora import remove_lora

        self.params = remove_lora(self.params)

    def apply_control_vector_file(self, path: str, strength: float = 1.0,
                                  layer_start: int = 0, layer_end: int | None = None):
        from .lora import apply_control_vector, load_control_vector

        cvec = load_control_vector(path, self.cfg.n_embd, self.cfg.n_layers)
        self.params = apply_control_vector(self.params, cvec, strength, layer_start, layer_end)

    # -- context shift (StreamingLLM-style) ----------------------------------

    def context_shift(self, n_keep: int, n_discard: int):
        """Drop ``n_discard`` tokens after the first ``n_keep`` and slide the
        rest left, re-roping moved keys (reference: the llama-cli / server
        context-shift path, server.cpp:3049-3090 + build_graph_shift).

        Compiled once: n_keep/n_discard enter as traced scalars."""
        if self.family.name != "llama":
            raise ValueError("context shift requires an attention KV cache")
        if not hasattr(self, "_ctx_shift"):
            from functools import partial as _partial

            from ..models.llama import KVCache as _KV
            from ..ops.rope import rope_frequencies, rope_shift_rows

            inv_freq = jnp.asarray(rope_frequencies(self.cfg))
            interleaved = self.cfg.rope_interleaved

            from ..ops.kv_quant import QuantKV, quantize_rows, take_rows

            @_partial(jax.jit, donate_argnames=("k", "v"))
            def _shift(k, v, n_past, keep, discard):
                S = k.shape[2]
                rows = jnp.arange(S)
                src = jnp.where(rows < keep, rows, jnp.minimum(rows + discard, S - 1))
                moved = (rows[None, :] >= keep) & (rows[None, :] < (n_past - discard)[:, None])
                deltas = jnp.where(moved, -discard, 0).astype(jnp.int32)  # (B, S)
                if isinstance(k, QuantKV):
                    # q8 cache: V is a pure row permutation; K rows must be
                    # re-roped, so round-trip moved rows through f32 exactly
                    # like the reference's build_rope_shift graph does for
                    # quantized caches (llama-kv-cache-unified.cpp:1416).
                    v2 = take_rows(v, src, axis=2)
                    kq = take_rows(k, src, axis=2)
                    kf = kq.q.astype(jnp.float32) * kq.s
                    if self.cfg.pos_emb == "rope":
                        kf = rope_shift_rows(kf, deltas, inv_freq, interleaved)
                    return quantize_rows(kf), v2, n_past - discard
                k2 = jnp.take(k, src, axis=2)
                v2 = jnp.take(v, src, axis=2)
                if self.cfg.pos_emb == "rope":
                    k2 = rope_shift_rows(k2, deltas, inv_freq, interleaved)
                return k2, v2, n_past - discard

            self._ctx_shift = _shift
            self._KV = _KV
        k, v, n_past = self._ctx_shift(
            self.kv.k, self.kv.v, self.kv.n_past,
            jnp.asarray(n_keep, jnp.int32), jnp.asarray(n_discard, jnp.int32),
        )
        self.kv = self._KV(k, v, n_past)

    # -- self-extend / grouped attention (llama_memory_seq_div/add) ----------

    def _ensure_pos(self):
        from ..models.llama import KVCache as _KV

        if self.kv.pos is None:
            S = self.kv.max_seq
            rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (self.batch_size, S))
            # rows beyond the fill level get the +inf sentinel
            live = rows < self.kv.n_past[:, None]
            pos = jnp.where(live, rows, 1 << 30)
            self.kv = _KV(self.kv.k, self.kv.v, self.kv.n_past,
                          pos=pos, pos_next=self.kv.n_past)

    def seq_div(self, p0: int, p1: int, g: int):
        """Compress logical positions in [p0, p1) by factor ``g`` —
        self-extend / grouped attention (reference: llama_memory_seq_div,
        examples/passkey.cpp:171).  Cached keys are re-roped by their
        position delta; row contents stay put (duplicate positions allowed,
        like the reference's KV cells)."""
        if self.family.name != "llama" or self.cfg.pos_emb != "rope":
            raise ValueError("seq_div requires a rope attention cache")
        self._ensure_pos()
        from ..models.llama import KVCache as _KV
        from ..ops.rope import rope_frequencies, rope_shift_rows

        inv_freq = jnp.asarray(rope_frequencies(self.cfg))
        pos = self.kv.pos
        in_range = (pos >= p0) & (pos < p1)
        new_pos = jnp.where(in_range, p0 + (pos - p0) // g, pos).astype(jnp.int32)
        deltas = jnp.where(in_range, new_pos - pos, 0).astype(jnp.int32)
        k2 = rope_shift_rows(self.kv.k, deltas, inv_freq, self.cfg.rope_interleaved)
        live = jnp.arange(self.kv.max_seq)[None, :] < self.kv.n_past[:, None]
        pos_next = jnp.max(jnp.where(live, new_pos, -1), axis=1) + 1
        self.kv = _KV(k2, self.kv.v, self.kv.n_past, pos=new_pos, pos_next=pos_next)

    def seq_add(self, p0: int, p1: int, delta: int):
        """Shift logical positions in [p0, p1) by ``delta``
        (llama_memory_seq_add analog)."""
        if self.family.name != "llama" or self.cfg.pos_emb != "rope":
            raise ValueError("seq_add requires a rope attention cache")
        self._ensure_pos()
        from ..models.llama import KVCache as _KV
        from ..ops.rope import rope_frequencies, rope_shift_rows

        inv_freq = jnp.asarray(rope_frequencies(self.cfg))
        pos = self.kv.pos
        in_range = (pos >= p0) & (pos < p1)
        new_pos = jnp.where(in_range, pos + delta, pos).astype(jnp.int32)
        deltas = jnp.where(in_range, delta, 0).astype(jnp.int32)
        k2 = rope_shift_rows(self.kv.k, deltas, inv_freq, self.cfg.rope_interleaved)
        live = jnp.arange(self.kv.max_seq)[None, :] < self.kv.n_past[:, None]
        pos_next = jnp.max(jnp.where(live, new_pos, -1), axis=1) + 1
        self.kv = _KV(k2, self.kv.v, self.kv.n_past, pos=new_pos, pos_next=pos_next)

    # -- whole-context state files (llama_state_{save,load}_file analog) -----

    def save_state(self, path: str, token_ids: list[int]) -> int:
        from .state import save_state_file

        return save_state_file(path, self, token_ids)

    def load_state(self, path: str) -> list[int]:
        from .state import load_state_file

        return load_state_file(path, self)

    # -- high-level generation ---------------------------------------------

    def generate(
        self,
        prompt: str,
        n_predict: int = 64,
        sampler: SamplerParams | SamplerChain | None = None,
        stop_on_eog: bool = True,
        stream_cb=None,
        abort_callback=None,  # f()->bool; True stops decoding between
        # steps and returns the tokens so far (ggml_abort_callback
        # analog, llama.h:328-329 / :975)
    ) -> tuple[str, list[int]]:
        if isinstance(sampler, SamplerChain):
            chain = sampler
        else:
            chain = SamplerChain(sampler or SamplerParams(greedy=True), self.cfg.n_vocab)
        ids = self.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
        if len(ids) + n_predict > self.max_seq:
            raise ValueError(
                f"prompt ({len(ids)}) + n_predict ({n_predict}) exceeds max_seq {self.max_seq}"
            )
        self.reset()
        logits = self.prefill(ids)
        out_ids: list[int] = []
        all_ids = list(ids)
        eog = self.tokenizer.vocab.special.eog_ids()
        for _ in range(n_predict):
            if abort_callback is not None and abort_callback():
                break
            tok = chain.sample(logits, all_ids)
            chain.accept(tok, is_eog=tok in eog)
            if stop_on_eog and tok in eog:
                break
            out_ids.append(tok)
            all_ids.append(tok)
            if stream_cb is not None:
                stream_cb(tok)
            logits = self.decode_one(tok)
        return self.tokenizer.detokenize(out_ids), out_ids
