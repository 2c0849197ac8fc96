"""Headline benchmark — prints ONE JSON line.

Workload mirrors the reference's measured headline
(`inference_test_results.md:17-21`): Gemma-3-270M-dimensioned model,
Q8_0-lineage weights.  Numbers on the one line:

- headline: single-stream generation (tg128-style), baseline 214.28 tok/s
  on the MI50;
- ``pp512_tok_s``: 512-token prompt processing, baseline 82.05 tok/s
  (`inference_test_results.md:17-19`);
- ``batched_decode_tok_s``: aggregate 8-slot decode throughput
  (continuous-batching capacity; the reference has no direct analog —
  ratio is vs the single-stream baseline);
- ``decode_tok_s_8b_q4km`` / ``pp512_tok_s_8b`` / ``ttft_p50_ms_8b``:
  the BASELINE.json flagship shape — Llama-3-8B dims, Q4_K_M-style mix
  (Q4_K layers, Q6_K attn_v + lm_head), single chip.  Weights are
  device-synthesized random values in the exact QuantTensor layouts the
  GGUF loader produces (decode throughput is value-independent; no real
  8B checkpoint is available in this environment, so wikitext-2 ppl is
  covered by the quant-codec ppl-δ tests instead).
  ``vs_mi50_roofline_8b`` divides our decode rate by the MI50's
  zero-overhead roofline on the same byte budget (bytes/token ÷ 1 TB/s)
  — an upper bound no real MI50 run can reach.

Runs on whatever platform JAX picks (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

if os.environ.get("BENCH_PLATFORM"):  # CPU drives / CI; the axon plugin
    import jax  # ignores JAX_PLATFORMS, only the config flag sticks

    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def bench_8b() -> dict:
    """Flagship single-chip bench: Llama-3-8B dims at a Q4_K_M-style mix.

    The headline leg synthesizes exactly what ``Engine.from_gguf`` (no
    flags) produces for a real Q4_K_M checkpoint since round 5: Q4_K
    tensors stay nib4c-packed (chunk-local 4-bit, streamed directly by
    the megakernel), k-quant scales fold by default (int8 sub-planes ×
    f32 per-128 super-planes), the Q6_K attn_v no longer forces an int8
    qkv repack — fusion keeps q|k 4-bit (``wqk_fused``) and the kernel
    streams v through its own window (split-v path) — and the Q6_K
    lm_head folds too, riding the streamed GEMV kernel's native folded
    planes."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

    _enable_compile_cache()

    if os.environ.get("BENCH_8B_TINY"):  # smoke-test the leg's plumbing
        cfg = ModelConfig(
            arch="llama", n_layers=2, n_embd=256, n_heads=2, n_kv_heads=1,
            head_dim=128, n_ff=512, n_vocab=2048, n_ctx_train=2048,
            rope_base=500000.0,
        )
    else:
        cfg = ModelConfig(
            arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8,
            head_dim=128, n_ff=14336, n_vocab=128256, n_ctx_train=8192,
            rope_base=500000.0,
        )
    L, D, F, V = cfg.n_layers, cfg.n_embd, cfg.n_ff, cfg.n_vocab
    HqD, HkD = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
    keys = jax.random.split(jax.random.PRNGKey(0), 12)

    def synth_fold(key, K, N, fmt, g):
        # folded QuantTensor layouts (pack_gguf_tensor fold_scales=True):
        # values are random — decode speed is value-independent — which
        # skips host-side quantize and the multi-GB tunnel transfer.
        SB = 128
        ks = jax.random.split(key, 5)
        k_rows = K // 2 if fmt == "nib4c" else K
        rep = lambda a: jnp.repeat(a[None], L, 0)
        return qmm.QuantTensor(
            q=rep(jax.random.randint(ks[0], (k_rows, N), -128, 128,
                                     dtype=jnp.int8)),
            s=rep(jax.random.randint(ks[1], (K // g, N), 1, 64,
                                     dtype=jnp.int8)),
            m=rep(jax.random.randint(ks[2], (K // g, N), 0, 64,
                                     dtype=jnp.int8)),
            sd=rep(jax.random.uniform(ks[3], (K // SB, N), jnp.float32,
                                      2e-5, 6e-5)),
            md=rep(jax.random.uniform(ks[4], (K // SB, N), jnp.float32,
                                      0.0, 2e-5)),
            fmt=fmt, group=g, sgroup=SB, shape=(K, N))

    def synth_q6k(key, K, N, stack=False):
        # Q6_K folded layout (the from_gguf default): int8 values, int8
        # g16 sub-scales × f32 per-128 super-scales, no mins
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.randint(k1, (K, N), -32, 32, dtype=jnp.int8)
        s = jax.random.randint(k2, (K // 16, N), 1, 64, dtype=jnp.int8)
        sd = jax.random.uniform(k3, (K // 128, N), jnp.float32, 2e-5, 6e-5)
        if stack:
            q, s, sd = (jnp.repeat(a[None], L, 0) for a in (q, s, sd))
        return qmm.QuantTensor(q=q, s=s, m=None, fmt="int8", group=16,
                               sd=sd, md=None, sgroup=128, shape=(K, N))

    params = {
        "tok_emb": jax.random.normal(keys[7], (V, D), jnp.bfloat16) * 0.02,
        "out_norm": jnp.ones(D, jnp.float32),
        # _M mix: output at Q6_K; vocab padded to wide N tiles (pad_qt_n —
        # the same treatment the quantized loader applies to real heads)
        "lm_head": qmm.pad_qt_n(synth_q6k(keys[8], D, V)),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "ffn_norm": jnp.ones((L, D), jnp.float32),
            # Q4_K q|k fuse and stay nib4c; Q6_K v streams as its own
            # window (split-v) instead of forcing an int8 qkv repack
            "wqk_fused": synth_fold(keys[0], D, HqD + HkD, "nib4c", 32),
            "wv": synth_q6k(keys[1], D, HkD, stack=True),
            # Q4_K wo/gate/up/down stay nib4c-packed, scales folded
            "wo": synth_fold(keys[3], HqD, D, "nib4c", 32),
            "wgateup_fused": synth_fold(keys[4], D, 2 * F, "nib4c", 32),
            "w_down": synth_fold(keys[6], F, D, "nib4c", 32),
        },
    }

    def qt_bytes(qt):
        return (qt.q.nbytes + qt.s.nbytes
                + (qt.m.nbytes if qt.m is not None else 0)
                + (qt.sd.nbytes if qt.sd is not None else 0)
                + (qt.md.nbytes if qt.md is not None else 0))

    streamed = sum(
        qt_bytes(t) for t in jax.tree_util.tree_leaves(
            params["layers"], is_leaf=lambda x: isinstance(x, qmm.QuantTensor))
        if isinstance(t, qmm.QuantTensor)
    ) + qt_bytes(params["lm_head"])

    fwd = jax.jit(forward, static_argnames=("cfg",), donate_argnames=("kv",))
    kv = KVCache.create(cfg, batch=1, max_seq=1024, dtype=jnp.bfloat16)
    from llama_cpp_gfx906_tpu.ops.decode_stream import _stream_ok

    dispatch_default = bool(_stream_ok(params, cfg, kv, 1, 1))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("kv",))
    def decode_steps(params, tok, kv, n_steps):
        def body(carry, _):
            tok, kv = carry
            logits, kv = forward(params, cfg, tok, kv)
            nxt = logits[:, -1:].argmax(-1).astype(jnp.int32)
            return (nxt, kv), nxt[:, 0]

        (tok, kv), toks = jax.lax.scan(body, (tok, kv), None, length=n_steps)
        return toks, kv

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, V, (1, 16)), jnp.int32)
    logits, kv = fwd(params, cfg, prompt, kv)
    tok = jnp.reshape(logits[:, -1].argmax(-1).astype(jnp.int32), (1, 1))
    for _ in range(2):
        toks, kv = decode_steps(params, tok, kv, 16)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)

    n_decode = 64
    t0 = time.perf_counter()
    for _ in range(n_decode // 16):
        toks, kv = decode_steps(params, tok, kv, 16)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    tok_s = n_decode / dt
    step_s = dt / n_decode

    PP = 512
    pp_kv = KVCache.create(cfg, batch=1, max_seq=PP, dtype=jnp.bfloat16)
    pp_fwd = jax.jit(forward, static_argnames=("cfg",))
    prompts = [jnp.asarray(rng.integers(0, V, (1, PP)), jnp.int32) for _ in range(6)]
    logits, _ = pp_fwd(params, cfg, prompts[0], pp_kv)
    np.asarray(logits[0, -1, 0])
    times = []
    for p in prompts[1:]:
        t0 = time.perf_counter()
        logits, _ = pp_fwd(params, cfg, p, pp_kv)
        np.asarray(logits[0, -1, 0])
        times.append(time.perf_counter() - t0)
    pp_dt = sorted(times)[len(times) // 2]

    # DEFAULT-config numbers (round-3 item 3: no flags needed — what
    # Engine.from_gguf produces out of the box streams 4-bit natively)
    mi50_roofline = streamed / 1e12  # s/token at 1 TB/s, zero overhead
    out = {
        "decode_tok_s_8b_q4km": round(tok_s, 2),
        "pp512_tok_s_8b": round(PP / pp_dt, 2),
        "ttft_p50_ms_8b": round((pp_dt + step_s) * 1e3, 1),
        "streamed_gb_per_tok_8b": round(streamed / 1e9, 2),
        "eff_bw_gb_s_8b": round(streamed * tok_s / 1e9, 1),
        "vs_mi50_roofline_8b": round(tok_s * mi50_roofline, 3),
        "stream_dispatch_8b": dispatch_default,
    }
    print(json.dumps(out))  # partial line: default-config numbers survive
    # an ablation-leg failure (the parent keeps the LAST json line)

    # --- batched serving decode: B=4 slots through the SAME streamed
    #     megakernel (round-5: per-slot n_past/rope/KV streams, ONE shared
    #     weight stream per step — the llama-server -np 4 configuration) --
    try:
        B4 = 4
        kv = None  # free the single-stream cache before the B=4 alloc
        kv4 = KVCache.create(cfg, batch=B4, max_seq=1024, dtype=jnp.bfloat16)
        out["stream_dispatch_8b_b4"] = bool(_stream_ok(params, cfg, kv4, B4, 1))
        prompt4 = jnp.asarray(rng.integers(0, V, (B4, 16)), jnp.int32)
        logits4, kv4 = fwd(params, cfg, prompt4, kv4)
        tok4 = logits4[:, -1:].argmax(-1).astype(jnp.int32)
        for _ in range(2):
            toks4, kv4 = decode_steps(params, tok4, kv4, 16)
            tok4 = toks4[-1].reshape(B4, 1)
        np.asarray(tok4)
        t0 = time.perf_counter()
        for _ in range(n_decode // 16):
            toks4, kv4 = decode_steps(params, tok4, kv4, 16)
            tok4 = toks4[-1].reshape(B4, 1)
        np.asarray(tok4)
        dt4 = time.perf_counter() - t0
        out["batched_decode_tok_s_8b_b4"] = round(B4 * n_decode / dt4, 2)
        out["eff_bw_gb_s_8b_b4"] = round(streamed * (n_decode / dt4) / 1e9, 1)
        kv4 = logits4 = toks4 = None
        print(json.dumps(out))
    except Exception as e:
        out["bench_8b_b4_error"] = f"{type(e).__name__}: {e}"[:160]

    # --- ABLATION: lossless int8 repack of the nib4c tensors (the
    #     round-3 fast path: 2× the streamed/resident weight bytes for a
    #     higher per-byte DMA rate).  Kept as a comparison row so the
    #     native-4-bit win stays visible round over round. --------------
    try:
        layers_src = params["layers"]
        tok_emb, out_norm, lm_head = (params["tok_emb"], params["out_norm"],
                                      params["lm_head"])
        kv = logits = toks = params = None
        rp_layers = {}
        for name in list(layers_src):
            t = layers_src.pop(name)
            rp_layers[name] = (qmm.repack_nib4_to_int8(t)
                               if isinstance(t, qmm.QuantTensor) else t)
        params_rp = {"tok_emb": tok_emb, "out_norm": out_norm,
                     "lm_head": lm_head, "layers": rp_layers}
        streamed_rp = sum(
            qt_bytes(t) for t in jax.tree_util.tree_leaves(
                rp_layers, is_leaf=lambda x: isinstance(x, qmm.QuantTensor))
            if isinstance(t, qmm.QuantTensor)
        ) + qt_bytes(lm_head)
        rp_kv = KVCache.create(cfg, batch=1, max_seq=1024, dtype=jnp.bfloat16)
        out["stream_dispatch_8b_int8rp"] = bool(
            _stream_ok(params_rp, cfg, rp_kv, 1, 1))
        logits, rp_kv = fwd(params_rp, cfg, prompt, rp_kv)
        tok = jnp.reshape(logits[:, -1].argmax(-1).astype(jnp.int32), (1, 1))
        for _ in range(2):
            toks, rp_kv = decode_steps(params_rp, tok, rp_kv, 16)
            tok = toks[-1:].reshape(1, 1)
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(n_decode // 16):
            toks, rp_kv = decode_steps(params_rp, tok, rp_kv, 16)
            tok = toks[-1:].reshape(1, 1)
        np.asarray(tok)
        rp_tok_s = n_decode / (time.perf_counter() - t0)
        out["decode_tok_s_8b_q4km_int8rp"] = round(rp_tok_s, 2)
        out["streamed_gb_per_tok_8b_int8rp"] = round(streamed_rp / 1e9, 2)
        out["eff_bw_gb_s_8b_int8rp"] = round(streamed_rp * rp_tok_s / 1e9, 1)
    except Exception as e:
        out["bench_8b_int8rp_error"] = f"{type(e).__name__}: {e}"[:160]
    return out


def bench_moe() -> dict:
    """MoE decode leg (round-3 item 5): Qwen1.5-MoE-A2.7B dims — the
    mixtral-class routed-FFN serving shape that actually fits one 16 GB
    chip at 4-bit (14.3B total / 2.7B active; mixtral-8x7B is 26 GB at
    Q4 and qwen3moe-30B-A3B ~18.6 GB — both need the multi-chip TP/EP
    path).  Experts stay block-quantized stacked in HBM and decode
    streams only the top-k expert slices per token
    (ops/quant_matmul.routed_quant_matmul, the ggml_mul_mat_id analog —
    reference build_moe_ffn, src/llama-graph.cpp:776-1024); the
    always-active shared expert rides the dense nib4c kernels.
    Roofline accounting: active bytes = router + attn projections +
    shared expert + k expert FFN slices + lm_head.

    Since round 5 the whole decode token runs as ONE Pallas launch: the
    MoE megakernel (ops/decode_stream) computes the router and top-k on
    the VPU, parks the expert ids in SMEM and DMAs just those expert
    slices — the per-layer launch overhead that capped this leg at
    ~33 tok/s is gone.  Weights synthesize what the loader produces for
    a real Q4_K_M qwen2moe file: plain (unfolded) nib4c dense
    projections — the 5632-wide shared expert can't keep folded
    super-scale DMAs 8-aligned, so the model-wide fold switch stays off
    (quant_matmul._fold_streams) — and nib4c experts padded to the
    512-lane chunk grid (1408 → 1536, pad slices dequant to zero)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

    _enable_compile_cache()
    tiny = bool(os.environ.get("BENCH_8B_TINY"))
    cfg = ModelConfig(
        arch="llama", n_layers=2 if tiny else 24, n_embd=2048, n_heads=16,
        n_kv_heads=16, head_dim=128, n_ff=512 if tiny else 5632,
        n_vocab=4096 if tiny else 151936,
        n_ctx_train=8192, rope_base=1000000.0,
        n_experts=8 if tiny else 60, n_experts_used=2 if tiny else 4,
        expert_ff=256 if tiny else 1408, expert_weights_norm=False,
    )
    L, D, EF, V = cfg.n_layers, cfg.n_embd, cfg.expert_ff, cfg.n_vocab
    E, TOPK = cfg.n_experts, cfg.n_experts_used
    SHF = cfg.n_ff  # shared_expert_intermediate_size
    HqD, HkD = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
    keys = jax.random.split(jax.random.PRNGKey(1), 16)

    def synth_n4(key, K, N, g=32):
        # dense projections: plain nib4c — the loader's model-wide fold
        # switch is OFF for this model (shexp K=5632 can't stream folded)
        ks = jax.random.split(key, 3)
        rep = lambda a: jnp.repeat(a[None], L, 0)
        return qmm.QuantTensor(
            q=rep(jax.random.randint(ks[0], (K // 2, N), -128, 128,
                                     dtype=jnp.int8)),
            s=rep(jax.random.uniform(ks[1], (K // g, N), jnp.float32,
                                     1e-3, 2e-3)),
            m=rep(jax.random.uniform(ks[2], (K // g, N), jnp.float32,
                                     0.0, 1e-3)),
            fmt="nib4c", group=g, shape=(K, N))

    EFp = -(-EF // 512) * 512 if not tiny else EF  # loader pad (1408→1536)

    def synth_experts(key, K, N, g=32):
        # stacked experts in the pack_gguf_experts nib4c layout:
        # q (E, K/2, N) chunk-local packed, plain f32 scales + mins
        k1, k2, k3 = jax.random.split(key, 3)
        q1 = jax.random.randint(k1, (E, K // 2, N), -128, 128, dtype=jnp.int8)
        s1 = jax.random.uniform(k2, (E, K // g, N), jnp.float32, 1e-3, 2e-3)
        m1 = jax.random.uniform(k3, (E, K // g, N), jnp.float32, 0.0, 1e-3)
        rep = lambda a: jnp.repeat(a[None], L, 0)
        return qmm.QuantTensor(q=rep(q1), s=rep(s1), m=rep(m1), fmt="nib4c",
                               group=g, shape=(K, N))

    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32),
        "ffn_norm": jnp.ones((L, D), jnp.float32),
        "wqkv_fused": synth_n4(keys[0], D, HqD + 2 * HkD),
        "wo": synth_n4(keys[1], HqD, D),
        "moe_gate_inp": jax.random.normal(keys[2], (L, D, E),
                                          jnp.float32) * 0.02,
        "moe_gate": synth_experts(keys[3], D, EFp),
        "moe_up": synth_experts(keys[4], D, EFp),
        "moe_down": synth_experts(keys[5], EFp, D),
        # qwen2moe shared expert: always-active dense FFN + sigmoid gate
        "shexp_gateup_fused": synth_n4(keys[8], D, 2 * SHF),
        "shexp_down": synth_n4(keys[10], SHF, D),
        "shexp_gate_inp": jax.random.normal(keys[11], (L, D, 1),
                                            jnp.float32) * 0.02,
    }
    def synth_q6k(key, K, N):
        k1, k2 = jax.random.split(key)
        return qmm.QuantTensor(
            q=jax.random.randint(k1, (K, N), -32, 32, dtype=jnp.int8),
            s=jax.random.uniform(k2, (K // 16, N), jnp.float32, 1e-3, 2e-3),
            m=None, fmt="int8", group=16, shape=(K, N))

    params = {
        "tok_emb": jax.random.normal(keys[6], (V, D), jnp.bfloat16) * 0.02,
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.pad_qt_n(synth_q6k(keys[7], D, V)),
        "layers": layers,
    }

    def qt_bytes(qt):
        return (qt.q.nbytes + qt.s.nbytes
                + (qt.m.nbytes if qt.m is not None else 0)
                + (qt.sd.nbytes if qt.sd is not None else 0)
                + (qt.md.nbytes if qt.md is not None else 0))

    # active bytes per decode token: dense attn + router + shared expert
    # + k-of-E routed expert slices
    active = (qt_bytes(layers["wqkv_fused"]) + qt_bytes(layers["wo"])
              + layers["moe_gate_inp"].nbytes
              + layers["shexp_gate_inp"].nbytes
              + sum(qt_bytes(layers[n])
                    for n in ("shexp_gateup_fused", "shexp_down"))
              + sum(qt_bytes(layers[n]) * TOPK // E
                    for n in ("moe_gate", "moe_up", "moe_down"))
              + qt_bytes(params["lm_head"]))

    fwd = jax.jit(forward, static_argnames=("cfg",), donate_argnames=("kv",))
    kv = KVCache.create(cfg, batch=1, max_seq=1024, dtype=jnp.bfloat16)
    from llama_cpp_gfx906_tpu.ops.decode_stream import _stream_ok

    moe_dispatch = bool(_stream_ok(params, cfg, kv, 1, 1))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("kv",))
    def decode_steps(params, tok, kv, n_steps):
        def body(carry, _):
            tok, kv = carry
            logits, kv = forward(params, cfg, tok, kv)
            nxt = logits[:, -1:].argmax(-1).astype(jnp.int32)
            return (nxt, kv), nxt[:, 0]

        (tok, kv), toks = jax.lax.scan(body, (tok, kv), None, length=n_steps)
        return toks, kv

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, V, (1, 16)), jnp.int32)
    logits, kv = fwd(params, cfg, prompt, kv)
    tok = jnp.reshape(logits[:, -1].argmax(-1).astype(jnp.int32), (1, 1))
    for _ in range(2):
        toks, kv = decode_steps(params, tok, kv, 16)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)
    n_decode = 64
    t0 = time.perf_counter()
    for _ in range(n_decode // 16):
        toks, kv = decode_steps(params, tok, kv, 16)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    tok_s = n_decode / dt

    PP = 512
    pp_kv = KVCache.create(cfg, batch=1, max_seq=PP, dtype=jnp.bfloat16)
    pp_fwd = jax.jit(forward, static_argnames=("cfg",))
    prompts = [jnp.asarray(rng.integers(0, V, (1, PP)), jnp.int32)
               for _ in range(4)]
    logits, _ = pp_fwd(params, cfg, prompts[0], pp_kv)
    np.asarray(logits[0, -1, 0])
    times = []
    for p in prompts[1:]:
        t0 = time.perf_counter()
        logits, _ = pp_fwd(params, cfg, p, pp_kv)
        np.asarray(logits[0, -1, 0])
        times.append(time.perf_counter() - t0)
    pp_dt = sorted(times)[len(times) // 2]

    return {
        "decode_tok_s_moe_a27b_shape": round(tok_s, 2),
        "pp512_tok_s_moe_a27b": round(PP / pp_dt, 2),
        "active_gb_per_tok_moe": round(active / 1e9, 3),
        "eff_bw_gb_s_moe": round(active * tok_s / 1e9, 1),
        # MI50 roofline on the same active-byte budget at 1 TB/s
        "vs_mi50_roofline_moe": round(tok_s * active / 1e12, 3),
        "moe_megakernel_dispatch": moe_dispatch,
    }


def bench_serve() -> dict:
    """Serving-load leg (round-3 item 7): spawn llama-server on the real
    chip with a synthetic 8B Q4_K_M GGUF (scripts/make_synth_gguf.py —
    decode throughput is value-independent) and fire concurrent streamed
    clients through scripts/server_bench.py.  Reports aggregate gen tok/s
    and TTFT p50/p95 — the reference's scripts/server-bench.py metrics."""
    import subprocess
    import sys as _sys

    tiny = bool(os.environ.get("BENCH_8B_TINY"))
    preset = "tiny" if tiny else "8b"
    model = f"/tmp/bench_synth_{preset}.gguf"
    if not os.path.exists(model):
        subprocess.run(
            [_sys.executable, os.path.join("scripts", "make_synth_gguf.py"),
             model, "--preset", preset],
            check=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    cmd = [_sys.executable, os.path.join("scripts", "server_bench.py"),
           "-m", model, "--spawn", "--port", "8871",
           "--n-prompts", "16", "--parallel", "4", "--n-predict", "64",
           "--prompt-length-min", "32", "--prompt-length-max", "256",
           "--startup-timeout", "1500"]
    if os.environ.get("BENCH_PLATFORM"):
        cmd += ["--platform", os.environ["BENCH_PLATFORM"]]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=2400,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
    lines = [ln for ln in (r.stdout or "").splitlines()
             if ln.startswith("{")]
    if not lines:
        return {"bench_serve_error": (r.stderr or "no output")[-200:]}
    got = json.loads(lines[-1])
    return {
        "serve_gen_tok_s_8b": got.get("gen_tok_s"),
        "serve_ttft_p50_ms_8b": got.get("ttft_p50_ms"),
        "serve_ttft_p95_ms_8b": got.get("ttft_p95_ms"),
        "serve_parallel": got.get("parallel"),
        "serve_n_prompts": got.get("n_prompts"),
    }


def _bench_leg_subprocess(leg: str, budget_s: float) -> dict:
    """Run one big-model leg isolated in a child process with a bounded
    budget.

    Big legs peak near the chip's 16 GB HBM and the allocator does not
    return the chip to a clean state in-process — the child's exit frees
    its HBM so the legs can run back to back.  A wedged child is killed
    at ``budget_s`` so the lines already measured still print.
    """
    import subprocess
    import sys as _sys

    def last_line(text):
        lines = [ln for ln in (text or "").splitlines() if ln.startswith("{")]
        return json.loads(lines[-1]) if lines else None

    try:
        r = subprocess.run(
            [_sys.executable, __file__, f"--leg-{leg}"],
            capture_output=True, text=True, timeout=budget_s,
        )
        return last_line(r.stdout) or {
            f"bench_{leg}_error": (r.stderr[-200:] or "no output")}
    except subprocess.TimeoutExpired as e:
        # legs print partial lines as sections finish — keep what's in hand
        got = last_line(e.stdout if isinstance(e.stdout, str)
                        else (e.stdout or b"").decode("utf-8", "replace"))
        got = got or {}
        got[f"bench_{leg}_error"] = f"TimeoutExpired after {budget_s:.0f}s"
        return got
    except Exception as e:  # keep the headline even if a big leg dies
        return {f"bench_{leg}_error": f"{type(e).__name__}: {e}"[:200]}


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache — repeat driver runs skip the
    2-5 min/kernel remote compiles on the tunneled chip."""
    import jax

    try:
        if jax.default_backend() != "tpu":
            return  # CPU compiles are cheap; mixed-topology cache reads
            # have segfaulted (see runtime.engine.enable_persistent_...)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort


def _device_guard() -> None:
    """Fail FAST with a parseable line if the accelerator is unreachable.

    ``jax.devices()`` on a wedged axon tunnel blocks forever; probing in a
    killable child turns an unbounded hang into an error record.  Skipped
    on forced-CPU runs."""
    import subprocess
    import sys as _sys

    if os.environ.get("BENCH_PLATFORM") == "cpu":
        return
    budget = float(os.environ.get("BENCH_DEVICE_PROBE_S", "600"))
    try:
        r = subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=budget,
        )
        if r.returncode == 0:
            return
        err = (r.stderr or b"").decode("utf-8", "replace")[-160:]
    except subprocess.TimeoutExpired:
        err = f"device init unresponsive after {budget:.0f}s"
    print(json.dumps({
        "metric": "decode_tok_s_gemma3_270m_shape_q8_0_single_stream",
        "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
        "bench_error": f"accelerator unavailable: {err}",
    }))
    raise SystemExit(0)


def main() -> None:
    _device_guard()
    import jax
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward

    from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

    _enable_compile_cache()
    t_start = time.perf_counter()

    # Gemma-3-270M dimensions (run as llama-style arch for now)
    cfg = ModelConfig(
        arch="llama",
        n_layers=18,
        n_embd=640,
        n_heads=4,
        n_kv_heads=1,
        head_dim=256,
        n_ff=2048,
        n_vocab=262144,
        n_ctx_train=2048,
    )
    rng = np.random.default_rng(0)
    L, D, F = cfg.n_layers, cfg.n_embd, cfg.n_ff
    HqD, HkD, V = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim, cfg.n_vocab
    QTYPE = GGMLType.Q8_0  # matches the reference's headline workload

    def qstack(K, N):
        # one random weight quantized and replicated across layers (decode
        # speed is value-independent; this keeps host-side setup fast)
        w = rng.standard_normal((N, K), dtype=np.float32) * 0.02
        qt = qmm.pack_gguf_tensor(quantize(w, QTYPE), QTYPE, (N, K))
        return qmm.QuantTensor(
            q=jnp.stack([qt.q] * L),
            s=jnp.stack([qt.s] * L),
            m=jnp.stack([qt.m] * L) if qt.m is not None else None,
            fmt=qt.fmt,
            group=qt.group,
            shape=qt.shape,
        )

    from llama_cpp_gfx906_tpu.runtime.weights import fuse_projections

    w_head = rng.standard_normal((V, D), dtype=np.float32) * 0.02
    params = {
        "tok_emb": jnp.asarray(w_head * 0.1, jnp.bfloat16),
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(quantize(w_head, QTYPE), QTYPE, (V, D)),
        "layers": fuse_projections({
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "ffn_norm": jnp.ones((L, D), jnp.float32),
            "wq": qstack(D, HqD),
            "wk": qstack(D, HkD),
            "wv": qstack(D, HkD),
            "wo": qstack(HqD, D),
            "w_gate": qstack(D, F),
            "w_up": qstack(D, F),
            "w_down": qstack(F, D),
        }),
    }

    from functools import partial

    fwd = jax.jit(forward, static_argnames=("cfg",), donate_argnames=("kv",))
    kv = KVCache.create(cfg, batch=1, max_seq=512, dtype=jnp.bfloat16)

    # TPU-native decode: greedy feedback stays on device, 32 steps fused
    # into one scan program per dispatch (the reference's CPU sampling would
    # serialize every token on the tunnel RTT here).
    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("kv",))
    def decode_steps(params, tok, kv, n_steps):
        def body(carry, _):
            tok, kv = carry
            logits, kv = forward(params, cfg, tok, kv)
            nxt = logits[:, -1:].argmax(-1).astype(jnp.int32)
            return (nxt, kv), nxt[:, 0]

        (tok, kv), toks = jax.lax.scan(body, (tok, kv), None, length=n_steps)
        return toks, kv

    prompt = jnp.asarray(rng.integers(0, V, (1, 16)), jnp.int32)
    logits, kv = fwd(params, cfg, prompt, kv)
    tok = jnp.reshape(logits[:, -1].argmax(-1).astype(jnp.int32), (1, 1))

    # warmup: compile + once more for the donated-buffer steady state.
    # 64-step device loops: the tunnel costs tens of ms per dispatch, so
    # the loop length sets how much of it leaks into the tok/s number
    for _ in range(2):
        toks, kv = decode_steps(params, tok, kv, 64)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)  # hard sync (block_until_ready is unreliable over axon)

    n_decode = 256
    t0 = time.perf_counter()
    for _ in range(n_decode // 64):
        toks, kv = decode_steps(params, tok, kv, 64)
        tok = toks[-1:].reshape(1, 1)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    tok_s = n_decode / dt

    # -- pp512: prompt processing (fresh prompts per rep defeat the axon
    #    runtime's whole-call memoization) --------------------------------
    PP = 512
    pp_kv = KVCache.create(cfg, batch=1, max_seq=PP, dtype=jnp.bfloat16)
    pp_fwd = jax.jit(forward, static_argnames=("cfg",))
    prompts = [jnp.asarray(rng.integers(0, V, (1, PP)), jnp.int32) for _ in range(7)]
    logits, _ = pp_fwd(params, cfg, prompts[0], pp_kv)  # compile
    np.asarray(logits[0, -1, 0])
    times = []
    for p in prompts[1:]:
        t0 = time.perf_counter()
        logits, _ = pp_fwd(params, cfg, p, pp_kv)
        np.asarray(logits[0, -1, 0])
        times.append(time.perf_counter() - t0)
    pp_dt = sorted(times)[len(times) // 2]
    pp_tok_s = PP / pp_dt

    # -- batched decode: 8-slot aggregate throughput ----------------------
    NB = 8
    bkv = KVCache.create(cfg, batch=NB, max_seq=512, dtype=jnp.bfloat16)
    bprompt = jnp.asarray(rng.integers(0, V, (NB, 16)), jnp.int32)
    blogits, bkv = fwd(params, cfg, bprompt, bkv)
    btok = blogits[:, -1:].argmax(-1).astype(jnp.int32)
    for _ in range(2):
        btoks, bkv = decode_steps(params, btok, bkv, 32)
        btok = btoks[-1].reshape(NB, 1)
    np.asarray(btok)
    t0 = time.perf_counter()
    for _ in range(n_decode // 32):
        btoks, bkv = decode_steps(params, btok, bkv, 32)
        btok = btoks[-1].reshape(NB, 1)
    np.asarray(btok)
    bdt = time.perf_counter() - t0
    batched_tok_s = NB * n_decode / bdt

    # big-model legs LAST (headline numbers above are already in hand)
    # with the remaining wall budget, capped at 40 min of compiles +
    # measurement (BENCH_8B_BUDGET_S overrides; 0 skips them entirely)
    cap = float(os.environ.get("BENCH_8B_BUDGET_S", "2400"))
    if cap > 0:
        left = lambda: max(min(300.0, cap),
                           cap - (time.perf_counter() - t_start))
        extra_8b = _bench_leg_subprocess("8b", budget_s=left())
        extra_8b.update(_bench_leg_subprocess("moe", budget_s=left()))
        extra_8b.update(_bench_leg_subprocess("serve", budget_s=left()))
    else:
        extra_8b = {"bench_8b_skipped": True}

    baseline = 214.28  # MI50 gemma-3-270M Q8_0 generation
    pp_baseline = 82.05  # MI50 gemma-3-270M Q8_0 prompt processing
    out = {
        "metric": "decode_tok_s_gemma3_270m_shape_q8_0_single_stream",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / baseline, 3),
        "pp512_tok_s": round(pp_tok_s, 2),
        "pp512_vs_baseline": round(pp_tok_s / pp_baseline, 3),
        "batched_decode_tok_s": round(batched_tok_s, 2),
        "batched_decode_vs_baseline": round(batched_tok_s / baseline, 3),
    }
    out.update(extra_8b)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys as _sys

    if "--leg-8b" in _sys.argv:
        try:
            print(json.dumps(bench_8b()))
        except Exception as e:
            print(json.dumps(
                {"bench_8b_error": f"{type(e).__name__}: {e}"[:200]}))
    elif "--leg-moe" in _sys.argv:
        try:
            print(json.dumps(bench_moe()))
        except Exception as e:
            print(json.dumps(
                {"bench_moe_error": f"{type(e).__name__}: {e}"[:200]}))
    elif "--leg-serve" in _sys.argv:
        try:
            print(json.dumps(bench_serve()))
        except Exception as e:
            print(json.dumps(
                {"bench_serve_error": f"{type(e).__name__}: {e}"[:200]}))
    else:
        main()
