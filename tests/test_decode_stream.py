"""Streamed-weights fused decode (ops/decode_stream.py) vs the scanned
jnp path, in interpreter mode on CPU.

The streamed kernel targets 8B-class layers whose weights can't sit in
VMEM; the test shapes are scaled down but keep every structural property
(K/N divisible by the chunk grid, multiple K-chunks per projection so the
double-buffered DMA schedule actually cycles)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize
from llama_cpp_gfx906_tpu.models.config import ModelConfig
from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm
from llama_cpp_gfx906_tpu.ops.decode_stream import (
    _stream_ok,
    fused_decode_step_streamed,
)
from llama_cpp_gfx906_tpu.runtime.weights import fuse_projections

# K dims (D=256, HQ*DH=256, F=512) give 1-2 K-chunks at TK=256 and
# several N-chunks at TN=128/256 — the full streamed schedule runs
L, D, HQ, HKV, DH, F, V, S = 3, 256, 2, 1, 128, 512, 64, 256


def make_cfg(**kw):
    return ModelConfig(
        arch="llama", n_layers=L, n_embd=D, n_heads=HQ, n_kv_heads=HKV,
        head_dim=DH, n_ff=F, n_vocab=V, n_ctx_train=S, **kw,
    )


def qstack(rng, K, N):
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
    qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q8_0), GGMLType.Q8_0,
                              (N, K))
    return qmm.QuantTensor(
        q=jnp.stack([qt.q] * L), s=jnp.stack([qt.s] * L), m=None,
        fmt=qt.fmt, group=qt.group, shape=qt.shape,
    )


def make_params(rng):
    head = rng.standard_normal((V, D), dtype=np.float32) * 0.05
    return {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D)) * 0.1, jnp.bfloat16),
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(quantize(head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D)),
        "layers": fuse_projections({
            "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
            "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
            "wq": qstack(rng, D, HQ * DH),
            "wk": qstack(rng, D, HKV * DH),
            "wv": qstack(rng, D, HKV * DH),
            "wo": qstack(rng, HQ * DH, D),
            "w_gate": qstack(rng, D, F),
            "w_up": qstack(rng, D, F),
            "w_down": qstack(rng, F, D),
        }),
    }


def lockstep_check(cfg, params, n_prompt, steps=3, seed=3, kv_tol=3e-2,
                   logit_tol=2e-2):
    rng = np.random.default_rng(seed)
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert _stream_ok(params, cfg, kv, 1, 1)

    prompt = jnp.asarray([list(rng.integers(0, V, n_prompt))], jnp.int32)
    _, kv = forward(params, cfg, prompt, kv)
    kv_f = KVCache(k=kv.k, v=kv.v, n_past=kv.n_past)

    from llama_cpp_gfx906_tpu.ops.norms import rms_norm
    from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

    tok = jnp.asarray([[5]], jnp.int32)
    for _ in range(steps):
        logits_ref, kv = forward(params, cfg, tok, kv)
        x = params["tok_emb"][tok]
        x2, k_new, v_new = fused_decode_step_streamed(params, cfg, x, kv_f,
                                                      interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)
        hid = rms_norm(x2, params["out_norm"], cfg.rms_eps)
        logits = linear(hid, params["lm_head"]).astype(jnp.float32)
        lg = np.asarray(logits[0, 0])
        lr = np.asarray(logits_ref[0, 0])
        np.testing.assert_allclose(lg, lr, rtol=logit_tol, atol=logit_tol)
        # quantized rounding walks differ slightly between the paths; the
        # reference argmax must stay within rounding distance of the top
        assert lg[int(np.argmax(lr))] >= lg.max() - 0.05
        np.testing.assert_allclose(
            np.asarray(kv_f.k, np.float32), np.asarray(kv.k, np.float32),
            rtol=kv_tol, atol=kv_tol,
        )
        np.testing.assert_allclose(
            np.asarray(kv_f.v, np.float32), np.asarray(kv.v, np.float32),
            rtol=kv_tol, atol=kv_tol,
        )
        tok = jnp.asarray([[int(np.argmax(logits_ref))]], jnp.int32)


def lockstep_check_batched(cfg, params, lens, steps=3, seed=7, kv_tol=3e-2,
                           logit_tol=2e-2):
    """B>1 slots with ragged n_past: the kernel streams the weights ONCE
    per step while every slot's KV prefix streams and inserts per-slot —
    must match the scanned path row-for-row."""
    rng = np.random.default_rng(seed)
    B = len(lens)
    kv = KVCache.create(cfg, batch=B, max_seq=S, dtype=jnp.bfloat16)
    assert _stream_ok(params, cfg, kv, B, 1)

    tmax = max(lens)
    toks = np.zeros((B, tmax), np.int32)
    for b, ln in enumerate(lens):
        toks[b, :ln] = rng.integers(0, V, ln)
    _, kv = forward(params, cfg, jnp.asarray(toks), kv,
                    n_tokens=jnp.asarray(lens, jnp.int32))
    kv_f = KVCache(k=kv.k, v=kv.v, n_past=kv.n_past)

    from llama_cpp_gfx906_tpu.ops.norms import rms_norm
    from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

    tok = jnp.asarray(rng.integers(0, V, (B, 1)), jnp.int32)
    for _ in range(steps):
        logits_ref, kv = forward(params, cfg, tok, kv)
        x = params["tok_emb"][tok]
        x2, k_new, v_new = fused_decode_step_streamed(params, cfg, x, kv_f,
                                                      interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)
        hid = rms_norm(x2, params["out_norm"], cfg.rms_eps)
        logits = linear(hid, params["lm_head"]).astype(jnp.float32)
        lg = np.asarray(logits[:, 0])
        lr = np.asarray(logits_ref[:, 0])
        np.testing.assert_allclose(lg, lr, rtol=logit_tol, atol=logit_tol)
        for b in range(B):
            assert lg[b, int(np.argmax(lr[b]))] >= lg[b].max() - 0.05
        np.testing.assert_allclose(
            np.asarray(kv_f.k, np.float32), np.asarray(kv.k, np.float32),
            rtol=kv_tol, atol=kv_tol,
        )
        np.testing.assert_allclose(
            np.asarray(kv_f.v, np.float32), np.asarray(kv.v, np.float32),
            rtol=kv_tol, atol=kv_tol,
        )
        tok = jnp.asarray(np.argmax(lr, axis=-1).reshape(B, 1), jnp.int32)


@pytest.mark.parametrize("interleaved,n_prompt", [
    (True, 7),     # self-term + 1 KV chunk
    (False, 7),
    (True, 135),   # crosses a KV chunk boundary
])
def test_streamed_matches_scan(interleaved, n_prompt):
    rng = np.random.default_rng(3)
    cfg = make_cfg(rope_interleaved=interleaved)
    lockstep_check(cfg, make_params(rng), n_prompt)


def test_streamed_gemma3_features():
    rng = np.random.default_rng(9)
    cfg = make_cfg(
        rope_interleaved=True, qk_norm=True, post_attn_norm=True,
        post_ffn_norm=True, sliding_window=16, swa_pattern=2,
        rope_local_base=10000.0, rope_base=1000000.0,
    )
    params = make_params(rng)
    layers = dict(params["layers"])
    layers["q_norm"] = jnp.asarray(
        1 + rng.standard_normal((L, DH)) * 0.05, jnp.float32)
    layers["k_norm"] = jnp.asarray(
        1 + rng.standard_normal((L, DH)) * 0.05, jnp.float32)
    layers["post_attn_norm"] = jnp.asarray(
        1 + rng.standard_normal((L, D)) * 0.05, jnp.float32)
    layers["post_ffn_norm"] = jnp.asarray(
        1 + rng.standard_normal((L, D)) * 0.05, jnp.float32)
    params = dict(params, layers=layers)
    lockstep_check(cfg, params, 40, seed=9)


def test_streamed_mixed_groups():
    """Q6_K-lineage tensors carry group=16 scales — the Q4_K_M mix has
    both groups live in one stack (attn_v/out at Q6_K)."""
    rng = np.random.default_rng(5)
    params = make_params(rng)
    layers = dict(params["layers"])
    qt = layers["w_down"]
    # re-pack w_down at group 16 (same values, finer scales)
    K, N = qt.shape
    q = np.asarray(qt.q[0], np.int8)
    s32 = np.asarray(qt.s[0])
    s16 = np.repeat(s32, 2, axis=0)
    layers["w_down"] = qmm.QuantTensor(
        q=jnp.stack([jnp.asarray(q)] * L), s=jnp.stack([jnp.asarray(s16)] * L),
        m=None, fmt="int8", group=16, shape=(K, N))
    params = dict(params, layers=layers)
    lockstep_check(make_cfg(), params, 7, seed=5)


def test_stream_gate():
    rng = np.random.default_rng(4)
    params = make_params(rng)
    cfg = make_cfg()
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert _stream_ok(params, cfg, kv, 1, 1)
    assert not _stream_ok(params, cfg, kv, 2, 1)  # single-stream only
    assert not _stream_ok(params, cfg, kv, 1, 2)
    assert not _stream_ok(params, make_cfg(alibi=True), kv, 1, 1)
    qkv = KVCache.create(cfg, batch=1, max_seq=S, dtype="q8")
    assert not _stream_ok(params, cfg, qkv, 1, 1)
    # K below the minimum chunk cap is rejected (no valid TK)
    tiny = dict(params["layers"])
    t = tiny["wqkv_fused"]
    tiny["wqkv_fused"] = qmm.QuantTensor(
        q=t.q[:, :128], s=t.s[:, :4], m=None, fmt="int8", group=32,
        shape=(128, t.shape[1]))
    tiny_cfg = ModelConfig(
        arch="llama", n_layers=L, n_embd=128, n_heads=HQ, n_kv_heads=HKV,
        head_dim=DH, n_ff=F, n_vocab=V, n_ctx_train=S)
    assert not _stream_ok(dict(params, layers=tiny), tiny_cfg, kv, 1, 1)


def qstack_affine(rng, K, N, g=32):
    """Q4_K-lineage layout after repack_nib4_to_int8: int8 values 0..15
    with per-group scales AND mins (dequant = q*s - m)."""
    q = rng.integers(0, 16, (K, N)).astype(np.int8)
    s = rng.uniform(0.002, 0.006, (K // g, N)).astype(np.float32)
    m = rng.uniform(0.0, 0.05, (K // g, N)).astype(np.float32)
    return qmm.QuantTensor(
        q=jnp.stack([jnp.asarray(q)] * L), s=jnp.stack([jnp.asarray(s)] * L),
        m=jnp.stack([jnp.asarray(m)] * L), fmt="int8", group=g, shape=(K, N))


def test_streamed_affine_mins():
    """Mins stream through the kernel: the repacked-Q4_K_M config (q/k
    affine g32, v symmetric g16 — fusion harmonizes groups and zero-fills
    the missing min plane) must match the scanned linear() path."""
    rng = np.random.default_rng(11)
    params = make_params(rng)
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
        "wq": qstack_affine(rng, D, HQ * DH),
        "wk": qstack_affine(rng, D, HKV * DH),
        "wv": qstack(rng, D, HKV * DH),     # symmetric group-32... see below
        "wo": qstack(rng, HQ * DH, D),
        "w_gate": qstack_affine(rng, D, F),
        "w_up": qstack_affine(rng, D, F),
        "w_down": qstack_affine(rng, F, D),
    }
    # repack wv to group 16 so the qkv fusion exercises harmonization
    qt = layers["wv"]
    s16 = jnp.repeat(qt.s, 2, axis=-2)
    layers["wv"] = qmm.QuantTensor(q=qt.q, s=s16, m=None, fmt="int8",
                                   group=16, shape=qt.shape)
    fused = fuse_projections(layers)
    assert "wqkv_fused" in fused, "group harmonization must allow fusion"
    assert fused["wqkv_fused"].group == 16
    assert fused["wqkv_fused"].m is not None
    params = dict(params, layers=fused)
    lockstep_check(make_cfg(), params, 7, seed=11)


def qstack_folded(rng, K, N, g=32, with_m=True, SB=128):
    """Folded k-quant layout (pack_gguf_tensor fold_scales=True after an
    int8 repack): int8 sub-scales + per-256 f32 super-scale planes."""
    q = rng.integers(0, 16, (K, N)).astype(np.int8)
    s8 = rng.integers(1, 64, (K // g, N)).astype(np.int8)
    sd = rng.uniform(1e-4, 4e-4, (K // SB, N)).astype(np.float32)
    m8 = rng.integers(0, 64, (K // g, N)).astype(np.int8) if with_m else None
    md = (rng.uniform(0.0, 2e-3, (K // SB, N)).astype(np.float32)
          if with_m else None)
    stk = lambda a: jnp.stack([jnp.asarray(a)] * L) if a is not None else None
    return qmm.QuantTensor(
        q=stk(q), s=stk(s8), m=stk(m8), fmt="int8", group=g, shape=(K, N),
        sd=stk(sd), md=stk(md), sgroup=SB)


def test_streamed_folded_scales():
    """Folded super-scale planes stream through the two extra windows;
    logits must match the scanned path (which unfolds via XLA)."""
    rng = np.random.default_rng(17)
    params = make_params(rng)
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
        "wq": qstack_folded(rng, D, HQ * DH),
        "wk": qstack_folded(rng, D, HKV * DH),
        # Q6_K-lineage leg: g=16, no mins — fusion harmonizes groups and
        # zero-fills BOTH min factors
        "wv": qstack_folded(rng, D, HKV * DH, g=16, with_m=False),
        "wo": qstack_folded(rng, HQ * DH, D),
        "w_gate": qstack_folded(rng, D, F),
        "w_up": qstack_folded(rng, D, F),
        "w_down": qstack_folded(rng, F, D),
    }
    fused = fuse_projections(layers)
    assert "wqkv_fused" in fused and fused["wqkv_fused"].sd is not None
    assert fused["wqkv_fused"].group == 16
    params = dict(params, layers=fused)
    lockstep_check(make_cfg(), params, 7, seed=17)


@pytest.mark.parametrize("fold", [False, True])
def test_streamed_deq_mode5_affine(fold, monkeypatch):
    """_DEQ_MODE=5 (group-factored raw-int8 MXU dot + per-group scale/min
    application, incl. folded sd/md reconstruction) restructures the
    dequant arithmetic rather than rescheduling it — pin its parity on
    the affine Q4_K-lineage shapes against the scanned jnp path."""
    from llama_cpp_gfx906_tpu.ops import decode_stream
    monkeypatch.setattr(decode_stream, "_DEQ_MODE", 5)
    rng = np.random.default_rng(23)
    params = make_params(rng)
    mk = qstack_folded if fold else qstack_affine
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
        "wq": mk(rng, D, HQ * DH),
        "wk": mk(rng, D, HKV * DH),
        "wv": mk(rng, D, HKV * DH),
        "wo": mk(rng, HQ * DH, D),
        "w_gate": mk(rng, D, F),
        "w_up": mk(rng, D, F),
        "w_down": mk(rng, F, D),
    }
    fused = fuse_projections(layers)
    assert fused["wqkv_fused"].m is not None
    params = dict(params, layers=fused)
    lockstep_check(make_cfg(), params, 7, seed=23)


def test_stream_gate_folded():
    """All-folded projections pass the gate; mixed folded/plain don't."""
    rng = np.random.default_rng(19)
    params = make_params(rng)
    layers = dict(params["layers"])
    layers["w_down"] = qstack_folded(rng, F, D)
    cfg = make_cfg()
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert not _stream_ok(dict(params, layers=layers), cfg, kv, 1, 1)


def test_repack_then_fuse_matches_nib4():
    """bench.py's repack leg: nib4 Q4_K weights repacked to int8 (mins
    kept) then re-fused — dequantized values must be bit-identical."""
    rng = np.random.default_rng(13)
    w = rng.standard_normal((F, D), dtype=np.float32) * 0.05
    qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K,
                              (F, D))
    rp = qmm.repack_nib4_to_int8(qt)
    assert rp.fmt == "int8" and rp.m is not None
    x = jnp.asarray(rng.standard_normal((1, D)) * 0.1, jnp.float32)
    y4 = qmm.linear(x, qt)
    y8 = qmm.linear(x, rp)
    np.testing.assert_allclose(np.asarray(y4, np.float32),
                               np.asarray(y8, np.float32),
                               rtol=1e-5, atol=1e-5)


def make_q4km(fold, seed=11):
    """The production Q4_K_M decode disposition: Q4_K tensors nib4c-packed,
    Q6_K attn_v split out (split-v), optionally folded k-quant scales.
    nib4c needs TK ≥ 16·group=512, so dims here are 2× the module's."""
    D2, HQ2, DH2, F2 = 512, 4, 128, 1024
    rng = np.random.default_rng(seed)

    def q4k_stack(K, N):
        w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
        qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K,
                                  (N, K), fold_scales=fold)
        assert qt.fmt == "nib4c"
        st = lambda a: jnp.stack([a] * L) if a is not None else None
        return qmm.QuantTensor(
            q=st(qt.q), s=st(qt.s), m=st(qt.m), fmt=qt.fmt, group=qt.group,
            shape=qt.shape, sd=st(qt.sd), md=st(qt.md), sgroup=qt.sgroup)

    def q6k_stack(K, N):
        w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
        qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q6_K), GGMLType.Q6_K,
                                  (N, K), fold_scales=fold)
        st = lambda a: jnp.stack([a] * L) if a is not None else None
        return qmm.QuantTensor(
            q=st(qt.q), s=st(qt.s), m=st(qt.m), fmt=qt.fmt, group=qt.group,
            shape=qt.shape, sd=st(qt.sd), md=st(qt.md), sgroup=qt.sgroup)

    head = rng.standard_normal((V, D2), dtype=np.float32) * 0.05
    layers = fuse_projections({
        "attn_norm": jnp.ones((L, D2), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D2), jnp.float32) * 0.9,
        "wq": q4k_stack(D2, HQ2 * DH2),
        "wk": q4k_stack(D2, DH2),
        "wv": q6k_stack(D2, DH2),  # forces int8 qkv harmonization
        "wo": q4k_stack(HQ2 * DH2, D2),
        "w_gate": q4k_stack(D2, F2),
        "w_up": q4k_stack(D2, F2),
        "w_down": q4k_stack(F2, D2),
    })
    assert "wqkv_fused" not in layers
    assert layers["wqk_fused"].fmt == "nib4c"
    assert layers["wv"].fmt == "int8"
    assert layers["wgateup_fused"].fmt == "nib4c"
    params = {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D2)) * 0.1,
                               jnp.bfloat16),
        "out_norm": jnp.ones(D2, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(quantize(head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D2)),
        "layers": layers,
    }
    cfg = ModelConfig(
        arch="llama", n_layers=L, n_embd=D2, n_heads=HQ2, n_kv_heads=1,
        head_dim=DH2, n_ff=F2, n_vocab=V, n_ctx_train=S,
    )
    return cfg, params


@pytest.mark.parametrize("fold", [False, True])
def test_streamed_nib4c_q4km_mix(fold):
    """The Q4_K_M disposition through the megakernel (split-v, groupdot-
    diff nib4c schedule, optional fold — the from_gguf default)."""
    cfg, params = make_q4km(fold)
    # Q4_K rounding is coarser than the module's Q8_0 shapes: one bf16
    # ulp on K rows lands at ~0.031 against the 0.03 default bound, and
    # the greedy-fedback steps accumulate path-rounding differences
    lockstep_check(cfg, params, n_prompt=7, kv_tol=6e-2, logit_tol=8e-2)


def test_streamed_batched_slots():
    """B=4 ragged slots through the streamed kernel (Q8_0): per-slot
    n_past/rope/KV streams, shared weight stream — the batched-serving
    configuration (decode_step's test_fused_batched_slots analog)."""
    rng = np.random.default_rng(3)
    lockstep_check_batched(make_cfg(), make_params(rng), [7, 135, 1, 40])


@pytest.mark.parametrize("fold", [False, True])
def test_streamed_batched_nib4c_q4km(fold):
    """Batched rows over the Q4_K_M disposition: exercises the M>1
    elementwise nibble-unpack dequant (the groupdot-diff schedule is
    per-row) with affine mins, split-v and folded scales."""
    cfg, params = make_q4km(fold)
    lockstep_check_batched(cfg, params, [7, 30, 3],
                           kv_tol=6e-2, logit_tol=8e-2)


# ---------------------------------------------------------------------------
# MoE megakernel: router + top-k + expert-slice streaming fully in-kernel


def estack(rng, E, K, N, g=16):
    """Stacked int8 affine experts (the pack_experts_int8_g16 layout)."""
    q = rng.integers(0, 16, (E, K, N)).astype(np.int8)
    s = rng.uniform(0.002, 0.006, (E, K // g, N)).astype(np.float32)
    m = rng.uniform(0.0, 0.05, (E, K // g, N)).astype(np.float32)
    st = lambda a: jnp.stack([jnp.asarray(a)] * L)
    return qmm.QuantTensor(q=st(q), s=st(s), m=st(m), fmt="int8", group=g,
                           shape=(K, N))


def moe_params(rng, E=8, EF=256, shexp=True, sgi=True):
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
        "wq": qstack(rng, D, HQ * DH),
        "wk": qstack(rng, D, HKV * DH),
        "wv": qstack(rng, D, HKV * DH),
        "wo": qstack(rng, HQ * DH, D),
        "moe_gate_inp": jnp.asarray(
            rng.standard_normal((L, D, E)) * 0.3, jnp.float32),
        "moe_gate": estack(rng, E, D, EF),
        "moe_up": estack(rng, E, D, EF),
        "moe_down": estack(rng, E, EF, D),
    }
    if shexp:
        layers["shexp_gate"] = qstack(rng, D, F)
        layers["shexp_up"] = qstack(rng, D, F)
        layers["shexp_down"] = qstack(rng, F, D)
        if sgi:
            layers["shexp_gate_inp"] = jnp.asarray(
                rng.standard_normal((L, D, 1)) * 0.1, jnp.float32)
    head = rng.standard_normal((V, D), dtype=np.float32) * 0.05
    return {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D)) * 0.1,
                               jnp.bfloat16),
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(quantize(head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D)),
        "layers": fuse_projections(layers),
    }


@pytest.mark.parametrize("shexp,gating,wnorm", [
    (True, 1, False),    # qwen2moe: softmax, no renorm, shared expert
    (False, 1, True),    # mixtral/qwen3moe: softmax + renorm, no shexp
    (False, 2, True),    # sigmoid gating (deepseek-lineage)
])
def test_streamed_moe_matches_scan(shexp, gating, wnorm):
    rng = np.random.default_rng(29)
    cfg = make_cfg(n_experts=8, n_experts_used=2, expert_ff=256,
                   expert_weights_norm=wnorm, expert_gating_func=gating)
    params = moe_params(rng, shexp=shexp)
    if shexp:
        assert "shexp_gateup_fused" in params["layers"]
    lockstep_check(cfg, params, n_prompt=7, seed=29)


def test_streamed_moe_nib4c_padded_experts():
    """nib4c experts with the expert-FF dim padded to the 512 chunk grid
    (the loader's pack_gguf_experts pad_n/pad_k path) through the kernel's
    expert windows."""
    from llama_cpp_gfx906_tpu.gguf import quantize as q_
    D2, HQ2, DH2, EF_RAW = 512, 4, 128, 384  # pads to 512
    E = 4
    rng = np.random.default_rng(31)

    def experts4(N, K, pad_k=False, pad_n=False):
        w = rng.standard_normal((E, N, K), dtype=np.float32) * 0.05
        raw = q_(w.reshape(E * N, K), GGMLType.Q4_K)
        qt = qmm.pack_gguf_experts(raw, GGMLType.Q4_K, (E, N, K),
                                   pad_k=pad_k, pad_n=pad_n)
        assert qt.fmt == "nib4c"
        st = lambda a: (jnp.stack([a] * L) if a is not None else None)
        return qmm.QuantTensor(q=st(qt.q), s=st(qt.s), m=st(qt.m),
                               fmt=qt.fmt, group=qt.group, shape=qt.shape)

    def q8stack(K, N):
        w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
        qt = qmm.pack_gguf_tensor(q_(w, GGMLType.Q8_0), GGMLType.Q8_0,
                                  (N, K))
        return qmm.QuantTensor(
            q=jnp.stack([qt.q] * L), s=jnp.stack([qt.s] * L), m=None,
            fmt=qt.fmt, group=qt.group, shape=qt.shape)

    layers = fuse_projections({
        "attn_norm": jnp.ones((L, D2), jnp.float32) * 1.1,
        "ffn_norm": jnp.ones((L, D2), jnp.float32) * 0.9,
        "wq": q8stack(D2, HQ2 * DH2),
        "wk": q8stack(D2, DH2),
        "wv": q8stack(D2, DH2),
        "wo": q8stack(HQ2 * DH2, D2),
        "moe_gate_inp": jnp.asarray(
            rng.standard_normal((L, D2, E)) * 0.3, jnp.float32),
        "moe_gate": experts4(EF_RAW, D2, pad_n=True),
        "moe_up": experts4(EF_RAW, D2, pad_n=True),
        "moe_down": experts4(D2, EF_RAW, pad_k=True),
    })
    assert layers["moe_gate"].shape == (D2, 512)
    assert layers["moe_down"].shape == (512, D2)
    head = rng.standard_normal((V, D2), dtype=np.float32) * 0.05
    params = {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D2)) * 0.1,
                               jnp.bfloat16),
        "out_norm": jnp.ones(D2, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(q_(head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D2)),
        "layers": layers,
    }
    cfg = ModelConfig(
        arch="llama", n_layers=L, n_embd=D2, n_heads=HQ2, n_kv_heads=1,
        head_dim=DH2, n_ff=512, n_vocab=V, n_ctx_train=S,
        n_experts=E, n_experts_used=2, expert_ff=EF_RAW,
        expert_weights_norm=True,
    )
    lockstep_check(cfg, params, n_prompt=7, seed=31, kv_tol=6e-2,
                   logit_tol=8e-2)
