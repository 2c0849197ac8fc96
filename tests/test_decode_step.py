"""Fused decode megakernel (ops/decode_step.py) vs the scanned jnp path.

Runs the Pallas kernel in interpreter mode on CPU; the scanned forward is
the golden oracle (itself HF-parity-tested).  Reference analog: the fork's
fused-GEMM decode (docs/gfx906/implementation_guide.md:170-287)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize
from llama_cpp_gfx906_tpu.models.config import ModelConfig
from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm
from llama_cpp_gfx906_tpu.ops.decode_step import _fused_ok, fused_decode_step
from llama_cpp_gfx906_tpu.runtime.weights import fuse_projections

L, D, HQ, HKV, DH, F, V, S = 3, 128, 2, 1, 128, 256, 64, 256


def make_cfg(**kw):
    return ModelConfig(
        arch="llama", n_layers=L, n_embd=D, n_heads=HQ, n_kv_heads=HKV,
        head_dim=DH, n_ff=F, n_vocab=V, n_ctx_train=S, **kw,
    )


def make_params(rng):
    def qstack(K, N):
        w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
        qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q8_0), GGMLType.Q8_0,
                                  (N, K))
        return qmm.QuantTensor(
            q=jnp.stack([qt.q] * L), s=jnp.stack([qt.s] * L), m=None,
            fmt=qt.fmt, group=qt.group, shape=qt.shape,
        )

    head = rng.standard_normal((V, D), dtype=np.float32) * 0.05
    return {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D)) * 0.1, jnp.bfloat16),
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.pack_gguf_tensor(quantize(head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D)),
        "layers": fuse_projections({
            "attn_norm": jnp.ones((L, D), jnp.float32) * 1.1,
            "ffn_norm": jnp.ones((L, D), jnp.float32) * 0.9,
            "wq": qstack(D, HQ * DH),
            "wk": qstack(D, HKV * DH),
            "wv": qstack(D, HKV * DH),
            "wo": qstack(HQ * DH, D),
            "w_gate": qstack(D, F),
            "w_up": qstack(D, F),
            "w_down": qstack(F, D),
        }),
    }


@pytest.mark.parametrize("interleaved,n_prompt", [
    (True, 7),     # n_past < one KV chunk (BK=128): self-term + 1 chunk
    (False, 7),
    (True, 135),   # n_past crosses a chunk boundary: 2-chunk stream loop
])
def test_fused_matches_scan(interleaved, n_prompt):
    rng = np.random.default_rng(3)
    cfg = make_cfg(rope_interleaved=interleaved)
    params = make_params(rng)
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert _fused_ok(params, cfg, kv, 1, 1)

    # prefill via the scanned path, then decode with BOTH paths in lockstep
    prompt = jnp.asarray([list(rng.integers(0, V, n_prompt))], jnp.int32)
    _, kv = forward(params, cfg, prompt, kv)
    kv_f = KVCache(k=kv.k, v=kv.v, n_past=kv.n_past)

    tok = jnp.asarray([[5]], jnp.int32)
    for step in range(3):
        logits_ref, kv = forward(params, cfg, tok, kv)
        x = params["tok_emb"][tok]
        x2, k_new, v_new = fused_decode_step(params, cfg, x, kv_f,
                                             interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)

        from llama_cpp_gfx906_tpu.ops.norms import rms_norm
        from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

        hid = rms_norm(x2, params["out_norm"], cfg.rms_eps)
        logits = linear(hid, params["lm_head"]).astype(jnp.float32)

        np.testing.assert_allclose(
            np.asarray(logits[0, 0]), np.asarray(logits_ref[0, 0]),
            rtol=2e-2, atol=2e-2,
        )
        assert int(np.argmax(logits)) == int(np.argmax(logits_ref))
        # caches agree (incl. the freshly inserted roped row)
        np.testing.assert_allclose(
            np.asarray(kv_f.k, np.float32), np.asarray(kv.k, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(kv_f.v, np.float32), np.asarray(kv.v, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        tok = jnp.asarray([[int(np.argmax(logits_ref))]], jnp.int32)


def test_gate_rejects_unsupported():
    rng = np.random.default_rng(4)
    params = make_params(rng)
    kv = KVCache.create(make_cfg(), batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert not _fused_ok(params, make_cfg(qk_norm=True), kv, 1, 1)
    assert not _fused_ok(params, make_cfg(alibi=True), kv, 1, 1)
    assert not _fused_ok(params, make_cfg(), kv, 1, 2)  # prefill
    assert not _fused_ok(params, make_cfg(), kv, 2, 1)  # batch
    qkv = KVCache.create(make_cfg(), batch=1, max_seq=S, dtype="q8")
    assert not _fused_ok(params, make_cfg(), qkv, 1, 1)


def test_fused_gemma3_features():
    """qk-norms + post norms + per-layer SWA windows + local rope — the
    gemma3 decode configuration (llm_build_gemma3_iswa analog)."""
    rng = np.random.default_rng(9)
    cfg = make_cfg(
        rope_interleaved=True, qk_norm=True, post_attn_norm=True,
        post_ffn_norm=True, sliding_window=16, swa_pattern=2,
        rope_local_base=10000.0, rope_base=1000000.0,
    )
    params = make_params(rng)
    layers = dict(params["layers"])
    layers["q_norm"] = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((L, DH)), jnp.float32)
    layers["k_norm"] = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((L, DH)), jnp.float32)
    layers["post_attn_norm"] = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((L, D)), jnp.float32)
    layers["post_ffn_norm"] = jnp.asarray(
        1.0 + 0.1 * rng.standard_normal((L, D)), jnp.float32)
    params = dict(params, layers=layers)
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert _fused_ok(params, cfg, kv, 1, 1)

    # prefill long enough that SWA layers actually window (window 16 < 40)
    prompt = jnp.asarray([list(rng.integers(0, V, 40))], jnp.int32)
    _, kv = forward(params, cfg, prompt, kv)
    kv_f = KVCache(k=kv.k, v=kv.v, n_past=kv.n_past)

    from llama_cpp_gfx906_tpu.ops.norms import rms_norm
    from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

    tok = jnp.asarray([[5]], jnp.int32)
    for _ in range(3):
        logits_ref, kv = forward(params, cfg, tok, kv)
        x = params["tok_emb"][tok]
        x2, k_new, v_new = fused_decode_step(params, cfg, x, kv_f,
                                             interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)
        hid = rms_norm(x2, params["out_norm"], cfg.rms_eps)
        logits = linear(hid, params["lm_head"]).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(logits[0, 0]), np.asarray(logits_ref[0, 0]),
            rtol=2e-2, atol=2e-2,
        )
        assert int(np.argmax(logits)) == int(np.argmax(logits_ref))
        tok = jnp.asarray([[int(np.argmax(logits_ref))]], jnp.int32)


def test_fused_eligible_for_real_gemma3_gguf(tmp_path):
    """A Q8_0-converted gemma3 checkpoint (the reference's benchmark model
    family) must pass the megakernel gate through the REAL loader path —
    guards loader/gate drift (fused projections, norm dtypes, cache type).
    Decode parity vs the scanned path on the loaded params."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma

    def dummy_vocab():
        n = 96
        return {
            "model": "llama",
            "tokens": ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(n - 3)],
            "scores": [0.0] * n,
            "token_types": [3, 3, 2] + [4] * (n - 3), "bos": 0, "eos": 1,
        }

    torch.manual_seed(12)
    hf = Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=96, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, query_pre_attn_scalar=128, sliding_window=16,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        rope_scaling=None,
    )).eval()
    path = str(tmp_path / "tiny-gemma3-q8.gguf")
    convert_hf_gemma(hf, dummy_vocab(), path, quant_type=GGMLType.Q8_0,
                     arch="gemma3")
    eng = Engine.from_gguf(path, max_seq=256, dtype=jnp.bfloat16)
    assert _fused_ok(eng.params, eng.cfg, eng.kv, 1, 1)

    ids = [3, 17, 42, 9, 88, 5, 63, 21] * 3
    eng.prefill(ids)
    kv_f = KVCache(k=eng.kv.k, v=eng.kv.v, n_past=eng.kv.n_past)

    from llama_cpp_gfx906_tpu.ops.norms import rms_norm
    from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

    tok = jnp.asarray([[5]], jnp.int32)
    for _ in range(2):
        logits_ref, kv_ref = forward(eng.params, eng.cfg, tok, eng.kv)
        eng.kv = kv_ref
        x = eng.params["tok_emb"][tok]
        if eng.cfg.embedding_scale != 1.0:
            x = (x.astype(jnp.float32) * eng.cfg.embedding_scale).astype(x.dtype)
        x2, k_new, v_new = fused_decode_step(eng.params, eng.cfg, x, kv_f,
                                             interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)
        hid = rms_norm(x2, eng.params["out_norm"], eng.cfg.rms_eps)
        logits = linear(hid, eng.params["lm_head"]).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(logits[0, 0]), np.asarray(logits_ref[0, 0]),
            rtol=4e-2, atol=4e-2,
        )
        assert int(np.argmax(logits)) == int(np.argmax(logits_ref))
        tok = jnp.asarray([[int(np.argmax(logits_ref))]], jnp.int32)


def test_fused_batched_slots():
    """B>1 (server slots): per-slot n_past, per-slot rope positions and
    KV inserts must match the scanned batched forward row-for-row."""
    rng = np.random.default_rng(11)
    cfg = make_cfg(rope_interleaved=True)
    params = make_params(rng)
    B = 3
    kv = KVCache.create(cfg, batch=B, max_seq=S, dtype=jnp.bfloat16)
    # B>1 is gated OFF in forward (scan path matches it on-chip for B>=2)
    # but the kernel itself must stay correct for per-slot state
    assert not _fused_ok(params, cfg, kv, B, 1)

    # stagger the slots: valid prompt lengths 8 / 5 / 3 in one padded batch
    toks = jnp.asarray(rng.integers(3, V, (B, 8)), jnp.int32)
    n_tok = jnp.asarray([8, 5, 3], jnp.int32)
    _, kv = forward(params, cfg, toks, kv, n_tokens=n_tok)
    assert [int(t) for t in kv.n_past] == [8, 5, 3]
    kv_f = KVCache(k=kv.k, v=kv.v, n_past=kv.n_past)

    from llama_cpp_gfx906_tpu.ops.norms import rms_norm
    from llama_cpp_gfx906_tpu.ops.quant_matmul import linear

    tok = jnp.asarray([[5], [9], [12]], jnp.int32)
    for _ in range(2):
        logits_ref, kv = forward(params, cfg, tok, kv)
        x = params["tok_emb"][tok]
        x2, k_new, v_new = fused_decode_step(params, cfg, x, kv_f,
                                             interpret=True)
        kv_f = KVCache(k=k_new, v=v_new, n_past=kv_f.n_past + 1)
        hid = rms_norm(x2, params["out_norm"], cfg.rms_eps)
        logits = linear(hid, params["lm_head"]).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(logits_ref[:, 0]),
            rtol=2e-2, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(kv_f.k, np.float32), np.asarray(kv.k, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        tok = jnp.asarray(np.argmax(np.asarray(logits_ref[:, 0]), -1)[:, None],
                          jnp.int32)
