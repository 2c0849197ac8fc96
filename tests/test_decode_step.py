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

L, D, HQ, HKV, DH, F, V, S = 3, 128, 2, 1, 128, 256, 64, 128


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


@pytest.mark.parametrize("interleaved", [True, False])
def test_fused_matches_scan(interleaved):
    rng = np.random.default_rng(3)
    cfg = make_cfg(rope_interleaved=interleaved)
    params = make_params(rng)
    kv = KVCache.create(cfg, batch=1, max_seq=S, dtype=jnp.bfloat16)
    assert _fused_ok(params, cfg, kv, 1, 1)

    # prefill via the scanned path, then decode with BOTH paths in lockstep
    prompt = jnp.asarray([list(rng.integers(0, V, 7))], jnp.int32)
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
