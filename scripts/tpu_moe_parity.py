"""On-chip MoE megakernel parity: the fused kernel vs the scanned XLA
path on the bench_moe shape (reduced layer count — parity, not perf).
Run on the real chip:  python scripts/tpu_moe_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    os.environ["BENCH_8B_TINY"] = ""  # full dims
    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm
    from llama_cpp_gfx906_tpu.ops import decode_stream

    print("backend:", jax.default_backend())
    L, D, EF, E, TOPK, SHF = 4, 2048, 1536, 60, 4, 5632
    V, HqD, HkD = 8192, 2048, 2048
    cfg = ModelConfig(
        arch="llama", n_layers=L, n_embd=D, n_heads=16, n_kv_heads=16,
        head_dim=128, n_ff=SHF, n_vocab=V, n_ctx_train=2048,
        rope_base=1000000.0, n_experts=E, n_experts_used=TOPK,
        expert_ff=1408, expert_weights_norm=False,
    )
    keys = jax.random.split(jax.random.PRNGKey(7), 16)

    def n4(key, K, N, g=32):
        ks = jax.random.split(key, 3)
        rep = lambda a: jnp.repeat(a[None], L, 0)
        return qmm.QuantTensor(
            q=rep(jax.random.randint(ks[0], (K // 2, N), -128, 128, dtype=jnp.int8)),
            s=rep(jax.random.uniform(ks[1], (K // g, N), jnp.float32, 1e-3, 2e-3)),
            m=rep(jax.random.uniform(ks[2], (K // g, N), jnp.float32, 0.0, 1e-3)),
            fmt="nib4c", group=g, shape=(K, N))

    def experts(key, K, N, g=32):
        k1, k2, k3 = jax.random.split(key, 3)
        rep = lambda a: jnp.repeat(a[None], L, 0)
        return qmm.QuantTensor(
            q=rep(jax.random.randint(k1, (E, K // 2, N), -128, 128, dtype=jnp.int8)),
            s=rep(jax.random.uniform(k2, (E, K // g, N), jnp.float32, 1e-3, 2e-3)),
            m=rep(jax.random.uniform(k3, (E, K // g, N), jnp.float32, 0.0, 1e-3)),
            fmt="nib4c", group=g, shape=(K, N))

    layers = {
        "attn_norm": jnp.ones((L, D), jnp.float32),
        "ffn_norm": jnp.ones((L, D), jnp.float32),
        "wqkv_fused": n4(keys[0], D, HqD + 2 * HkD),
        "wo": n4(keys[1], HqD, D),
        "moe_gate_inp": jax.random.normal(keys[2], (L, D, E), jnp.float32) * 0.3,
        "moe_gate": experts(keys[3], D, EF),
        "moe_up": experts(keys[4], D, EF),
        "moe_down": experts(keys[5], EF, D),
        "shexp_gateup_fused": n4(keys[8], D, 2 * SHF),
        "shexp_down": n4(keys[10], SHF, D),
        "shexp_gate_inp": jax.random.normal(keys[11], (L, D, 1), jnp.float32) * 0.1,
    }
    params = {
        "tok_emb": jax.random.normal(keys[6], (V, D), jnp.bfloat16) * 0.02,
        "out_norm": jnp.ones(D, jnp.float32),
        "lm_head": qmm.QuantTensor(
            q=jax.random.randint(keys[7], (D, V), -32, 32, dtype=jnp.int8),
            s=jax.random.uniform(keys[9], (D // 16, V), jnp.float32, 1e-3, 2e-3),
            m=None, fmt="int8", group=16, shape=(D, V)),
        "layers": layers,
    }
    kv = KVCache.create(cfg, batch=1, max_seq=512, dtype=jnp.bfloat16)
    assert decode_stream._stream_ok(params, cfg, kv, 1, 1), "gate refused"

    fwd = jax.jit(forward, static_argnames=("cfg",))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, V, (1, 24)), jnp.int32)
    logits, kv = fwd(params, cfg, prompt, kv)
    tok = jnp.reshape(logits[:, -1].argmax(-1).astype(jnp.int32), (1, 1))

    import llama_cpp_gfx906_tpu.ops.decode_stream as ds

    agree = 0
    for step in range(6):
        lk, kv_k = fwd(params, cfg, tok, kv)          # kernel path
        ds._DISABLE_STREAM = True
        try:
            ls, kv_s = jax.jit(forward, static_argnames=("cfg",))(
                params, cfg, tok, kv)                 # scan path
        finally:
            ds._DISABLE_STREAM = False
        a, b = np.asarray(lk[0, -1], np.float32), np.asarray(ls[0, -1], np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
        agree += int(np.argmax(a) == np.argmax(b))
        print(f"step {step}: rel |dlogit| {rel:.4f} "
              f"argmax {np.argmax(a)} vs {np.argmax(b)}")
        assert rel < 0.05, "kernel/scan divergence"
        kv = kv_k
        tok = jnp.reshape(lk[:, -1].argmax(-1).astype(jnp.int32), (1, 1))
    print(f"MoE megakernel on-chip parity OK ({agree}/6 argmax agree)")


if __name__ == "__main__":
    main()
