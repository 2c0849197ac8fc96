"""Where does the MoE decode token go?  On-chip ablation for the
bench_moe shape (Qwen1.5-MoE-A2.7B dims): layer-count slope isolates
per-layer cost; isolated routed / dense GEMV timings split it into
kernel-rate vs launch overhead.  Run on the real chip:

    python scripts/microbench_moe.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

    import bench as benchmod  # reuse the bench's synth builders

    print("backend:", jax.default_backend())

    def build(L):
        os.environ.pop("BENCH_8B_TINY", None)
        # replicate bench_moe's param synth at layer count L
        cfg = ModelConfig(
            arch="llama", n_layers=L, n_embd=2048, n_heads=16,
            n_kv_heads=16, head_dim=128, n_ff=5632, n_vocab=151936,
            n_ctx_train=8192, rope_base=1000000.0,
            n_experts=60, n_experts_used=4, expert_ff=1408,
            expert_weights_norm=False,
        )
        D, EF, V, E = 2048, 1408, 151936, 60
        HqD = HkD = 2048
        keys = jax.random.split(jax.random.PRNGKey(1), 16)

        def n4(key, K, N, g=32):
            ks = jax.random.split(key, 5)
            rep = lambda a: jnp.repeat(a[None], L, 0)
            return qmm.QuantTensor(
                q=rep(jax.random.randint(ks[0], (K // 2, N), -128, 128, dtype=jnp.int8)),
                s=rep(jax.random.randint(ks[1], (K // g, N), 1, 64, dtype=jnp.int8)),
                m=rep(jax.random.randint(ks[2], (K // g, N), 0, 64, dtype=jnp.int8)),
                sd=rep(jax.random.uniform(ks[3], (K // 128, N), jnp.float32, 2e-5, 6e-5)),
                md=rep(jax.random.uniform(ks[4], (K // 128, N), jnp.float32, 0.0, 2e-5)),
                fmt="nib4c", group=g, sgroup=128, shape=(K, N))

        def experts(key, K, N, g=32):
            k1, k2, k3 = jax.random.split(key, 3)
            rep = lambda a: jnp.repeat(a[None], L, 0)
            return qmm.QuantTensor(
                q=rep(jax.random.randint(k1, (E, K // 2, N), -128, 128, dtype=jnp.int8)),
                s=rep(jax.random.uniform(k2, (E, K // g, N), jnp.float32, 1e-3, 2e-3)),
                m=rep(jax.random.uniform(k3, (E, K // g, N), jnp.float32, 0.0, 1e-3)),
                fmt="nib4", group=g, shape=(K, N))

        def q6k(key, K, N):
            k1, k2, k3 = jax.random.split(key, 3)
            return qmm.QuantTensor(
                q=jax.random.randint(k1, (K, N), -32, 32, dtype=jnp.int8),
                s=jax.random.randint(k2, (K // 16, N), 1, 64, dtype=jnp.int8),
                m=None, fmt="int8", group=16,
                sd=jax.random.uniform(k3, (K // 128, N), jnp.float32, 2e-5, 6e-5),
                md=None, sgroup=128, shape=(K, N))

        layers = {
            "attn_norm": jnp.ones((L, D), jnp.float32),
            "ffn_norm": jnp.ones((L, D), jnp.float32),
            "wqkv_fused": n4(keys[0], D, HqD + 2 * HkD),
            "wo": n4(keys[1], HqD, D),
            "moe_gate_inp": jax.random.normal(keys[2], (L, D, E), jnp.float32) * 0.02,
            "moe_gate": experts(keys[3], D, EF),
            "moe_up": experts(keys[4], D, EF),
            "moe_down": experts(keys[5], EF, D),
            "shexp_gate": n4(keys[8], D, 5632),
            "shexp_up": n4(keys[9], D, 5632),
            "shexp_down": n4(keys[10], 5632, D),
            "shexp_gate_inp": jax.random.normal(keys[11], (L, D, 1), jnp.float32) * 0.02,
        }
        params = {
            "tok_emb": jax.random.normal(keys[6], (151936, D), jnp.bfloat16) * 0.02,
            "out_norm": jnp.ones(D, jnp.float32),
            "lm_head": qmm.pad_qt_n(q6k(keys[7], D, 151936)),
            "layers": layers,
        }
        return cfg, params

    @partial(jax.jit, static_argnames=("cfg", "n_steps"), donate_argnames=("kv",))
    def decode_steps(params, cfg, tok, kv, n_steps):
        def body(carry, _):
            tok, kv = carry
            logits, kv = forward(params, cfg, tok, kv)
            nxt = logits[:, -1:].argmax(-1).astype(jnp.int32)
            return (nxt, kv), nxt[:, 0]
        (tok, kv), toks = jax.lax.scan(body, (tok, kv), None, length=n_steps)
        return toks, kv

    res = {}
    for L in (4, 24):
        cfg, params = build(L)
        kv = KVCache.create(cfg, batch=1, max_seq=512, dtype=jnp.bfloat16)
        tok = jnp.asarray([[5]], jnp.int32)
        logits, kv = jax.jit(forward, static_argnames=("cfg",),
                             donate_argnames=("kv",))(params, cfg, tok, kv)
        sync(logits)
        f = lambda p=params, c=cfg, k=kv: decode_steps(p, c, tok, k, 16)[0]
        # note: donated kv — rebuild per call
        def run():
            kvi = KVCache.create(cfg, batch=1, max_seq=512, dtype=jnp.bfloat16)
            t, _ = decode_steps(params, cfg, tok, kvi, 16)
            return t
        dt = timeit(run)
        res[L] = dt / 16
        print(f"L={L}: {dt/16*1e3:.2f} ms/token")
    per_layer = (res[24] - res[4]) / 20
    fixed = res[4] - 4 * per_layer
    print(f"per-layer {per_layer*1e3:.3f} ms, fixed (head+embed+scan) {fixed*1e3:.3f} ms")

    # isolated kernels at the layer shapes
    cfg, params = build(1)
    lay = params["layers"]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2048)) * 0.05, jnp.bfloat16)

    def slice0(t):
        return qmm.QuantTensor(
            q=t.q[0], s=t.s[0], m=None if t.m is None else t.m[0],
            sd=None if t.sd is None else t.sd[0],
            md=None if t.md is None else t.md[0],
            fmt=t.fmt, group=t.group, sgroup=t.sgroup, shape=t.shape)

    for name in ("wqkv_fused", "wo", "shexp_gate", "shexp_down"):
        t = slice0(lay[name])
        xx = x if t.shape[0] == 2048 else jnp.asarray(
            np.random.default_rng(0).standard_normal((1, t.shape[0])) * 0.05, jnp.bfloat16)
        f = jax.jit(lambda a, qt=t: qmm.quant_matmul(a, qt))
        dt = timeit(f, xx, reps=5)
        by = t.q.nbytes + t.s.nbytes + (t.m.nbytes if t.m is not None else 0) \
            + (t.sd.nbytes if t.sd is not None else 0) + (t.md.nbytes if t.md is not None else 0)
        print(f"{name}: {dt*1e6:.0f} us, {by/dt/1e9:.0f} GB/s ({by/1e6:.1f} MB)")

    idx = jnp.asarray([3, 17, 42, 9], jnp.int32)
    xr = jnp.asarray(np.random.default_rng(0).standard_normal((4, 2048)) * 0.05, jnp.bfloat16)
    for name in ("moe_gate", "moe_down"):
        t = lay[name]
        t0 = qmm.QuantTensor(q=t.q[0], s=t.s[0], m=t.m[0], fmt=t.fmt,
                             group=t.group, shape=t.shape)
        xi = xr if t0.shape[0] == 2048 else jnp.asarray(
            np.random.default_rng(0).standard_normal((4, t0.shape[0])) * 0.05, jnp.bfloat16)
        f = jax.jit(lambda a, qt=t0: qmm.routed_quant_matmul(a, qt, idx))
        dt = timeit(f, xi, reps=5)
        slice_by = (t0.q.nbytes + t0.s.nbytes + t0.m.nbytes) // 60 * 4
        print(f"routed {name}: {dt*1e6:.0f} us, {slice_by/dt/1e9:.1f} GB/s of "
              f"active bytes ({slice_by/1e6:.1f} MB)")

    # lm_head
    t = params["lm_head"]
    f = jax.jit(lambda a, qt=t: qmm.quant_matmul(a, qt))
    dt = timeit(f, x, reps=5)
    by = t.q.nbytes + t.s.nbytes + t.sd.nbytes
    print(f"lm_head: {dt*1e6:.0f} us, {by/dt/1e9:.0f} GB/s ({by/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
