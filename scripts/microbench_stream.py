"""Microbench: the streamed-weights fused decode kernel at 8B fold-leg dims.

Times ``fused_decode_step_streamed`` in isolation (no lm_head, no embed,
no sampling) with the two-length slope trick so per-dispatch tunnel
overhead cancels.  Synthetic folded int8 weights match bench.py's fold
leg (group=16, sgroup=128, min planes present — the Q4_K_M mix after
int8 repack + k-quant scale fold).

Usage: python scripts/microbench_stream.py [n_layers]
Env:   LCG_DEQ_MODE / LCG_STREAM_TN forwarded to the kernel for A/B.
       MB_FMT=int8|nib4c|mixed — weight packing for the four projections:
       int8 (fold-leg baseline), nib4c (all-4-bit streams, Q4_K_S-like),
       mixed (qkv int8 + the rest nib4c — the Q4_K_M disposition after
       fuse-time harmonization, where Q6_K attn_v forces the fused qkv
       to int8 while wo/gate-up/down stay packed 4-bit).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from llama_cpp_gfx906_tpu.models.config import ModelConfig
from llama_cpp_gfx906_tpu.models.llama import KVCache
from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm
from llama_cpp_gfx906_tpu.ops.decode_stream import (_stream_ok,
                                                    fused_decode_step_streamed)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = ModelConfig(
    arch="llama", n_layers=L, n_embd=4096, n_heads=32, n_kv_heads=8,
    head_dim=128, n_ff=14336, n_vocab=128256, n_ctx_train=8192,
    rope_base=500000.0,
)
D, F = cfg.n_embd, cfg.n_ff
HqD, HkD = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim


FMT = os.environ.get("MB_FMT", "int8")


def synth_fold(seed, K, N, fmt="int8"):
    # one layer of random bits, repeated over L: randint's uint32 temp at
    # full stack size would OOM HBM; decode speed is value-independent
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    SB = 128
    g = 32 if fmt == "nib4c" else 16  # Q4_K group vs unified int8/g16
    k_rows = K // 2 if fmt == "nib4c" else K
    rep = lambda a: jnp.repeat(a[None], L, 0)
    return qmm.QuantTensor(
        q=rep(jax.random.randint(ks[0], (k_rows, N), -128, 128,
                                 dtype=jnp.int8)),
        s=rep(jax.random.randint(ks[1], (K // g, N), 1, 64, dtype=jnp.int8)),
        m=rep(jax.random.randint(ks[2], (K // g, N), 0, 64, dtype=jnp.int8)),
        sd=rep(jax.random.uniform(ks[3], (K // SB, N), jnp.float32, 2e-5, 6e-5)),
        md=rep(jax.random.uniform(ks[4], (K // SB, N), jnp.float32, 0.0, 2e-5)),
        fmt=fmt, group=g, sgroup=SB, shape=(K, N))


qkv_fmt = "int8" if FMT in ("int8", "mixed") else FMT
rest_fmt = "int8" if FMT == "int8" else "nib4c"
layers = {
    "attn_norm": jnp.ones((L, D), jnp.float32),
    "ffn_norm": jnp.ones((L, D), jnp.float32),
    "wqkv_fused": synth_fold(0, D, HqD + 2 * HkD, qkv_fmt),
    "wo": synth_fold(1, HqD, D, rest_fmt),
    "wgateup_fused": synth_fold(2, D, 2 * F, rest_fmt),
    "w_down": synth_fold(3, F, D, rest_fmt),
}
params = {"layers": layers}


def qt_bytes(t):
    return (t.q.nbytes + t.s.nbytes + t.m.nbytes + t.sd.nbytes + t.md.nbytes)


streamed = sum(qt_bytes(layers[k])
               for k in ("wqkv_fused", "wo", "wgateup_fused", "w_down"))

kv = KVCache.create(cfg, batch=1, max_seq=1024, dtype=jnp.bfloat16)
kv = KVCache(k=kv.k, v=kv.v, n_past=jnp.full((1,), 64, jnp.int32))
assert _stream_ok(params, cfg, kv, 1, 1), "dispatch gate rejected the shape"


def steps(params, x, kv, n):
    def body(carry, _):
        x, kv = carry
        xo, k_new, v_new = fused_decode_step_streamed(params, cfg, x, kv)
        return (xo, KVCache(k=k_new, v=v_new, n_past=kv.n_past + 1)), ()

    (x, kv), _ = jax.lax.scan(body, (x, kv), None, length=n)
    return x, kv


jit_steps = jax.jit(steps, static_argnames=("n",), donate_argnames=("kv",))
x = jax.random.normal(jax.random.PRNGKey(9), (1, 1, D), jnp.bfloat16)


def run(n):
    # jit_steps donates kv, so build a FRESH copy per call — re-wrapping the
    # module-level arrays would hand back already-deleted buffers on TPU
    k2 = KVCache(k=jnp.copy(kv.k), v=jnp.copy(kv.v), n_past=jnp.copy(kv.n_past))
    xo, _ = jit_steps(params, x, k2, n)
    np.asarray(xo)


for n in (4, 32):  # compile both lengths
    run(n)
run(4)  # warm

reps = 3
ts = []
for _ in range(reps):
    t0 = time.perf_counter(); run(4); t1 = time.perf_counter()
    run(32); t2 = time.perf_counter()
    ts.append(((t2 - t1) - (t1 - t0)) / 28)
t = min(ts)
print(f"layers={L} fmt={FMT} step={t*1e3:.3f} ms  "
      f"streamed={streamed/1e6:.0f} MB  "
      f"eff_bw={streamed/t/1e9:.0f} GB/s  "
      f"(deq_mode={os.environ.get('LCG_DEQ_MODE','0')} "
      f"tn={os.environ.get('LCG_STREAM_TN','1024')})")
