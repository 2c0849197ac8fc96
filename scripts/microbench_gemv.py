"""On-chip A/B: dense k-grid kernel vs streamed full-K GEMV on the 8B
Q6_K lm_head shape (4096 x 128256, N padded to 129024).

Timing discipline (docs/perf.md round-3): two-length slope —
time(R=32) − time(R=8) over on-device scan iterations cancels the
~25–90 ms per-dispatch tunnel overhead that poisons single-call
timings; fresh inputs per timed call defeat the axon dispatch memoizer.
Weights are passed as scan-carried ARGUMENTS (a closure would embed
them as constants in the remote-compile payload → HTTP 413).
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

D, V = 4096, 128256
rng = np.random.default_rng(0)
keys = jax.random.split(jax.random.PRNGKey(0), 8)


def synth_q6k(fold):
    q = jax.random.randint(keys[0], (D, V), -32, 32, dtype=jnp.int8)
    if fold:
        s = jax.random.randint(keys[1], (D // 16, V), 1, 64, dtype=jnp.int8)
        sd = jax.random.uniform(keys[2], (D // 128, V), jnp.float32, 1e-4, 2e-4)
        qt = qmm.QuantTensor(q=q, s=s, m=None, fmt="int8", group=16,
                             shape=(D, V), sd=sd, sgroup=128)
    else:
        s = jax.random.uniform(keys[1], (D // 16, V), jnp.float32, 1e-3, 2e-3)
        qt = qmm.QuantTensor(q=q, s=s, m=None, fmt="int8", group=16,
                             shape=(D, V))
    return qmm.pad_qt_n(qt)


def timeit(fn, qt, r_lo=8, r_hi=32):
    @functools.partial(jax.jit, static_argnames=("r",))
    def many(xs, qt, r):
        def body(c, x):
            o = fn(x + c * 1e-20, qt)
            return o[0, :1].astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.bfloat16), xs[:r])
        return c

    def once(r):
        mk = lambda: jnp.asarray(rng.standard_normal((r_hi, 1, D)) * 0.1,
                                 jnp.bfloat16)
        t0 = time.perf_counter()
        _ = np.asarray(many(mk(), qt, r))  # compile + hard sync
        print(f"    [compile r={r}: {time.perf_counter()-t0:.1f}s]", flush=True)
        best = 1e9
        for _i in range(3):
            x = mk()
            t0 = time.perf_counter()
            _ = np.asarray(many(x, qt, r))
            best = min(best, time.perf_counter() - t0)
        print(f"    [t(r={r}) = {best*1e3:.2f} ms]", flush=True)
        return best

    return (once(r_hi) - once(r_lo)) / (r_hi - r_lo)


def report(name, qt, t):
    nbytes = qt.q.nbytes + qt.s.nbytes + (qt.sd.nbytes if qt.sd is not None else 0)
    print(f"{name}: {t*1e3:.2f} ms  {nbytes/t/1e9:.0f} GB/s  ({nbytes/1e6:.0f} MB)",
          flush=True)


def dense(x, qt):
    return qmm._quant_matmul_pallas(x, qt.q, qt.s, qt.m, fmt=qt.fmt,
                                    group=qt.group, shape=qt.shape)


def gemv(x, qt):
    return qmm._quant_gemv_pallas(x, qt.q, qt.s, qt.m, qt.sd, qt.md,
                                  group=qt.group, sgroup=qt.sgroup or 0,
                                  shape=qt.shape)


qt = synth_q6k(False)
report("dense k-grid (current)", qt, timeit(dense, qt))
report("streamed GEMV", qt, timeit(gemv, qt))
del qt

qtf = synth_q6k(True)
report("streamed GEMV folded", qtf, timeit(gemv, qtf))
