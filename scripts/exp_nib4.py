"""On-chip experiment: 4-bit dequant schedules for the streamed GEMV.

Goal (round-4 item 2): stream the as-loaded 4-bit planes at high HBM BW
instead of the 2x int8 repack.  Variants, all computing x (1,K) @ W (K,N)
with per-group scales (g=32 logical, Q4_K-lineage affine):

  a) int8 repack, mode-0 elementwise dequant (current production path)
  b) nib4 packed, elementwise unpack + dequant (current dense-kernel style)
  c) nib4 packed, exact unpack to lo/hi bf16 + group-factored raw dots
     (scales applied per group ROW after the MXU dot - mode-5 analog)
  d) "nib4x" biased packing  b = lo + 16*hi - 128  (= (lo|hi<<4) ^ 0x80):
     the packed byte casts DIRECTLY to bf16 as a usable signed value; the
     hi-plane dot is recovered as (dot(x, b) - dot(x, lo) + 128*xsum)/16.
     Elementwise cost: 1 cast + (widen+mask+cast) per byte.
  e) uint4 native dtype, if Mosaic accepts it.

Timing: two-length slope over on-device scan (docs/perf.md discipline).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 4096, 129024  # 8B lm_head-class shape (big SNR)
G = 32              # logical quant group (Q4_K)
TN = 512
rng = np.random.default_rng(0)

# ---- synthetic Q4_K-like data --------------------------------------------
lo_np = rng.integers(0, 16, (K // 2, N), dtype=np.uint8)   # logical rows [0, K/2)
hi_np = rng.integers(0, 16, (K // 2, N), dtype=np.uint8)   # logical rows [K/2, K)
vals_np = np.concatenate([lo_np, hi_np], 0).astype(np.float32)  # (K, N)
s_np = rng.uniform(1e-3, 2e-3, (K // G, N)).astype(np.float32)
m_np = rng.uniform(0.0, 1e-2, (K // G, N)).astype(np.float32)
x_np = (rng.standard_normal((1, K)) * 0.1).astype(np.float32)

w_ref = vals_np * np.repeat(s_np, G, 0) - np.repeat(m_np, G, 0)
ref = x_np @ w_ref

packed_np = (lo_np | (hi_np << 4)).view(np.int8)            # standard nib4
packedx_np = (packed_np.view(np.uint8) ^ 0x80).view(np.int8)  # biased nib4x
int8_np = vals_np.astype(np.int8)                            # repacked int8

x = jnp.asarray(x_np, jnp.bfloat16)
s = jnp.asarray(s_np)
m = jnp.asarray(m_np)


# ---- kernels ---------------------------------------------------------------
def k_int8_mode0(x_ref, q_ref, s_ref, o_ref):
    Kk, TNn = q_ref.shape
    outs = []
    for n0 in range(0, TNn, 512):
        acc = jnp.zeros((1, 512), jnp.float32)
        for k0 in range(0, Kk, 1024):
            qs = q_ref[k0:k0 + 1024, n0:n0 + 512]
            sg = jnp.repeat(s_ref[k0 // G:(k0 + 1024) // G, n0:n0 + 512], G, 0)
            w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
            acc += jax.lax.dot(x_ref[:, k0:k0 + 1024].astype(jnp.bfloat16), w,
                               preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def k_nib4_elem(x_ref, q_ref, s_ref, o_ref):
    """current style: widen, unpack both nibbles, elementwise scale, 2 dots"""
    Kh, TNn = q_ref.shape  # packed rows = K/2
    Kk = 2 * Kh
    outs = []
    for n0 in range(0, TNn, 512):
        acc = jnp.zeros((1, 512), jnp.float32)
        for k0 in range(0, Kh, 1024):
            p32 = q_ref[k0:k0 + 1024, n0:n0 + 512].astype(jnp.int32) & 255
            sl = jnp.repeat(s_ref[k0 // G:(k0 + 1024) // G, n0:n0 + 512], G, 0)
            sh = jnp.repeat(
                s_ref[(Kh + k0) // G:(Kh + k0 + 1024) // G, n0:n0 + 512], G, 0)
            wl = ((p32 & 0xF).astype(jnp.float32) * sl).astype(jnp.bfloat16)
            wh = ((p32 >> 4).astype(jnp.float32) * sh).astype(jnp.bfloat16)
            acc += jax.lax.dot(x_ref[:, k0:k0 + 1024].astype(jnp.bfloat16), wl,
                               preferred_element_type=jnp.float32)
            acc += jax.lax.dot(
                x_ref[:, Kh + k0:Kh + k0 + 1024].astype(jnp.bfloat16), wh,
                preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def _gmatT(TKg, TK, dtype=jnp.bfloat16):
    rowg = jax.lax.broadcasted_iota(jnp.int32, (TKg, TK), 0)
    colg = jax.lax.broadcasted_iota(jnp.int32, (TKg, TK), 1)
    return (colg // G == rowg).astype(dtype)


def k_nib4_groupdot(x_ref, q_ref, s_ref, o_ref):
    """exact unpack to bf16 planes + raw group dots, scales per group row"""
    Kh, TNn = q_ref.shape
    TKg = Kh // G
    gT = _gmatT(TKg, Kh)
    xg_lo = gT * x_ref[:, :Kh]
    xg_hi = gT * x_ref[:, Kh:]
    outs = []
    for n0 in range(0, TNn, 512):
        p32 = q_ref[:, n0:n0 + 512].astype(jnp.int32) & 255
        l_bf = (p32 & 0xF).astype(jnp.bfloat16)
        h_bf = (p32 >> 4).astype(jnp.bfloat16)
        y_lo = jax.lax.dot(xg_lo, l_bf, preferred_element_type=jnp.float32)
        y_hi = jax.lax.dot(xg_hi, h_bf, preferred_element_type=jnp.float32)
        sl = s_ref[:TKg, n0:n0 + 512]
        sh = s_ref[TKg:, n0:n0 + 512]
        acc = jnp.sum(sl * y_lo + sh * y_hi, 0, keepdims=True)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def k_nib4x_diff(x_ref, q_ref, s_ref, o_ref):
    """biased packing: b casts straight to bf16; hi dot by difference"""
    Kh, TNn = q_ref.shape
    TKg = Kh // G
    gT = _gmatT(TKg, Kh)
    xg_lo = gT * x_ref[:, :Kh]
    xg_hi = gT * x_ref[:, Kh:]
    xsum_hi = jnp.sum(xg_hi.astype(jnp.float32), 1, keepdims=True)  # (TKg, 1)
    outs = []
    for n0 in range(0, TNn, 512):
        q8 = q_ref[:, n0:n0 + 512]
        b_bf = q8.astype(jnp.bfloat16)                       # lo + 16*hi - 128
        l_bf = (q8.astype(jnp.int32) & 0xF).astype(jnp.bfloat16)
        y_l_lo = jax.lax.dot(xg_lo, l_bf, preferred_element_type=jnp.float32)
        y_b_hi = jax.lax.dot(xg_hi, b_bf, preferred_element_type=jnp.float32)
        y_l_hi = jax.lax.dot(xg_hi, l_bf, preferred_element_type=jnp.float32)
        y_h_hi = (y_b_hi - y_l_hi + 128.0 * xsum_hi) * (1.0 / 16.0)
        sl = s_ref[:TKg, n0:n0 + 512]
        sh = s_ref[TKg:, n0:n0 + 512]
        acc = jnp.sum(sl * y_l_lo + sh * y_h_hi, 0, keepdims=True)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def k_nib4x_diff_i8mask(x_ref, q_ref, s_ref, o_ref):
    """like diff but lo-mask directly on int8 (if Mosaic allows)"""
    Kh, TNn = q_ref.shape
    TKg = Kh // G
    gT = _gmatT(TKg, Kh)
    xg_lo = gT * x_ref[:, :Kh]
    xg_hi = gT * x_ref[:, Kh:]
    xsum_hi = jnp.sum(xg_hi.astype(jnp.float32), 1, keepdims=True)
    outs = []
    for n0 in range(0, TNn, 512):
        q8 = q_ref[:, n0:n0 + 512]
        b_bf = q8.astype(jnp.bfloat16)
        l_bf = (q8 & jnp.int8(0xF)).astype(jnp.bfloat16)
        y_l_lo = jax.lax.dot(xg_lo, l_bf, preferred_element_type=jnp.float32)
        y_b_hi = jax.lax.dot(xg_hi, b_bf, preferred_element_type=jnp.float32)
        y_l_hi = jax.lax.dot(xg_hi, l_bf, preferred_element_type=jnp.float32)
        y_h_hi = (y_b_hi - y_l_hi + 128.0 * xsum_hi) * (1.0 / 16.0)
        sl = s_ref[:TKg, n0:n0 + 512]
        sh = s_ref[TKg:, n0:n0 + 512]
        acc = jnp.sum(sl * y_l_lo + sh * y_h_hi, 0, keepdims=True)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def k_uint4(x_ref, q_ref, s_ref, o_ref):
    """native sub-byte dtype: single cast to bf16"""
    Kk, TNn = q_ref.shape
    outs = []
    for n0 in range(0, TNn, 512):
        acc = jnp.zeros((1, 512), jnp.float32)
        for k0 in range(0, Kk, 1024):
            qs = q_ref[k0:k0 + 1024, n0:n0 + 512]
            sg = jnp.repeat(s_ref[k0 // G:(k0 + 1024) // G, n0:n0 + 512], G, 0)
            w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
            acc += jax.lax.dot(x_ref[:, k0:k0 + 1024].astype(jnp.bfloat16), w,
                               preferred_element_type=jnp.float32)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def k_uint4_groupdot(x_ref, q_ref, s_ref, o_ref):
    """native sub-byte dtype + group dots (scale after MXU)"""
    Kk, TNn = q_ref.shape
    TKg = Kk // G
    gT = _gmatT(TKg, Kk)
    xg = gT * x_ref[:]
    outs = []
    for n0 in range(0, TNn, 512):
        w = q_ref[:, n0:n0 + 512].astype(jnp.bfloat16)
        y = jax.lax.dot(xg, w, preferred_element_type=jnp.float32)
        acc = jnp.sum(s_ref[:, n0:n0 + 512] * y, 0, keepdims=True)
        outs.append(acc)
    o_ref[:] = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


# ---- harness ---------------------------------------------------------------
def build(kernel, q, s_arr, k_rows):
    @jax.jit
    def f(x, q, s_arr):
        return pl.pallas_call(
            kernel,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k_rows, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_arr.shape[0], TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TN), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * K,
                bytes_accessed=int(q.nbytes + s_arr.nbytes),
                transcendentals=0),
        )(x, q, s_arr)
    return f


def min_correction(out):
    xs = x_np.reshape(1, K // G, G).sum(-1)
    return out - xs @ m_np


def timeit(f, q, s_arr):
    @functools.partial(jax.jit, static_argnames=("r",))
    def many(xs, q, s_arr, r):
        def body(c, xi):
            o = f(xi + c * 1e-20, q, s_arr)
            return o[0, :1].astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.bfloat16), xs[:r])
        return c

    def once(r):
        mk = lambda: jnp.asarray(
            rng.standard_normal((64, 1, K)) * 0.1, jnp.bfloat16)
        _ = np.asarray(many(mk(), q, s_arr, r))
        best = 1e9
        for _ in range(5):
            xs = mk()
            t0 = time.perf_counter()
            _ = np.asarray(many(xs, q, s_arr, r))
            best = min(best, time.perf_counter() - t0)
        print(f"    [t(r={r}) = {best*1e3:.2f} ms]", flush=True)
        return best

    return (once(64) - once(8)) / 56


def check_and_time(name, kernel, q_arr, s_arr, k_rows, affine=True):
    try:
        f = build(kernel, q_arr, s_arr, k_rows)
        out = np.asarray(f(x, q_arr, s_arr))
        if affine:
            out = min_correction(out)
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        t = timeit(f, q_arr, s_arr)
        nbytes = q_arr.nbytes + s_arr.nbytes
        print(f"{name:24s} relerr={err:.2e}  t={t*1e3:.3f} ms  "
              f"{nbytes/t/1e9:6.0f} GB/s streamed  "
              f"({2*(K*N + K//G*N)/t/1e9:6.0f} GB/s int8-equiv)", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


VARIANTS = {
    "int8": ("int8 mode0 (baseline)", k_int8_mode0, int8_np, K),
    "nib4elem": ("nib4 elementwise", k_nib4_elem, packed_np, K // 2),
    "nib4gd": ("nib4 groupdot exact", k_nib4_groupdot, packed_np, K // 2),
    "nib4xdiff": ("nib4x diff", k_nib4x_diff, packedx_np, K // 2),
    "nib4xi8": ("nib4x diff i8mask", k_nib4x_diff_i8mask, packedx_np, K // 2),
}

import sys
name, kernel, q_np, k_rows = VARIANTS[sys.argv[1]]
q_arr = jnp.asarray(q_np)
for trial in range(3):
    check_and_time(f"{name} [{trial}]", kernel, q_arr, s, k_rows)

