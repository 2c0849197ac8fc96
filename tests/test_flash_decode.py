"""Decode flash kernel vs the jnp einsum oracle (ops/attention.py).

Covers: GQA/MHA, per-sequence n_past, sliding window, logit softcap,
attention sinks, quantized (int8) KV consumed in-kernel, multi-token
verify chunks (T > 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.ops.attention import mha_with_cache
from llama_cpp_gfx906_tpu.ops.flash_decode import flash_decode
from llama_cpp_gfx906_tpu.ops.kv_quant import QuantKV, insert_quant, quantize_rows

RNG = np.random.default_rng(11)


def make_case(B=2, T=1, Hq=4, Hkv=2, D=64, S=256, quant=False):
    q = jnp.asarray(RNG.standard_normal((B, T, Hq, D)) * 0.3, jnp.float32)
    k_new = jnp.asarray(RNG.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    v_new = jnp.asarray(RNG.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    n_past = jnp.asarray(RNG.integers(3, S - T - 1, size=B), jnp.int32)
    kv = RNG.standard_normal((2, B, S, Hkv, D)).astype(np.float32) * 0.3
    if quant:
        k_cache = quantize_rows(jnp.asarray(kv[0]))
        v_cache = quantize_rows(jnp.asarray(kv[1]))
    else:
        k_cache = jnp.asarray(kv[0])
        v_cache = jnp.asarray(kv[1])
    return q, k_new, v_new, k_cache, v_cache, n_past


def oracle_and_kernel(q, k_new, v_new, k_cache, v_cache, n_past,
                      window=0, softcap=0.0, sinks=None, alibi=None,
                      kv_pos=None, q_pos=None, shared_k=None, shared_v=None):
    scale = q.shape[-1] ** -0.5
    # oracle: the einsum reference path (never takes the flash branch on CPU)
    ref, k_store, v_store = mha_with_cache(
        q, k_new, v_new, k_cache, v_cache, n_past, scale,
        sliding_window=window, logit_softcap=softcap, sinks=sinks,
        alibi_slopes=alibi, kv_pos=kv_pos, q_pos=q_pos,
        shared_k=shared_k, shared_v=shared_v,
    )
    got = flash_decode(
        q, k_store, v_store, n_past, scale,
        sliding_window=window, logit_softcap=softcap, sinks=sinks,
        alibi_slopes=alibi, kv_pos=kv_pos, q_pos=q_pos,
        shared_k=shared_k, shared_v=shared_v,
        interpret=True,
    )
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


def assert_close(ref, got, tol=2e-2):
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < tol


def test_decode_basic():
    ref, got = oracle_and_kernel(*make_case())
    assert_close(ref, got)


def test_decode_t_greater_one():
    ref, got = oracle_and_kernel(*make_case(T=5))
    assert_close(ref, got)


def test_decode_mha():
    ref, got = oracle_and_kernel(*make_case(Hq=4, Hkv=4))
    assert_close(ref, got)


def test_decode_sliding_window():
    ref, got = oracle_and_kernel(*make_case(S=384), window=64)
    assert_close(ref, got)


def test_decode_softcap():
    ref, got = oracle_and_kernel(*make_case(), softcap=30.0)
    assert_close(ref, got)


def test_decode_sinks():
    sinks = jnp.asarray(RNG.standard_normal(4), jnp.float32)
    ref, got = oracle_and_kernel(*make_case(), sinks=sinks)
    assert_close(ref, got)


def test_decode_sinks_with_window():
    sinks = jnp.asarray(RNG.standard_normal(4), jnp.float32)
    ref, got = oracle_and_kernel(*make_case(S=384), window=96, sinks=sinks)
    assert_close(ref, got)


def test_decode_quant_kv():
    ref, got = oracle_and_kernel(*make_case(quant=True))
    assert_close(ref, got, tol=3e-2)


def test_decode_quant_kv_t4():
    ref, got = oracle_and_kernel(*make_case(T=4, quant=True))
    assert_close(ref, got, tol=3e-2)


def test_decode_quant_kv_sinks_window():
    sinks = jnp.asarray(RNG.standard_normal(4), jnp.float32)
    ref, got = oracle_and_kernel(
        *make_case(S=384, quant=True), window=128, sinks=sinks
    )
    assert_close(ref, got, tol=3e-2)


def test_decode_respects_n_past_isolation():
    """Rows beyond n_past+T must not influence the output."""
    q, k_new, v_new, k_cache, v_cache, n_past = make_case(B=1, S=256)
    scale = q.shape[-1] ** -0.5
    _, k_store, v_store = mha_with_cache(
        q, k_new, v_new, k_cache, v_cache, n_past, scale
    )
    out1 = flash_decode(q, k_store, v_store, n_past, scale, interpret=True)
    # poison dead rows
    live = int(n_past[0]) + 1
    k_bad = k_store.at[:, live:].set(1e4)
    v_bad = v_store.at[:, live:].set(1e4)
    out2 = flash_decode(q, k_bad, v_bad, n_past, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out2, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_decode_sinks_dominant_no_overflow():
    """When every live score sits far below the sink logit, exp(sink - m)
    must not overflow — the sink folds into the running max (regression:
    denominator hit inf and the head collapsed to zeros)."""
    B, T, Hq, Hkv, D, S = 1, 1, 2, 1, 64, 128
    k_row = RNG.standard_normal((1, 1, Hkv, D)).astype(np.float32)
    # queries anti-aligned with every key → scores ≈ -200 after scaling
    kv = np.tile(k_row[:, 0:1], (1, S, 1, 1)).astype(np.float32)
    q = jnp.asarray(-np.tile(k_row, (1, T, Hq // Hkv, 1)) * 30, jnp.float32)
    sinks = jnp.asarray(np.zeros(Hq, np.float32))  # sink at 0 >> scores
    n_past = jnp.asarray([100], jnp.int32)
    ref, got = oracle_and_kernel(
        q, jnp.asarray(k_row.repeat(T, 1)), jnp.asarray(k_row.repeat(T, 1)),
        jnp.asarray(kv), jnp.asarray(kv), n_past, sinks=sinks)
    assert np.isfinite(got).all()
    assert_close(ref, got)


# ---------------------------------------------------------------------------
# ALiBi / self-extend / shared-prefix on the kernel path (the combos that
# previously fell back to the whole-cache einsum — VERDICT r3 items 4, 9)

def _alibi(Hq):
    from llama_cpp_gfx906_tpu.ops.attention import alibi_slopes_for

    return alibi_slopes_for(Hq)


def test_decode_alibi_gqa():
    ref, got = oracle_and_kernel(*make_case(), alibi=_alibi(4))
    assert_close(ref, got)


def test_decode_alibi_mha_t3():
    ref, got = oracle_and_kernel(*make_case(T=3, Hq=4, Hkv=4), alibi=_alibi(4))
    assert_close(ref, got)


def test_decode_alibi_softcap_window():
    # order matters: softcap applies before the ALiBi bias (oracle order)
    ref, got = oracle_and_kernel(
        *make_case(S=384), alibi=_alibi(4), softcap=25.0, window=96
    )
    assert_close(ref, got)


def test_decode_alibi_quant_kv():
    ref, got = oracle_and_kernel(*make_case(quant=True), alibi=_alibi(4))
    assert_close(ref, got, tol=3e-2)


def _self_extend_pos(n_past, S, T, group=2):
    """Grouped-attention remap (llama_kv_cache_seq_div analog): physical
    row i holds logical position i // group; the T new tokens continue
    the same ladder."""
    B = n_past.shape[0]
    kv_pos = jnp.broadcast_to(jnp.arange(S)[None, :] // group, (B, S))
    q_pos = (n_past[:, None] + jnp.arange(T)[None, :]) // group
    return kv_pos.astype(jnp.int32), q_pos.astype(jnp.int32)


def test_decode_self_extend():
    case = make_case()
    q, *_, n_past = case
    kv_pos, q_pos = _self_extend_pos(n_past, 256, q.shape[1])
    ref, got = oracle_and_kernel(*case, kv_pos=kv_pos, q_pos=q_pos)
    assert_close(ref, got)


def test_decode_self_extend_t4_window():
    case = make_case(T=4, S=384)
    q, *_, n_past = case
    kv_pos, q_pos = _self_extend_pos(n_past, 384, 4, group=3)
    ref, got = oracle_and_kernel(
        *case, kv_pos=kv_pos, q_pos=q_pos, window=32
    )
    assert_close(ref, got)


def test_decode_self_extend_quant_kv():
    case = make_case(quant=True)
    q, *_, n_past = case
    kv_pos, q_pos = _self_extend_pos(n_past, 256, 1)
    ref, got = oracle_and_kernel(*case, kv_pos=kv_pos, q_pos=q_pos)
    assert_close(ref, got, tol=3e-2)


def test_decode_self_extend_alibi():
    case = make_case()
    q, *_, n_past = case
    kv_pos, q_pos = _self_extend_pos(n_past, 256, 1)
    ref, got = oracle_and_kernel(
        *case, kv_pos=kv_pos, q_pos=q_pos, alibi=_alibi(4)
    )
    assert_close(ref, got)


def _shared(S0=40, Hkv=2, D=64):
    sh = RNG.standard_normal((2, 1, S0, Hkv, D)).astype(np.float32) * 0.3
    return jnp.asarray(sh[0]), jnp.asarray(sh[1])


def test_decode_shared_prefix():
    sk, sv = _shared()
    ref, got = oracle_and_kernel(*make_case(), shared_k=sk, shared_v=sv)
    assert_close(ref, got)


def test_decode_shared_prefix_t4_block_multiple():
    # S0 an exact multiple of block_k: no pad-tail rows to mask
    sk, sv = _shared(S0=128)
    ref, got = oracle_and_kernel(*make_case(T=4), shared_k=sk, shared_v=sv)
    assert_close(ref, got)


def test_decode_shared_prefix_quant_kv():
    # own cache int8, shared rows bf16/f32 — mixed-precision branches
    sk, sv = _shared(S0=70)
    ref, got = oracle_and_kernel(
        *make_case(quant=True), shared_k=sk, shared_v=sv
    )
    assert_close(ref, got, tol=3e-2)


def test_decode_shared_prefix_sinks_softcap():
    sk, sv = _shared()
    sinks = jnp.asarray(RNG.standard_normal(4), jnp.float32)
    ref, got = oracle_and_kernel(
        *make_case(), shared_k=sk, shared_v=sv, sinks=sinks, softcap=30.0
    )
    assert_close(ref, got)


def test_decode_shared_prefix_alibi_window():
    sk, sv = _shared(S0=96)
    ref, got = oracle_and_kernel(
        *make_case(S=384), shared_k=sk, shared_v=sv,
        alibi=_alibi(4), window=160,
    )
    assert_close(ref, got)


def test_decode_shared_prefix_attended():
    """Shared rows are actually attended: perturbing them must move the
    output (guards against a dispatch that silently drops the segment)."""
    sk, sv = _shared(S0=40)
    q, k_new, v_new, k_cache, v_cache, n_past = make_case(B=1)
    scale = q.shape[-1] ** -0.5
    _, k_store, v_store = mha_with_cache(
        q, k_new, v_new, k_cache, v_cache, n_past, scale,
        shared_k=sk, shared_v=sv,
    )
    out1 = flash_decode(q, k_store, v_store, n_past, scale,
                        shared_k=sk, shared_v=sv, interpret=True)
    out2 = flash_decode(q, k_store, v_store, n_past, scale,
                        shared_k=sk + 1.0, shared_v=sv + 1.0, interpret=True)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_decode_shared_prefix_pad_isolation(monkeypatch):
    """Rows the kernel appends to round S0 up to block_k must be masked:
    fill the pad with huge values instead of zeros and demand the output
    still matches the einsum oracle (a leak would blow the logits up)."""
    import llama_cpp_gfx906_tpu.ops.flash_decode as fd

    sk, sv = _shared(S0=40)  # pads to the 512-row block internally
    q, k_new, v_new, k_cache, v_cache, n_past = make_case(B=1)
    scale = q.shape[-1] ** -0.5
    ref, k_store, v_store = mha_with_cache(
        q, k_new, v_new, k_cache, v_cache, n_past, scale,
        shared_k=sk, shared_v=sv,
    )
    real_pad = jnp.pad

    def poison_pad(arr, pad_width, **kw):
        if arr.ndim == 4 and not kw:  # the shared-segment pad call
            return real_pad(arr, pad_width, constant_values=1e4)
        return real_pad(arr, pad_width, **kw)

    monkeypatch.setattr(fd.jnp, "pad", poison_pad)
    got = flash_decode(q, k_store, v_store, n_past, scale,
                       shared_k=sk, shared_v=sv, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    assert_close(np.asarray(ref, np.float32), np.asarray(got, np.float32))
