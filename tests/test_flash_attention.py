"""Flash attention kernel vs the einsum oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_gfx906_tpu.ops.attention import insert_kv, mha_with_cache
from llama_cpp_gfx906_tpu.ops.flash_attention import flash_attention

RNG = np.random.default_rng(3)


def make_case(B=2, T=128, S=256, Hq=4, Hkv=2, D=64, n_past_vals=(0, 64)):
    q = jnp.asarray(RNG.standard_normal((B, T, Hq, D)) * 0.3, jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, S, Hkv, D)) * 0.3, jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, S, Hkv, D)) * 0.3, jnp.float32)
    n_past = jnp.asarray(n_past_vals[:B], jnp.int32)
    return q, k, v, n_past


def oracle(q, k_cache, v_cache, n_past, scale, sliding_window=0, softcap=0.0):
    """einsum attention over an already-filled cache (no insertion)."""
    B, T, Hq, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k_cache, preferred_element_type=jnp.float32) * scale
    if softcap > 0:
        s = jnp.tanh(s / softcap) * softcap
    q_pos = n_past[:, None] + jnp.arange(T)[None, :]
    k_pos = jnp.arange(S)[None, :]
    mask = k_pos[:, None, :] <= q_pos[:, :, None]
    if sliding_window > 0:
        mask &= k_pos[:, None, :] > q_pos[:, :, None] - sliding_window
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", p, v_cache, preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D)


@pytest.mark.parametrize("case", [
    dict(),  # base GQA
    dict(Hq=4, Hkv=4),  # MHA
    dict(T=100, S=200),  # non-multiple shapes → padding paths
    dict(n_past_vals=(32, 5)),  # ragged per-sequence offsets
])
def test_flash_matches_oracle(case):
    q, k, v, n_past = make_case(**case)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = np.asarray(oracle(q, k, v, n_past, scale))
    got = np.asarray(
        flash_attention(q, k, v, n_past, scale, block_q=64, block_k=64, interpret=True)
    )
    # rows with no visible keys (q_pos beyond... none here) — compare valid rows
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_flash_sliding_window():
    q, k, v, n_past = make_case(B=1, T=128, S=128, n_past_vals=(0,))
    scale = 0.125
    ref = np.asarray(oracle(q, k, v, n_past, scale, sliding_window=32))
    got = np.asarray(
        flash_attention(q, k, v, n_past, scale, sliding_window=32, block_q=64, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_flash_softcap():
    q, k, v, n_past = make_case(B=1, T=64, S=64, n_past_vals=(0,))
    ref = np.asarray(oracle(q, k, v, n_past, 0.125, softcap=30.0))
    got = np.asarray(
        flash_attention(q, k, v, n_past, 0.125, logit_softcap=30.0, block_q=64, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_mha_with_cache_einsum_path_unchanged():
    """On CPU the dispatch keeps the einsum path; sanity the wrapper."""
    B, T, S, Hq, Hkv, D = 1, 8, 32, 4, 2, 16
    q = jnp.asarray(RNG.standard_normal((B, T, Hq, D)), jnp.float32)
    kn = jnp.asarray(RNG.standard_normal((B, T, Hkv, D)), jnp.float32)
    vn = jnp.asarray(RNG.standard_normal((B, T, Hkv, D)), jnp.float32)
    kc = jnp.zeros((B, S, Hkv, D))
    vc = jnp.zeros((B, S, Hkv, D))
    n_past = jnp.zeros((B,), jnp.int32)
    out, kc2, vc2 = mha_with_cache(q, kn, vn, kc, vc, n_past, 0.25)
    assert out.shape == (B, T, Hq, D)
    np.testing.assert_allclose(np.asarray(kc2[:, :T]), np.asarray(kn), rtol=1e-6)


def test_flash_sinks():
    """Sink logit joins the softmax denominator (gpt-oss prefill path)."""
    from llama_cpp_gfx906_tpu.ops.kv_quant import quantize_rows

    q, k, v, n_past = make_case()
    Hq = q.shape[2]
    sinks = jnp.asarray(RNG.standard_normal(Hq), jnp.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    # oracle with sinks: extra denominator term per head
    ref_plain = oracle(q, k, v, n_past, scale)
    # recompute via mha semantics (einsum path handles sinks)
    ref, _, _ = mha_with_cache(
        q, q[:, :0, :2], q[:, :0, :2],  # no new rows: T=0 inserts
        k, v, n_past, scale, sinks=sinks,
    )
    got = np.asarray(
        flash_attention(q, k, v, n_past, scale, sinks=sinks,
                        block_q=64, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-3, atol=2e-3)
    assert np.abs(got - np.asarray(ref_plain)).max() > 1e-3  # sinks changed it


def test_flash_quantized_kv():
    """int8 KV + per-row scales consumed in-kernel match the dequantized run."""
    from llama_cpp_gfx906_tpu.ops.kv_quant import dequantize_rows, quantize_rows

    q, k, v, n_past = make_case()
    scale = 1.0 / np.sqrt(q.shape[-1])
    kq = quantize_rows(k)
    vq = quantize_rows(v)
    ref = np.asarray(
        oracle(q, dequantize_rows(kq, jnp.float32), dequantize_rows(vq, jnp.float32),
               n_past, scale)
    )
    got = np.asarray(
        flash_attention(
            q, kq.q, vq.q, n_past, scale,
            k_scales=kq.s[..., 0], v_scales=vq.s[..., 0],
            block_q=64, block_k=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_flash_quantized_kv_window_sinks():
    from llama_cpp_gfx906_tpu.ops.kv_quant import dequantize_rows, quantize_rows

    q, k, v, n_past = make_case(S=320)
    Hq = q.shape[2]
    sinks = jnp.asarray(RNG.standard_normal(Hq), jnp.float32)
    scale = 1.0 / np.sqrt(q.shape[-1])
    kq = quantize_rows(k)
    vq = quantize_rows(v)
    ref, _, _ = mha_with_cache(
        q, q[:, :0, :2], q[:, :0, :2],
        dequantize_rows(kq, jnp.float32), dequantize_rows(vq, jnp.float32),
        n_past, scale, sliding_window=64, sinks=sinks,
    )
    got = np.asarray(
        flash_attention(
            q, kq.q, vq.q, n_past, scale, sliding_window=64, sinks=sinks,
            k_scales=kq.s[..., 0], v_scales=vq.s[..., 0],
            block_q=64, block_k=64, interpret=True,
        )
    )
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-2, atol=2e-2)
