"""Decode-time flash attention Pallas kernel (T = 1..few new tokens).

The TPU analog of the reference's fused decode attention
(``ggml_flash_attn_ext`` consumed by ``build_attn_mha``,
``src/llama-graph.cpp:1220-1259``, including ``*_add_sinks``) specialized
for the decode regime, where attention is a pure HBM-bandwidth problem:

- **reads only live KV blocks**: per-sequence fill levels are scalar-
  prefetched and the K/V block index maps clamp dead block indices to the
  last live block — Mosaic elides the DMA when consecutive grid steps map
  to the same block, so HBM traffic is ∝ ``n_past``, not ``max_seq``;
- **consumes quantized (int8) KV in place**: per-row scales stream as
  ``(BK, Hkv)`` tiles and fold into the score / probability columns — the
  cache is never materialized in bf16 (reference: blockwise dequant inside
  the attention kernel; kills the whole-cache ``dequantize_rows``);
- **K/V stay in stored layout** ``(B, S, Hkv, D)``: one kernel block
  carries all KV heads of a position range, so no cache-sized transpose is
  materialized per step (the prefill kernel's (B,H,S,D) relayout is
  amortized over many query tokens; at T=1 it would triple traffic);
- **attention sinks** (gpt-oss): the per-head sink logit joins the softmax
  denominator in the epilogue.

Internal orientation: scores are computed transposed, ``(BK, queries)``
with queries on lanes — per-key quant scales, masks, and the running
max/denominator all broadcast along their natural axis, so the kernel
contains no vector relayouts.  Each KV head's query group is padded to 128
lanes (G·T ≤ 128 queries per KV head).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
_LANES = 128  # query lanes per KV head group


def _decode_kernel(
    # scalar prefetch
    npast_ref,  # (B,) int32 fill level per sequence (pre-insert)
    win_ref,  # (1,) int32 sliding window; <= 0 disables
    # inputs
    *refs,
    scale: float,
    block_k: int,
    n_k: int,
    T: int,
    G: int,
    Hkv: int,
    logit_softcap: float,
    kv_quant: bool,
    has_sinks: bool,
):
    from jax.experimental import pallas as pl

    if kv_quant:
        q_ref, k_ref, v_ref, ks_ref, vs_ref = refs[:5]
        rest = refs[5:]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        ks_ref = vs_ref = None
        rest = refs[3:]
    if has_sinks:
        sinks_ref = rest[0]
        rest = rest[1:]
    else:
        sinks_ref = None
    o_ref, acc_ref, m_ref, l_ref = rest

    b = pl.program_id(0)
    j = pl.program_id(1)
    n_past = npast_ref[b]
    window = win_ref[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # query t sits at position n_past + t; rows [0, n_past + T) are live
    block_needed = j * block_k <= n_past + T - 1
    block_needed &= jnp.logical_or(
        window <= 0, (j + 1) * block_k - 1 > n_past - window
    )

    @pl.when(block_needed)
    def _():
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, _LANES), 0
        )
        # lane u inside a head group is query (g, t) with u = g*T + t
        q_pos = n_past + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, _LANES), 1
        ) % T
        mask = k_pos <= q_pos
        mask &= jnp.logical_or(window <= 0, k_pos > q_pos - window)

        for h in range(Hkv):
            lanes = slice(h * _LANES, (h + 1) * _LANES)
            q_h = q_ref[0, h]  # (LANES, D)
            k_h = k_ref[0, :, h, :]  # (BK, D)
            v_h = v_ref[0, :, h, :]
            s_t = jax.lax.dot_general(
                k_h.astype(jnp.bfloat16) if kv_quant else k_h,
                q_h,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BK, LANES) — keys on sublanes, queries on lanes
            if kv_quant:
                s_t = s_t * ks_ref[0, :, h : h + 1]  # per-key scale
            s_t = s_t * scale
            if logit_softcap > 0.0:
                s_t = jnp.tanh(s_t / logit_softcap) * logit_softcap
            s_t = jnp.where(mask, s_t, NEG_INF)

            m_prev = m_ref[0:1, lanes]  # (1, LANES)
            m_cur = jnp.maximum(m_prev, s_t.max(axis=0, keepdims=True))
            p = jnp.exp(s_t - m_cur)  # (BK, LANES)
            alpha = jnp.exp(m_prev - m_cur)  # (1, LANES)
            l_new = l_ref[0:1, lanes] * alpha + p.sum(axis=0, keepdims=True)
            if kv_quant:
                p = p * vs_ref[0, :, h : h + 1]  # per-value scale
            pv = jax.lax.dot_general(
                v_h.astype(jnp.bfloat16) if kv_quant else v_h,
                p.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (D, LANES)
            acc_ref[:, lanes] = acc_ref[:, lanes] * alpha + pv
            m_ref[:, lanes] = jnp.broadcast_to(m_cur, (m_ref.shape[0], _LANES))
            l_ref[:, lanes] = jnp.broadcast_to(l_new, (l_ref.shape[0], _LANES))

    @pl.when(j == n_k - 1)
    def _():
        denom = l_ref[0:1, :]  # (1, Hkv·LANES)
        acc = acc_ref[:]
        if has_sinks:
            # fold the sink into the running max (oracle behavior) so
            # exp(sink - m) cannot overflow at very negative live scores
            m_new = jnp.maximum(m_ref[0:1, :], sinks_ref[0:1, :])
            alpha = jnp.exp(m_ref[0:1, :] - m_new)
            denom = denom * alpha + jnp.exp(sinks_ref[0:1, :] - m_new)
            acc = acc * alpha
        o_ref[0] = (acc / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "logit_softcap", "block_k", "kv_quant", "interpret", "t_dim"
    ),
)
def _flash_decode_call(
    qh,  # (B, Hkv, LANES, D) head-grouped, lane-padded queries
    k,  # (B, Sp, Hkv, D) bf16 or int8
    v,
    ks,  # (B, Sp, Hkv) f32 per-row scales or None
    vs,
    sinks_l,  # (8, Hkv·LANES) f32 or None
    n_past,  # (B,) int32
    window,  # (1,) int32
    *,
    scale: float,
    logit_softcap: float,
    block_k: int,
    kv_quant: bool,
    t_dim: int,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, _, D = qh.shape
    Sp = k.shape[1]
    n_k = Sp // block_k
    T = t_dim
    G = _LANES // max(T, 1)
    L = Hkv * _LANES

    def _live_block(b, j, npast_ref, win_ref):
        # clamp dead blocks to the live frontier: repeated indices make
        # Mosaic skip the HBM fetch, so traffic follows n_past.  ONE
        # definition — the K/V fetch and the scale fetch must never
        # desynchronize
        hi = (npast_ref[b] + T - 1) // block_k
        lo = jnp.where(
            win_ref[0] > 0,
            jnp.maximum(npast_ref[b] + 1 - win_ref[0], 0) // block_k,
            0,
        )
        return jnp.clip(j, lo, hi)

    def kv_index(b, j, npast_ref, win_ref):
        return (b, _live_block(b, j, npast_ref, win_ref), 0, 0)

    def sc_index(b, j, npast_ref, win_ref):
        return (b, _live_block(b, j, npast_ref, win_ref), 0)

    in_specs = [
        pl.BlockSpec(
            (1, Hkv, _LANES, D), lambda b, j, np_, w_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, block_k, Hkv, D), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, Hkv, D), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qh, k, v]
    if kv_quant:
        in_specs += [
            pl.BlockSpec((1, block_k, Hkv), sc_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Hkv), sc_index, memory_space=pltpu.VMEM),
        ]
        operands += [ks, vs]
    if sinks_l is not None:
        in_specs.append(
            pl.BlockSpec((8, L), lambda b, j, np_, w_: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(sinks_l)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, D, L), lambda b, j, np_, w_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((D, L), jnp.float32),
            pltpu.VMEM((8, L), jnp.float32),
            pltpu.VMEM((8, L), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            scale=scale,
            block_k=block_k,
            n_k=n_k,
            T=T,
            G=G,
            Hkv=Hkv,
            logit_softcap=logit_softcap,
            kv_quant=kv_quant,
            has_sinks=sinks_l is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(n_past.astype(jnp.int32), window.astype(jnp.int32), *operands)
    return out


def flash_decode(
    q: jnp.ndarray,  # (B, T, Hq, D) — T small (decode / short verify chunk)
    k_cache,  # (B, S, Hkv, D) array, or QuantKV with q int8 + s (B,S,Hkv,1)
    v_cache,
    n_past: jnp.ndarray,  # (B,) int32 fill level (before these T tokens)
    scale: float,
    sliding_window=0,  # int or traced int32; <= 0 disables
    logit_softcap: float = 0.0,
    sinks: jnp.ndarray | None = None,  # (Hq,) attention-sink logits
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention over the already-updated cache; returns (B,T,Hq,D)."""
    from .kv_quant import QuantKV

    B, T, Hq, D = q.shape
    kv_quant = isinstance(k_cache, QuantKV)
    if kv_quant:
        k_arr, v_arr = k_cache.q, v_cache.q
        ks = k_cache.s[..., 0]  # (B, S, Hkv)
        vs = v_cache.s[..., 0]
    else:
        k_arr, v_arr = k_cache, v_cache
        ks = vs = None
    S, Hkv = k_arr.shape[1], k_arr.shape[2]
    G = Hq // Hkv
    if G * T > _LANES:
        raise ValueError(f"flash_decode: G·T = {G * T} exceeds {_LANES} lanes")

    bk = min(block_k, S)
    Sp = -(-S // bk) * bk
    if Sp != S:
        pad4 = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
        k_arr = jnp.pad(k_arr, pad4)
        v_arr = jnp.pad(v_arr, pad4)
        if kv_quant:
            ks = jnp.pad(ks, ((0, 0), (0, Sp - S), (0, 0)))
            vs = jnp.pad(vs, ((0, 0), (0, Sp - S), (0, 0)))

    # head-grouped queries: lane u of group h is query (g = u//T, t = u%T)
    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * T, D)
    qh = jnp.pad(qh, ((0, 0), (0, 0), (0, _LANES - G * T), (0, 0)))
    qh = qh.astype(jnp.bfloat16)

    sinks_l = None
    if sinks is not None:
        # lane u of head-group h carries head h·G + u//T
        lane_head = np.arange(Hkv * _LANES) // _LANES * G + (
            np.arange(Hkv * _LANES) % _LANES
        ) // max(T, 1)
        lane_head = np.minimum(lane_head, Hq - 1)
        sl = sinks.astype(jnp.float32)[jnp.asarray(lane_head)]
        sinks_l = jnp.broadcast_to(sl[None, :], (8, Hkv * _LANES))

    window = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1,))
    out = _flash_decode_call(
        qh, k_arr, v_arr, ks, vs, sinks_l,
        n_past, window,
        scale=scale, logit_softcap=logit_softcap, block_k=bk,
        kv_quant=kv_quant, t_dim=T, interpret=interpret,
    )  # (B, D, Hkv·LANES)
    out = out.reshape(B, D, Hkv, _LANES)[:, :, :, : G * T]
    out = out.reshape(B, D, Hkv, G, T).transpose(0, 4, 2, 3, 1)  # (B,T,Hkv,G,D)
    return out.reshape(B, T, Hq, D).astype(q.dtype)
