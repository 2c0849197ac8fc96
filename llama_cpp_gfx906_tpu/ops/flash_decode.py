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
  denominator in the epilogue;
- **ALiBi** (mpt/bloom/baichuan-13b, ``ggml_soft_max_ext`` positional
  bias): per-lane slopes stream like the sink row and the bias is applied
  from the same position iotas the mask already builds — ALiBi decode no
  longer falls back to the whole-cache einsum;
- **self-extend positions** (``llama_kv_cache_seq_div`` grouped-attention
  remap): the logical-position plane streams through the *same* live-block
  index map as K, so remapped masking keeps n_past-proportional cost;
- **shared-prefix segment** (reference system-prompt KV reuse): the grid
  grows ``n_sh`` leading steps that stream the batch-shared rows (stored
  once, batch dim 1) into the same running softmax — no per-slot broadcast
  copy, no einsum fallback.

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


def _lane_heads(Hkv: int, Hq: int, T: int) -> np.ndarray:
    """Head index carried by each of the Hkv·LANES query lanes
    (lane u of head-group h is query head h·G + u//T)."""
    G = Hq // Hkv
    u = np.arange(Hkv * _LANES)
    lane_head = u // _LANES * G + (u % _LANES) // max(T, 1)
    return np.minimum(lane_head, Hq - 1)


def _decode_kernel(
    # scalar prefetch
    npast_ref,  # (B,) int32 fill level per sequence (pre-insert)
    win_ref,  # (1,) int32 sliding window; <= 0 disables
    # inputs
    *refs,
    scale: float,
    block_k: int,
    n_k: int,
    n_sh: int,
    s0: int,
    T: int,
    G: int,
    Hkv: int,
    logit_softcap: float,
    kv_quant: bool,
    has_sinks: bool,
    has_alibi: bool,
    has_pos: bool,
):
    from jax.experimental import pallas as pl

    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    ks_ref = next(it) if kv_quant else None
    vs_ref = next(it) if kv_quant else None
    sinks_ref = next(it) if has_sinks else None
    al_ref = next(it) if has_alibi else None
    kvpos_ref = next(it) if has_pos else None
    qposl_ref = next(it) if has_pos else None
    shk_ref = next(it) if n_sh else None
    shv_ref = next(it) if n_sh else None
    o_ref, acc_ref, m_ref, l_ref = tuple(it)

    b = pl.program_id(0)
    j = pl.program_id(1)
    n_past = npast_ref[b]
    window = win_ref[0]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    k_off = jax.lax.broadcasted_iota(jnp.int32, (block_k, _LANES), 0)
    t_lane = jax.lax.broadcasted_iota(jnp.int32, (block_k, _LANES), 1) % T

    def process(get_k, get_v, get_ks, get_vs, mask, dist):
        """One (BK, LANES) softmax-accumulate step over every KV head.

        ``dist`` is the (q_pos − k_pos) plane for ALiBi, or None."""
        for h in range(Hkv):
            lanes = slice(h * _LANES, (h + 1) * _LANES)
            q_h = q_ref[0, h]  # (LANES, D)
            k_h = get_k(h)  # (BK, D)
            s_t = jax.lax.dot_general(
                k_h,
                q_h,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BK, LANES) — keys on sublanes, queries on lanes
            if get_ks is not None:
                s_t = s_t * get_ks(h)  # per-key scale
            s_t = s_t * scale
            if logit_softcap > 0.0:
                s_t = jnp.tanh(s_t / logit_softcap) * logit_softcap
            if dist is not None:
                # ALiBi: score -= slope_head · (q_pos − k_pos); applied
                # after the softcap, matching the einsum oracle order
                s_t = s_t - al_ref[0:1, lanes] * dist
            s_t = jnp.where(mask, s_t, NEG_INF)

            m_prev = m_ref[0:1, lanes]  # (1, LANES)
            m_cur = jnp.maximum(m_prev, s_t.max(axis=0, keepdims=True))
            p = jnp.exp(s_t - m_cur)  # (BK, LANES)
            alpha = jnp.exp(m_prev - m_cur)  # (1, LANES)
            l_new = l_ref[0:1, lanes] * alpha + p.sum(axis=0, keepdims=True)
            if get_vs is not None:
                p = p * get_vs(h)  # per-value scale
            pv = jax.lax.dot_general(
                get_v(h),
                p.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (D, LANES)
            acc_ref[:, lanes] = acc_ref[:, lanes] * alpha + pv
            m_ref[:, lanes] = jnp.broadcast_to(m_cur, (m_ref.shape[0], _LANES))
            l_ref[:, lanes] = jnp.broadcast_to(l_new, (l_ref.shape[0], _LANES))

    if n_sh:
        # shared-prefix steps: rows live at logical positions 0..s0-1,
        # always causally visible (every query sits at logical >= s0);
        # only the pad tail and the sliding window mask anything
        @pl.when(j < n_sh)
        def _():
            k_sh = j * block_k + k_off
            q_log = s0 + n_past + t_lane
            mask = k_sh < s0
            mask &= jnp.logical_or(window <= 0, k_sh > q_log - window)
            dist = (q_log - k_sh).astype(jnp.float32) if has_alibi else None
            process(
                lambda h: shk_ref[0, :, h, :].astype(jnp.bfloat16),
                lambda h: shv_ref[0, :, h, :].astype(jnp.bfloat16),
                None,
                None,
                mask,
                dist,
            )

    jj = j - n_sh
    # query t sits at physical position n_past + t; rows [0, n_past + T)
    # are live
    own_needed = jj * block_k <= n_past + T - 1
    if not has_pos:
        # physical == logical (up to the shared shift, which cancels in
        # every position difference) — whole blocks behind the window can
        # be skipped.  With remapped positions the logical plane must be
        # read before masking, so no position-based block skip applies.
        own_needed &= jnp.logical_or(
            window <= 0, (jj + 1) * block_k - 1 > n_past - window
        )
    if n_sh:
        own_needed &= j >= n_sh

    @pl.when(own_needed)
    def _():
        k_phys = jj * block_k + k_off
        if has_pos:
            # self-extend: mask on the streamed logical positions; rows
            # beyond the fill level stay hidden by the physical check
            k_log = kvpos_ref[0, :, 0:1]  # (BK, 1)
            q_log = qposl_ref[0, 0:1, :]  # (1, LANES)
            mask = k_log <= q_log
            mask &= k_phys < n_past + T
            mask &= jnp.logical_or(window <= 0, k_log > q_log - window)
            dist = (q_log - k_log).astype(jnp.float32) if has_alibi else None
        else:
            q_phys = n_past + t_lane
            mask = k_phys <= q_phys
            mask &= jnp.logical_or(window <= 0, k_phys > q_phys - window)
            dist = (q_phys - k_phys).astype(jnp.float32) if has_alibi else None
        if kv_quant:
            process(
                lambda h: k_ref[0, :, h, :].astype(jnp.bfloat16),
                lambda h: v_ref[0, :, h, :].astype(jnp.bfloat16),
                lambda h: ks_ref[0, :, h : h + 1],
                lambda h: vs_ref[0, :, h : h + 1],
                mask,
                dist,
            )
        else:
            process(
                lambda h: k_ref[0, :, h, :],
                lambda h: v_ref[0, :, h, :],
                None,
                None,
                mask,
                dist,
            )

    @pl.when(j == n_sh + n_k - 1)
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
        "scale", "logit_softcap", "block_k", "kv_quant", "interpret",
        "t_dim", "s0",
    ),
)
def _flash_decode_call(
    qh,  # (B, Hkv, LANES, D) head-grouped, lane-padded queries
    k,  # (B, Sp, Hkv, D) bf16 or int8
    v,
    ks,  # (B, Sp, Hkv) f32 per-row scales or None
    vs,
    sinks_l,  # (8, Hkv·LANES) f32 or None
    alibi_l,  # (8, Hkv·LANES) f32 per-lane ALiBi slopes or None
    kvpos,  # (B, Sp, 1) int32 logical positions or None
    qposl,  # (B, 8, LANES) int32 per-lane query positions or None
    sh_k,  # (1, S0p, Hkv, D) shared-prefix rows or None
    sh_v,
    n_past,  # (B,) int32
    window,  # (1,) int32
    *,
    scale: float,
    logit_softcap: float,
    block_k: int,
    kv_quant: bool,
    t_dim: int,
    s0: int,  # true (unpadded) shared-prefix length; 0 disables
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Hkv, _, D = qh.shape
    Sp = k.shape[1]
    n_k = Sp // block_k
    n_sh = sh_k.shape[1] // block_k if sh_k is not None else 0
    T = t_dim
    G = _LANES // max(T, 1)
    L = Hkv * _LANES
    has_pos = kvpos is not None

    def _live_block(b, j, npast_ref, win_ref):
        # clamp dead blocks to the live frontier: repeated indices make
        # Mosaic skip the HBM fetch, so traffic follows n_past.  ONE
        # definition — the K/V fetch, the scale fetch, and the logical-
        # position fetch must never desynchronize.  Shared-prefix steps
        # (j < n_sh) pin the own-cache window to its first live block.
        jj = j - n_sh
        hi = (npast_ref[b] + T - 1) // block_k
        if has_pos:
            # remapped logical positions: the physical window precheck
            # doesn't apply, read from block 0
            lo = 0
        else:
            lo = jnp.where(
                win_ref[0] > 0,
                jnp.maximum(npast_ref[b] + 1 - win_ref[0], 0) // block_k,
                0,
            )
        return jnp.clip(jj, lo, hi)

    def kv_index(b, j, npast_ref, win_ref):
        return (b, _live_block(b, j, npast_ref, win_ref), 0, 0)

    def sc_index(b, j, npast_ref, win_ref):
        return (b, _live_block(b, j, npast_ref, win_ref), 0)

    def sh_index(b, j, npast_ref, win_ref):
        # constant during own-cache steps → DMA elided
        return (0, jnp.minimum(j, n_sh - 1), 0, 0)

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
    if alibi_l is not None:
        in_specs.append(
            pl.BlockSpec((8, L), lambda b, j, np_, w_: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(alibi_l)
    if has_pos:
        in_specs += [
            pl.BlockSpec((1, block_k, 1), sc_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, _LANES), lambda b, j, np_, w_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands += [kvpos, qposl]
    if n_sh:
        in_specs += [
            pl.BlockSpec((1, block_k, Hkv, D), sh_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Hkv, D), sh_index, memory_space=pltpu.VMEM),
        ]
        operands += [sh_k, sh_v]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_sh + n_k),
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
            n_sh=n_sh,
            s0=s0,
            T=T,
            G=G,
            Hkv=Hkv,
            logit_softcap=logit_softcap,
            kv_quant=kv_quant,
            has_sinks=sinks_l is not None,
            has_alibi=alibi_l is not None,
            has_pos=has_pos,
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
    alibi_slopes: jnp.ndarray | None = None,  # (Hq,) per-head ALiBi slopes
    kv_pos: jnp.ndarray | None = None,  # (B, S) logical positions (self-extend)
    q_pos: jnp.ndarray | None = None,  # (B, T) query positions when kv_pos set
    shared_k: jnp.ndarray | None = None,  # (1, S0, Hkv, D) shared-prefix rows
    shared_v: jnp.ndarray | None = None,
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
    if shared_k is not None and kv_pos is not None:
        raise NotImplementedError("shared-prefix KV + self-extend positions")
    if kv_pos is not None and q_pos is None:
        raise ValueError("flash_decode: kv_pos requires q_pos")

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

    lane_head = None
    sinks_l = None
    if sinks is not None:
        lane_head = jnp.asarray(_lane_heads(Hkv, Hq, T))
        sl = sinks.astype(jnp.float32)[lane_head]
        sinks_l = jnp.broadcast_to(sl[None, :], (8, Hkv * _LANES))
    alibi_l = None
    if alibi_slopes is not None:
        if lane_head is None:
            lane_head = jnp.asarray(_lane_heads(Hkv, Hq, T))
        al = alibi_slopes.astype(jnp.float32)[lane_head]
        alibi_l = jnp.broadcast_to(al[None, :], (8, Hkv * _LANES))

    kvpos_in = qposl_in = None
    if kv_pos is not None:
        kvpos_in = kv_pos.astype(jnp.int32)
        if Sp != S:
            # pad rows are dead (masked by the physical fill-level check)
            kvpos_in = jnp.pad(kvpos_in, ((0, 0), (0, Sp - S)))
        kvpos_in = kvpos_in[..., None]  # (B, Sp, 1)
        # lane u carries query t = u % T
        lane_t = jnp.arange(_LANES) % max(T, 1)
        qposl = q_pos.astype(jnp.int32)[:, lane_t]  # (B, LANES)
        qposl_in = jnp.broadcast_to(qposl[:, None, :], (B, 8, _LANES))

    sh_k_in = sh_v_in = None
    s0 = 0
    if shared_k is not None:
        s0 = shared_k.shape[1]
        S0p = -(-s0 // bk) * bk
        sh_k_in = shared_k
        sh_v_in = shared_v
        if S0p != s0:
            pad4 = ((0, 0), (0, S0p - s0), (0, 0), (0, 0))
            sh_k_in = jnp.pad(sh_k_in, pad4)
            sh_v_in = jnp.pad(sh_v_in, pad4)

    window = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1,))
    out = _flash_decode_call(
        qh, k_arr, v_arr, ks, vs, sinks_l, alibi_l, kvpos_in, qposl_in,
        sh_k_in, sh_v_in,
        n_past, window,
        scale=scale, logit_softcap=logit_softcap, block_k=bk,
        kv_quant=kv_quant, t_dim=T, s0=s0, interpret=interpret,
    )  # (B, D, Hkv·LANES)
    out = out.reshape(B, D, Hkv, _LANES)[:, :, :, : G * T]
    out = out.reshape(B, D, Hkv, G, T).transpose(0, 4, 2, 3, 1)  # (B,T,Hkv,G,D)
    return out.reshape(B, T, Hq, D).astype(q.dtype)
