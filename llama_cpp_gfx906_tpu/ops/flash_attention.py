"""Blockwise (flash) attention Pallas kernel.

The TPU analog of the reference fork's 64KB-LDS flash attention
(``docs/gfx906/implementation_guide.md:289-403``) and of
``ggml_flash_attn_ext`` (used via ``build_attn_mha``,
``llama-graph.cpp:1245-1259``): causal GQA attention that never
materializes the (T, S) score matrix — K/V stream through VMEM in blocks
with a running max/denominator, so prefill memory is O(T·D) and the
arithmetic stays on the MXU.

Supports: GQA (grouped q heads), per-sequence position offset (n_past),
sliding-window masking, logit softcap (gemma2).

Internal layout is (B, H, T, D) so every Pallas block keeps its last two
dims (T-block, D) hardware-aligned; the (B, T, H, D) public interface
transposes at the boundary (fused by XLA into neighboring ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _flash_kernel(
    *refs,
    scale: float,
    block_q: int,
    block_k: int,
    n_k: int,
    logit_softcap: float,
    kv_quant: bool,
    has_sinks: bool,
):
    # ref layout: q (1,1,BQ,D), k (1,1,BK,D), v (1,1,BK,D),
    #   [ks (1,1,8,BK), vs (1,1,8,BK) when kv_quant]  per-key/value scales
    #   npast (B,1) SMEM (full), window (1,1) SMEM,
    #   [sinks (Hq,1) SMEM (full) when has_sinks]
    #   o (1,1,BQ,D); scratch acc (BQ,D), m (BQ,128), l (BQ,128)
    from jax.experimental import pallas as pl

    q_ref, k_ref, v_ref = refs[:3]
    rest = refs[3:]
    if kv_quant:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    else:
        ks_ref = vs_ref = None
    npast_ref, window_ref = rest[:2]
    rest = rest[2:]
    if has_sinks:
        sink_ref = rest[0]
        rest = rest[1:]
    else:
        sink_ref = None
    o_ref, acc_ref, m_ref, l_ref = rest

    b_id = pl.program_id(0)
    h_id = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    n_past = npast_ref[b_id, 0]
    window = window_ref[0, 0]  # traced: one compiled kernel serves iSWA models
    q_pos = n_past + qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    # skip blocks entirely above the causal diagonal (and, with a sliding
    # window, blocks entirely left of every query's window)
    block_needed = ki * block_k <= n_past + (qi + 1) * block_q - 1
    block_needed &= jnp.logical_or(
        window <= 0, (ki + 1) * block_k - 1 > n_past + qi * block_q - window
    )

    @pl.when(block_needed)
    def _():
        q = q_ref[0, 0]  # (BQ, D)
        k = k_ref[0, 0]  # (BK, D)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype) if kv_quant else k,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        if kv_quant:
            s = s * ks_ref[0, 0, 0:1, :]  # per-key dequant scale (1, BK)
        s = s * scale
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        mask = k_pos <= q_pos
        mask &= jnp.logical_or(window <= 0, k_pos > q_pos - window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]  # (BQ, 1)
        m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)  # (BQ, BK)
        alpha = jnp.exp(m_prev - m_cur)  # (BQ, 1)
        l_new = l_ref[:, 0:1] * alpha + p.sum(axis=-1, keepdims=True)

        v = v_ref[0, 0]  # (BK, D)
        if kv_quant:
            p = p * vs_ref[0, 0, 0:1, :]  # per-value dequant scale
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == n_k - 1)
    def _():
        denom = l_ref[:, 0:1]
        acc = acc_ref[:]
        if has_sinks:
            # gpt-oss sinks: the per-head sink logit joins the softmax —
            # folded INTO the running max (like the einsum oracle) so
            # exp(sink - m) cannot overflow when every live score is far
            # below the sink
            m_new = jnp.maximum(m_ref[:, 0:1], sink_ref[h_id, 0])
            alpha = jnp.exp(m_ref[:, 0:1] - m_new)
            denom = denom * alpha + jnp.exp(sink_ref[h_id, 0] - m_new)
            acc = acc * alpha
        denom = jnp.maximum(denom, 1e-30)
        o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "logit_softcap", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # (B, T, Hq, D)
    k_cache: jnp.ndarray,  # (B, S, Hkv, D) bf16, or int8 when scales given
    v_cache: jnp.ndarray,
    n_past: jnp.ndarray,  # (B,) int32
    scale: float,
    sliding_window=0,  # int or traced int32 scalar; <= 0 disables
    logit_softcap: float = 0.0,
    sinks: jnp.ndarray | None = None,  # (Hq,) attention-sink logits
    k_scales: jnp.ndarray | None = None,  # (B, S, Hkv) f32 per-row scales
    v_scales: jnp.ndarray | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Hq, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = Hq // Hkv
    kv_quant = k_scales is not None

    block_q = max(8, min(block_q, T))
    block_k = min(block_k, S)
    Tp = -(-T // block_q) * block_q
    n_q = Tp // block_q
    n_k = -(-S // block_k)
    Sp = n_k * block_k

    qh = q.transpose(0, 2, 1, 3)  # (B, Hq, T, D)
    if Tp != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kh = k_cache.transpose(0, 2, 1, 3)  # (B, Hkv, S, D)
    vh = v_cache.transpose(0, 2, 1, 3)
    if Sp != S:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    npast2 = n_past.reshape(B, 1).astype(jnp.int32)
    window2 = jnp.reshape(jnp.asarray(sliding_window, jnp.int32), (1, 1))

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, block_k, D),
            lambda b, h, i, j, _g=G: (b, h // _g, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_k, D),
            lambda b, h, i, j, _g=G: (b, h // _g, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [qh, kh, vh]
    if kv_quant:
        # scales ride as (B, Hkv, 8, Sp) sublane-replicated tiles so the
        # (1, 1, 8, BK) block stays Mosaic-aligned; kernel reads row 0
        def prep_scales(sc):
            st = sc.transpose(0, 2, 1)  # (B, Hkv, S)
            if Sp != S:
                st = jnp.pad(st, ((0, 0), (0, 0), (0, Sp - S)))
            return jnp.broadcast_to(st[:, :, None, :], (B, Hkv, 8, Sp)).astype(
                jnp.float32
            )

        in_specs += [
            pl.BlockSpec(
                (1, 1, 8, block_k),
                lambda b, h, i, j, _g=G: (b, h // _g, 0, j),
                memory_space=pltpu.VMEM,
            )
        ] * 2
        operands += [prep_scales(k_scales), prep_scales(v_scales)]
    # SMEM scalars ride as full arrays (a (1,1) block over a (B,1) array
    # violates Mosaic's last-two-dims rule for B > 1); kernels index by
    # their grid ids instead
    in_specs += [
        pl.BlockSpec((B, 1), lambda b, h, i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda b, h, i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    operands += [npast2, window2]
    if sinks is not None:
        in_specs.append(
            pl.BlockSpec((Hq, 1), lambda b, h, i, j: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(sinks.reshape(Hq, 1).astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            n_k=n_k,
            logit_softcap=logit_softcap,
            kv_quant=kv_quant,
            has_sinks=sinks is not None,
        ),
        grid=(B, Hq, n_q, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Tp, D), jnp.bfloat16 if kv_quant else q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * Tp * Sp * D,
            bytes_accessed=B * (Tp * Hq * D * 2 + 2 * Sp * Hkv * D * (1 if kv_quant else 2)),
            transcendentals=B * Hq * Tp * Sp,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :, :T].transpose(0, 2, 1, 3).astype(q.dtype)
