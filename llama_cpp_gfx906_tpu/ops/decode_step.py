"""Persistent fused decode step: the whole layer stack in ONE Pallas kernel.

Single-token decode on small models is launch-bound: the scanned jnp path
dispatches ~6 kernels per layer, and each one is too short to hide its own
weight DMA (measured ~137 GB/s effective over the 270M layer stack vs
~690 GB/s for the one big lm_head matmul).  This kernel runs the grid over
layers instead — one launch for the full stack — so Pallas double-buffers
layer ``l+1``'s quantized weights while layer ``l`` computes, and the weight
stream stays dense across the whole model.

The TPU analog of the reference fork's fused-GEMM decode discipline
(``docs/gfx906/implementation_guide.md:170-287`` — dequant fused into the
GEMV, one persistent kernel per stack); the layer math mirrors
``models/llama.py::forward``'s scan body (reference ``build_attn_mha``,
``src/llama-graph.cpp:1220``) for the common llama decode configuration:

  rms → fused-qkv int8 GEMV → rope → KV insert → GQA attention
      → wo → residual → rms → fused-gateup GEMV → act·mul → down → residual

The KV cache never enters the automatic block pipeline: it stays in HBM
(aliased in-place) and the kernel (a) writes only the aligned 8-row tile
holding the new row (a DMA'd read-modify-write — partial HBM tiles can't
be DMA-written) and
(b) streams only the LIVE prefix back in as double-buffered BK-row chunks
with flash-style online-softmax accumulation.  VMEM residency and HBM
traffic are therefore ∝ ``n_past``, independent of ``max_seq`` — the
long-context decode asymptotics the reference gets from its cell-count
bookkeeping (``llama-kv-cache-unified.cpp``), obtained here at the DMA
level.  The current token's own K/V never round-trips through HBM: its
attention score is an in-register "self term" folded into the online
softmax after the streamed chunks.

Scope (``_fused_ok``): B=1, T=1 (the kernel generalizes to B ≤ 8 but the
scan path already matches it there — launches amortize across rows),
pre-norm RMS llama/gemma family: full-dim rope (NORM or NEOX, per-layer
dual bases), per-head qk-norms (gemma3/qwen3), gemma post-norms, per-layer
SWA windows, int8-format QuantTensor weights (Q8_0/Q6_K lineage), plain
bf16/f32 KV cache.  No MoE / softcap / ALiBi / biases / LoRA — those fall
back to the scanned path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# kill switch: LCG_NO_FUSED_DECODE=1 restores the scanned decode path
_DISABLE = os.environ.get("LCG_NO_FUSED_DECODE", "0") == "1"

# dequant chunk caps (lanes × sublanes of the bf16 weight temp); v5e VMEM is
# 16 MB and the per-layer blocks double-buffer, so temps must stay ~2 MB
_TN_CAPS = (512, 256, 128)
_TK_CAPS = (1024, 512, 256)


def _act_f32(x, act_fn):
    if act_fn in ("gelu", "gelu_tanh"):
        return jax.nn.gelu(x, approximate=True)
    if act_fn == "gelu_erf":
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.silu(x)


def _kernel(npast_ref, win_ref, swa_ref, x0_ref, cos_ref, ssig_ref,
            anorm_ref, fnorm_ref, qn_ref, kn_ref, pa_ref, pf_ref,
            qkv_q, qkv_s, wo_q, wo_s, gu_q, gu_s, dn_q, dn_s,
            kin_ref, vin_ref,
            xout_ref, kout_ref, vout_ref,
            kbuf, vbuf, krow, vrow, ksem, vsem, isem,
            *, B, Hq, Hkv, Dh, F, BK, g_qkv, g_o, g_gu, g_dn,
            scale, eps, act_fn, interleaved, has_qk, has_post):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l = pl.program_id(0)
    window = win_ref[l]  # sliding window for this layer; <= 0 disables

    @pl.when(l == 0)
    def _():
        xout_ref[:] = x0_ref[:]

    x = xout_ref[:]  # (B, D) f32 carry, persists across grid steps

    np_b = [npast_ref[b] for b in range(B)]
    bases = [pl.multiple_of((np_b[b] // 8) * 8, 8) for b in range(B)]

    # issue every slot's insert-tile read at kernel top so the DMA latency
    # hides under the qkv GEMV
    k_tins, v_tins = [], []
    for b in range(B):
        kt = pltpu.make_async_copy(
            kin_ref.at[l, b, pl.ds(bases[b], 8), :],
            krow.at[pl.ds(b * 8, 8)], isem.at[0, b])
        vt = pltpu.make_async_copy(
            vin_ref.at[l, b, pl.ds(bases[b], 8), :],
            vrow.at[pl.ds(b * 8, 8)], isem.at[1, b])
        kt.start()
        vt.start()
        k_tins.append(kt)
        v_tins.append(vt)

    def row(mat, b):  # extract row b of (B, X) without sublane-offset slices
        if B == 1:
            return mat
        sel = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0) == b
        return jnp.sum(jnp.where(sel, mat, jnp.zeros_like(mat)),
                       axis=0, keepdims=True)

    def rms(v, w):
        sc = jax.lax.rsqrt(jnp.mean(v * v, axis=-1, keepdims=True) + eps)
        return v * sc * w

    def qdot(xb, qref, sref, g):
        """(B, K) bf16 @ int8 (1, K, N) with per-g scales → (B, N) f32.

        Chunked so the dequantized bf16 temp stays small (VMEM budget)."""
        K, N = qref.shape[1], qref.shape[2]
        TN = next((t for t in _TN_CAPS if N % t == 0), N)
        TK = next((t for t in _TK_CAPS if K % t == 0 and t % g == 0), K)
        outs = []
        for j0 in range(0, N, TN):
            acc = jnp.zeros((xb.shape[0], TN), jnp.float32)
            for k0 in range(0, K, TK):
                qs = qref[0, k0:k0 + TK, j0:j0 + TN]
                sg = jnp.repeat(
                    sref[0, k0 // g:(k0 + TK) // g, j0:j0 + TN], g, axis=0
                )
                w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot(
                    xb[:, k0:k0 + TK], w, preferred_element_type=jnp.float32
                )
            outs.append(acc)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    # ---- attention ---------------------------------------------------------
    h = rms(x, anorm_ref[0].astype(jnp.float32))
    hb = h.astype(jnp.bfloat16)
    qkv = qdot(hb, qkv_q, qkv_s, g_qkv)  # (B, Dq + 2·Dkv)
    # round through bf16 exactly where the scanned path does (linear()
    # returns the activation dtype) so both paths see identical values
    qkv = qkv.astype(jnp.bfloat16).astype(jnp.float32)

    # rope tables (2, B, Dh): row 0 = global base, row 1 = local base
    # (gemma3 SWA layers); static-slice + select, per-slot positions
    use_local = swa_ref[l] > 0
    C = jnp.where(use_local, cos_ref[1], cos_ref[0])  # (B, Dh)
    Ss = jnp.where(use_local, ssig_ref[1], ssig_ref[0])
    half = Dh // 2

    def rope1(v):  # (B, Dh) f32 → rotated (rowwise, per-slot tables)
        if interleaved:  # ggml NORM mode: pairs (2i, 2i+1)
            xl = pltpu.roll(v, Dh - 1, 1)  # lane i ← lane i+1 (mod Dh)
            xr = pltpu.roll(v, 1, 1)  # lane i ← lane i-1
            lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            partner = jnp.where(lane % 2 == 0, xl, xr)
        else:  # NEOX mode: pairs (i, i + Dh/2)
            partner = pltpu.roll(v, half, 1)
        return v * C + partner * Ss

    Dq = Hq * Dh
    Dkv = Hkv * Dh
    if has_qk:  # per-head rms q/k norms BEFORE rope (gemma3/qwen3 style)
        qn = qn_ref[0].astype(jnp.float32)  # (1, Dh)
        kn = kn_ref[0].astype(jnp.float32)
        q_rows = [rope1(rms(qkv[:, i * Dh:(i + 1) * Dh], qn).astype(
            jnp.bfloat16).astype(jnp.float32)) for i in range(Hq)]
        k_rows = [rope1(rms(qkv[:, Dq + i * Dh:Dq + (i + 1) * Dh], kn).astype(
            jnp.bfloat16).astype(jnp.float32)) for i in range(Hkv)]
    else:
        q_rows = [rope1(qkv[:, i * Dh:(i + 1) * Dh]) for i in range(Hq)]
        k_rows = [rope1(qkv[:, Dq + i * Dh:Dq + (i + 1) * Dh])
                  for i in range(Hkv)]
    v_vec = qkv[:, Dq + Dkv:]  # (B, Hkv·Dh)
    k_vec = jnp.concatenate(k_rows, axis=-1) if Hkv > 1 else k_rows[0]

    # KV insert (ggml_set_rows analog): the cache stays in HBM (aliased
    # in-place) — write ONLY the aligned 8-row tile holding each slot's new
    # row and stream only the LIVE prefix back in, so VMEM residency and
    # HBM traffic are ∝ n_past, not max_seq.  DMA cannot write a partial
    # (8, 128) HBM tile, so the insert is a read-modify-write (masked
    # select in VMEM; live rows rewritten with their original values,
    # which is benign).  The new row is never read by its own token (its
    # score is the in-register self term), so the writeback is lazy.
    G = Hq // Hkv
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)
    t8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    attn_slot_rows = []
    ins_dmas = []
    for b in range(B):
        np_ = np_b[b]
        lo = jnp.where(window > 0, jnp.maximum(np_ - window + 1, 0), 0)
        c0 = lo // BK
        n_chunks = (np_ + BK - 1) // BK  # ceil; 0 on a slot's first token

        kvk_b = row(k_vec, b)
        kvv_b = row(v_vec, b)
        k_tins[b].wait()
        v_tins[b].wait()
        t_iota = bases[b] + t8
        krow[b * 8:(b + 1) * 8] = jnp.where(
            t_iota == np_, kvk_b.astype(krow.dtype), krow[b * 8:(b + 1) * 8])
        vrow[b * 8:(b + 1) * 8] = jnp.where(
            t_iota == np_, kvv_b.astype(vrow.dtype), vrow[b * 8:(b + 1) * 8])
        k_ins = pltpu.make_async_copy(
            krow.at[pl.ds(b * 8, 8)],
            kout_ref.at[l, b, pl.ds(bases[b], 8), :], isem.at[0, b])
        v_ins = pltpu.make_async_copy(
            vrow.at[pl.ds(b * 8, 8)],
            vout_ref.at[l, b, pl.ds(bases[b], 8), :], isem.at[1, b])
        k_ins.start()
        v_ins.start()
        ins_dmas += [k_ins, v_ins]

        # flash-style streamed attention over this slot's live rows:
        # double-buffered BK-row chunks, per-q-head running (m, l, acc)
        def kdma(slot, i, b=b):
            return pltpu.make_async_copy(
                kin_ref.at[l, b, pl.ds(i * BK, BK), :],
                kbuf.at[slot], ksem.at[slot])

        def vdma(slot, i, b=b):
            return pltpu.make_async_copy(
                vin_ref.at[l, b, pl.ds(i * BK, BK), :],
                vbuf.at[slot], vsem.at[slot])

        @pl.when(c0 < n_chunks)
        def _():
            kdma(jax.lax.rem(c0, 2), c0).start()
            vdma(jax.lax.rem(c0, 2), c0).start()

        qbs = [row(q_rows[i], b).astype(jnp.bfloat16) for i in range(Hq)]
        init = tuple(
            (jnp.zeros((1, Dh), jnp.float32),  # acc
             jnp.full((1, 1), NEG_INF, jnp.float32),  # running max
             jnp.zeros((1, 1), jnp.float32))  # denominator
            for _ in range(Hq)
        )

        def chunk_body(i, carry, np_=np_, lo=lo, n_chunks=n_chunks,
                       kdma=kdma, vdma=vdma, qbs=qbs):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                kdma(1 - slot, i + 1).start()
                vdma(1 - slot, i + 1).start()

            kdma(slot, i).wait()
            vdma(slot, i).wait()
            kc = kbuf[slot]  # (BK, Hkv·Dh)
            vc = vbuf[slot]
            rows = i * BK + c_iota
            live = (rows >= lo) & (rows < np_)  # (1, BK)
            out = []
            for h_i in range(Hkv):
                kch = kc[:, h_i * Dh:(h_i + 1) * Dh]  # (BK, Dh)
                vch = vc[:, h_i * Dh:(h_i + 1) * Dh]
                for g_i in range(G):
                    qi = h_i * G + g_i
                    acc, m, den = carry[qi]
                    sc = jax.lax.dot_general(
                        qbs[qi], kch, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale  # (1, BK)
                    sc = jnp.where(live, sc, NEG_INF)
                    m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
                    p = jnp.exp(sc - m_new)
                    alpha = jnp.exp(m - m_new)
                    den = den * alpha + jnp.sum(p, axis=-1, keepdims=True)
                    pv = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), vch, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, Dh)
                    out.append((acc * alpha + pv, m_new, den))
            return tuple(out)

        carry = jax.lax.fori_loop(c0, n_chunks, chunk_body, init)

        # self term: the slot's own K/V (in registers), then the normalized
        # output row feeds its wo slice (flatten-free attn @ wo)
        attn_out = jnp.zeros((1, wo_q.shape[2]), jnp.float32)
        kb = kvk_b.astype(jnp.bfloat16).astype(jnp.float32)
        vb = kvv_b.astype(jnp.bfloat16).astype(jnp.float32)
        for h_i in range(Hkv):
            k_h = kb[:, h_i * Dh:(h_i + 1) * Dh]
            v_h = vb[:, h_i * Dh:(h_i + 1) * Dh]
            for g_i in range(G):
                qi = h_i * G + g_i
                acc, m, den = carry[qi]
                s_self = jnp.sum(
                    qbs[qi].astype(jnp.float32) * k_h, axis=-1, keepdims=True
                ) * scale  # (1, 1)
                m_new = jnp.maximum(m, s_self)
                p = jnp.exp(s_self - m_new)
                alpha = jnp.exp(m - m_new)
                den = den * alpha + p
                o_row = (acc * alpha + p * v_h) / den  # (1, Dh)
                qs = wo_q[0, qi * Dh:(qi + 1) * Dh, :]
                sg = jnp.repeat(
                    wo_s[0, qi * Dh // g_o:(qi + 1) * Dh // g_o, :],
                    g_o, axis=0)
                w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
                attn_out = attn_out + jax.lax.dot(
                    o_row.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32,
                )
        attn_slot_rows.append(attn_out)
    attn_out = (attn_slot_rows[0] if B == 1
                else jnp.concatenate(attn_slot_rows, axis=0))  # (B, D)
    for d in ins_dmas:
        d.wait()
    # mirror the scanned path's dtype walk: attn and mlp round to bf16
    # before joining the bf16 residual stream
    attn_b = attn_out.astype(jnp.bfloat16)
    if has_post:  # gemma-style post-attention norm (before the residual)
        attn_b = rms(attn_b.astype(jnp.float32),
                     pa_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    x = (x.astype(jnp.bfloat16) + attn_b).astype(jnp.float32)

    # ---- MLP ---------------------------------------------------------------
    h2 = rms(x, fnorm_ref[0].astype(jnp.float32))
    gu = qdot(h2.astype(jnp.bfloat16), gu_q, gu_s, g_gu)  # (B, 2F)
    g_b = gu[:, :F].astype(jnp.bfloat16)
    u_b = gu[:, F:].astype(jnp.bfloat16)
    y = (_act_f32(g_b.astype(jnp.float32), act_fn).astype(jnp.bfloat16) * u_b)
    mlp = qdot(y, dn_q, dn_s, g_dn)
    mlp_b = mlp.astype(jnp.bfloat16)
    if has_post:
        mlp_b = rms(mlp_b.astype(jnp.float32),
                    pf_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    x = (x.astype(jnp.bfloat16) + mlp_b).astype(jnp.float32)

    xout_ref[:] = x


def _int8_qt(t):
    from .quant_matmul import QuantTensor

    return (isinstance(t, QuantTensor) and t.fmt == "int8" and t.m is None
            and t.sd is None  # folded scales stream via decode_stream only
            and not t.xla_only  # TP-sharded weights stay on the XLA path
            and t.q.ndim == 3 and t.q.shape[-1] == t.shape[1])


def _fused_ok(params, cfg, kv, B: int, T: int) -> bool:
    """Static scope gate — see module docstring."""
    # the kernel generalizes to B ≤ 8 (per-slot n_past/rope/streams — see
    # test_fused_batched_slots), but measured on-chip the scan path already
    # matches it for B ≥ 2 (launch overhead amortizes across rows: B=2
    # 2952 vs 2960 tok/s, B=4 5132 vs 5108, B=8 7863 vs 7847) — only the
    # single-stream case is launch-bound, so only it dispatches here
    if _DISABLE or T != 1 or B != 1:
        return False
    if kv.pos is not None or kv.shared_k is not None:
        return False
    if not isinstance(kv.k, jnp.ndarray):  # QuantKV cache
        return False
    if kv.k.ndim != 5 or kv.k.shape[1] != B:
        return False
    p = params["layers"]
    if not all(k in p for k in ("wqkv_fused", "wgateup_fused", "wo", "w_down",
                                "attn_norm", "ffn_norm")):
        return False
    if not all(_int8_qt(p[k]) for k in ("wqkv_fused", "wgateup_fused", "wo",
                                        "w_down")):
        return False
    blocked = ("bqkv_fused", "bo", "b_down", "moe_gate_inp", "ffn_norm_exps",
               "attn_sub_norm", "sinks", "cvec", "attn_norm_b", "ffn_norm_b",
               "q_norm_b", "k_norm_b")
    if any(k in p for k in blocked) or any(k.endswith("_lora_a") for k in p):
        return False
    if cfg.qk_norm:  # per-head rms q/k norms supported (gemma3/qwen3 style)
        if (cfg.qk_norm_layer or cfg.qk_norm_after_rope
                or "q_norm" not in p or "k_norm" not in p
                or p["q_norm"].ndim != 2 or p["q_norm"].shape[1] != cfg.head_dim):
            return False
    elif "q_norm" in p or "k_norm" in p:
        return False
    if cfg.post_attn_norm or cfg.post_ffn_norm:  # gemma post norms
        if not ("post_attn_norm" in p and "post_ffn_norm" in p
                and cfg.post_attn_norm and cfg.post_ffn_norm):
            return False
    elif "post_attn_norm" in p or "post_ffn_norm" in p:
        return False
    if any(cfg.swa_layers) and cfg.sliding_window <= 0:
        return False
    if not (cfg.pre_norm and cfg.norm_type == "rms" and cfg.pos_emb == "rope"
            and not cfg.mrope_sections and all(cfg.rope_layers)
            and not cfg.attn_linear_layers and not cfg.alibi
            and cfg.clamp_kqv <= 0 and not cfg.qk_norm_full
            and not cfg.qk_norm_l2 and cfg.attn_temp_scale <= 0
            and cfg.attn_logit_softcap <= 0 and not cfg.parallel_residual
            and cfg.residual_scale == 1.0 and cfg.ffn_gated
            and cfg.act_fn in ("silu", "gelu", "gelu_tanh", "gelu_erf")):
        return False
    D, Dh, F = cfg.n_embd, cfg.head_dim, cfg.n_ff
    S = kv.k.shape[2]
    if not (D % 128 == 0 and Dh % 128 == 0 and F % 128 == 0 and S % 128 == 0):
        return False
    from ..ops.rope import rope_frequencies

    if 2 * len(rope_frequencies(cfg)) != Dh:  # partial rope unsupported
        return False
    if p["wqkv_fused"].shape != (D, (cfg.n_heads + 2 * cfg.n_kv_heads) * Dh):
        return False
    if p["wgateup_fused"].shape != (D, 2 * F):
        return False
    return True


def fused_decode_step(params, cfg, x, kv, interpret: bool = False):
    """Run the full layer stack for one token per slot.  ``x`` is the
    embedded input (B, 1, D).  Returns (x' (B, 1, D) bf16-valued, k_new,
    v_new) with cache shapes matching ``kv.k``/``kv.v``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .rope import rope_frequencies

    p = params["layers"]
    L, D, Dh, F = cfg.n_layers, cfg.n_embd, cfg.head_dim, cfg.n_ff
    Hq, Hkv = cfg.n_heads, cfg.n_kv_heads
    B, S = kv.k.shape[1], kv.k.shape[2]
    HD = Hkv * Dh
    scale = cfg.attn_scale or Dh ** -0.5

    x0 = x.reshape(B, D).astype(jnp.float32)

    def rope_rows(inv_freq):  # lane-expanded (B, Dh) cos / signed-sin rows
        ang = kv.n_past[:, None].astype(jnp.float32) * inv_freq  # (B, Dh/2)
        c, s = jnp.cos(ang), jnp.sin(ang)
        if cfg.rope_interleaved:
            sign = jnp.where(jnp.arange(Dh) % 2 == 0, -1.0, 1.0)
            return jnp.repeat(c, 2, -1), jnp.repeat(s, 2, -1) * sign
        return jnp.concatenate([c, c], -1), jnp.concatenate([-s, s], -1)

    c_g, s_g = rope_rows(jnp.asarray(rope_frequencies(cfg), jnp.float32))
    if cfg.rope_local_base > 0:  # gemma3 SWA layers rotate with local base
        from ..gguf.constants import RopeScalingType

        local_cfg = cfg.with_(rope_base=cfg.rope_local_base,
                              rope_scaling=RopeScalingType.NONE)
        c_l, s_l = rope_rows(jnp.asarray(rope_frequencies(local_cfg),
                                         jnp.float32))
    else:
        c_l, s_l = c_g, s_g
    C = jnp.stack([c_g, c_l])  # (2, B, Dh): 0 = global base, 1 = local
    Ss = jnp.stack([s_g, s_l])

    import numpy as _np

    windows = jnp.asarray(
        [cfg.sliding_window if w else 0 for w in cfg.swa_layers], jnp.int32)
    swa_flags = jnp.asarray(_np.asarray(cfg.swa_layers, _np.int32))
    has_qk = bool(cfg.qk_norm)
    has_post = bool(cfg.post_attn_norm)
    qn = (p["q_norm"].astype(jnp.float32).reshape(L, 1, Dh) if has_qk
          else jnp.zeros((L, 1, Dh), jnp.float32))
    kn = (p["k_norm"].astype(jnp.float32).reshape(L, 1, Dh) if has_qk
          else jnp.zeros((L, 1, Dh), jnp.float32))
    pa = (p["post_attn_norm"].astype(jnp.float32).reshape(L, 1, D) if has_post
          else jnp.zeros((L, 1, D), jnp.float32))
    pf = (p["post_ffn_norm"].astype(jnp.float32).reshape(L, 1, D) if has_post
          else jnp.zeros((L, 1, D), jnp.float32))

    k3 = kv.k.reshape(L, B, S, HD)
    v3 = kv.v.reshape(L, B, S, HD)
    qkv_qt, wo_qt = p["wqkv_fused"], p["wo"]
    gu_qt, dn_qt = p["wgateup_fused"], p["w_down"]
    Nqkv = qkv_qt.q.shape[-1]

    BK = next(t for t in (512, 256, 128) if S % t == 0)
    kern = functools.partial(
        _kernel, B=B, Hq=Hq, Hkv=Hkv, Dh=Dh, F=F, BK=BK,
        g_qkv=qkv_qt.group, g_o=wo_qt.group, g_gu=gu_qt.group,
        g_dn=dn_qt.group, scale=float(scale), eps=float(cfg.rms_eps),
        act_fn=cfg.act_fn, interleaved=bool(cfg.rope_interleaved),
        has_qk=has_qk, has_post=has_post,
    )

    def wspec(arr):  # per-layer weight block (1, K, N)
        return pl.BlockSpec((1,) + arr.shape[1:], lambda l: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    w_bytes = sum(t.q.nbytes + t.s.nbytes
                  for t in (qkv_qt, wo_qt, gu_qt, dn_qt))
    flops = 2 * L * (D * Nqkv + Hq * Dh * D + D * 2 * F + F * D)

    x_out, k_new, v_new = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((B,), lambda l: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((L,), lambda l: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((L,), lambda l: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, D), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B, Dh), lambda l: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B, Dh), lambda l: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dh), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dh), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            wspec(qkv_qt.q), wspec(qkv_qt.s),
            wspec(wo_qt.q), wspec(wo_qt.s),
            wspec(gu_qt.q), wspec(gu_qt.s),
            wspec(dn_qt.q), wspec(dn_qt.s),
            # KV stays in HBM: the kernel streams live BK-row chunks and
            # writes only the new row (manual DMA, see kernel)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((L, B, S, HD), k3.dtype),
            jax.ShapeDtypeStruct((L, B, S, HD), v3.dtype),
        ],
        input_output_aliases={20: 1, 21: 2},
        scratch_shapes=[
            pltpu.VMEM((2, BK, HD), k3.dtype),  # kbuf (double-buffered)
            pltpu.VMEM((2, BK, HD), v3.dtype),  # vbuf
            pltpu.VMEM((8 * B, HD), k3.dtype),  # krow (per-slot RMW tiles)
            pltpu.VMEM((8 * B, HD), v3.dtype),  # vrow
            pltpu.SemaphoreType.DMA((2,)),  # ksem
            pltpu.SemaphoreType.DMA((2,)),  # vsem
            pltpu.SemaphoreType.DMA((2, B)),  # isem (per-slot inserts)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=w_bytes + 2 * L * S * HD * k3.dtype.itemsize,
            transcendentals=L * (2 * F + Hq * S),
        ),
        interpret=interpret,
    )(
        kv.n_past.astype(jnp.int32), windows, swa_flags, x0,
        C.astype(jnp.float32), Ss.astype(jnp.float32),
        p["attn_norm"].astype(jnp.float32).reshape(L, 1, D),
        p["ffn_norm"].astype(jnp.float32).reshape(L, 1, D),
        qn, kn, pa, pf,
        qkv_qt.q, qkv_qt.s, wo_qt.q, wo_qt.s,
        gu_qt.q, gu_qt.s, dn_qt.q, dn_qt.s,
        k3, v3,
    )

    kvs = kv.k.shape
    return (x_out.reshape(B, 1, D).astype(x.dtype),
            k_new.reshape(kvs), v_new.reshape(kvs))
