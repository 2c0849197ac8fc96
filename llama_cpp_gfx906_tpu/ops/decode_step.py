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

Scope (``_fused_ok``): B=1, T=1, pre-norm RMS llama family, full-dim rope
(NORM or NEOX mode), int8-format QuantTensor weights (Q8_0/Q6_K lineage),
plain bf16/f32 KV cache, no MoE / qk-norm / softcap / SWA / ALiBi / biases.
Everything else falls back to the scanned path.
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


def _kernel(npast_ref, x0_ref, cos_ref, ssig_ref, anorm_ref, fnorm_ref,
            qkv_q, qkv_s, wo_q, wo_s, gu_q, gu_s, dn_q, dn_s,
            kin_ref, vin_ref,
            xout_ref, kout_ref, vout_ref,
            *, Hq, Hkv, Dh, F, S, g_qkv, g_o, g_gu, g_dn,
            scale, eps, act_fn, interleaved):
    from jax.experimental import pallas as pl

    l = pl.program_id(0)
    np_ = npast_ref[0]

    @pl.when(l == 0)
    def _():
        xout_ref[:] = x0_ref[:]

    x = xout_ref[:]  # (1, D) f32 carry, persists across grid steps

    def rms(v, w):
        sc = jax.lax.rsqrt(jnp.mean(v * v, axis=-1, keepdims=True) + eps)
        return v * sc * w

    def qdot(xb, qref, sref, g):
        """(1, K) bf16 @ int8 (1, K, N) with per-g scales → (1, N) f32.

        Chunked so the dequantized bf16 temp stays small (VMEM budget)."""
        K, N = qref.shape[1], qref.shape[2]
        TN = next((t for t in _TN_CAPS if N % t == 0), N)
        TK = next((t for t in _TK_CAPS if K % t == 0 and t % g == 0), K)
        outs = []
        for j0 in range(0, N, TN):
            acc = jnp.zeros((1, TN), jnp.float32)
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
    qkv = qdot(hb, qkv_q, qkv_s, g_qkv)  # (1, Dq + 2·Dkv)
    # round through bf16 exactly where the scanned path does (linear()
    # returns the activation dtype) so both paths see identical values
    qkv = qkv.astype(jnp.bfloat16).astype(jnp.float32)

    C = cos_ref[:]  # (1, Dh) lane-expanded cos
    Ss = ssig_ref[:]  # (1, Dh) lane-expanded signed sin
    half = Dh // 2

    def rope1(v):  # (1, Dh) f32 → rotated
        from jax.experimental.pallas import tpu as pltpu

        if interleaved:  # ggml NORM mode: pairs (2i, 2i+1)
            xl = pltpu.roll(v, Dh - 1, 1)  # lane i ← lane i+1 (mod Dh)
            xr = pltpu.roll(v, 1, 1)  # lane i ← lane i-1
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, Dh), 1)
            partner = jnp.where(lane % 2 == 0, xl, xr)
        else:  # NEOX mode: pairs (i, i + Dh/2)
            partner = pltpu.roll(v, half, 1)
        return v * C + partner * Ss

    Dq = Hq * Dh
    Dkv = Hkv * Dh
    q_rows = [rope1(qkv[:, i * Dh:(i + 1) * Dh]) for i in range(Hq)]
    k_rows = [rope1(qkv[:, Dq + i * Dh:Dq + (i + 1) * Dh]) for i in range(Hkv)]
    v_vec = qkv[:, Dq + Dkv:]
    k_vec = jnp.concatenate(k_rows, axis=-1) if Hkv > 1 else k_rows[0]

    # KV insert at row n_past (ggml_set_rows analog), then attend over the
    # updated block — matches mha_with_cache's insert-then-mask ordering.
    # The block is copied through anyway (aliased in/out), so the insert is
    # a masked select folded into that copy (a lone dynamic sublane store
    # would need a provable 8-multiple row index, which n_past is not).
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    kout_ref[0] = jnp.where(row == np_, k_vec.astype(kout_ref.dtype), kin_ref[0])
    vout_ref[0] = jnp.where(row == np_, v_vec.astype(vout_ref.dtype), vin_ref[0])

    # per-q-head attention: (1, S) score rows keep every intermediate
    # naturally (1, ·)-shaped (no sublane-offset row extraction, which
    # Mosaic's concat lowering rejects); M=1 dots pad to the same 8-row
    # MXU tile a (G, Dh) batch would
    G = Hq // Hkv
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    attn_out = jnp.zeros((1, wo_q.shape[2]), jnp.float32)
    for h_i in range(Hkv):
        kc = kout_ref[0, :, h_i * Dh:(h_i + 1) * Dh]  # (S, Dh)
        vc = vout_ref[0, :, h_i * Dh:(h_i + 1) * Dh]
        for g_i in range(G):
            i = h_i * G + g_i
            sc = jax.lax.dot_general(
                q_rows[i].astype(jnp.bfloat16), kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (1, S)
            sc = jnp.where(s_iota <= np_, sc, NEG_INF)
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o_row = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, Dh)
            # wo contribution of this head: rows [i·Dh, (i+1)·Dh) — the
            # flatten-free equivalent of attn_flat @ wo
            qs = wo_q[0, i * Dh:(i + 1) * Dh, :]
            sg = jnp.repeat(
                wo_s[0, i * Dh // g_o:(i + 1) * Dh // g_o, :], g_o, axis=0
            )
            w = (qs.astype(jnp.float32) * sg).astype(jnp.bfloat16)
            attn_out = attn_out + jax.lax.dot(
                o_row.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32,
            )
    # mirror the scanned path's dtype walk: attn and mlp round to bf16
    # before joining the bf16 residual stream
    x = (x.astype(jnp.bfloat16) + attn_out.astype(jnp.bfloat16)).astype(jnp.float32)

    # ---- MLP ---------------------------------------------------------------
    h2 = rms(x, fnorm_ref[0].astype(jnp.float32))
    gu = qdot(h2.astype(jnp.bfloat16), gu_q, gu_s, g_gu)  # (1, 2F)
    g_b = gu[:, :F].astype(jnp.bfloat16)
    u_b = gu[:, F:].astype(jnp.bfloat16)
    y = (_act_f32(g_b.astype(jnp.float32), act_fn).astype(jnp.bfloat16) * u_b)
    mlp = qdot(y, dn_q, dn_s, g_dn)
    x = (x.astype(jnp.bfloat16) + mlp.astype(jnp.bfloat16)).astype(jnp.float32)

    xout_ref[:] = x


def _int8_qt(t):
    from .quant_matmul import QuantTensor

    return (isinstance(t, QuantTensor) and t.fmt == "int8" and t.m is None
            and t.q.ndim == 3 and t.q.shape[-1] == t.shape[1])


def _fused_ok(params, cfg, kv, B: int, T: int) -> bool:
    """Static scope gate — see module docstring."""
    if _DISABLE or B != 1 or T != 1:
        return False
    if kv.pos is not None or kv.shared_k is not None:
        return False
    if not isinstance(kv.k, jnp.ndarray):  # QuantKV cache
        return False
    if kv.k.shape[2] > 4096:  # long max_seq: flash_decode's live-block
        return False          # indexing has the right asymptotics instead
    p = params["layers"]
    if not all(k in p for k in ("wqkv_fused", "wgateup_fused", "wo", "w_down",
                                "attn_norm", "ffn_norm")):
        return False
    if not all(_int8_qt(p[k]) for k in ("wqkv_fused", "wgateup_fused", "wo",
                                        "w_down")):
        return False
    blocked = ("bqkv_fused", "bo", "b_down", "moe_gate_inp", "ffn_norm_exps",
               "attn_sub_norm", "post_attn_norm", "post_ffn_norm", "sinks",
               "q_norm", "k_norm", "cvec", "attn_norm_b", "ffn_norm_b")
    if any(k in p for k in blocked) or any(k.endswith("_lora_a") for k in p):
        return False
    if not (cfg.pre_norm and cfg.norm_type == "rms" and cfg.pos_emb == "rope"
            and not cfg.mrope_sections and cfg.rope_local_base <= 0
            and not any(cfg.swa_layers) and all(cfg.rope_layers)
            and not cfg.attn_linear_layers and not cfg.alibi
            and cfg.clamp_kqv <= 0 and not cfg.qk_norm and not cfg.qk_norm_full
            and not cfg.qk_norm_l2 and cfg.attn_temp_scale <= 0
            and cfg.attn_logit_softcap <= 0 and not cfg.parallel_residual
            and cfg.residual_scale == 1.0 and cfg.ffn_gated
            and cfg.embedding_scale == 1.0
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
    """Run the full layer stack for one token.  ``x`` is the embedded input
    (1, 1, D).  Returns (x' (1, 1, D) bf16-valued, k_new, v_new) with
    cache shapes matching ``kv.k``/``kv.v``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .rope import rope_frequencies

    p = params["layers"]
    L, D, Dh, F = cfg.n_layers, cfg.n_embd, cfg.head_dim, cfg.n_ff
    Hq, Hkv = cfg.n_heads, cfg.n_kv_heads
    S = kv.k.shape[2]
    HD = Hkv * Dh
    scale = cfg.attn_scale or Dh ** -0.5

    x0 = x.reshape(1, D).astype(jnp.float32)

    inv_freq = jnp.asarray(rope_frequencies(cfg), jnp.float32)  # (Dh/2,)
    ang = kv.n_past[0].astype(jnp.float32) * inv_freq
    c, s = jnp.cos(ang), jnp.sin(ang)
    if cfg.rope_interleaved:
        C = jnp.repeat(c, 2)[None, :]
        sign = jnp.where(jnp.arange(Dh) % 2 == 0, -1.0, 1.0)
        Ss = jnp.repeat(s, 2)[None, :] * sign
    else:
        C = jnp.concatenate([c, c])[None, :]
        Ss = jnp.concatenate([-s, s])[None, :]

    k3 = kv.k.reshape(L, S, HD)
    v3 = kv.v.reshape(L, S, HD)
    qkv_qt, wo_qt = p["wqkv_fused"], p["wo"]
    gu_qt, dn_qt = p["wgateup_fused"], p["w_down"]
    Nqkv = qkv_qt.q.shape[-1]

    kern = functools.partial(
        _kernel, Hq=Hq, Hkv=Hkv, Dh=Dh, F=F, S=S,
        g_qkv=qkv_qt.group, g_o=wo_qt.group, g_gu=gu_qt.group,
        g_dn=dn_qt.group, scale=float(scale), eps=float(cfg.rms_eps),
        act_fn=cfg.act_fn, interleaved=bool(cfg.rope_interleaved),
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
            pl.BlockSpec((1,), lambda l: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            wspec(qkv_qt.q), wspec(qkv_qt.s),
            wspec(wo_qt.q), wspec(wo_qt.s),
            wspec(gu_qt.q), wspec(gu_qt.s),
            wspec(dn_qt.q), wspec(dn_qt.s),
            pl.BlockSpec((1, S, HD), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, HD), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, HD), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, HD), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((L, S, HD), k3.dtype),
            jax.ShapeDtypeStruct((L, S, HD), v3.dtype),
        ],
        input_output_aliases={14: 1, 15: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=w_bytes + 4 * L * S * HD * k3.dtype.itemsize,
            transcendentals=L * (2 * F + Hq * S),
        ),
        interpret=interpret,
    )(
        kv.n_past.astype(jnp.int32), x0, C.astype(jnp.float32),
        Ss.astype(jnp.float32),
        p["attn_norm"].astype(jnp.float32).reshape(L, 1, D),
        p["ffn_norm"].astype(jnp.float32).reshape(L, 1, D),
        qkv_qt.q, qkv_qt.s, wo_qt.q, wo_qt.s,
        gu_qt.q, gu_qt.s, dn_qt.q, dn_qt.s,
        k3, v3,
    )

    kvs = kv.k.shape
    return (x_out.reshape(1, 1, D).astype(x.dtype),
            k_new.reshape(kvs), v_new.reshape(kvs))
