"""Mixture-of-experts routed FFN (reference: ``build_moe_ffn``,
``src/llama-graph.cpp:776-1024`` — routing via ``ggml_mul_mat_id``).

TPU-native dispatch, chosen by static token count at trace time:

- decode (T·k small): gather the selected experts' weight slices from HBM —
  reads exactly k experts per token, the bandwidth-optimal analog of the
  reference's mul_mat_id row gather;
- prefill (T large): dense all-experts einsum with a dispatch mask — every
  expert runs on the MXU over all tokens; at T ≳ E·capacity this wins on
  MXU utilization and avoids ragged shapes entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from .quant_matmul import QuantTensor, qt_expert, quant_matmul, routed_quant_matmul

_GATHER_MAX_TOKENS = 8  # below this, per-token expert gather beats dense


def moe_ffn(
    x: jnp.ndarray,  # (B, T, D)
    gate_inp: jnp.ndarray,  # (D, E) router
    w_gate: jnp.ndarray,  # (E, D, F)
    w_up: jnp.ndarray,  # (E, D, F)
    w_down: jnp.ndarray,  # (E, F, D)
    cfg: ModelConfig,
    probs_bias: jnp.ndarray | None = None,  # (E,) selection bias (deepseek3)
    router_b: jnp.ndarray | None = None,  # (E,) router logit bias (gpt-oss)
    gate_b: jnp.ndarray | None = None,  # (E, F) expert biases (gpt-oss)
    up_b: jnp.ndarray | None = None,
    down_b: jnp.ndarray | None = None,
    gate_x: jnp.ndarray | None = None,  # router input override (smallthinker
    # feeds the raw layer input, llm_build_smallthinker)
) -> jnp.ndarray:
    B, T, D = x.shape
    # stacked QuantTensor leaves carry the expert axis on q; plain arrays
    # are (E, D, F)
    E = w_gate.q.shape[0] if isinstance(w_gate, QuantTensor) else w_gate.shape[0]
    k = cfg.n_experts_used
    xt = x.reshape(B * T, D)
    gt = gate_x.reshape(B * T, D) if gate_x is not None else xt

    router = (gt.astype(jnp.float32) @ gate_inp.astype(jnp.float32))  # (N, E)
    if router_b is not None:
        router = router + router_b.astype(jnp.float32)
    if cfg.moe_topk_softmax:
        # gpt-oss router: softmax over the selected top-k logits only
        topl, topi = jax.lax.top_k(router, k)
        topv = jax.nn.softmax(topl, axis=-1)
    else:
        if cfg.expert_gating_func == 2:  # LLAMA_EXPERT_GATING_FUNC_TYPE_SIGMOID
            probs = jax.nn.sigmoid(router)
        else:
            probs = jax.nn.softmax(router, axis=-1)
        if probs_bias is not None:
            # bias steers selection only; combine weights stay unbiased
            sel = probs + probs_bias.astype(jnp.float32)
            _, topi = jax.lax.top_k(sel, k)
            topv = jnp.take_along_axis(probs, topi, axis=-1)
        else:
            topv, topi = jax.lax.top_k(probs, k)  # (N, k)
        if cfg.expert_weights_norm:  # mixtral/qwen renormalize selected probs
            topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-9)
        if cfg.expert_weights_scale != 1.0:
            topv = topv * cfg.expert_weights_scale
    topv = topv.astype(x.dtype)

    def act_mix(g, u):
        """Combine gate/up streams per the configured GLU variant."""
        gf = g.astype(jnp.float32)
        uf = u.astype(jnp.float32)
        if cfg.act_fn == "swiglu_oai":  # ggml_swiglu_oai: clamp + (up+1)·glu
            gf = jnp.minimum(gf, cfg.swiglu_limit)
            uf = jnp.clip(uf, -cfg.swiglu_limit, cfg.swiglu_limit)
            return ((uf + 1.0) * gf * jax.nn.sigmoid(1.702 * gf)).astype(x.dtype)
        if cfg.act_fn == "gelu":
            return (jax.nn.gelu(gf, approximate=True) * uf).astype(x.dtype)
        if cfg.act_fn == "relu":  # smallthinker gated-ReLU experts
            return (jax.nn.relu(gf) * uf).astype(x.dtype)
        return (jax.nn.silu(gf) * uf).astype(x.dtype)

    # llama4 applies the (sigmoid) gate to the expert INPUT, not the output
    # (Llama4TextMoe; the expert nonlinearity makes the two inequivalent)
    scale_input = cfg.moe_scale_input
    quantized = isinstance(w_gate, QuantTensor)
    if B * T <= _GATHER_MAX_TOKENS:
        if quantized:
            # routed quantized matmul (mul_mat_id analog): experts stay
            # block-quantized in HBM; each (token, expert) pair streams only
            # its expert's quantized bytes through the kernel
            N = B * T
            F = w_gate.shape[1]
            idx = topi.reshape(N * k)
            xp = jnp.repeat(xt, k, axis=0)  # (N·k, D) pair rows
            if scale_input:
                xp = xp * topv.reshape(N * k, 1)
            g = routed_quant_matmul(xp, w_gate, idx).reshape(N, k, F)
            u = routed_quant_matmul(xp, w_up, idx).reshape(N, k, F)
            if gate_b is not None:
                g = g + gate_b[topi]
            if up_b is not None:
                u = u + up_b[topi]
            h = act_mix(g.astype(x.dtype), u.astype(x.dtype))
            out = routed_quant_matmul(h.reshape(N * k, F), w_down, idx)
            out = out.reshape(N, k, D).astype(jnp.float32)
            if down_b is not None:
                out = out + down_b[topi]
            if scale_input:
                out = out.sum(axis=1)
            else:
                out = (out * topv[:, :, None].astype(jnp.float32)).sum(axis=1)
        else:
            # gather path: (N, k, D, F) expert slices
            wg = w_gate[topi]  # (N, k, D, F)
            wu = w_up[topi]
            wd = w_down[topi]  # (N, k, F, D)
            if scale_input:
                xk = xt[:, None, :] * topv[:, :, None]  # (N, k, D)
            else:
                xk = jnp.broadcast_to(xt[:, None, :], (xt.shape[0], k, xt.shape[1]))
            g = jnp.einsum("nkd,nkdf->nkf", xk, wg, preferred_element_type=jnp.float32)
            u = jnp.einsum("nkd,nkdf->nkf", xk, wu, preferred_element_type=jnp.float32)
            if gate_b is not None:
                g = g + gate_b[topi]
            if up_b is not None:
                u = u + up_b[topi]
            h = act_mix(g.astype(x.dtype), u.astype(x.dtype))
            out = jnp.einsum("nkf,nkfd->nkd", h, wd, preferred_element_type=jnp.float32)
            if down_b is not None:
                out = out + down_b[topi]
            if scale_input:
                out = out.sum(axis=1)
            else:
                out = (out * topv[:, :, None].astype(jnp.float32)).sum(axis=1)
    else:
        # dense path: run all experts, mask with dispatch weights
        combine = jnp.zeros((B * T, E), x.dtype)
        combine = jax.vmap(lambda c, i, v: c.at[i].set(v))(combine, topi, topv)  # (N, E)
        if quantized:
            # scan over experts: every expert streams once (quantized) and
            # runs a full-token fused dequant-matmul — the MXU-dense analog
            # of the bf16 all-experts einsum below
            def one_expert(acc, e):
                xe = xt * combine[:, e, None] if scale_input else xt
                ge = quant_matmul(xe, qt_expert(w_gate, e))
                ue = quant_matmul(xe, qt_expert(w_up, e))
                gf, uf = ge.astype(jnp.float32), ue.astype(jnp.float32)
                if gate_b is not None:
                    gf = gf + gate_b[e]
                if up_b is not None:
                    uf = uf + up_b[e]
                h = act_mix(gf.astype(x.dtype), uf.astype(x.dtype))
                oe = quant_matmul(h, qt_expert(w_down, e)).astype(jnp.float32)
                if down_b is not None:
                    oe = oe + down_b[e]
                wgt = 1.0 if scale_input else combine[:, e, None].astype(jnp.float32)
                return acc + oe * wgt, None

            out, _ = jax.lax.scan(
                one_expert, jnp.zeros((B * T, D), jnp.float32), jnp.arange(E)
            )
        else:
            if scale_input:
                xe = xt[None, :, :] * combine.T[:, :, None].astype(xt.dtype)  # (E,N,D)
                g = jnp.einsum("end,edf->enf", xe, w_gate, preferred_element_type=jnp.float32)
                u = jnp.einsum("end,edf->enf", xe, w_up, preferred_element_type=jnp.float32)
            else:
                g = jnp.einsum("nd,edf->enf", xt, w_gate, preferred_element_type=jnp.float32)
                u = jnp.einsum("nd,edf->enf", xt, w_up, preferred_element_type=jnp.float32)
            if gate_b is not None:
                g = g + gate_b[:, None, :]
            if up_b is not None:
                u = u + up_b[:, None, :]
            h = act_mix(g.astype(x.dtype), u.astype(x.dtype))  # (E, N, F)
            out_e = jnp.einsum("enf,efd->end", h, w_down, preferred_element_type=jnp.float32)
            if down_b is not None:
                out_e = out_e + down_b[:, None, :]
            if scale_input:
                # selection already zeroed non-chosen experts' inputs
                out = out_e.sum(axis=0)
            else:
                out = jnp.einsum("end,ne->nd", out_e, combine.astype(jnp.float32))
    return out.astype(x.dtype).reshape(B, T, D)
