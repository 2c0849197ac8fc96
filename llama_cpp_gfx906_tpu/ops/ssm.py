"""Selective-state-space ops: causal depthwise conv + selective scan.

TPU-native analogs of ``ggml_ssm_conv`` / ``ggml_ssm_scan`` (reference
usage: build_mamba_layer, src/llama-model.cpp:11011; op list SURVEY §2.2).
Prefill runs the recurrence as a ``lax.scan`` over time with the matmuls
batched outside the scan (MXU work stays (B·T)-shaped); decode is the
T=1 special case of the same functions, so both paths share one compiled
structure and the carried state is the recurrent "KV cache".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jnp.ndarray,  # (B, T, C)
    conv_state: jnp.ndarray,  # (B, K-1, C) trailing inputs from the past
    weight: jnp.ndarray,  # (C, K) depthwise taps
    bias: jnp.ndarray | None,  # (C,)
    n_tokens: jnp.ndarray | None = None,  # (B,) valid length (right-padding)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depthwise causal conv over time with carried state.

    Returns (y (B, T, C), new_conv_state (B, K-1, C)).  With ``n_tokens``
    the carried state captures the last K-1 *valid* inputs, so bucketed
    (right-padded) prefill leaves the recurrent memory clean."""
    B, T, C = x.shape
    K = weight.shape[1]
    ext = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # (B, K-1+T, C)
    # gather K shifted views; K is tiny (4) so this unrolls into adds
    y = jnp.zeros((B, T, C), jnp.float32)
    for k in range(K):
        y = y + ext[:, k : k + T, :].astype(jnp.float32) * weight[:, k].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if K > 1:
        if n_tokens is None:
            new_state = ext[:, -(K - 1) :, :]
        else:
            # ext[:K-1+n] are valid → last K-1 valid rows start at index n
            def slice_one(e, n):
                return jax.lax.dynamic_slice(e, (n, 0), (K - 1, C))

            new_state = jax.vmap(slice_one)(ext, n_tokens.astype(jnp.int32))
    else:
        new_state = conv_state
    return y.astype(x.dtype), new_state


def ssd_scan(
    x: jnp.ndarray,  # (B, T, H, P)   per-head inputs (V in SSM/attn duality)
    dt: jnp.ndarray,  # (B, T, H)     softplus'd per-head step sizes
    A: jnp.ndarray,  # (H,)           negative per-head decay (= -exp(A_log))
    Bmat: jnp.ndarray,  # (B, T, G, N)  input gate (K in the duality)
    Cmat: jnp.ndarray,  # (B, T, G, N)  output gate (Q in the duality)
    ssm_state: jnp.ndarray,  # (B, H, P, N)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mamba-2 state-space-duality scan (scalar A per head):
    h_t = exp(dt_t·A)·h_{t-1} + dt_t·x_t⊗B_t,  y_t = h_t·C_t.

    The ``reference ggml_ssm_scan`` analog for the mamba2 layer
    (build_mamba2_layer, src/llama-model.cpp:11149); groups broadcast
    B/C to their H/G heads.  D-skip and gating live in the caller.
    Returns (y (B, T, H, P), final state)."""
    Bsz, T, H, P = x.shape
    G = Bmat.shape[2]
    rep = H // G
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    dA = jnp.exp(dtf * A.astype(jnp.float32)[None, None, :])  # (B, T, H)
    # broadcast groups to heads: (B, T, G, N) -> (B, T, H, N)
    Bh = jnp.repeat(Bmat.astype(jnp.float32), rep, axis=2)
    Ch = jnp.repeat(Cmat.astype(jnp.float32), rep, axis=2)
    dtx = dtf[..., None] * xf  # (B, T, H, P)

    def step(h, inputs):
        # outer product formed inside the step: keeps the big (H, P, N)
        # intermediate out of the scanned arrays (O(B·H·P·N), not O(T·…))
        dA_t, dtx_t, B_t, C_t = inputs
        h = dA_t[:, :, None, None] * h + dtx_t[..., None] * B_t[:, :, None, :]
        y = jnp.einsum("bhpn,bhn->bhp", h, C_t)
        return h, y

    h_final, ys = jax.lax.scan(
        step,
        ssm_state.astype(jnp.float32),
        (dA.transpose(1, 0, 2), dtx.transpose(1, 0, 2, 3),
         Bh.transpose(1, 0, 2, 3), Ch.transpose(1, 0, 2, 3)),
    )
    y = ys.transpose(1, 0, 2, 3)  # (B, T, H, P)
    return y.astype(x.dtype), h_final.astype(ssm_state.dtype)


def selective_scan(
    x: jnp.ndarray,  # (B, T, C)     conv+silu output
    dt: jnp.ndarray,  # (B, T, C)    softplus'd step sizes
    A: jnp.ndarray,  # (C, N)        negative state matrix (= -exp(A_log))
    Bmat: jnp.ndarray,  # (B, T, N)  input gate
    Cmat: jnp.ndarray,  # (B, T, N)  output gate
    D: jnp.ndarray,  # (C,)          skip connection
    ssm_state: jnp.ndarray,  # (B, C, N)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mamba-1 selective scan: h_t = exp(dt·A)·h_{t-1} + (dt·x·B)_t,
    y_t = C_t·h_t + D·x_t.  Returns (y (B,T,C), final state)."""
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Af = A.astype(jnp.float32)

    dA = jnp.exp(dtf[..., None] * Af[None, None])  # (B, T, C, N)
    dBx = dtf[..., None] * Bmat[:, :, None, :].astype(jnp.float32) * xf[..., None]

    def step(h, inputs):
        dA_t, dBx_t = inputs  # (B, C, N)
        h = dA_t * h + dBx_t
        return h, h

    # scan over time: move T to the leading axis
    hs_final, hs = jax.lax.scan(
        step,
        ssm_state.astype(jnp.float32),
        (dA.transpose(1, 0, 2, 3), dBx.transpose(1, 0, 2, 3)),
    )
    hs = hs.transpose(1, 0, 2, 3)  # (B, T, C, N)
    y = jnp.einsum("btcn,btn->btc", hs, Cmat.astype(jnp.float32))
    y = y + D.astype(jnp.float32) * xf
    return y.astype(x.dtype), hs_final.astype(ssm_state.dtype)
