"""Minimal training step (reference: ``llama_opt_*`` / ``ggml-opt``).

The reference exposes full-finetune via ``llama_opt_init``/``llama_opt_epoch``
(llama.h:1467-1476, ``llama-context.cpp:2039-2188``) with AdamW/SGD from the
ggml-opt module.  Here the same capability is a pure jit-compiled train
step: cross-entropy loss over the forward pass, ``jax.grad``, optimizer
update — shardable over the mesh like inference (gradients all-reduce over
"data"; TP weights keep their layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward


def cross_entropy_loss(params, cfg: ModelConfig, tokens, targets, mask):
    """Mean next-token cross entropy; mask marks valid target positions."""
    from ..ops.attention import force_einsum

    B, T = tokens.shape
    kv = KVCache.create(cfg, B, T, jnp.bfloat16)
    with force_einsum():  # Pallas attention has no JVP; grad needs einsum
        logits, _ = forward(params, cfg, tokens, kv)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1)
    return (nll * mask).sum() / denom


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("params",))
def sgd_train_step(params, cfg: ModelConfig, tokens, targets, mask, lr=1e-4):
    """One SGD step; returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(cross_entropy_loss)(params, cfg, tokens, targets, mask)
    new_params = jax.tree_util.tree_map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype), params, grads
    )
    return new_params, loss


def adamw_train_step_factory(cfg: ModelConfig, lr: float = 1e-4):
    """AdamW via optax (the reference's default optimizer, ggml-opt)."""
    import optax

    opt = optax.adamw(lr)

    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, tokens, targets, mask):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(params, cfg, tokens, targets, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, step
