"""Minimal training step (reference: ``llama_opt_*`` / ``ggml-opt``).

The reference exposes full-finetune via ``llama_opt_init``/``llama_opt_epoch``
(llama.h:1467-1476, ``llama-context.cpp:2039-2188``) with AdamW/SGD from the
ggml-opt module.  Here the same capability is a pure jit-compiled train
step: cross-entropy loss over the forward pass, ``jax.grad``, optimizer
update — shardable over the mesh like inference (gradients all-reduce over
"data"; TP weights keep their layout).
"""

from __future__ import annotations

from dataclasses import dataclass
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


def adamw_train_step_factory(cfg: ModelConfig, lr=1e-4,
                             weight_decay: float = 0.0):
    """AdamW via optax (the reference's default optimizer, ggml-opt).
    ``lr`` may be a float or an optax schedule (cosine decay for the
    finetune tool's -lr-min/-decay-epochs flags)."""
    import optax

    opt = optax.adamw(lr, weight_decay=weight_decay)

    @partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, tokens, targets, mask):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(params, cfg, tokens, targets, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, step


@partial(jax.jit, static_argnames=("cfg",))
def eval_loss_step(params, cfg: ModelConfig, tokens, targets, mask):
    """Loss without gradients (the epoch's eval split)."""
    return cross_entropy_loss(params, cfg, tokens, targets, mask)


# -- dataset + epoch API (reference: ggml_opt dataset / llama_opt_epoch,
#    llama-context.cpp:2039-2188, tests/test-opt.cpp) ------------------------


@dataclass
class TokenDataset:
    """Contiguous token stream chunked into (ctx+1)-length sequences: each
    row yields (inputs = seq[:-1], targets = seq[1:]) — the ggml_opt_dataset
    layout (ndata × (n_ctx+1))."""

    seqs: "np.ndarray"  # (n_data, ctx + 1) int32

    @classmethod
    def from_tokens(cls, ids, ctx: int, stride: int | None = None) -> "TokenDataset":
        import numpy as np

        stride = stride or ctx
        rows = []
        for start in range(0, max(len(ids) - ctx, 0), stride):
            chunk = ids[start : start + ctx + 1]
            if len(chunk) == ctx + 1:
                rows.append(chunk)
        if not rows:
            raise ValueError(f"corpus too short for ctx={ctx}")
        return cls(seqs=np.asarray(rows, dtype="int32"))

    def __len__(self) -> int:
        return len(self.seqs)

    def batches(self, batch_size: int, lo: int, hi: int, shuffle_key=None):
        """Yield (tokens, targets, mask) jnp batches over rows [lo, hi)."""
        import numpy as np

        idx = np.arange(lo, hi)
        if shuffle_key is not None:
            rng = np.random.default_rng(int(shuffle_key))
            rng.shuffle(idx)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            rows = self.seqs[idx[i : i + batch_size]]
            toks = jnp.asarray(rows[:, :-1])
            tgts = jnp.asarray(rows[:, 1:])
            yield toks, tgts, jnp.ones_like(tgts, jnp.float32)


class Trainer:
    """Epoch-level training driver (llama_opt_init + llama_opt_epoch analog).

    Holds the optimizer-state pytree across epochs; ``epoch`` walks the
    train split with gradient steps and the eval split without, invoking
    the reference-style progress callbacks."""

    def __init__(self, cfg: ModelConfig, params, optimizer: str = "adamw",
                 lr=1e-4, weight_decay: float = 0.0):
        import optax

        self.cfg = cfg
        # the jitted steps donate the params buffers; train on a private
        # copy so the caller's pytree (e.g. a live Engine) stays valid
        self.params = jax.tree_util.tree_map(jnp.array, params)
        params = self.params
        if optimizer == "adamw":
            self.opt, self._step = adamw_train_step_factory(
                cfg, lr, weight_decay)
            self.opt_state = self.opt.init(params)
        elif optimizer == "sgd":
            self.opt = None
            self.opt_state = ()
            lr_f = lr

            def _sgd(params, opt_state, toks, tgts, mask):
                params, loss = sgd_train_step(params, cfg, toks, tgts, mask, lr_f)
                return params, opt_state, loss

            self._step = _sgd
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")

    def epoch(
        self,
        dataset: TokenDataset,
        batch_size: int = 1,
        split: float = 0.0,  # trailing fraction reserved for eval
        shuffle_seed: int | None = None,
        callback_train=None,  # (ibatch, nbatch, loss) — progress hook
        callback_eval=None,
    ) -> tuple[float, float]:
        """One pass over the dataset; returns (train_loss, eval_loss) means.
        Mirrors llama_opt_epoch's idata_split contract: rows before the
        split train, rows after only evaluate."""
        n = len(dataset)
        n_train = n - int(n * split)
        t_losses, e_losses = [], []
        train_batches = list(dataset.batches(batch_size, 0, n_train, shuffle_seed))
        for i, (toks, tgts, mask) in enumerate(train_batches):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, toks, tgts, mask
            )
            t_losses.append(float(loss))
            if callback_train:
                callback_train(i, len(train_batches), t_losses[-1])
        eval_batches = list(dataset.batches(batch_size, n_train, n))
        for i, (toks, tgts, mask) in enumerate(eval_batches):
            loss = eval_loss_step(self.params, self.cfg, toks, tgts, mask)
            e_losses.append(float(loss))
            if callback_eval:
                callback_eval(i, len(eval_batches), e_losses[-1])
        mean = lambda xs: sum(xs) / len(xs) if xs else 0.0
        return mean(t_losses), mean(e_losses)

    # -- optimizer-state persistence (ggml-opt checkpoint analog) ----------

    def save_checkpoint(self, path: str):
        import numpy as np

        leaves, _ = jax.tree_util.tree_flatten((self.params, self.opt_state))
        np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})

    def load_checkpoint(self, path: str):
        import numpy as np

        data = np.load(path)
        _, treedef = jax.tree_util.tree_flatten((self.params, self.opt_state))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
        self.params, self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
