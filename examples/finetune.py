"""Full finetune with AdamW (reference: examples/training/finetune.cpp via
llama_opt_epoch; here: jax.grad over the same forward the engine serves)."""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
import numpy as np

from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.training import adamw_train_step_factory

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model", required=True)
ap.add_argument("-f", "--file", required=True, help="training text")
ap.add_argument("--ctx", type=int, default=128)
ap.add_argument("--epochs", type=int, default=1)
ap.add_argument("--lr", type=float, default=1e-5)
args = ap.parse_args()

eng = Engine.from_gguf(args.model, keep_quantized=False, dtype=jnp.float32)
ids = eng.tokenizer.tokenize(open(args.file, encoding="utf-8").read(), add_special=False)
n = (len(ids) - 1) // args.ctx
chunks = np.asarray([ids[i * args.ctx:(i + 1) * args.ctx + 1] for i in range(n)])

opt, step = adamw_train_step_factory(eng.cfg, lr=args.lr)
params = eng.params
opt_state = opt.init(params)
for epoch in range(args.epochs):
    total = 0.0
    for c in chunks:
        toks = jnp.asarray(c[None, :-1], jnp.int32)
        tgts = jnp.asarray(c[None, 1:], jnp.int32)
        mask = jnp.ones_like(tgts, jnp.float32)
        params, opt_state, loss = step(params, opt_state, toks, tgts, mask)
        total += float(loss)
    print(f"epoch {epoch}: mean loss {total / max(n,1):.4f}")
