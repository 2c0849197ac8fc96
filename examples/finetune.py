"""Full finetune with AdamW (reference: examples/training/finetune.cpp via
llama_opt_epoch; here: jax.grad over the same forward the engine serves)."""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# honor forced-CPU runs (the axon plugin overrides JAX_PLATFORMS at
# discovery; only jax.config wins — same workaround as tests/conftest.py)
import os as _os2
if _os2.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.common.args import build_parser
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.training import TokenDataset, Trainer

# registry "finetune" scope: --epochs/-lr/--optimizer/-wd/-val-split/-o
# with LLAMA_ARG_* mirrors (arg.cpp finetune section analog)
ap = build_parser("finetune")
ap.set_defaults(epochs=1)
ap.add_argument("--ctx", type=int, default=128)
ap.add_argument("--batch", type=int, default=1)
ap.add_argument("--lr", type=float, default=None, help="alias of -lr")
ap.add_argument("--checkpoint", default=None, help="save params+optimizer here")
args = ap.parse_args()
if args.lr is not None:
    args.learning_rate = args.lr
args.checkpoint = args.checkpoint or args.output

eng = Engine.from_gguf(args.model, keep_quantized=False, dtype=jnp.float32)
ids = eng.tokenizer.tokenize(open(args.file, encoding="utf-8").read(), add_special=False)
try:
    data = TokenDataset.from_tokens(ids, args.ctx)
except ValueError:
    print("epoch 0: mean loss 0.0000 (corpus shorter than ctx)")
    raise SystemExit(0)

lr = args.learning_rate
if args.learning_rate_decay_epochs > 0 and args.optimizer == "adamw":
    # -decay-epochs: cosine decay to -lr-min over N epochs (finetune.cpp)
    import optax

    steps_per_epoch = max(
        int(len(data) * (1 - args.val_split)) // max(args.batch, 1), 1)
    lr = optax.cosine_decay_schedule(
        init_value=args.learning_rate,
        decay_steps=int(steps_per_epoch * args.learning_rate_decay_epochs),
        alpha=(args.learning_rate_min / args.learning_rate
               if args.learning_rate else 0.0))
trainer = Trainer(eng.cfg, eng.params, optimizer=args.optimizer,
                  lr=lr, weight_decay=args.weight_decay)
for epoch in range(args.epochs):
    train_loss, eval_loss = trainer.epoch(
        data, batch_size=args.batch, split=args.val_split, shuffle_seed=epoch,
        callback_train=lambda i, n, l: print(f"  train {i + 1}/{n} loss {l:.4f}", flush=True)
        if (i + 1) % 8 == 0 else None,
    )
    print(f"epoch {epoch}: mean loss {train_loss:.4f} eval {eval_loss:.4f}")
if args.checkpoint:
    trainer.save_checkpoint(args.checkpoint)
    print(f"checkpoint -> {args.checkpoint}")
