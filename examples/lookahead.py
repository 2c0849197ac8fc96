"""Lookahead (Jacobi) decoding — reference: examples/lookahead (n-gram
Jacobi iteration; Fu et al. lookahead decoding).

Each round feeds the current token plus a W-token guess window through one
``decode_chunk`` forward.  The model's argmax outputs both (a) verify the
guesses — the longest matching prefix is accepted like speculative
decoding — and (b) become the next round's guess window (the Jacobi
fixed-point iteration).  Accepted trajectories seed an n-gram pool that
re-seeds future windows (the reference's n-gram candidate pool).

    python examples/lookahead.py -m model.gguf -p "..." -n 64 -W 8
"""
# run standalone from a repo checkout without installing the package
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0] if __name__ == "__main__" else __file__))))

# honor forced-CPU runs (the axon plugin overrides JAX_PLATFORMS at
# discovery; only jax.config wins — same workaround as tests/conftest.py)
import os as _os2
if _os2.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import argparse

import numpy as np


def lookahead_generate(eng, prompt_ids, n_predict=64, W=8, stop_on_eog=True):
    """Returns (tokens, stats dict)."""
    from llama_cpp_gfx906_tpu.runtime.ngram_cache import NgramCache

    eng.reset()
    logits = eng.prefill(list(prompt_ids))
    cur = int(np.argmax(logits))
    out = [cur]
    all_ids = list(prompt_ids) + [cur]
    eog = eng.tokenizer.vocab.special.eog_ids()
    pool = NgramCache()
    pool.update(all_ids)

    # initial guess window: ngram draft if available, else repeat cur
    def seed_window():
        d = pool.draft(all_ids, W)
        return (d + [cur] * (W - len(d)))[:W]

    guesses = seed_window()
    stats = {"rounds": 0, "accepted": 0, "guessed": 0}
    while len(out) < n_predict and (not stop_on_eog or cur not in eog):
        base = eng.n_past
        chunk = [cur] + guesses
        t_logits = eng.decode_chunk(chunk)  # (1+W, V)
        preds = np.argmax(t_logits, axis=-1).astype(int)  # model outputs
        # verification: guess i is correct iff it equals the model's output
        # after consuming [cur] + guesses[:i]
        accepted = []
        for i, g in enumerate(guesses):
            if preds[i] == g:
                accepted.append(g)
            else:
                break
        accepted.append(int(preds[len(accepted)]))  # first novel token
        stats["rounds"] += 1
        stats["guessed"] += len(guesses)
        stats["accepted"] += len(accepted) - 1

        final = []
        for t in accepted:
            final.append(t)
            if (stop_on_eog and t in eog) or len(out) + len(final) >= n_predict:
                break
        out.extend(final)
        all_ids.extend(final)
        pool.update(all_ids[-(W + 8):])
        cur = final[-1]
        # rewind to keep only accepted rows (llama_memory_seq_rm analog)
        eng.set_n_past(base + len(final))
        # Jacobi update: next window = model outputs shifted past acceptance
        tail = [int(p) for p in preds[len(final):]]
        guesses = (tail + seed_window())[:W]
    return out, stats


def main(argv=None) -> int:
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="The")
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("-W", "--window", type=int, default=8)
    args = ap.parse_args(argv)

    eng = Engine.from_gguf(args.model, dtype=jnp.float32)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
    out, stats = lookahead_generate(eng, ids, args.n_predict, args.window)
    print(eng.tokenizer.detokenize(out))
    acc = stats["accepted"] / max(stats["guessed"], 1)
    print(f"[lookahead] rounds={stats['rounds']} tokens={len(out)} "
          f"accept-rate={acc:.2f} tokens/round={len(out) / max(stats['rounds'], 1):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
