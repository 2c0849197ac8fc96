"""Performance matrix benchmark (reference: ``tools/llama-bench`` — pp512 /
tg128 defaults, mean ± stdev over repetitions, markdown/json/csv output)."""

from __future__ import annotations

import argparse
import json
import statistics
import time


def run_bench(
    model_path: str,
    pp_list: list[int],
    tg_list: list[int],
    reps: int = 3,
    max_seq: int = 2048,
    keep_quantized: bool = True,
) -> list[dict]:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from ..gguf.reader import GGUFModelReader
    from ..models.config import config_from_gguf
    from ..models.llama import KVCache, forward
    from ..runtime.weights import load_llama_params, load_llama_params_quantized
    from ..tokenizers import tokenizer_from_gguf

    reader = GGUFModelReader(model_path)
    cfg = config_from_gguf(reader)
    tokenizer_from_gguf(reader.readers[0])  # validates tokenizer metadata
    loader = load_llama_params_quantized if keep_quantized else load_llama_params
    params = loader(reader, cfg)

    fwd = jax.jit(forward, static_argnames=("cfg",), donate_argnames=("kv",))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("kv",))
    def decode_steps(params, tok, kv, n_steps):
        def body(carry, _):
            tok, kv = carry
            logits, kv = forward(params, cfg, tok, kv)
            nxt = logits[:, -1:].argmax(-1).astype(jnp.int32)
            return (nxt, kv), ()

        (tok, kv), _ = jax.lax.scan(body, (tok, kv), None, length=n_steps)
        return tok, kv

    rows = []
    rng = np.random.default_rng(0)
    for pp in pp_list:
        if pp <= 0:
            continue
        toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, pp)), jnp.int32)
        samples = []
        for _ in range(reps + 1):  # first is warmup
            kv = KVCache.create(cfg, 1, max(pp + 8, 64))
            t0 = time.perf_counter()
            logits, kv = fwd(params, cfg, toks, kv)
            _ = np.asarray(logits[0, -1, :8])  # hard sync, tiny fetch
            samples.append(pp / (time.perf_counter() - t0))
        samples = samples[1:]
        rows.append(_row(model_path, cfg, f"pp{pp}", samples))
    for tg in tg_list:
        if tg <= 0:
            continue
        chunk = 16
        samples = []
        for _ in range(reps + 1):
            kv = KVCache.create(cfg, 1, tg + chunk + 8)
            tok = jnp.zeros((1, 1), jnp.int32)
            tok, kv = decode_steps(params, tok, kv, chunk)  # warm/compile
            np.asarray(tok)
            t0 = time.perf_counter()
            done = 0
            while done < tg:
                tok, kv = decode_steps(params, tok, kv, chunk)
                done += chunk
            np.asarray(tok)
            samples.append(done / (time.perf_counter() - t0))
        samples = samples[1:]
        rows.append(_row(model_path, cfg, f"tg{tg}", samples))
    return rows


def _row(model_path, cfg, test, samples) -> dict:
    return {
        "model": model_path.rsplit("/", 1)[-1],
        "arch": cfg.arch,
        "n_params_m": None,
        "test": test,
        "t/s": round(statistics.mean(samples), 2),
        "stdev": round(statistics.stdev(samples) if len(samples) > 1 else 0.0, 2),
    }


def format_rows(rows: list[dict], fmt: str) -> str:
    if fmt == "json":
        return json.dumps(rows, indent=2)
    if fmt == "jsonl":
        return "\n".join(json.dumps(r) for r in rows)
    if fmt == "csv":
        header = ",".join(rows[0].keys())
        return header + "\n" + "\n".join(",".join(str(v) for v in r.values()) for r in rows)
    # markdown
    out = ["| model | test | t/s |", "| --- | --- | --- |"]
    for r in rows:
        out.append(f"| {r['model']} | {r['test']} | {r['t/s']} ± {r['stdev']} |")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-bench (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--n-prompt", type=int, nargs="*", default=[512])
    ap.add_argument("-n", "--n-gen", type=int, nargs="*", default=[128])
    ap.add_argument("-r", "--repetitions", type=int, default=3)
    ap.add_argument("-o", "--output", default="md", choices=("md", "json", "jsonl", "csv"))
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")
    rows = run_bench(args.model, args.n_prompt, args.n_gen, args.repetitions)
    print(format_rows(rows, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
