"""Performance matrix benchmark (reference: ``tools/llama-bench`` —
cross-product of parameters (``cmd_params``, llama-bench.cpp:238), pp512 /
tg128 defaults (:277-278), mean ± stdev over repetitions, and
MARKDOWN/CSV/JSON/JSONL/SQL output (:139)).

The TPU-relevant parameter axes replace the reference's CPU/GPU knobs:
models × n_prompt × n_gen × batch size (parallel decode streams) ×
KV-cache type (bf16/q8) × weight residency (quantized/bf16)."""

from __future__ import annotations

import argparse
import itertools
import json
import statistics
import time


def bench_combo(
    model_path: str,
    pp_list: list[int],
    tg_list: list[int],
    batch: int = 1,
    kv_type: str = "bf16",
    weights: str = "quant",
    reps: int = 3,
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
    loader = load_llama_params_quantized if weights == "quant" else load_llama_params
    params = loader(reader, cfg)
    kv_dtype = "q8" if kv_type == "q8" else jnp.bfloat16

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

    meta = {"batch": batch, "kv": kv_type, "weights": weights}
    rows = []
    rng = np.random.default_rng(0)
    for pp in pp_list:
        if pp <= 0:
            continue
        samples = []
        for r in range(reps + 1):  # first is warmup; fresh prompts defeat
            # the axon runtime's whole-call memoization
            toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (batch, pp)), jnp.int32)
            kv = KVCache.create(cfg, batch, max(pp + 8, 64), kv_dtype)
            t0 = time.perf_counter()
            logits, kv = fwd(params, cfg, toks, kv)
            _ = np.asarray(logits[0, -1, :8])  # hard sync, tiny fetch
            samples.append(batch * pp / (time.perf_counter() - t0))
        rows.append(_row(model_path, cfg, f"pp{pp}", samples[1:], meta))
    for tg in tg_list:
        if tg <= 0:
            continue
        chunk = 16
        samples = []
        for r in range(reps + 1):
            kv = KVCache.create(cfg, batch, tg + chunk + 8, kv_dtype)
            tok = jnp.asarray(rng.integers(0, cfg.n_vocab, (batch, 1)), jnp.int32)
            tok, kv = decode_steps(params, tok, kv, chunk)  # warm/compile
            np.asarray(tok)
            t0 = time.perf_counter()
            done = 0
            while done < tg:
                tok, kv = decode_steps(params, tok, kv, chunk)
                done += chunk
            np.asarray(tok)
            samples.append(batch * done / (time.perf_counter() - t0))
        rows.append(_row(model_path, cfg, f"tg{tg}", samples[1:], meta))
    return rows


def run_bench(
    model_path: str,
    pp_list: list[int],
    tg_list: list[int],
    reps: int = 3,
    max_seq: int = 2048,
    keep_quantized: bool = True,
) -> list[dict]:
    """Single-combination entry point (backwards compatible)."""
    return bench_combo(
        model_path, pp_list, tg_list, batch=1, kv_type="bf16",
        weights="quant" if keep_quantized else "bf16", reps=reps,
    )


def run_matrix(
    models: list[str],
    pp_list: list[int],
    tg_list: list[int],
    batches: list[int],
    kv_types: list[str],
    weights_list: list[str],
    reps: int = 3,
) -> list[dict]:
    """Cross product over every parameter axis (cmd_params analog)."""
    rows = []
    for m, b, kv, wt in itertools.product(models, batches, kv_types, weights_list):
        rows.extend(bench_combo(m, pp_list, tg_list, b, kv, wt, reps))
    return rows


def _row(model_path, cfg, test, samples, meta) -> dict:
    return {
        "model": model_path.rsplit("/", 1)[-1],
        "arch": cfg.arch,
        "test": test,
        **meta,
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
    if fmt == "sql":
        # llama-bench SQL dialect: one CREATE TABLE + INSERTs
        cols = list(rows[0].keys())
        defs = ", ".join(
            f'"{c.replace("/", "_")}" '
            + ("REAL" if isinstance(rows[0][c], float) else
               "INTEGER" if isinstance(rows[0][c], int) else "TEXT")
            for c in cols
        )
        out = [f"CREATE TABLE IF NOT EXISTS bench ({defs});"]
        for r in rows:
            vals = ", ".join(
                f"'{v}'" if isinstance(v, str) else str(v) for v in r.values()
            )
            out.append(f"INSERT INTO bench VALUES ({vals});")
        return "\n".join(out)
    # markdown
    keys = [k for k in rows[0] if k not in ("t/s", "stdev")]
    out = ["| " + " | ".join(keys + ["t/s"]) + " |",
           "| " + " | ".join("---" for _ in range(len(keys) + 1)) + " |"]
    for r in rows:
        cells = [str(r[k]) for k in keys] + [f"{r['t/s']} ± {r['stdev']}"]
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-bench (TPU)")
    ap.add_argument("-m", "--model", required=True, nargs="+",
                    help="one or more GGUF models (cross-product axis)")
    ap.add_argument("-p", "--n-prompt", type=int, nargs="*", default=[512])
    ap.add_argument("-n", "--n-gen", type=int, nargs="*", default=[128])
    ap.add_argument("-b", "--batch-size", type=int, nargs="*", default=[1],
                    help="parallel decode streams (cross-product axis)")
    ap.add_argument("-ctk", "--cache-type-k", nargs="*", default=["bf16"],
                    choices=("bf16", "q8"), help="KV cache type (axis)")
    ap.add_argument("--weights", nargs="*", default=["quant"],
                    choices=("quant", "bf16"), help="weight residency (axis)")
    ap.add_argument("-r", "--repetitions", type=int, default=3)
    ap.add_argument("-o", "--output", default="md",
                    choices=("md", "json", "jsonl", "csv", "sql"))
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")
    rows = run_matrix(
        args.model, args.n_prompt, args.n_gen, args.batch_size,
        args.cache_type_k, args.weights, args.repetitions,
    )
    print(format_rows(rows, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
