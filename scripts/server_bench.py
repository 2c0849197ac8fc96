#!/usr/bin/env python3
"""Server load benchmark — concurrent requests against a llama-server.

The analog of the reference's ``scripts/server-bench.py`` (spawn server,
fire N concurrent prompts, measure TTFT and token throughput), stdlib
only (urllib instead of requests; no datasets/matplotlib — prompts are
random token ids like the reference's rng mode; results print as JSON).

Usage:
    python scripts/server_bench.py --port 8080                 # running server
    python scripts/server_bench.py -m model.gguf --spawn       # spawn one
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import random
import statistics
import subprocess
import sys
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_health(base: str, timeout_s: float) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(base + "/health", timeout=5) as r:
                if json.load(r).get("status") == "ok":
                    return
        except (urllib.error.URLError, OSError):
            pass
        time.sleep(1.0)
    raise SystemExit(f"server at {base} not healthy after {timeout_s:.0f}s")


def one_request(base: str, prompt_ids: list[int], n_predict: int) -> dict:
    """Streamed completion; returns TTFT + generation timing."""
    body = json.dumps({
        "prompt": prompt_ids, "n_predict": n_predict,
        "temperature": 0.0, "stream": True,
    }).encode()
    req = urllib.request.Request(
        base + "/completion", data=body,
        headers={"Content-Type": "application/json"})
    t_start = time.perf_counter()
    t_first = None
    n_tokens = 0
    with urllib.request.urlopen(req, timeout=600) as r:
        for raw in r:
            line = raw.decode("utf-8", "replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            evt = json.loads(line[6:])
            if evt.get("error"):
                raise RuntimeError(evt["error"])
            if t_first is None:
                t_first = time.perf_counter()
            n_tokens += 1
    t_end = time.perf_counter()
    return {
        "n_prompt": len(prompt_ids),
        "n_gen": n_tokens,
        "ttft_s": (t_first or t_end) - t_start,
        "total_s": t_end - t_start,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("server-bench")
    ap.add_argument("-m", "--model", help="GGUF (with --spawn)")
    ap.add_argument("--spawn", action="store_true",
                    help="start a server subprocess for the run")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--n-prompts", type=int, default=16)
    ap.add_argument("--n-predict", type=int, default=32)
    ap.add_argument("--prompt-length-min", type=int, default=8)
    ap.add_argument("--prompt-length-max", type=int, default=64)
    ap.add_argument("--parallel", type=int, default=8,
                    help="concurrent clients")
    ap.add_argument("--n-vocab", type=int, default=0,
                    help="prompt-id range; 0 = read from /props")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, help="with --spawn")
    ap.add_argument("--startup-timeout", type=float, default=300.0)
    ap.add_argument("--warmup", choices=("none", "one", "full"),
                    default="full",
                    help="untimed pre-pass: 'full' covers every prompt "
                    "bucket at full concurrency (steady-state serving "
                    "numbers, first-compile cost excluded), 'one' fires a "
                    "single 2-token request, 'none' times a cold server")
    args = ap.parse_args(argv)

    base = f"http://{args.host}:{args.port}"
    proc = None
    if args.spawn:
        if not args.model:
            ap.error("--spawn needs -m")
        cmd = [sys.executable, "-m", "llama_cpp_gfx906_tpu.server",
               "-m", args.model, "--port", str(args.port), "-np",
               str(args.parallel)]
        if args.platform:
            cmd += ["--platform", args.platform]
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
    try:
        wait_health(base, args.startup_timeout)
        n_vocab = args.n_vocab
        if not n_vocab:
            with urllib.request.urlopen(base + "/props", timeout=10) as r:
                n_vocab = int(json.load(r)["n_vocab"])

        rng = random.Random(args.seed)
        prompts = [
            [rng.randrange(3, n_vocab)
             for _ in range(rng.randint(args.prompt_length_min,
                                        args.prompt_length_max))]
            for _ in range(args.n_prompts)
        ]

        # warmup (compile paths), then the timed concurrent run
        if args.warmup != "none":
            one_request(base, prompts[0], 2)
        if args.warmup == "full":
            # one untimed representative per prefill bucket, fired at full
            # concurrency: compiles every bucketed prefill program plus the
            # multi-slot burst/single-step decode paths, so the timed run
            # measures steady-state serving rather than first compiles
            sys.path.insert(0, REPO)
            from llama_cpp_gfx906_tpu.runtime.engine import bucket_len

            reps: dict[int, list[int]] = {}
            for p in prompts:
                reps.setdefault(bucket_len(len(p)), p)
            with cf.ThreadPoolExecutor(max_workers=args.parallel) as pool:
                list(pool.map(
                    lambda p: one_request(base, p, args.n_predict),
                    reps.values()))
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=args.parallel) as pool:
            results = list(pool.map(
                lambda p: one_request(base, p, args.n_predict), prompts))
        wall = time.perf_counter() - t0

        ttfts = sorted(r["ttft_s"] for r in results)
        n_gen = sum(r["n_gen"] for r in results)
        n_prompt = sum(r["n_prompt"] for r in results)
        out = {
            "n_prompts": len(results),
            "parallel": args.parallel,
            "wall_s": round(wall, 3),
            "prompt_tokens": n_prompt,
            "gen_tokens": n_gen,
            "gen_tok_s": round(n_gen / wall, 2),
            "prompt_tok_s": round(n_prompt / wall, 2),
            "ttft_avg_ms": round(1e3 * statistics.fmean(ttfts), 1),
            "ttft_p50_ms": round(1e3 * ttfts[len(ttfts) // 2], 1),
            "ttft_p95_ms": round(1e3 * ttfts[min(len(ttfts) - 1,
                                                 int(len(ttfts) * 0.95))], 1),
        }
        print(json.dumps(out))
        return 0
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    raise SystemExit(main())
