"""Batched throughput benchmark (reference: tools/batched-bench).

Measures prompt-processing (PP), text-generation (TG) and joint
throughput across (n_prompt, n_gen, n_parallel) combinations, printing
the reference's table format.
"""

from __future__ import annotations

import argparse
import time


def run_case(base, npp: int, ntg: int, npl: int) -> dict:
    import numpy as np

    from ..runtime.batch_engine import BatchedEngine, SamplerConfig

    eng = BatchedEngine(
        base.cfg, base.params, base.tokenizer,
        n_slots=npl, max_seq=npp + ntg + 8,
    )
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(3, base.cfg.n_vocab, npp)]

    from ..runtime.batch_engine import SlotState

    t0 = time.perf_counter()
    for i in range(npl):
        eng.add_request(prompt, ntg, SamplerConfig(temp=0.0), request_id=str(i))
    # prompts stream in chunks from step() (chunked prefill); drive until
    # every slot has flipped to GENERATING
    while any(s.state == SlotState.PREFILLING for s in eng.slots):
        eng.step()
    t_pp = time.perf_counter() - t0

    t0 = time.perf_counter()
    steps = 0
    while eng.n_active and steps < ntg:
        eng.step()
        steps += 1
    t_tg = time.perf_counter() - t0

    n_pp_tok = npp * npl
    n_tg_tok = sum(len(s.generated) for s in eng.slots)
    return {
        "pp": npp, "tg": ntg, "pl": npl,
        "t_pp_s": round(t_pp, 3),
        "s_pp": round(n_pp_tok / t_pp, 2) if t_pp else 0.0,
        "t_tg_s": round(t_tg, 3),
        "s_tg": round(n_tg_tok / t_tg, 2) if t_tg else 0.0,
        "s_total": round((n_pp_tok + n_tg_tok) / (t_pp + t_tg), 2),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-batched-bench (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-npp", type=str, default="128,256")
    ap.add_argument("-ntg", type=str, default="64")
    ap.add_argument("-npl", type=str, default="1,2,4")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine

    base = Engine.from_gguf(args.model)
    rows = []
    for npp in map(int, args.npp.split(",")):
        for ntg in map(int, args.ntg.split(",")):
            for npl in map(int, args.npl.split(",")):
                rows.append(run_case(base, npp, ntg, npl))
    if args.json:
        import json

        print(json.dumps(rows))
    else:
        hdr = ("PP", "TG", "B", "S_PP t/s", "S_TG t/s", "S t/s")
        print("| " + " | ".join(f"{h:>9}" for h in hdr) + " |")
        print("|" + "|".join("-" * 11 for _ in hdr) + "|")
        for r in rows:
            print(
                f"| {r['pp']:>9} | {r['tg']:>9} | {r['pl']:>9} "
                f"| {r['s_pp']:>9} | {r['s_tg']:>9} | {r['s_total']:>9} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
