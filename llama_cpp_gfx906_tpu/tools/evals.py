"""Benchmark evals: HellaSwag, Winogrande, generic multiple-choice.

Reference: tools/perplexity/perplexity.cpp — hellaswag :741,
winogrande :1098, multiple_choice :1402.  Same scoring rule: each
candidate continuation is scored by the sum of next-token log-probs of
its tokens given the context; accuracy = fraction of tasks where the
gold candidate scores highest.

Task files are JSONL here (one task per line):
  hellaswag:       {"query": str, "endings": [str, ...], "gold": int}
  winogrande:      {"sentence": "... _ ...", "option1": str, "option2": str, "answer": 1|2}
  multiple-choice: {"question": str, "choices": [str, ...], "gold": int}
"""

from __future__ import annotations

import json

import numpy as np


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def score_continuation(engine, ctx_ids: list[int], cont_ids: list[int]) -> float:
    """Σ log p(cont_i | ctx, cont_<i) via one bucketed forward pass."""
    import jax.numpy as jnp

    from ..runtime.engine import bucket_len

    full = list(ctx_ids) + list(cont_ids)
    n = len(full)
    padded = bucket_len(n)
    toks = np.zeros((1, padded), np.int32)
    toks[0, :n] = full
    kv = engine.family.make_cache(engine.cfg, 1, padded, engine.kv_dtype)
    logits, _ = engine._forward(
        engine.params, engine.cfg, jnp.asarray(toks), kv,
        jnp.full((1,), n, jnp.int32),
    )
    logits = np.asarray(logits[0, :n], np.float32)
    logp = logits - _logsumexp(logits)
    start = len(ctx_ids)
    # token at position i is predicted by logits at i-1
    rows = np.arange(start - 1, n - 1)
    return float(logp[rows, np.asarray(cont_ids)].sum())


def _load_jsonl(path: str, limit: int | None) -> list[dict]:
    tasks = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                tasks.append(json.loads(line))
            if limit and len(tasks) >= limit:
                break
    return tasks


def hellaswag(engine, path: str, limit: int | None = None, normalize: bool = True) -> dict:
    """Ending-completion accuracy (perplexity.cpp:741).  ``normalize``
    divides by ending token count (the reference's acc_norm metric)."""
    tok = engine.tokenizer
    tasks = _load_jsonl(path, limit)
    correct = 0
    for t in tasks:
        ctx = tok.tokenize(t["query"], add_special=True, parse_special=False)
        scores = []
        for ending in t["endings"]:
            cont = tok.tokenize(" " + ending.strip(), add_special=False, parse_special=False)
            s = score_continuation(engine, ctx, cont)
            scores.append(s / max(len(cont), 1) if normalize else s)
        if int(np.argmax(scores)) == int(t["gold"]):
            correct += 1
    return {"task": "hellaswag", "n": len(tasks), "accuracy": correct / max(len(tasks), 1)}


def winogrande(engine, path: str, limit: int | None = None) -> dict:
    """Blank-filling pick (perplexity.cpp:1098): substitute each option
    into the '_' slot and score the sentence tail after the blank."""
    tok = engine.tokenizer
    tasks = _load_jsonl(path, limit)
    correct = 0
    for t in tasks:
        sent = t["sentence"]
        blank = sent.index("_")
        scores = []
        for opt in (t["option1"], t["option2"]):
            prefix = sent[:blank] + opt
            suffix = sent[blank + 1 :]
            ctx = tok.tokenize(prefix, add_special=True, parse_special=False)
            cont = tok.tokenize(suffix, add_special=False, parse_special=False)
            if not cont:
                scores.append(-np.inf)
                continue
            scores.append(score_continuation(engine, ctx, cont) / len(cont))
        if int(np.argmax(scores)) + 1 == int(t["answer"]):
            correct += 1
    return {"task": "winogrande", "n": len(tasks), "accuracy": correct / max(len(tasks), 1)}


def multiple_choice(engine, path: str, limit: int | None = None) -> dict:
    """Generic MC accuracy (perplexity.cpp:1402)."""
    tok = engine.tokenizer
    tasks = _load_jsonl(path, limit)
    correct = 0
    for t in tasks:
        ctx = tok.tokenize(t["question"], add_special=True, parse_special=False)
        scores = []
        for choice in t["choices"]:
            cont = tok.tokenize(" " + str(choice).strip(), add_special=False, parse_special=False)
            if not cont:
                scores.append(-np.inf)
                continue
            scores.append(score_continuation(engine, ctx, cont) / len(cont))
        if int(np.argmax(scores)) == int(t["gold"]):
            correct += 1
    return {"task": "multiple_choice", "n": len(tasks), "accuracy": correct / max(len(tasks), 1)}
