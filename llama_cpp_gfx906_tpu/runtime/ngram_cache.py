"""N-gram cache for lookup decoding (reference: common/ngram-cache.{h,cpp}
+ examples/lookup) — drafts continuation tokens from n-gram statistics of
previously seen text instead of a draft model; verification happens
exactly like model-based speculation (one target forward over the draft).
"""

from __future__ import annotations

import json
from collections import defaultdict

NGRAM_MIN = 1
NGRAM_MAX = 4


class NgramCache:
    """ngram (tuple) → {next_token: count}; sizes NGRAM_MIN..NGRAM_MAX."""

    def __init__(self):
        self.maps: dict[int, dict[tuple, dict[int, int]]] = {
            n: defaultdict(dict) for n in range(NGRAM_MIN, NGRAM_MAX + 1)
        }

    def update(self, tokens: list[int]):
        """Accumulate statistics from a token stream
        (common_ngram_cache_update)."""
        for n in range(NGRAM_MIN, NGRAM_MAX + 1):
            for i in range(len(tokens) - n):
                key = tuple(tokens[i : i + n])
                nxt = tokens[i + n]
                d = self.maps[n][key]
                d[nxt] = d.get(nxt, 0) + 1

    def _best(self, key: tuple) -> tuple[int, int, int] | None:
        """(token, count, total) with the highest count for this ngram."""
        d = self.maps[len(key)].get(key)
        if not d:
            return None
        tok, cnt = max(d.items(), key=lambda kv: kv[1])
        return tok, cnt, sum(d.values())

    def draft_one(self, tail: list[int]) -> int | None:
        """Pick one continuation: largest ngram wins, validated by
        frequency thresholds (the spirit of common_ngram_cache_draft's
        per-size min-count/percentage gates)."""
        for n in range(min(NGRAM_MAX, len(tail)), NGRAM_MIN - 1, -1):
            hit = self._best(tuple(tail[-n:]))
            if hit is None:
                continue
            tok, cnt, total = hit
            # larger ngrams may fire on fewer sightings; unigrams need
            # strong evidence
            min_cnt = 1 if n >= 3 else (2 if n == 2 else 4)
            if cnt >= min_cnt and cnt * 2 >= total:
                return tok
        return None

    def draft(self, tail: list[int], n_draft: int) -> list[int]:
        out: list[int] = []
        work = list(tail)
        for _ in range(n_draft):
            tok = self.draft_one(work)
            if tok is None:
                break
            out.append(tok)
            work.append(tok)
        return out

    # -- persistence (common_ngram_cache_save/load/merge) ---------------------

    def save(self, path: str):
        blob = {
            str(n): {",".join(map(str, k)): v for k, v in m.items()}
            for n, m in self.maps.items()
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(blob, f)

    @classmethod
    def load(cls, path: str) -> "NgramCache":
        c = cls()
        with open(path, encoding="utf-8") as f:
            blob = json.load(f)
        for n_str, m in blob.items():
            n = int(n_str)
            for k_str, d in m.items():
                key = tuple(int(x) for x in k_str.split(","))
                c.maps[n][key] = {int(t): int(cnt) for t, cnt in d.items()}
        return c

    def merge(self, other: "NgramCache"):
        for n, m in other.maps.items():
            for key, d in m.items():
                mine = self.maps[n][key]
                for tok, cnt in d.items():
                    mine[tok] = mine.get(tok, 0) + cnt


def generate_with_lookup(
    engine,
    prompt: str,
    n_predict: int = 64,
    n_draft: int = 8,
    cache: NgramCache | None = None,
    stop_on_eog: bool = True,
) -> tuple[str, list[int], dict]:
    """Greedy lookup-decoding loop (examples/lookup/lookup.cpp): draft from
    the n-gram cache, verify with one chunked target forward, accept the
    matching prefix."""
    import numpy as np

    cache = cache or NgramCache()
    tok = engine.tokenizer
    ids = tok.tokenize(prompt, add_special=True, parse_special=True)
    cache.update(ids)
    engine.reset()
    logits = engine.prefill(ids)
    eog = tok.vocab.special.eog_ids()

    all_ids = list(ids)
    out: list[int] = []
    n_drafted = 0
    n_accepted = 0
    while len(out) < n_predict:
        cur = int(np.argmax(logits))
        if stop_on_eog and cur in eog:
            break
        out.append(cur)
        all_ids.append(cur)
        cache.update(all_ids[-(NGRAM_MAX + 1):])
        if len(out) >= n_predict:
            break
        draft = cache.draft(all_ids, n_draft)
        if draft:
            n_drafted += len(draft)
            chunk_logits = engine.decode_chunk([cur] + draft)
            # position i of chunk_logits predicts the token after [cur]+draft[:i]
            accepted = 0
            for i, d in enumerate(draft):
                if int(np.argmax(chunk_logits[i])) == d:
                    accepted += 1
                else:
                    break
            accepted = min(accepted, n_predict - len(out))
            n_accepted += accepted
            for d in draft[:accepted]:
                out.append(d)
                all_ids.append(d)
                cache.update(all_ids[-(NGRAM_MAX + 1):])
            # roll back KV past the accepted region; the next loop decode
            # re-scores from the right position
            engine.set_n_past(len(all_ids))
            logits = chunk_logits[accepted]
        else:
            logits = engine.decode_one(cur)
    stats = {
        "n_drafted": n_drafted,
        "n_accepted": n_accepted,
        "accept_rate": round(n_accepted / n_drafted, 3) if n_drafted else 0.0,
    }
    return tok.detokenize(out), out, stats
