"""Speculative decoding: draft-model propose, target verify.

Reference: ``common/speculative.cpp:185-361`` (draft loop with p_min early
stop, KV prefix reuse) + the server's verification
(``server.cpp:3656-3755`` with ``common_sampler_sample_and_accept_n``).

Both engines keep contiguous per-sequence KV, so "remove rejected tail"
(llama_memory_seq_rm) is just rewinding ``n_past`` — the dead rows get
overwritten by the next write.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..sampling.samplers import SamplerChain, SamplerParams
from .engine import Engine


@dataclass
class SpeculativeConfig:
    n_draft: int = 8  # max tokens drafted per round
    p_min: float = 0.75  # draft stops when its confidence drops below this


@dataclass
class SpecStats:
    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


class SpeculativeEngine:
    """Couples a small draft model with the target model."""

    def __init__(self, target: Engine, draft: Engine, spec: SpeculativeConfig | None = None):
        self.target = target
        self.draft = draft
        self.spec = spec or SpeculativeConfig()
        self.stats = SpecStats()
        # cross-vocab mode (common/speculative.cpp:204-226): when the draft
        # uses a different vocabulary, its proposals round-trip through text
        # and the draft context is kept in its own token space
        tv, dv = target.tokenizer.vocab, draft.tokenizer.vocab
        self.translate = tv.n_tokens != dv.n_tokens or tv.tokens[: min(64, tv.n_tokens)] != dv.tokens[: min(64, dv.n_tokens)]

    def _to_target_tokens(self, draft_ids: list[int]) -> list[int]:
        """Draft-space tokens → target-space via detokenize/retokenize."""
        text = self.draft.tokenizer.detokenize(draft_ids)
        if not text:
            return []
        return self.target.tokenizer.tokenize(text, add_special=False, parse_special=False)

    def _propose(self, all_ids: list[int]) -> list[int]:
        """Draft a continuation of ``all_ids`` (target-space tokens).

        The draft context lives in the draft's own token space; its KV is
        resynced by longest-common-prefix each round (the reference's
        prefix reuse with KV shift, speculative.cpp:232-279), which also
        realizes cross-vocab translation: the history round-trips through
        text and the proposals are retokenized for the target."""
        if self.translate:
            text = self.target.tokenizer.detokenize(all_ids)
            drf_ids = self.draft.tokenizer.tokenize(text, add_special=True, parse_special=True)
        else:
            drf_ids = list(all_ids)
        cache = getattr(self, "_drf_cache", [])
        m = 0
        limit = min(len(cache), len(drf_ids) - 1)
        while m < limit and cache[m] == drf_ids[m]:
            m += 1
        self.draft.set_n_past(m)
        if m < len(drf_ids) - 1:
            self.draft.decode_chunk(drf_ids[m:-1])
        logits = self.draft.decode_one(drf_ids[-1])

        out_d: list[int] = []
        for _ in range(self.spec.n_draft):
            probs = _softmax(logits)
            tok = int(np.argmax(probs))
            if probs[tok] < self.spec.p_min and out_d:
                break
            out_d.append(tok)
            if len(out_d) >= self.spec.n_draft:
                break
            logits = self.draft.decode_one(tok)
        self._drf_cache = drf_ids + out_d[:-1]  # rows actually present
        if self.translate:
            return self._to_target_tokens(out_d)[: self.spec.n_draft]
        return out_d

    def generate(
        self,
        prompt: str,
        n_predict: int = 64,
        sampler: SamplerParams | None = None,
        stop_on_eog: bool = True,
    ) -> tuple[str, list[int], SpecStats]:
        tgt, drf = self.target, self.draft
        chain = SamplerChain(sampler or SamplerParams(greedy=True), tgt.cfg.n_vocab)
        ids = tgt.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
        eog = tgt.tokenizer.vocab.special.eog_ids()

        tgt.reset()
        drf.reset()
        self._drf_cache = []
        logits = tgt.prefill(ids)

        all_ids = list(ids)
        out: list[int] = []
        # first token from the target directly
        cur = chain.sample(logits, all_ids)
        out.append(cur)
        all_ids.append(cur)

        while len(out) < n_predict and (not stop_on_eog or cur not in eog):
            draft = self._propose(all_ids)
            if not draft:
                # translation produced nothing usable — plain decode step
                logits = tgt.decode_one(cur)
                cur = chain.sample(logits, all_ids)
                out.append(cur)
                all_ids.append(cur)
                continue
            self.stats.n_rounds += 1
            self.stats.n_drafted += len(draft)
            # target scores [cur, d0, d1, ...] in one pass; its logits at
            # position i give the token following prefix+draft[:i]
            chunk = [cur] + draft
            base_n_past = tgt.n_past
            t_logits = tgt.decode_chunk(chunk)

            accepted: list[int] = []
            for i, d in enumerate(draft):
                tok_i = chain.sample(t_logits[i], all_ids + accepted)
                if tok_i != d:
                    accepted.append(tok_i)  # target's correction, always kept
                    break
                accepted.append(d)
                self.stats.n_accepted += 1
            else:
                # all drafts accepted → also take the bonus token
                accepted.append(chain.sample(t_logits[len(draft)], all_ids + accepted))

            # clamp to budget / eog
            final: list[int] = []
            for t in accepted:
                final.append(t)
                if (stop_on_eog and t in eog) or len(out) + len(final) >= n_predict:
                    break

            out.extend(final)
            all_ids.extend(final)
            cur = final[-1]
            # target KV already holds [cur, draft...]; the accepted prefix
            # rows are correct, so rewinding n_past drops the rejected tail
            # (llama_memory_seq_rm analog).  The draft resyncs by prefix in
            # the next _propose.
            tgt.set_n_past(base_n_past + len(final))

        text = tgt.tokenizer.detokenize(out)
        return text, out, self.stats


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    e = np.exp(x - m)
    return e / e.sum()
