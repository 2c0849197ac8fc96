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
        if target.tokenizer.vocab.n_tokens != draft.tokenizer.vocab.n_tokens:
            # cross-vocab translation (speculative.cpp:204-226) not yet built
            raise ValueError("draft and target must share a vocabulary")
        self.target = target
        self.draft = draft
        self.spec = spec or SpeculativeConfig()
        self.stats = SpecStats()

    def _draft_tokens(self, last_token: int) -> list[int]:
        """Greedy draft continuation with p_min cutoff."""
        out = []
        logits = self.draft.decode_one(last_token)
        for _ in range(self.spec.n_draft):
            probs = _softmax(logits)
            tok = int(np.argmax(probs))
            if probs[tok] < self.spec.p_min:
                if not out:
                    out.append(tok)  # always propose at least one
                break
            out.append(tok)
            if len(out) >= self.spec.n_draft:
                break
            logits = self.draft.decode_one(tok)
        return out

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
        logits = tgt.prefill(ids)
        drf.prefill(ids)

        all_ids = list(ids)
        out: list[int] = []
        # first token from the target directly
        cur = chain.sample(logits, all_ids)
        out.append(cur)
        all_ids.append(cur)

        while len(out) < n_predict and (not stop_on_eog or cur not in eog):
            draft = self._draft_tokens(cur)
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
            replay = [cur] + final[:-1]  # tokens whose KV rows must exist
            cur = final[-1]
            # target KV already holds [cur, draft...]; the accepted prefix
            # rows are correct, so rewinding n_past drops the rejected tail
            # (llama_memory_seq_rm analog)
            tgt.set_n_past(base_n_past + len(final))
            # draft KV may miss the last accepted row and may hold stale
            # speculation — rewind and replay the accepted prefix
            drf.set_n_past(base_n_past)
            drf.decode_chunk(replay)

        text = tgt.tokenizer.detokenize(out)
        return text, out, self.stats


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    e = np.exp(x - m)
    return e / e.sum()
