"""Sampler chain (reference: ``src/llama-sampling.cpp`` + the default chain
order of ``common/sampling.cpp:113-230``).

Samplers run on host numpy over the final-token logits, exactly like the
reference samples on CPU after the device returns logits — at one token per
step this is bandwidth-trivial; batched device-side sampling is an
optimization carried by the server path later.

Each sampler is a callable ``(logits_f32, ctx) -> logits_f32`` where ctx
carries previous tokens and the RNG; terminal samplers pick the token id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SamplerContext:
    rng: np.random.Generator
    prev_tokens: list[int] = field(default_factory=list)


@dataclass
class SamplerParams:
    """Mirror of the reference's ``common_params_sampling`` defaults."""

    seed: int = 0xFFFFFFFF
    temp: float = 0.8
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typical_p: float = 1.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    logit_bias: dict[int, float] = field(default_factory=dict)
    greedy: bool = False
    # DRY repetition suppression (llama-sampling.cpp:2138)
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_penalty_last_n: int = -1
    dry_sequence_breakers: tuple[int, ...] = ()  # breaker TOKEN ids
    # top-n-sigma (llama-sampling.cpp:1810); < 0 disables
    top_n_sigma: float = -1.0
    min_keep: int = 1
    # infill/FIM sampler (llama-sampling.cpp:2504): needs eog ids via
    # SamplerChain.set_eog_ids
    infill: bool = False


def apply_logit_bias(logits: np.ndarray, bias: dict[int, float]) -> np.ndarray:
    for tok, b in bias.items():
        logits[tok] += b
    return logits


def apply_penalties(
    logits: np.ndarray,
    prev: list[int],
    last_n: int,
    repeat: float,
    freq: float,
    present: float,
) -> np.ndarray:
    """llama-sampling.cpp:1720 semantics."""
    if last_n == 0 or (repeat == 1.0 and freq == 0.0 and present == 0.0):
        return logits
    window = prev[-last_n:] if last_n > 0 else prev
    if not window:
        return logits
    toks, counts = np.unique(np.asarray(window), return_counts=True)
    vals = logits[toks]
    if repeat != 1.0:
        vals = np.where(vals <= 0, vals * repeat, vals / repeat)
    vals = vals - counts * freq - (counts > 0) * present
    logits[toks] = vals
    return logits


def apply_top_k(logits: np.ndarray, k: int) -> np.ndarray:
    if k <= 0 or k >= logits.size:
        return logits
    kth = np.partition(logits, -k)[-k]
    logits[logits < kth] = -np.inf
    return logits


def _softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max()
    p = np.exp(logits - m)
    return p / p.sum()


def apply_top_p(logits: np.ndarray, p: float, min_keep: int = 1) -> np.ndarray:
    if p >= 1.0:
        return logits
    order = np.argsort(-logits, kind="stable")
    probs = _softmax(logits[order])
    csum = np.cumsum(probs)
    cutoff = max(int(np.searchsorted(csum, p) + 1), min_keep)
    logits[order[cutoff:]] = -np.inf
    return logits


def apply_min_p(logits: np.ndarray, p: float, min_keep: int = 1) -> np.ndarray:
    """llama-sampling.cpp:850 — drop tokens below p × max-prob."""
    if p <= 0.0:
        return logits
    mx = logits.max()
    threshold = mx + np.log(p)  # log-space: prob >= p * max_prob
    mask = logits < threshold
    if (~mask).sum() < min_keep:
        keep = np.argsort(-logits, kind="stable")[:min_keep]
        mask[:] = True
        mask[keep] = False
    logits[mask] = -np.inf
    return logits


def apply_typical(logits: np.ndarray, p: float, min_keep: int = 1) -> np.ndarray:
    """llama-sampling.cpp:949 — locally-typical sampling."""
    if p >= 1.0:
        return logits
    probs = _softmax(logits)
    with np.errstate(divide="ignore"):
        ent = -np.nansum(np.where(probs > 0, probs * np.log(probs), 0.0))
        shifted = np.abs(-np.log(np.where(probs > 0, probs, 1e-30)) - ent)
    order = np.argsort(shifted, kind="stable")
    csum = np.cumsum(probs[order])
    cutoff = max(int(np.searchsorted(csum, p) + 1), min_keep)
    logits[order[cutoff:]] = -np.inf
    return logits


def apply_xtc(logits: np.ndarray, probability: float, threshold: float, rng) -> np.ndarray:
    """llama-sampling.cpp:1194 — exclude-top-choices: with probability p,
    remove all but the last token whose prob exceeds the threshold."""
    if probability <= 0.0 or threshold > 0.5 or rng.random() >= probability:
        return logits
    probs = _softmax(logits)
    above = np.nonzero(probs >= threshold)[0]
    if above.size >= 2:
        # drop every above-threshold token except the least-probable one
        order = np.argsort(-probs[above], kind="stable")
        logits[above[order[:-1]]] = -np.inf
    return logits


def apply_temp(logits: np.ndarray, temp: float) -> np.ndarray:
    if temp > 0:
        logits /= temp
    return logits


def apply_temp_ext(logits: np.ndarray, temp: float, delta: float, exponent: float) -> np.ndarray:
    """llama-sampling.cpp:1103 — entropy-scaled dynamic temperature."""
    if delta <= 0:
        return apply_temp(logits, temp)
    min_t, max_t = max(0.0, temp - delta), temp + delta
    probs = _softmax(logits)
    valid = probs > 0
    ent = -np.sum(probs[valid] * np.log(probs[valid]))
    max_ent = np.log(np.count_nonzero(valid)) or 1.0
    dyn = min_t + (max_t - min_t) * (ent / max_ent) ** exponent
    return apply_temp(logits, dyn)


_DRY_MAX_MATCH = 64  # match-length cap, same spirit as the reference's z-cap


def apply_dry(
    logits: np.ndarray,
    prev: list[int],
    multiplier: float,
    base: float,
    allowed_length: int,
    last_n: int,
    breakers: frozenset[int],
) -> np.ndarray:
    """DRY sampler (llama-sampling.cpp:2138): penalise tokens that would
    extend a verbatim repeat of the recent context.

    For every candidate token c that has previously followed a context
    matching the current suffix, the repeat length L is the longest common
    suffix between the pre-occurrence prefix and the full window; tokens
    with L >= allowed_length get logit -= multiplier * base^(L-allowed)."""
    if multiplier <= 0.0 or not prev:
        return logits
    w = prev[-last_n:] if last_n > 0 else list(prev)
    n = len(w)
    if n < 2:
        return logits
    best: dict[int, int] = {}
    # walk candidate positions j: w[j] is the continuation token whose
    # preceding context w[:j] is compared against the full window suffix
    for j in range(1, n):
        c = w[j]
        if c in breakers:
            continue
        # longest common suffix of w[:j] and w[:n], capped, not crossing breakers
        length = 0
        while (
            length < _DRY_MAX_MATCH
            and length < j
            and w[j - 1 - length] == w[n - 1 - length]
            and w[j - 1 - length] not in breakers
        ):
            length += 1
        if length >= allowed_length and length > best.get(c, 0):
            best[c] = length
    for c, length in best.items():
        if 0 <= c < logits.size:
            logits[c] -= multiplier * base ** (length - allowed_length)
    return logits


def apply_infill(logits: np.ndarray, eog_ids: frozenset[int]) -> np.ndarray:
    """Infill/FIM sampler (llama-sampling.cpp:2504 semantics): when the
    combined end-of-generation probability dominates the text tokens,
    force EOG; otherwise suppress EOG so the middle keeps filling."""
    if not eog_ids:
        return logits
    probs = _softmax(logits)
    eog = np.asarray(sorted(t for t in eog_ids if 0 <= t < logits.size))
    p_eog = probs[eog].sum()
    p_txt = 1.0 - p_eog
    if p_txt <= 0 or 3.0 * p_eog > p_txt:
        mask = np.ones(logits.size, bool)
        mask[eog] = False
        logits[mask] = -np.inf
    else:
        logits[eog] = -np.inf
    return logits


def apply_top_n_sigma(logits: np.ndarray, n_sigma: float) -> np.ndarray:
    """llama-sampling.cpp:1810 — keep logits within n·σ of the max."""
    if n_sigma < 0:
        return logits
    valid = np.isfinite(logits)
    if valid.sum() <= 1:
        return logits
    vals = logits[valid]
    cutoff = vals.max() - n_sigma * vals.std()
    logits[logits < cutoff] = -np.inf
    return logits


class SamplerChain:
    """Composable chain with the reference's default ordering."""

    def __init__(self, params: SamplerParams, n_vocab: int):
        self.p = params
        self.n_vocab = n_vocab
        seed = params.seed if params.seed != 0xFFFFFFFF else np.random.SeedSequence().entropy
        self.rng = np.random.default_rng(seed)
        self.mu: float | None = None  # mirostat state
        # optional grammar constraint (grammar.gbnf); set via set_grammar()
        self.grammar = None
        self.grammar_vocab = None
        self.eog_ids: frozenset[int] = frozenset()  # for the infill sampler

    def set_eog_ids(self, eog_ids):
        self.eog_ids = frozenset(eog_ids)

    def set_grammar(self, grammar, grammar_vocab):
        """Attach a Grammar + GrammarVocab for constrained decoding
        (reference: common_sampler grammar handling, common/sampling.cpp)."""
        self.grammar = grammar
        self.grammar_vocab = grammar_vocab

    def reset(self):
        self.mu = None
        if self.grammar is not None:
            self.grammar.reset()

    def accept(self, token_id: int, is_eog: bool = False):
        """Commit a sampled token into stateful samplers (grammar PDA)."""
        if self.grammar is not None:
            piece = self.grammar_vocab.pieces[token_id] if self.grammar_vocab else b""
            self.grammar.accept_token(token_id, piece, is_eog=is_eog)

    def sample(self, logits: np.ndarray, prev_tokens: list[int]) -> int:
        tok = self._sample_inner(np.asarray(logits, np.float32).copy(), prev_tokens)
        if self.grammar is not None and not self.grammar.awaiting_trigger:
            # fast path: keep the unconstrained pick if the grammar allows it
            piece = self.grammar_vocab.pieces[tok]
            eog = bool(self.grammar_vocab.eog_mask[tok])
            allowed = (
                (eog and self.grammar.can_stop())
                or (not eog and bool(piece) and self.grammar.token_allowed(piece))
            )
            if not allowed:
                mask = self.grammar_vocab.mask(self.grammar)
                constrained = np.where(mask, np.asarray(logits, np.float32), -np.inf)
                if not np.isfinite(constrained).any():
                    raise RuntimeError("grammar: no token is acceptable")
                tok = self._sample_inner(constrained.copy(), prev_tokens)
        return tok

    def _sample_inner(self, logits: np.ndarray, prev_tokens: list[int]) -> int:
        p = self.p
        if p.logit_bias:
            logits = apply_logit_bias(logits, p.logit_bias)
        logits = apply_penalties(
            logits, prev_tokens, p.penalty_last_n, p.penalty_repeat, p.penalty_freq, p.penalty_present
        )
        logits = apply_dry(
            logits, prev_tokens, p.dry_multiplier, p.dry_base,
            p.dry_allowed_length, p.dry_penalty_last_n,
            frozenset(p.dry_sequence_breakers),
        )
        if p.infill:
            logits = apply_infill(logits, self.eog_ids)
        if p.greedy or p.temp <= 0:
            return int(np.argmax(logits))
        if p.mirostat == 1:
            return self._mirostat_v1(logits)
        if p.mirostat == 2:
            return self._mirostat_v2(logits)
        if p.top_n_sigma >= 0:
            # reference chain order when top-n-sigma active: top_k → temp → sigma
            logits = apply_top_k(logits, p.top_k)
            logits = apply_temp(logits, p.temp)
            logits = apply_top_n_sigma(logits, p.top_n_sigma)
            probs = _softmax(logits)
            return int(self.rng.choice(probs.size, p=probs))
        logits = apply_top_k(logits, p.top_k)
        logits = apply_typical(logits, p.typical_p)
        logits = apply_top_p(logits, p.top_p)
        logits = apply_min_p(logits, p.min_p)
        logits = apply_xtc(logits, p.xtc_probability, p.xtc_threshold, self.rng)
        logits = apply_temp_ext(logits, p.temp, p.dynatemp_range, p.dynatemp_exponent)
        probs = _softmax(logits)
        return int(self.rng.choice(probs.size, p=probs))

    def _mirostat_v1(self, logits: np.ndarray) -> int:
        """llama-sampling.cpp:1301 — estimate Zipf exponent from the top-100
        tail, derive k from the target surprise, then top-k sample."""
        p = self.p
        logits = apply_temp(logits, p.temp)
        if self.mu is None:
            self.mu = 2.0 * p.mirostat_tau
        probs = _softmax(logits)
        order = np.argsort(-probs, kind="stable")
        m = min(100, probs.size)
        top = probs[order[:m]]
        ti = np.log((np.arange(1, m) + 1.0) / np.arange(1, m))
        bi = np.log(np.where(top[:-1] > 0, top[:-1], 1e-30) / np.where(top[1:] > 0, top[1:], 1e-30))
        s_hat = float(np.sum(ti * bi) / max(np.sum(ti * ti), 1e-9))
        eps = max(s_hat - 1.0, 1e-6)  # Zipf exponent > 1 by construction
        n = float(self.n_vocab)
        k = ((eps * (2.0**self.mu)) / max(1.0 - n ** (-eps), 1e-9)) ** (1.0 / max(s_hat, 1e-9))
        k = int(np.clip(k, 1, probs.size)) if np.isfinite(k) else probs.size
        kept = order[:k]
        mp = top[:k] if k <= m else probs[kept]
        mp = mp / mp.sum()
        idx = int(self.rng.choice(k, p=mp))
        tok = int(kept[idx])
        observed = -float(np.log2(max(probs[tok], 1e-30)))
        self.mu -= p.mirostat_eta * (observed - p.mirostat_tau)
        return tok

    def _mirostat_v2(self, logits: np.ndarray) -> int:
        """llama-sampling.cpp:1400."""
        p = self.p
        logits = apply_temp(logits, p.temp)
        if self.mu is None:
            self.mu = 2.0 * p.mirostat_tau
        probs = _softmax(logits)
        surprise = -np.log2(np.where(probs > 0, probs, 1e-30))
        allowed = surprise <= self.mu
        if not allowed.any():
            allowed[np.argmax(probs)] = True
        masked = np.where(allowed, logits, -np.inf)
        mp = _softmax(masked)
        tok = int(self.rng.choice(mp.size, p=mp))
        observed = float(surprise[tok])
        self.mu -= p.mirostat_eta * (observed - p.mirostat_tau)
        return tok
