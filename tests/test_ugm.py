"""UGM (unigram) tokenizer tests — Viterbi verified against brute-force
enumeration of all segmentations (reference: llm_tokenizer_ugm,
src/llama-vocab.cpp:752)."""

import itertools

import numpy as np
import pytest

from llama_cpp_gfx906_tpu.tokenizers.ugm import UGMTokenizer, _SPACE
from llama_cpp_gfx906_tpu.tokenizers.vocab import SpecialTokens, TokenType, Vocab


def make_vocab():
    # token list: specials + unigram pieces with scores (log-probs)
    pieces = {
        _SPACE: -2.0,
        _SPACE + "the": -3.0,
        "t": -6.0,
        "h": -6.0,
        "e": -6.0,
        "th": -4.5,
        "he": -4.6,
        "the": -3.5,
        _SPACE + "cat": -3.2,
        "c": -6.5,
        "a": -6.0,
        "ca": -5.0,
        "at": -5.0,
        "cat": -4.0,
        "s": -5.5,
    }
    tokens = ["<unk>", "</s>", "<pad>"] + list(pieces)
    scores = [0.0, 0.0, 0.0] + list(pieces.values())
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)] + [
        int(TokenType.NORMAL)
    ] * len(pieces)
    return Vocab(
        model="t5",
        pre="",
        tokens=tokens,
        scores=np.asarray(scores, np.float32),
        token_types=np.asarray(types, np.int32),
        special=SpecialTokens(unk=0, eos=1, pad=2),
        add_bos=False,
        add_eos=True,
        add_space_prefix=True,
    )


def brute_force_best(tok: UGMTokenizer, norm: str):
    """Enumerate every segmentation; return the max-score token ids."""
    n = len(norm)
    best_score, best_seg = -1e30, None
    # all ways to cut the string (2^(n-1) — keep strings short)
    for mask in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
        seg = [norm[cuts[i]:cuts[i + 1]] for i in range(len(cuts) - 1)]
        score = 0.0
        ids = []
        ok = True
        for piece in seg:
            t = tok._match.get(piece)
            if t is None:
                if len(piece) != 1:
                    ok = False
                    break
                score += tok._unknown_score
                ids.append(0)
            else:
                score += float(tok._scores[t])
                ids.append(t)
        if ok and score > best_score:
            best_score, best_seg = score, ids
    return best_seg, best_score


@pytest.mark.parametrize("text", ["the cat", "that", "cats", "e", "a cat"])
def test_viterbi_matches_brute_force(text):
    tok = UGMTokenizer(make_vocab())
    norm = tok._normalize(text)
    want, _ = brute_force_best(tok, norm)
    got = tok.encode_fragment(text)
    # merge consecutive unknowns in the brute-force result too
    merged = []
    for t in want:
        if merged and t == 0 and merged[-1] == 0:
            continue
        merged.append(t)
    assert got == merged, (text, norm, got, merged)


def test_add_eos_and_specials():
    tok = UGMTokenizer(make_vocab())
    ids = tok.tokenize("the cat", add_special=True)
    assert ids[-1] == 1  # </s>
    assert 0 not in ids  # no unknowns needed


def test_detokenize_roundtrip():
    tok = UGMTokenizer(make_vocab())
    ids = tok.tokenize("the cat", add_special=False)
    assert tok.detokenize(ids) == "the cat"


def test_unknown_penalty():
    tok = UGMTokenizer(make_vocab())
    ids = tok.tokenize("zz", add_special=False)
    # leading ▁ matches; the two unknown codepoints merge into one <unk>
    assert ids == [3, 0]


def test_user_defined_token_priority():
    v = make_vocab()
    v.tokens.append("<extra_id_0>")
    import numpy as np

    v.scores = np.append(v.scores, 0.0).astype(np.float32)
    v.token_types = np.append(v.token_types, int(TokenType.USER_DEFINED)).astype(np.int32)
    v.token_to_id = {}
    v.__post_init__()
    tok = UGMTokenizer(v)
    ids = tok.tokenize("the<extra_id_0>cat", add_special=False, parse_special=True)
    assert v.tokens.index("<extra_id_0>") in ids
