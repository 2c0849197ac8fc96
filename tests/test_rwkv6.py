"""RWKV6 tests: wkv6 recurrence vs a brute-force numpy oracle, plus
incremental-vs-full state-carry equivalence on a random model
(reference: llm_build_rwkv6 / ggml_rwkv_wkv6, src/llama-model.cpp:14354)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.models.rwkv6 import wkv6

VOCAB = 96
D = 32
S = 8  # wkv head size
H = D // S
L = 2
EXTRA = 8
FF = 64


def test_wkv6_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, T = 2, 5
    r = rng.standard_normal((B, T, H, S)).astype(np.float32)
    k = rng.standard_normal((B, T, H, S)).astype(np.float32) * 0.5
    v = rng.standard_normal((B, T, H, S)).astype(np.float32)
    w = rng.uniform(0.5, 0.99, (B, T, H, S)).astype(np.float32)
    u = rng.standard_normal((H, S)).astype(np.float32)
    s0 = rng.standard_normal((B, H, S, S)).astype(np.float32) * 0.1

    out, fin = wkv6(*(jnp.asarray(a) for a in (r, k, v, w)), jnp.asarray(u), jnp.asarray(s0))
    out, fin = np.asarray(out), np.asarray(fin)

    # brute force scalar loop
    ref = np.zeros_like(out)
    st = s0.copy()
    for t in range(T):
        for b in range(B):
            for h in range(H):
                kv = np.outer(k[b, t, h], v[b, t, h])  # (S_k, S_v)
                ref[b, t, h] = r[b, t, h] @ (st[b, h] + u[h][:, None] * kv)
                st[b, h] = st[b, h] * w[b, t, h][:, None] + kv
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fin, st, rtol=1e-5, atol=1e-5)


def _tiny_rwkv6_gguf(path: str, seed=0) -> str:
    """Random tiny rwkv6 GGUF with the reference tensor names."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, "rwkv6")
    w.add_string("general.name", "tiny-rwkv6")
    w.add_uint32("rwkv6.context_length", 1 << 20)
    w.add_uint32("rwkv6.embedding_length", D)
    w.add_uint32("rwkv6.block_count", L)
    w.add_uint32("rwkv6.feed_forward_length", FF)
    w.add_uint32("rwkv6.attention.head_count", 0)
    w.add_uint32("rwkv6.wkv.head_size", S)
    w.add_float32("rwkv6.attention.layer_norm_epsilon", 1e-5)
    w.add_uint32("rwkv6.vocab_size", VOCAB)
    w.add_string("tokenizer.ggml.model", "gpt2")
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", np.asarray([3, 3, 2] + [4] * (VOCAB - 3), np.int32))
    w.add_uint32("tokenizer.ggml.bos_token_id", 0)
    w.add_uint32("tokenizer.ggml.eos_token_id", 1)

    def r(*shape, scale=0.3):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def add(name, arr):
        w.add_tensor(name, arr, GGMLType.F32)

    add("token_embd.weight", r(VOCAB, D))
    add("token_embd_norm.weight", np.ones(D, np.float32))
    add("token_embd_norm.bias", np.zeros(D, np.float32))
    add("output_norm.weight", np.ones(D, np.float32))
    add("output_norm.bias", np.zeros(D, np.float32))
    add("output.weight", r(VOCAB, D))
    for i in range(L):
        b = f"blk.{i}."
        add(b + "attn_norm.weight", np.ones(D, np.float32))
        add(b + "attn_norm.bias", np.zeros(D, np.float32))
        add(b + "attn_norm_2.weight", np.ones(D, np.float32))
        add(b + "attn_norm_2.bias", np.zeros(D, np.float32))
        add(b + "time_mix_lerp_x.weight", r(1, 1, D, scale=0.1))
        add(b + "time_mix_lerp_fused.weight", r(5, 1, D, scale=0.1))
        add(b + "time_mix_w1.weight", r(5 * EXTRA, D, scale=0.1))
        add(b + "time_mix_w2.weight", r(5, D, EXTRA, scale=0.1))
        add(b + "time_mix_decay_w1.weight", r(EXTRA, D, scale=0.1))
        add(b + "time_mix_decay_w2.weight", r(D, EXTRA, scale=0.1))
        add(b + "time_mix_decay.weight", r(D, scale=0.5))
        add(b + "time_mix_first.weight", r(H, S, scale=0.3))
        add(b + "time_mix_receptance.weight", r(D, D))
        add(b + "time_mix_key.weight", r(D, D))
        add(b + "time_mix_value.weight", r(D, D))
        add(b + "time_mix_gate.weight", r(D, D))
        add(b + "time_mix_ln.weight", np.ones(D, np.float32))
        add(b + "time_mix_ln.bias", np.zeros(D, np.float32))
        add(b + "time_mix_output.weight", r(D, D))
        add(b + "channel_mix_lerp_k.weight", r(1, 1, D, scale=0.1))
        add(b + "channel_mix_lerp_r.weight", r(1, 1, D, scale=0.1))
        add(b + "channel_mix_key.weight", r(FF, D))
        add(b + "channel_mix_receptance.weight", r(D, D))
        add(b + "channel_mix_value.weight", r(D, FF))
    return w.write()


@pytest.fixture(scope="module")
def rwkv_path(tmp_path_factory):
    return _tiny_rwkv6_gguf(str(tmp_path_factory.mktemp("rwkv") / "tiny-rwkv6.gguf"))


def test_rwkv6_incremental_matches_full(rwkv_path):
    """Prefill-all-at-once logits must equal token-by-token decode through
    the recurrent state — validates wkv carry + token shift + padding."""
    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    eng = Engine.from_gguf(rwkv_path, max_seq=32, dtype=jnp.float32)
    assert eng.family.name == "rwkv6"
    ids = [3, 17, 42, 9, 7, 25]

    # full prefill (bucketed to 8: exercises the padding no-op masking)
    full_logits = eng.prefill(ids).copy()

    # incremental: prefill first token, then decode one at a time
    eng.reset()
    logits = eng.prefill(ids[:1])
    for t in ids[1:]:
        logits = eng.decode_one(t)
    np.testing.assert_allclose(logits, full_logits, rtol=2e-4, atol=2e-4)


def test_rwkv6_greedy_deterministic(rwkv_path):
    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams

    eng = Engine.from_gguf(rwkv_path, max_seq=64, dtype=jnp.float32)
    t1, ids1 = eng.generate("<t1><t2>", n_predict=6, sampler=SamplerParams(greedy=True), stop_on_eog=False)
    t2, ids2 = eng.generate("<t1><t2>", n_predict=6, sampler=SamplerParams(greedy=True), stop_on_eog=False)
    assert ids1 == ids2 and len(ids1) == 6


def test_rwkv_tokenizer_longest_match():
    from llama_cpp_gfx906_tpu.tokenizers.rwkv import RWKVTokenizer
    from llama_cpp_gfx906_tpu.tokenizers.vocab import SpecialTokens, Vocab

    toks = ["<unk>", "a", "b", "ab", "abc", "c", " ", "hello"]
    v = Vocab(model="rwkv", pre="", tokens=toks, scores=None, token_types=None,
              special=SpecialTokens(unk=0))
    tok = RWKVTokenizer(v)
    assert tok.tokenize("abc") == [4]          # longest match wins
    assert tok.tokenize("abab") == [3, 3]
    assert tok.tokenize("ab c") == [3, 6, 5]
    assert tok.tokenize("abz") == [3, 0]       # unknown byte -> unk
    assert tok.detokenize([3, 6, 5]) == "ab c"
