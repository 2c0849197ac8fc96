"""Lookup decoding (ngram cache) tests — the key invariant: lookup-decoded
output is token-identical to plain greedy decoding (reference:
examples/lookup, common/ngram-cache)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.ngram_cache import NgramCache, generate_with_lookup
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("lk") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return Engine.from_gguf(path, max_seq=128, dtype=jnp.float32)


def test_ngram_cache_basics():
    c = NgramCache()
    seq = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3]
    c.update(seq)
    assert c.draft_one([1, 2, 3]) == 4
    draft = c.draft([1, 2, 3], 4)
    assert draft[:1] == [4]


def test_ngram_cache_save_load_merge(tmp_path):
    a = NgramCache()
    a.update([5, 6, 7, 8] * 4)
    f = str(tmp_path / "ngrams.json")
    a.save(f)
    b = NgramCache.load(f)
    assert b.draft_one([6, 7, 8]) == a.draft_one([6, 7, 8])
    cmerged = NgramCache()
    cmerged.merge(a)
    cmerged.merge(b)
    key = (6, 7, 8)
    assert cmerged.maps[3][key][5] == a.maps[3][key][5] * 2


def test_lookup_matches_greedy(engine):
    """Repetitive prompt → the cache fires; output must equal plain greedy."""
    prompt = "<t1><t2><t3><t1><t2><t3><t1><t2><t3>"
    text_g, ids_g = engine.generate(prompt, n_predict=24, sampler=SamplerParams(greedy=True), stop_on_eog=False)
    text_l, ids_l, stats = generate_with_lookup(engine, prompt, n_predict=24, stop_on_eog=False)
    assert ids_l == ids_g, (stats, ids_l, ids_g)


def test_lookup_drafts_on_repetitive_model(engine):
    """A degenerate repeating generation should get real speedup signal."""
    prompt = "<t5><t6><t5><t6><t5><t6><t5><t6>"
    _, ids, stats = generate_with_lookup(engine, prompt, n_predict=32, stop_on_eog=False)
    assert len(ids) == 32
    # with a tiny random model outputs loop quickly; the cache should at
    # least have been consulted without breaking correctness
    assert stats["n_drafted"] >= 0
