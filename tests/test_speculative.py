"""Speculative decoding: must produce *identical* greedy output to the
target alone (the correctness invariant of draft/verify), plus embeddings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.speculative import SpeculativeConfig, SpeculativeEngine
from llama_cpp_gfx906_tpu.sampling.samplers import SamplerParams
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import dummy_vocab, tiny_hf_model


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    tgt_path = str(d / "target.gguf")
    drf_path = str(d / "draft.gguf")
    convert_hf_llama(tiny_hf_model(seed=0), dummy_vocab(), tgt_path, quant_type=GGMLType.F32)
    # draft = same weights (perfect drafter) and a different model (imperfect)
    convert_hf_llama(tiny_hf_model(seed=9), dummy_vocab(), drf_path, quant_type=GGMLType.F32)
    return tgt_path, drf_path


def _greedy_reference(path, prompt, n):
    eng = Engine.from_gguf(path, max_seq=128, dtype=jnp.float32)
    text, ids = eng.generate(prompt, n_predict=n, sampler=SamplerParams(greedy=True), stop_on_eog=False)
    return text, ids


@pytest.mark.parametrize("perfect_draft", [True, False])
def test_speculative_matches_target_greedy(paths, perfect_draft):
    tgt_path, drf_path = paths
    prompt = "<t1><t2><t3>"
    n = 16
    ref_text, ref_ids = _greedy_reference(tgt_path, prompt, n)

    target = Engine.from_gguf(tgt_path, max_seq=128, dtype=jnp.float32)
    draft = Engine.from_gguf(tgt_path if perfect_draft else drf_path, max_seq=128, dtype=jnp.float32)
    spec = SpeculativeEngine(target, draft, SpeculativeConfig(n_draft=4, p_min=0.0))
    text, ids, stats = spec.generate(prompt, n_predict=n, sampler=SamplerParams(greedy=True), stop_on_eog=False)

    assert ids == ref_ids, f"text={text!r} vs {ref_text!r}"
    assert stats.n_rounds > 0
    if perfect_draft:
        # a perfect drafter should get (nearly) everything accepted
        assert stats.acceptance_rate > 0.9


def test_embeddings(paths):
    tgt_path, _ = paths
    eng = Engine.from_gguf(tgt_path, max_seq=64, dtype=jnp.float32)
    e1 = eng.embed("<t1><t2><t3>", pooling="mean")
    e2 = eng.embed("<t1><t2><t3>", pooling="mean")
    e3 = eng.embed("<t40><t40><t41><t50>", pooling="mean")
    assert e1.shape == (eng.cfg.n_embd,)
    np.testing.assert_allclose(e1, e2, rtol=1e-5)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5  # normalized
    assert np.dot(e1, e3) < 0.9999  # different inputs → different vectors
    # pooling variants
    assert eng.embed("<t1><t2>", pooling="last").shape == (eng.cfg.n_embd,)
    assert eng.embed("<t1><t2>", pooling="cls").shape == (eng.cfg.n_embd,)


def test_cross_vocab_translation(paths, tmp_path):
    """A draft with a DIFFERENT vocabulary still speeds the target via
    text round-tripping (common/speculative.cpp:204-226) — greedy output
    must stay identical to the target alone."""
    tgt_path, _ = paths
    # draft model with a larger, differently-ordered vocab
    big_vocab_tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(125)]
    vocab2 = {"model": "llama", "tokens": big_vocab_tokens,
              "scores": [0.0] * 128,
              "token_types": [3, 3, 2] + [4] * 125, "bos": 0, "eos": 1}
    import torch as _t
    from transformers import LlamaConfig, LlamaForCausalLM

    _t.manual_seed(5)
    hf2 = LlamaForCausalLM(LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)).eval()
    drf_path = str(tmp_path / "draft128.gguf")
    convert_hf_llama(hf2, vocab2, drf_path, quant_type=GGMLType.F32)

    prompt = "<t1><t2><t3>"
    n = 12
    _, ref_ids = _greedy_reference(tgt_path, prompt, n)
    target = Engine.from_gguf(tgt_path, max_seq=128, dtype=jnp.float32)
    draft = Engine.from_gguf(drf_path, max_seq=128, dtype=jnp.float32)
    spec = SpeculativeEngine(target, draft, SpeculativeConfig(n_draft=4, p_min=0.0))
    assert spec.translate
    _, ids, stats = spec.generate(prompt, n_predict=n,
                                  sampler=SamplerParams(greedy=True), stop_on_eog=False)
    assert ids == ref_ids


def test_server_draft_model_speculation(paths):
    """BatchedEngine with a draft model: output identical to plain greedy
    decode, and a same-weights draft accepts >1 token/step on average
    (reference: server speculative branch, server.cpp:3656-3755)."""
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
    from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
    from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf

    tgt_path, _ = paths
    reader = GGUFReader(tgt_path)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)

    plain = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=128, dtype=jnp.float32)
    greedy = SamplerConfig(temp=0.0)
    s = plain.add_request([3, 17, 42], 16, greedy)
    while s.stop_reason is None:
        plain.step()
    ref = list(s.generated)

    spec = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=128,
                         dtype=jnp.float32, draft=(cfg, params), n_draft=4)
    s2 = spec.add_request([3, 17, 42], 16, greedy)
    steps = 0
    while s2.stop_reason is None:
        spec.step()
        steps += 1
        assert steps < 64
    assert s2.generated == ref
    # same-weights draft: most drafts accepted → >1 token per decode step
    decode_steps = steps - 1  # one step was the prefill
    assert len(s2.generated) / max(decode_steps, 1) > 1.5, (
        len(s2.generated), decode_steps, spec.metrics)
    assert spec.metrics["n_spec_accepted"] > 0


def test_server_draft_speculation_with_sampling(paths):
    """Stochastic verification lifts the all-greedy restriction: sampled
    requests run through the draft path and stay finite/valid."""
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
    from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
    from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf

    tgt_path, drf_path = paths
    reader = GGUFReader(tgt_path)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    d_reader = GGUFReader(drf_path)
    d_cfg = config_from_gguf(d_reader)
    d_params = load_llama_params(d_reader, d_cfg, jnp.float32)

    eng = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=128,
                        dtype=jnp.float32, draft=(d_cfg, d_params), n_draft=3)
    sampled = SamplerConfig(temp=0.8, top_k=20, penalty_repeat=1.2, seed=7)
    s = eng.add_request([3, 17, 42], 12, sampled)
    steps = 0
    while s.stop_reason is None:
        eng.step()
        steps += 1
        assert steps < 64
    assert len(s.generated) == 12 or s.stop_reason == "stop"
    assert all(0 <= t < cfg.n_vocab for t in s.generated)
    assert eng.metrics["n_spec_drafted"] > 0


def test_lookahead_matches_greedy(paths):
    """Jacobi lookahead must be output-identical to plain greedy decoding."""
    import sys as _s, os as _o
    _s.path.insert(0, _o.path.join(_o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))), "examples"))
    from lookahead import lookahead_generate

    tgt_path, _ = paths
    prompt = "<t1><t2><t3>"
    n = 14
    _, ref_ids = _greedy_reference(tgt_path, prompt, n)
    eng = Engine.from_gguf(tgt_path, max_seq=128, dtype=jnp.float32)
    ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
    out, stats = lookahead_generate(eng, ids, n_predict=n, W=4, stop_on_eog=False)
    assert out == ref_ids, (out, ref_ids)
    assert stats["rounds"] <= n  # lookahead never does worse than 1 tok/round
