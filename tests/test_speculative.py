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
