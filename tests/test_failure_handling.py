"""Failure-handling parity: cancellable model-load progress callback
(reference llama_progress_callback, llama.h:276-279 +
tests/test-model-load-cancel.cpp) and the generation abort callback
(ggml_abort_callback, llama.h:328-329 / :975)."""

import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine, ModelLoadCancelled
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import tiny_hf_model, dummy_vocab


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    hf = tiny_hf_model(seed=23)
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_progress_callback_reports_monotonic(tiny_gguf):
    seen = []
    eng = Engine.from_gguf(tiny_gguf, max_seq=32, dtype=jnp.float32,
                           progress_callback=lambda f: seen.append(f) or True)
    assert seen and seen[-1] == 1.0
    assert all(b >= a for a, b in zip(seen, seen[1:]))
    text, ids = eng.generate("Hello", n_predict=2, stop_on_eog=False)
    assert len(ids) == 2


def test_progress_callback_cancels_load(tiny_gguf):
    # the test-model-load-cancel contract: returning False aborts the load
    with pytest.raises(ModelLoadCancelled):
        Engine.from_gguf(tiny_gguf, max_seq=32, dtype=jnp.float32,
                         progress_callback=lambda f: f < 0.3)


def test_abort_callback_stops_generation(tiny_gguf):
    eng = Engine.from_gguf(tiny_gguf, max_seq=64, dtype=jnp.float32)
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return calls["n"] > 3  # allow 3 steps, then abort

    _, ids = eng.generate("Hello", n_predict=32, stop_on_eog=False,
                          abort_callback=abort)
    assert len(ids) == 3

    # fused path: abort after the first chunk
    flag = {"chunks": 0}

    def abort2():
        flag["chunks"] += 1
        return flag["chunks"] > 1

    _, ids2 = eng.generate_fused("Hello", n_predict=32, stop_on_eog=False,
                                 chunk=4, abort_callback=abort2)
    assert 0 < len(ids2) <= 5
