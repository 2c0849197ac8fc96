"""Real-weights fixture parity (round-3 VERDICT item 8).

``tests/fixtures/tinydoc-byte.f16.gguf`` is a byte-level llama TRAINED on
the repo's docs (scripts/make_tiny_fixture.py — deterministic, committed)
with pinned greedy continuations and held-out perplexity.  Unlike the
random-init HF-parity oracles, these expectations are frozen ON DISK, so
a regression anywhere in the GGUF reader → tokenizer → engine → sampler
stack shows up as a token/ppl diff against history (the offline analog of
the reference's stories15M CI models, tests/CMakeLists.txt:114-126).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
GGUF = os.path.join(FIX, "tinydoc-byte.f16.gguf")
EXPECTED = os.path.join(FIX, "tinydoc_expected.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GGUF), reason="fixture not built")


@pytest.fixture(scope="module")
def expected():
    with open(EXPECTED) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def engine():
    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    return Engine.from_gguf(GGUF, max_seq=192, dtype=jnp.float32,
                            keep_quantized=False)


def _ppl(eng, held_ids):
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward

    toks = np.asarray([held_ids[:-1]], np.int32)
    kv = KVCache.create(eng.cfg, 1, len(held_ids) - 1, jnp.float32)
    logits, _ = forward(eng.params, eng.cfg, jnp.asarray(toks), kv)
    logp = np.asarray(jnp.take_along_axis(
        jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1),
        jnp.asarray(held_ids[1:], jnp.int32)[:, None], axis=-1)[:, 0])
    return float(np.exp(-logp.mean()))


def test_greedy_tokens_pinned(engine, expected):
    for prompt, want in expected["greedy"].items():
        _, toks = engine.generate(prompt, n_predict=len(want),
                                  stop_on_eog=False)
        assert toks == want, f"greedy drift for prompt {prompt!r}"


def test_heldout_ppl_pinned(engine, expected):
    ppl = _ppl(engine, expected["held_ids"])
    assert abs(ppl - expected["ppl"]) / expected["ppl"] < 0.01
    # the model genuinely learned the corpus (uniform would be 256)
    assert ppl < 20.0


@pytest.mark.parametrize("preset,max_delta", [("Q8_0", 0.01), ("Q4_0", 0.25)])
def test_quantized_ppl_delta(engine, expected, tmp_path, preset, max_delta):
    """Quantization quality on REAL weights: requantize the fixture and
    bound the held-out ppl regression (the wikitext-2 ppl-δ discipline on
    the corpus this environment can reach)."""
    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.quantize import quantize_file

    out = str(tmp_path / f"tiny-{preset}.gguf")
    quantize_file(GGUF, out, preset)
    qeng = Engine.from_gguf(out, max_seq=192, dtype=jnp.float32)
    ppl_q = _ppl(qeng, expected["held_ids"])
    base = expected["ppl"]
    assert ppl_q < base * (1 + max_delta), (preset, ppl_q, base)
