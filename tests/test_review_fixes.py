"""Regressions for the round-3 runtime review findings (seeded host
sampling, slot-state completeness, truncation clamp, prefill budget,
progress-wrapper fusion, set_n_past cache-family support)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFReader
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.runtime.batch_engine import (
    BatchedEngine,
    SamplerConfig,
    SlotState,
)
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import tiny_hf_model, dummy_vocab


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    hf = tiny_hf_model(seed=13)
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def make_engine(tiny_gguf, **kw):
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    return BatchedEngine(cfg, params, tok, max_seq=64, dtype=jnp.float32, **kw)


def test_seeded_host_sampling_varies_by_position(tiny_gguf):
    """A fixed request seed must not replay the same RNG draw every token
    (fresh-chain-per-token bug: fixed-quantile sampling)."""
    eng = make_engine(tiny_gguf, n_slots=1)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(96).astype(np.float32)  # same logits row
    sc = SamplerConfig(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, seed=7)
    draws = {eng._sample_host(logits.copy(), [1] * n, sc, n_pos=n)
             for n in range(40)}
    assert len(draws) > 3  # the same quantile would give one token forever
    # still deterministic per position
    a = eng._sample_host(logits.copy(), [1] * 5, sc, n_pos=5)
    b = eng._sample_host(logits.copy(), [1] * 5, sc, n_pos=5)
    assert a == b


def test_slot_restore_keeps_shared_prefix_and_recent(tiny_gguf):
    eng = make_engine(tiny_gguf, n_slots=2)
    eng.set_system_prompt([3, 4, 5, 6])
    s = eng.add_request([7, 8, 9], 4, SamplerConfig(temp=0.0))
    for _ in range(3):
        eng.step()
    state = eng.save_slot_state(s.id)
    shared_before = eng.kv.shared_k
    assert shared_before is not None
    eng.load_slot_state(s.id, state)
    assert eng.kv.shared_k is shared_before  # system prompt survives
    hist = (state["prompt_ids"] + state["generated"])
    got = [t for t in eng.recent[s.id] if t >= 0]
    assert got == hist[-len(got):]


def test_slot_state_q8_roundtrip(tiny_gguf):
    """q8 caches serialize their int8+scale planes bit-faithfully
    (round-3 gap closed; reference serializes quantized cells fine,
    llama-kv-cache-unified.cpp:1831-2402)."""
    eng = make_engine(tiny_gguf, n_slots=2, kv_cache_dtype="q8")
    s = eng.add_request([7, 8, 9], 6, SamplerConfig(temp=0.0))
    for _ in range(3):
        eng.step()
    state = eng.save_slot_state(s.id)
    assert state["kv_format"] == "q8" and state["k_q"].dtype == np.int8
    # continue from the saved point
    rest_a = []
    while s.stop_reason is None:
        for sl, t, fin in eng.step():
            if sl is s:
                rest_a.append(t)
    # fresh engine, restore, continue — must produce the same tokens
    eng2 = make_engine(tiny_gguf, n_slots=2, kv_cache_dtype="q8")
    eng2.load_slot_state(1, state)
    s2 = eng2.slots[1]
    s2.n_predict = s.n_predict
    s2.sampler = SamplerConfig(temp=0.0)
    rest_b = []
    for _ in range(30):
        for sl, t, fin in eng2.step():
            if sl is s2:
                rest_b.append(t)
        if s2.stop_reason is not None:
            break
    assert rest_b[:len(rest_a)] == rest_a
    # format mismatch is a clean error, not silent corruption
    dense = make_engine(tiny_gguf, n_slots=1)
    with pytest.raises(ValueError, match="kv_format"):
        dense.load_slot_state(0, state)


def test_shared_prefix_q8_matches_dense_system_prompt(tiny_gguf):
    """shared-prefix segment over a q8 main cache (round-3
    NotImplementedError site): greedy tokens must match the same prompts
    run WITHOUT the shared segment."""
    sys_ids = [3, 4, 5, 6]
    suffix = [7, 8, 9]

    def run(eng, prompt):
        s = eng.add_request(prompt, 5, SamplerConfig(temp=0.0))
        out = []
        for _ in range(30):
            for sl, t, fin in eng.step():
                if sl is s:
                    out.append(t)
            if s.stop_reason is not None:
                break
        return out

    plain = make_engine(tiny_gguf, n_slots=1, kv_cache_dtype="q8")
    ref = run(plain, sys_ids + suffix)
    shared = make_engine(tiny_gguf, n_slots=1, kv_cache_dtype="q8")
    shared.set_system_prompt(sys_ids)
    got = run(shared, sys_ids + suffix)
    assert shared.kv.shared_k is not None
    # the shared segment holds bf16 rows once; the main cache stays q8
    from llama_cpp_gfx906_tpu.ops.kv_quant import QuantKV

    assert isinstance(shared.kv.k, QuantKV)
    assert got == ref


def test_truncation_clamps_n_keep(tiny_gguf):
    eng = make_engine(tiny_gguf, n_slots=1)
    long_prompt = list(np.arange(3, 3 + 200) % 90 + 3)
    s = eng.add_request(long_prompt, 8, SamplerConfig(temp=0.0),
                        n_keep=1000)  # n_keep far beyond the target
    assert len(s.prompt_ids) < eng.max_seq
    # and the request still runs to completion without blowing max_seq
    for _ in range(60):
        eng.step()
        if s.stop_reason is not None:
            break
    assert s.stop_reason is not None
    assert s.n_past <= eng.max_seq


def test_prefill_budget_bounds_per_step_work(tiny_gguf):
    """With budget = one chunk, only one slot's chunk advances per step
    and the rotation spreads progress fairly."""
    eng = make_engine(tiny_gguf, n_slots=3, n_chunk=16, prefill_budget=16)
    prompts = [list((np.arange(40) % 90) + 3) for _ in range(3)]
    slots = [eng.add_request(p, 2, SamplerConfig(temp=0.0)) for p in prompts]
    eng.step()
    advanced = [s for s in slots if s.n_past > 0]
    assert len(advanced) == 1  # budget bound one chunk this step
    eng.step()
    advanced2 = [s for s in slots if s.n_past > 0]
    assert len(advanced2) == 2  # rotation moved to the next slot
    for _ in range(40):
        eng.step()
        if all(s.stop_reason is not None for s in slots):
            break
    assert all(s.stop_reason is not None for s in slots)


def test_progress_callback_keeps_fused_layout(tiny_gguf):
    seen = []
    eng = Engine.from_gguf(tiny_gguf, max_seq=32, dtype=jnp.float32,
                           progress_callback=lambda f: seen.append(f) or True)
    # the progress wrapper must not silently de-fuse the weights (the
    # fused megakernel gate requires wqkv_fused)
    assert "wqkv_fused" in eng.params["layers"]
    assert seen and seen[-1] == 1.0
    assert all(b >= a for a, b in zip(seen, seen[1:]))


def test_set_n_past_works_on_iswa_ring(tiny_gguf):
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader).with_(sliding_window=16, swa_pattern=2)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    eng = Engine(cfg=cfg, params=params, tokenizer=tok, max_seq=64,
                 kv_dtype=jnp.float32, swa_ring=True)
    eng.prefill([3, 4, 5, 6, 7])
    eng.set_n_past(3)  # must not crash on the ring cache family
    assert int(np.asarray(eng.kv.n_past)[0]) == 3
