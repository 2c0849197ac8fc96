"""Steady-state decode bursts (BatchedEngine decode_burst): K sampled
decode steps fused into one dispatch, with the feedback token, KV advance
and repetition window carried on device.

The reference samples on the host per token (src/llama-sampling.cpp) —
fine over PCIe, ruinous when each dispatch costs tens of ms (tunneled
TPU) or even ~1 ms (pod).  Correctness contract: a burst engine must
produce exactly the single-step engine's tokens for greedy requests, stop
mid-burst on EOS / n_predict, and keep n_past at the accepted count (rows
written past the stop are dead).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFReader
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama", "tokens": tokens, "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1,
    }


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("burst") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def _engine(model_path, burst, **kw):
    reader = GGUFReader(model_path)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    return BatchedEngine(cfg, params, tok, dtype=jnp.float32,
                         decode_burst=burst, **kw)


def _run(eng, prompts, n_predict=24):
    slots, toks = {}, {}
    for p in prompts:
        s = eng.add_request(p, n_predict=n_predict,
                            sampler=SamplerConfig(temp=0.0))
        slots[s.id] = s
        toks[s.id] = []
    for _ in range(400):
        for s, t, fin in eng.step():
            toks[s.id].append(t)
        if all(s.stop_reason is not None for s in slots.values()):
            break
    return {i: toks[i] for i in slots}, slots


def test_burst_matches_single_step_greedy(model_path):
    prompts = [[3, 17, 42, 9], [5, 5, 8, 30, 2, 77], [60, 61, 62]]
    out1, _ = _run(_engine(model_path, 1, n_slots=4, max_seq=128), prompts)
    out8, slots8 = _run(_engine(model_path, 8, n_slots=4, max_seq=128),
                        prompts)
    assert out1 == out8
    for s in slots8.values():
        # n_past reflects accepted tokens only (the last sampled token's
        # row is written when it is next consumed as input)
        assert s.n_past == len(s.prompt_ids) + len(s.generated) - 1


def test_burst_respects_n_predict_mid_burst(model_path):
    # n_predict=5 with burst=8: the slot must stop at exactly 5 tokens
    eng = _engine(model_path, 8, n_slots=2, max_seq=128)
    out, slots = _run(eng, [[3, 17, 42, 9]], n_predict=5)
    (s,) = slots.values()
    assert len(s.generated) == 5 and s.stop_reason == "length"


def test_burst_with_staggered_join(model_path):
    """A request joining mid-generation (bursts already running) gets
    the same tokens as under a single-step engine — bursts pause while
    the newcomer prefills."""
    long_prompt = list(np.random.default_rng(0).integers(3, VOCAB, 40))

    def run(burst):
        eng = _engine(model_path, burst, n_slots=2, max_seq=128, n_chunk=4)
        s1 = eng.add_request([3, 17, 42, 9], n_predict=16,
                             sampler=SamplerConfig(temp=0.0))
        toks = {s1.id: []}
        for _ in range(4):  # s1 prefills and starts generating
            for s, t, fin in eng.step():
                toks[s.id].append(t)
        s2 = eng.add_request(long_prompt, n_predict=8,
                             sampler=SamplerConfig(temp=0.0))
        toks.setdefault(s2.id, [])
        for _ in range(200):
            for s, t, fin in eng.step():
                toks[s.id].append(t)
            if s1.stop_reason and s2.stop_reason:
                break
        return toks[s1.id], toks[s2.id]

    got1, got2 = run(8)
    ref1, ref2 = run(1)
    assert len(got1) == 16 and len(got2) == 8
    assert got1 == ref1 and got2 == ref2


def test_burst_slot_reuse_after_early_stop(model_path):
    """A slot that stopped mid-burst leaves dead rows above n_past; a new
    request on the same slot must not see them."""
    eng = _engine(model_path, 8, n_slots=1, max_seq=128)
    _, slots = _run(eng, [[3, 17, 42, 9]], n_predict=3)
    for s in slots.values():
        eng.release(s)
    out2, _ = _run(eng, [[60, 61, 62]], n_predict=12)
    ref_eng = _engine(model_path, 1, n_slots=1, max_seq=128)
    ref, _ = _run(ref_eng, [[60, 61, 62]], n_predict=12)
    assert list(out2.values()) == list(ref.values())


def test_unbounded_n_predict_runs_past_one_token(model_path):
    """reference n_predict=-1 = generate until EOS/ctx — must not stop
    after the first token."""
    eng = _engine(model_path, 1, n_slots=1, max_seq=64, ctx_shift=False)
    s = eng.add_request([3, 17, 42, 9], n_predict=-1,
                        sampler=SamplerConfig(temp=0.0))
    n = 0
    for _ in range(100):
        for _s, t, fin in eng.step():
            n += 1
        if s.stop_reason is not None:
            break
    assert n > 1


def test_warmup_compiles_and_leaves_engine_clean(model_path):
    """warmup() (the server's pre-/health compile pass, the reference
    common_init warmup analog) must run a burst + a single-step request to
    completion, then leave zeroed metrics and fully-free slots, and a
    later request must match a never-warmed engine token-for-token."""
    eng = _engine(model_path, 4, n_slots=2, max_seq=128)
    eng.warmup()
    assert all(v == 0 for v in eng.metrics.values())
    assert all(s.state.name == "IDLE" for s in eng.slots)
    got, _ = _run(eng, [[3, 17, 42, 9]], n_predict=10)
    ref_eng = _engine(model_path, 4, n_slots=2, max_seq=128)
    ref, _ = _run(ref_eng, [[3, 17, 42, 9]], n_predict=10)
    assert list(got.values()) == list(ref.values())


def test_burst_fixed_length_no_tail_resize(model_path, monkeypatch):
    """Burst length stays static when a request's remaining n_predict is
    smaller than K (a tail-sized burst would compile a new program);
    overshoot tokens must be truncated at exactly n_predict."""
    eng = _engine(model_path, 8, n_slots=1, max_seq=128)
    seen_bursts = set()
    orig = eng._decode_burst_fn

    def spy(*a, **kw):
        # positional: (params, cfg, tokens, kv, key, ...) with burst as
        # the trailing static int before gain
        seen_bursts.add(a[-2])
        return orig(*a, **kw)

    eng._decode_burst_fn = spy
    got, slots = _run(eng, [[3, 17, 42, 9]], n_predict=11)
    assert len(list(got.values())[0]) == 11
    assert seen_bursts == {8}  # never a tail-sized 3-step program
