"""Eval-harness tests (reference: perplexity.cpp hellaswag/winogrande/MC)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
from llama_cpp_gfx906_tpu.tools.evals import hellaswag, multiple_choice, score_continuation, winogrande

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
    path = str(tmp_path_factory.mktemp("ev") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)


def test_score_continuation_matches_manual(engine):
    ctx = [3, 17, 42]
    cont = [9, 7]
    got = score_continuation(engine, ctx, cont)

    # manual: prefill full sequence, sum next-token logprobs for cont
    engine.reset()
    logits = None
    full = ctx + cont
    import jax.numpy as jnp2

    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward

    kv = KVCache.create(engine.cfg, 1, 8, jnp.float32)
    out, _ = forward(engine.params, engine.cfg, jnp2.asarray([full + [0] * 3], jnp2.int32), kv,
                     jnp2.asarray([5], jnp2.int32))
    lp = np.asarray(out[0], np.float32)
    lp = lp - (lp.max(-1, keepdims=True) + np.log(np.exp(lp - lp.max(-1, keepdims=True)).sum(-1, keepdims=True)))
    want = lp[2, 9] + lp[3, 7]
    assert abs(got - want) < 1e-3


def test_hellaswag_pipeline(engine, tmp_path):
    tasks = [
        {"query": "<t1><t2>", "endings": ["<t3>", "<t4><t5>", "<t6>"], "gold": 1},
        {"query": "<t7>", "endings": ["<t8>", "<t9>"], "gold": 0},
    ]
    f = tmp_path / "hs.jsonl"
    f.write_text("\n".join(json.dumps(t) for t in tasks))
    res = hellaswag(engine, str(f))
    assert res["n"] == 2 and 0.0 <= res["accuracy"] <= 1.0
    res2 = hellaswag(engine, str(f))
    assert res == res2  # deterministic


def test_winogrande_pipeline(engine, tmp_path):
    tasks = [
        {"sentence": "<t1> _ <t2>", "option1": "<t3>", "option2": "<t4>", "answer": 1},
    ]
    f = tmp_path / "wg.jsonl"
    f.write_text("\n".join(json.dumps(t) for t in tasks))
    res = winogrande(engine, str(f))
    assert res["n"] == 1 and res["accuracy"] in (0.0, 1.0)


def test_multiple_choice_pipeline(engine, tmp_path):
    tasks = [
        {"question": "<t1><t2>", "choices": ["<t3>", "<t4>"], "gold": 0},
        {"question": "<t5>", "choices": ["<t6>", "<t7>", "<t8>"], "gold": 2},
    ]
    f = tmp_path / "mc.jsonl"
    f.write_text("\n".join(json.dumps(t) for t in tasks))
    res = multiple_choice(engine, str(f))
    assert res["n"] == 2 and 0.0 <= res["accuracy"] <= 1.0
