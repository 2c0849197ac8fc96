"""Thread-safety: one model's weights shared by N contexts decoding in
parallel threads (reference strategy: tests/test-thread-safety.cpp — a
model copy per device, N contexts per model, parallel decode threads;
registered with -np 4 -t 2 in tests/CMakeLists.txt:194).

The JAX analog: `Engine` contexts share one immutable params dict
(device arrays are read-only; each context owns its KV), so concurrent
greedy decodes from many threads must be byte-identical to the serial
runs.  The tokenizer thread-safety guarantee (llama.h:1082) is covered
by hammering `tokenize` from the same pool.
"""

import concurrent.futures as cf

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
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
    path = str(tmp_path_factory.mktemp("m") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def _greedy(eng: Engine, prompt: list[int], n: int) -> list[int]:
    eng.reset()
    logits = eng.prefill(prompt)
    toks = [int(np.argmax(logits))]
    for _ in range(n - 1):
        toks.append(int(np.argmax(eng.decode_one(toks[-1]))))
    return toks


def test_parallel_contexts_match_serial(model_path):
    base = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)

    def new_ctx() -> Engine:
        # share the weights dict — the llama_init_from_model analog
        return Engine(cfg=base.cfg, params=base.params,
                      tokenizer=base.tokenizer, max_seq=64,
                      kv_dtype=jnp.float32)

    prompts = [[3, 17, 42, 9], [5, 5, 80, 11, 2], [60, 61], [7, 30, 31, 8]]
    serial = [_greedy(new_ctx(), p, 8) for p in prompts]

    # 8 threads over 8 fresh contexts, two rounds each, all concurrent
    def worker(i: int) -> list[int]:
        ctx = new_ctx()
        out = _greedy(ctx, prompts[i % 4], 8)
        return out if _greedy(ctx, prompts[i % 4], 8) == out else []

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(worker, range(8)))
    for i, got in enumerate(results):
        assert got == serial[i % 4], f"thread {i} diverged"


def test_tokenizer_concurrent(model_path):
    eng = Engine.from_gguf(model_path, max_seq=32, dtype=jnp.float32)
    texts = [f"<t{i}> <t{(i * 7) % 90}> <t3>" for i in range(32)]
    serial = [eng.tokenizer.tokenize(t) for t in texts]
    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        par = list(pool.map(eng.tokenizer.tokenize, texts))
    assert par == serial
