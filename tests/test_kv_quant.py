"""Quantized (q8) KV cache tests (reference capability: type_k/type_v,
llama.h:322-323)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.ops.kv_quant import QuantKV, dequantize_rows, quantize_rows
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
    path = str(tmp_path_factory.mktemp("kvq") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 16)) * 3, jnp.float32)
    q = quantize_rows(x)
    back = dequantize_rows(q, jnp.float32)
    rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.02  # int8 row quantization error bound


def test_q8_cache_close_to_fp(model_path):
    eng_f = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng_q = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    assert isinstance(eng_q.kv.k, QuantKV)
    ids = [3, 17, 42, 9, 7]
    lf = eng_f.prefill(ids)
    lq = eng_q.prefill(ids)
    assert int(np.argmax(lf)) == int(np.argmax(lq))
    # decode several tokens; greedy paths should agree on a tiny model
    for _ in range(6):
        t = int(np.argmax(lf))
        lf = eng_f.decode_one(t)
        lq = eng_q.decode_one(t)
    assert int(np.argmax(lf)) == int(np.argmax(lq))


def test_q8_cache_memory_is_int8(model_path):
    eng_q = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    assert eng_q.kv.k.q.dtype == jnp.int8
    assert eng_q.kv.k.s.shape[-1] == 1


def test_q8_context_shift_layer0_exact(model_path):
    """Context shift on a q8 cache: layer-0 rows after the shift must match
    a fresh prefill of the survivors (within requant error).  Pins the fix
    for the round-2 silent no-op (shift previously returned unshifted on
    QuantKV caches)."""
    from llama_cpp_gfx906_tpu.ops.kv_quant import dequantize_rows

    tokens = [3, 17, 42, 9, 7, 25, 33, 11, 40, 6, 28, 13]
    n_keep, n_discard = 2, 4
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    eng.prefill(tokens)
    eng.context_shift(n_keep, n_discard)
    survivors = tokens[:n_keep] + tokens[n_keep + n_discard:]
    assert eng.n_past == len(survivors)

    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32, kv_cache_dtype="q8")
    eng2.prefill(survivors)
    n = len(survivors)
    k1 = np.asarray(dequantize_rows(eng.kv.k, jnp.float32))[0, :, :n]
    k2 = np.asarray(dequantize_rows(eng2.kv.k, jnp.float32))[0, :, :n]
    # two int8 quantization round-trips: tolerance is a few quant steps
    assert np.abs(k1 - k2).max() < 0.05 * max(np.abs(k2).max(), 1e-6) + 0.02
    v1 = np.asarray(dequantize_rows(eng.kv.v, jnp.float32))[0, :, :n]
    v2 = np.asarray(dequantize_rows(eng2.kv.v, jnp.float32))[0, :, :n]
    assert np.abs(v1 - v2).max() < 0.05 * max(np.abs(v2).max(), 1e-6) + 0.02


def test_q8_batched_shift_keeps_decoding(model_path):
    """A q8-KV batched slot that hits max_seq must context-shift (not
    silently clamp-overwrite the last row) and keep producing tokens that
    agree with a bf16-KV engine under the same shift schedule."""
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
    from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
    from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf

    reader = GGUFReader(model_path)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    kw = dict(max_seq=32, n_slots=2, dtype=jnp.float32)
    eng_q = BatchedEngine(cfg, params, tok, kv_cache_dtype="q8", **kw)
    eng_f = BatchedEngine(cfg, params, tok, **kw)
    prompt = [3, 17, 42, 9, 7, 25, 33, 11] * 3  # 24 tokens, near the 32 cap
    sc = SamplerConfig(temp=0.0)
    outs = {}
    for name, eng in (("q8", eng_q), ("f32", eng_f)):
        slot = eng.add_request(prompt, n_predict=20, sampler=sc)
        toks = []
        for _ in range(80):
            for s, t, fin in eng.step():
                toks.append(t)
            if slot.stop_reason is not None:
                break
        outs[name] = (toks, slot.n_shifted)
    assert outs["q8"][1] > 0, "q8 slot never shifted"
    assert len(outs["q8"][0]) == 20, "q8 slot stopped early"
    # greedy paths agree at least through the first post-shift tokens
    n_agree = sum(a == b for a, b in zip(outs["q8"][0][:8], outs["f32"][0][:8]))
    assert n_agree >= 6


def test_quant_weights_q8_kv_flash_parity(model_path, tmp_path):
    """Quantized weights + q8 KV must take the Pallas fast path on TPU and
    match the einsum oracle (pins the round-3 re-enable of the combo that
    round 2 had blacklisted for an axon miscompile — since fixed)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("combo dispatch is TPU-only")
    import llama_cpp_gfx906_tpu.ops.attention as att
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )).eval()
    qpath = str(tmp_path / "tiny-q8.gguf")
    convert_hf_llama(hf, dummy_vocab(), qpath, quant_type=GGMLType.Q8_0)

    seq = [3, 17, 42, 9, 7, 25, 33, 11]

    def run(force):
        import contextlib

        eng = Engine.from_gguf(qpath, max_seq=128, kv_cache_dtype="q8",
                               keep_quantized=True)
        rows = []
        with (att.force_einsum() if force else contextlib.nullcontext()):
            rows.append(np.asarray(eng.prefill(seq), np.float32))
            for t in [5, 9, 30, 41]:
                rows.append(np.asarray(eng.decode_one(t), np.float32))
        return np.stack(rows)

    ref = run(True)
    got = run(False)
    # NOTE: same-process jit caching means run(False) may reuse the einsum
    # trace for shapes already compiled; the decisive cross-process checks
    # live in the round-3 repro (docs/perf.md).  Still pins numerics.
    assert np.abs(ref - got).max() < 0.05
