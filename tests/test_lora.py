"""LoRA + control-vector tests (reference: llama-adapter.cpp semantics;
server test_lora pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96
RANK = 4
ALPHA = 8.0


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
def base_and_lora(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    d = tmp_path_factory.mktemp("lora")
    base = str(d / "base-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), base, quant_type=GGMLType.F32)

    # hand-built LoRA adapter GGUF on attn_q + ffn_down of every layer
    rng = np.random.default_rng(7)
    w = GGUFWriter(str(d / "adapter.gguf"), "llama")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", ALPHA)
    lora_arrays = {}
    for il in range(3):
        for suffix, (out_dim, in_dim) in [("attn_q", (64, 64)), ("ffn_down", (64, 112))]:
            A = (rng.standard_normal((RANK, in_dim)) * 0.05).astype(np.float32)
            B = (rng.standard_normal((out_dim, RANK)) * 0.05).astype(np.float32)
            w.add_tensor(f"blk.{il}.{suffix}.weight.lora_a", A, GGMLType.F32)
            w.add_tensor(f"blk.{il}.{suffix}.weight.lora_b", B, GGMLType.F32)
            lora_arrays[(il, suffix)] = (A, B)
    lora_path = w.write()
    return base, lora_path, lora_arrays


def test_lora_forward_matches_manual_merge(base_and_lora):
    base, lora_path, arrays = base_and_lora
    ids = [3, 17, 42, 9, 7]

    eng = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    base_logits = eng.prefill(ids).copy()

    eng.reset()
    eng.apply_lora_file(lora_path, scale=1.0)
    lora_logits = eng.prefill(ids).copy()
    assert not np.allclose(base_logits, lora_logits)

    # manual merge oracle: W' = W + (alpha/r)·(B·A)ᵀ in x@W orientation
    eng2 = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    layers = dict(eng2.params["layers"])
    wq = np.asarray(layers["wq"]).copy()
    wd = np.asarray(layers["w_down"]).copy()
    for (il, suffix), (A, B) in arrays.items():
        delta = (B @ A).T * (ALPHA / RANK)  # (in, out)
        if suffix == "attn_q":
            wq[il] += delta
        else:
            wd[il] += delta
    layers["wq"] = jnp.asarray(wq)
    layers["w_down"] = jnp.asarray(wd)
    eng2.params = {**eng2.params, "layers": layers}
    merged_logits = eng2.prefill(ids)
    np.testing.assert_allclose(lora_logits, merged_logits, rtol=2e-4, atol=2e-4)


def test_lora_clear_restores_base(base_and_lora):
    base, lora_path, _ = base_and_lora
    eng = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    ids = [5, 6, 7]
    base_logits = eng.prefill(ids).copy()
    eng.reset()
    eng.apply_lora_file(lora_path)
    eng.clear_lora()
    np.testing.assert_allclose(eng.prefill(ids), base_logits, rtol=1e-6, atol=1e-6)


def test_lora_scale_zero_is_noop(base_and_lora):
    base, lora_path, _ = base_and_lora
    eng = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    ids = [5, 6, 7]
    base_logits = eng.prefill(ids).copy()
    eng.reset()
    eng.apply_lora_file(lora_path, scale=0.0)
    np.testing.assert_allclose(eng.prefill(ids), base_logits, rtol=1e-5, atol=1e-5)


def test_lora_works_with_quantized_base(base_and_lora):
    """LoRA applies on top of block-quantized device weights (the reference
    applies LoRA at matmul time for the same reason)."""
    base, lora_path, _ = base_and_lora
    eng = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=True)
    ids = [3, 17, 42]
    base_logits = eng.prefill(ids).copy()
    eng.reset()
    eng.apply_lora_file(lora_path)
    lora_logits = eng.prefill(ids)
    assert not np.allclose(base_logits, lora_logits)


def test_export_lora_merge(base_and_lora, tmp_path):
    from llama_cpp_gfx906_tpu.tools.export_lora import merge_lora

    base, lora_path, _ = base_and_lora
    merged_path = str(tmp_path / "merged.gguf")
    merge_lora(base, [lora_path], merged_path)

    eng_rt = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    eng_rt.apply_lora_file(lora_path)
    eng_merged = Engine.from_gguf(merged_path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    ids = [3, 17, 42, 9]
    np.testing.assert_allclose(
        eng_rt.prefill(ids), eng_merged.prefill(ids), rtol=2e-4, atol=2e-4
    )


def test_control_vector(base_and_lora, tmp_path):
    base, _, _ = base_and_lora
    w = GGUFWriter(str(tmp_path / "cvec.gguf"), "controlvector")
    rng = np.random.default_rng(3)
    for il in range(1, 4):  # direction.<n> is 1-based
        w.add_tensor(f"direction.{il}", rng.standard_normal(64).astype(np.float32) * 0.5, GGMLType.F32)
    cpath = w.write()

    eng = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    ids = [3, 17, 42]
    base_logits = eng.prefill(ids).copy()
    eng.reset()
    eng.apply_control_vector_file(cpath, strength=1.0)
    cv_logits = eng.prefill(ids)
    assert not np.allclose(base_logits, cv_logits)


def test_peft_adapter_conversion(base_and_lora, tmp_path):
    """PEFT LoRA adapter → GGUF → runtime application equals torch PEFT."""
    peft = pytest.importorskip("peft")
    from transformers import LlamaConfig, LlamaForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_lora import convert_peft_model

    base_path, _, _ = base_and_lora
    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    # convert the base FIRST: get_peft_model wraps modules in place
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    base2 = str(tmp_path / "base2.gguf")
    convert_hf_llama(hf, dummy_vocab(), base2, quant_type=GGMLType.F32)

    lora_cfg = peft.LoraConfig(r=4, lora_alpha=8, target_modules=["q_proj", "v_proj"],
                               init_lora_weights=False)
    pm = peft.get_peft_model(hf, lora_cfg).eval()
    gguf_lora = str(tmp_path / "peft.gguf")
    convert_peft_model(pm, gguf_lora)
    eng = Engine.from_gguf(base2, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    eng.apply_lora_file(gguf_lora, scale=1.0)

    ids = [3, 17, 42, 9]
    with torch.no_grad():
        ref = pm(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def _greedy_single(base, ids, n, lora_path=None):
    eng = Engine.from_gguf(base, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    if lora_path:
        eng.apply_lora_file(lora_path, scale=1.0)
    logits = eng.prefill(list(ids))
    out = []
    for _ in range(n):
        t = int(np.argmax(logits))
        out.append(t)
        logits = eng.decode_one(t)
    return out


def test_per_request_lora_batched(base_and_lora, tmp_path):
    """Per-slot adapter selection in one batched program (reference server:
    per-request `lora` scales): slots mixing base / adapter-0 / adapter-1
    must each reproduce their single-engine greedy output."""
    base, lora_path, arrays = base_and_lora
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig

    # second adapter: negated A on the same hooks → distinct behavior
    w = GGUFWriter(str(tmp_path / "adapter2.gguf"), "llama")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", ALPHA)
    for (il, suffix), (A, B) in arrays.items():
        w.add_tensor(f"blk.{il}.{suffix}.weight.lora_a", -A, GGMLType.F32)
        w.add_tensor(f"blk.{il}.{suffix}.weight.lora_b", B, GGMLType.F32)
    lora2 = w.write()

    ids = [3, 17, 42, 9]
    N = 6
    refs = [
        _greedy_single(base, ids, N),
        _greedy_single(base, ids, N, lora_path),
        _greedy_single(base, ids, N, lora2),
    ]
    assert refs[0] != refs[1] or refs[0] != refs[2]  # adapters must bite

    eng = Engine.from_gguf(base, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    be = BatchedEngine(eng.cfg, eng.params, eng.tokenizer, n_slots=3,
                       max_seq=64, dtype=jnp.float32)
    be.attach_lora([lora_path, lora2])
    specs = [None, {0: 1.0}, {1: 1.0}]
    for i, lora in enumerate(specs):
        s = be.add_request(list(ids), N, SamplerConfig(temp=0.0), request_id=str(i),
                           lora=lora)
        assert s is not None
    done = {}
    for _ in range(200):
        if len(done) == 3:
            break
        for slot, tok, finished in be.step():
            if finished:
                done[slot.request_id] = list(slot.generated)
                be.release(slot)
    assert [done[str(i)] for i in range(3)] == refs


def test_per_request_lora_requires_attach(base_and_lora):
    base, _, _ = base_and_lora
    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig

    eng = Engine.from_gguf(base, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    be = BatchedEngine(eng.cfg, eng.params, eng.tokenizer, n_slots=2, max_seq=64)
    with pytest.raises(ValueError, match="attach_lora"):
        be.add_request([3, 4], 4, SamplerConfig(), lora={0: 1.0})
