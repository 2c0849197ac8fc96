"""DeepSeek-V2 MLA + MoE parity vs HF transformers (torch CPU oracle).

Reference builder: llm_build_deepseek2 (src/llama-model.cpp:12691) — the
absorbed-MQA attention over the compressed latent must match HF's
decompressed MHA bit-for-bit up to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_deepseek2

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "gpt2",
        "tokens": tokens,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


def _make(seed, q_lora_rank):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(seed)
    cfg = DeepseekV2Config(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        norm_topk_prob=False,
        routed_scaling_factor=1.0,
        scoring_func="softmax",
        topk_method="greedy",
        n_group=1,
        topk_group=1,
        kv_lora_rank=32,
        q_lora_rank=q_lora_rank,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=24,
        max_position_embeddings=128,
        attention_bias=False,
    )
    return DeepseekV2ForCausalLM(cfg).eval()


@pytest.fixture(scope="module", params=[None, 24], ids=["lite", "qlora"])
def ds_pair(request, tmp_path_factory):
    hf = _make(0 if request.param is None else 1, request.param)
    path = str(tmp_path_factory.mktemp("ds") / f"tiny-ds-{request.param}.gguf")
    convert_hf_deepseek2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_deepseek2_logits_parity(ds_pair):
    path, hf = ds_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.family.name == "deepseek2"
    assert eng.cfg.n_layer_dense_lead == 1
    ids = [3, 17, 42, 9, 88, 5]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.deepseek2 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_deepseek2_greedy_decode(ds_pair):
    path, hf = ds_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    n_steps = 8
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]

    logits = eng.prefill(prompt)
    got = []
    for _ in range(n_steps):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out


def test_mla_cache_is_compressed(ds_pair):
    """The KV cache stores the latent, not per-head K/V — the MLA win."""
    path, _ = ds_pair
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    L, B, S, Hkv, Dk = eng.kv.k.shape
    assert Hkv == 1
    assert Dk == eng.cfg.kv_lora_rank + eng.cfg.rope_dim
    assert eng.kv.v.shape[-1] == eng.cfg.kv_lora_rank


def test_minicpm3_mla_scaled(tmp_path):
    """minicpm3 rides the verified MLA graph plus MiniCPM scaling
    (reference llm_build_minicpm3 :9868: scale_embd=12,
    scale_depth=1.4/√L, logit scale n_embd_base/n_embd=256/n_embd).
    Same tensors under both archs must match exactly once the scales are
    neutralized; with defaults the scales must bite."""
    hf = _make(31, q_lora_rank=24)
    base = str(tmp_path / "ds2-as-base.gguf")
    convert_hf_deepseek2(hf, dummy_vocab(), base, quant_type=GGMLType.F32)

    # re-write the exact tensor set under arch minicpm3
    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter

    r = GGUFReader(base)
    w = GGUFWriter(str(tmp_path / "mini3.gguf"), "minicpm3")
    for k in r.field_names():
        if k == "general.architecture":
            continue
        w.add_kv(k.replace("deepseek2.", "minicpm3."), r.get(k))
    for name, t in r.tensors.items():
        w.add_tensor(name, t.to_f32(), GGMLType.F32)
    p3 = w.write()

    eng_ds = Engine.from_gguf(base, max_seq=32, dtype=jnp.float32)
    eng_m3 = Engine.from_gguf(p3, max_seq=32, dtype=jnp.float32)
    assert eng_m3.family.name == "deepseek2"
    assert eng_m3.cfg.embedding_scale == 12.0
    assert abs(eng_m3.cfg.logit_scale - 256.0 / 64) < 1e-6

    from llama_cpp_gfx906_tpu.models.deepseek2 import forward

    ids = [3, 17, 42, 9]
    ref, _ = forward(eng_ds.params, eng_ds.cfg, jnp.asarray([ids], jnp.int32), eng_ds.kv)

    neutral = eng_m3.cfg.with_(embedding_scale=1.0, residual_scale=1.0,
                               logit_scale=1.0,
                               rope_interleaved=eng_ds.cfg.rope_interleaved)
    got_eq, _ = forward(eng_m3.params, neutral, jnp.asarray([ids], jnp.int32), eng_m3.kv)
    np.testing.assert_allclose(np.asarray(got_eq), np.asarray(ref), rtol=1e-5, atol=1e-5)

    got_scaled, _ = forward(eng_m3.params, eng_m3.cfg.with_(
        rope_interleaved=eng_ds.cfg.rope_interleaved),
        jnp.asarray([ids], jnp.int32), eng_m3.kv)
    assert np.abs(np.asarray(got_scaled) - np.asarray(ref)).max() > 1e-2
