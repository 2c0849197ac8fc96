"""Arch wave 4 parity vs HF transformers: starcoder2, nemotron (layernorm1p),
exaone4 (post-norm-only), arcee (relu² FFN), xverse (llama alias).
Reference builders: llm_build_starcoder2 :10880, llm_build_nemotron :13923,
llm_build_exaone4 :14184, llm_build_arcee :17039."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import (
    convert_hf_exaone4,
    convert_hf_llama,
    convert_hf_nemotron,
    convert_hf_starcoder2,
)

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


def _check(path, hf, arch, ids=(3, 17, 42, 9, 88), rtol=3e-3):
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.arch == arch
    ids = list(ids)
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=rtol, atol=rtol)
    return eng


def test_starcoder2(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    torch.manual_seed(20)
    hf = Starcoder2ForCausalLM(Starcoder2Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-sc2.gguf")
    convert_hf_starcoder2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check(path, hf, "starcoder2")
    assert eng.cfg.norm_type == "layer" and not eng.cfg.ffn_gated


def test_nemotron(tmp_path):
    from transformers import NemotronConfig, NemotronForCausalLM

    torch.manual_seed(21)
    hf = NemotronForCausalLM(NemotronConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-nemotron.gguf")
    convert_hf_nemotron(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check(path, hf, "nemotron")
    assert eng.cfg.act_fn == "relu2" and eng.cfg.rope_dim == 4


def test_exaone4(tmp_path):
    from transformers import Exaone4Config, Exaone4ForCausalLM

    torch.manual_seed(22)
    hf = Exaone4ForCausalLM(Exaone4Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-exaone4.gguf")
    convert_hf_exaone4(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check(path, hf, "exaone4")
    assert not eng.cfg.pre_norm and eng.cfg.post_attn_norm and eng.cfg.qk_norm


def test_arcee(tmp_path):
    from transformers import ArceeConfig, ArceeForCausalLM

    torch.manual_seed(23)
    hf = ArceeForCausalLM(ArceeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-arcee.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="arcee")
    eng = _check(path, hf, "arcee")
    assert eng.cfg.act_fn == "relu2" and not eng.cfg.ffn_gated


def test_xverse_llama_alias(tmp_path):
    """xverse is the llama graph verbatim — same weights under both archs
    must match exactly (llm_build_xverse = llama minus rope_factors)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(24)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-xverse.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="xverse")
    _check(path, hf, "xverse")


def _moe_lead_check(hf, arch, tmp_path, name):
    from llama_cpp_gfx906_tpu.models.moe_lead import forward
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_moe_lead

    path = str(tmp_path / name)
    convert_hf_moe_lead(hf, dummy_vocab(), path, arch=arch, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "moe_lead"
    assert eng.cfg.n_layer_dense_lead == 1 and eng.cfg.expert_gating_func == 2
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)
    # decode continuity through the two-scan KV layout
    logits = eng.prefill(ids)
    t0 = int(np.argmax(logits))
    with torch.no_grad():
        ref2 = hf(torch.tensor([ids + [t0]])).logits[0, -1].float().numpy()
    got2 = eng.decode_one(t0)
    np.testing.assert_allclose(got2, ref2, rtol=4e-3, atol=4e-3)


def test_glm4moe(tmp_path):
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(25)
    hf = Glm4MoeForCausalLM(Glm4MoeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, n_routed_experts=4,
        n_shared_experts=1, num_experts_per_tok=2, first_k_dense_replace=1,
        num_nextn_predict_layers=0, norm_topk_prob=True,
        routed_scaling_factor=1.5, use_qk_norm=True, attention_bias=False,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    _moe_lead_check(hf, "glm4moe", tmp_path, "tiny-glm4moe.gguf")


def test_dots1(tmp_path):
    from transformers import Dots1Config, Dots1ForCausalLM

    torch.manual_seed(26)
    hf = Dots1ForCausalLM(Dots1Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.0, max_position_embeddings=128,
        tie_word_embeddings=False,
    )).eval()
    _moe_lead_check(hf, "dots1", tmp_path, "tiny-dots1.gguf")


def test_hunyuan_moe(tmp_path):
    """Post-rope qk norms + softmax-routed MoE with shared expert
    (reference llm_build_hunyuan_moe)."""
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_hunyuan

    torch.manual_seed(27)
    hf = HunYuanMoEV1ForCausalLM(HunYuanMoEV1Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, moe_topk=2, num_experts=4, max_position_embeddings=128,
        tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-hunyuan.gguf")
    convert_hf_hunyuan(hf, dummy_vocab(), path, arch="hunyuan-moe",
                       quant_type=GGMLType.F32)
    eng = _check(path, hf, "hunyuan-moe", rtol=4e-3)
    assert eng.cfg.qk_norm_after_rope and eng.cfg.n_experts == 4


def test_hunyuan_dense(tmp_path):
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_hunyuan

    torch.manual_seed(28)
    hf = HunYuanDenseV1ForCausalLM(HunYuanDenseV1Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-hunyuan-d.gguf")
    convert_hf_hunyuan(hf, dummy_vocab(), path, arch="hunyuan-dense",
                       quant_type=GGMLType.F32)
    _check(path, hf, "hunyuan-dense")


def test_mpt_alibi(tmp_path):
    """MPT: ALiBi positional bias + fused Wqkv split + bias-free LayerNorms
    (reference llm_build_mpt)."""
    from transformers import MptConfig, MptForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_mpt

    torch.manual_seed(32)
    hf = MptForCausalLM(MptConfig(
        vocab_size=VOCAB, d_model=32, n_heads=4, n_layers=2,
        expansion_ratio=2, max_seq_len=64,
    )).eval()
    path = str(tmp_path / "tiny-mpt.gguf")
    convert_hf_mpt(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check(path, hf, "mpt")
    assert eng.cfg.alibi and eng.cfg.pos_emb == "none"
    # decode continuity (ALiBi distances via absolute positions)
    ids = [3, 17, 42]
    eng.reset()
    logits = eng.prefill(ids)
    t0 = int(np.argmax(logits))
    with torch.no_grad():
        ref2 = hf(torch.tensor([ids + [t0]])).logits[0, -1].float().numpy()
    np.testing.assert_allclose(eng.decode_one(t0), ref2, rtol=3e-3, atol=3e-3)


def test_bloom_alibi(tmp_path):
    """Bloom: ALiBi + per-head-interleaved qkv de-interleave + embedding
    LayerNorm (reference llm_build_bloom)."""
    from transformers import BloomConfig, BloomForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_bloom

    torch.manual_seed(33)
    hf = BloomForCausalLM(BloomConfig(
        vocab_size=VOCAB, hidden_size=32, n_head=4, n_layer=2,
    )).eval()
    path = str(tmp_path / "tiny-bloom.gguf")
    convert_hf_bloom(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check(path, hf, "bloom")
    assert eng.cfg.alibi and "tok_norm" in eng.params
