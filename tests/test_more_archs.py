"""Command-R (Cohere) and Granite parity vs HF transformers
(reference builders: llm_build_command_r, llm_build_granite)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_cohere, convert_hf_llama

VOCAB = 96


def dummy_vocab(model="gpt2"):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    d = {"model": model, "tokens": tokens,
         "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1}
    if model == "llama":
        d["scores"] = [0.0] * VOCAB
    return d


def _greedy_check(eng, hf, prompt=(3, 17, 42, 9), n_steps=8, tie_tol=0.02):
    """Step-wise greedy comparison; near-ties (top-2 gap < tie_tol on a
    random tiny model) follow the reference's pick to keep paths aligned."""
    ids = list(prompt)
    eng.reset()
    logits = eng.prefill(list(prompt))
    for _ in range(n_steps):
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
        np.testing.assert_allclose(logits, ref, rtol=2e-2, atol=2e-2)
        t_ref = int(np.argmax(ref))
        gap = np.sort(ref)[-1] - np.sort(ref)[-2]
        if gap > tie_tol:
            assert int(np.argmax(logits)) == t_ref
        ids.append(t_ref)
        logits = eng.decode_one(t_ref)


def test_cohere_command_r(tmp_path):
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(0)
    hf = CohereForCausalLM(
        CohereConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, logit_scale=0.25,
            tie_word_embeddings=True, use_qk_norm=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-cmdr-f32.gguf")
    convert_hf_cohere(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.parallel_residual and eng.cfg.logit_scale == 0.25

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_granite(tmp_path):
    from transformers import GraniteConfig, GraniteForCausalLM

    torch.manual_seed(1)
    hf = GraniteForCausalLM(
        GraniteConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128,
            embedding_multiplier=2.0, attention_multiplier=0.1,
            residual_multiplier=0.5, logits_scaling=4.0,
            tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-granite-f32.gguf")
    convert_hf_llama(
        hf, dummy_vocab("llama"), path, quant_type=GGMLType.F32, arch="granite",
        extra_kv={
            "granite.embedding_scale": 2.0,
            "granite.attention.scale": 0.1,
            "granite.residual_scale": 0.5,
            "granite.logit_scale": 4.0,
        },
    )
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.residual_scale == 0.5 and eng.cfg.logit_scale == 0.25

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_olmo2(tmp_path):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_olmo2

    torch.manual_seed(2)
    hf = Olmo2ForCausalLM(
        Olmo2Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-olmo2-f32.gguf")
    convert_hf_olmo2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert not eng.cfg.pre_norm and eng.cfg.qk_norm_full

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_qwen2moe(tmp_path):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(3)
    hf = Qwen2MoeForCausalLM(
        Qwen2MoeConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            moe_intermediate_size=48, shared_expert_intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
            decoder_sparse_step=1, max_position_embeddings=128,
            tie_word_embeddings=False, mlp_only_layers=[],
        )
    ).eval()
    path = str(tmp_path / "tiny-qwen2moe-f32.gguf")
    convert_hf_llama(hf, dummy_vocab("llama"), path, quant_type=GGMLType.F32, arch="qwen2moe")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    # loader fuses the shared expert's gate|up when shapes allow
    assert ("shexp_gateup_fused" in eng.params["layers"]
            or "shexp_gate" in eng.params["layers"])
    assert not eng.cfg.expert_weights_norm

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_gemma2(tmp_path):
    """Validates iSWA alternation, attn/final softcaps, (1+w) norms,
    pre+post norm pairs (reference: llm_build_gemma2_iswa)."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma

    torch.manual_seed(4)
    hf = Gemma2ForCausalLM(
        Gemma2Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            max_position_embeddings=128, tie_word_embeddings=True,
            layer_types=["sliding_attention", "full_attention"] * 2,
        )
    ).eval()
    path = str(tmp_path / "tiny-gemma2-f32.gguf")
    convert_hf_gemma(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="gemma2")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.swa_layers == (True, False, True, False)
    assert eng.cfg.attn_logit_softcap == 50.0

    ids = [3, 17, 42, 9, 88, 5, 63, 21, 40, 6, 28, 13]  # > window
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)
    _greedy_check(eng, hf)


def test_gemma3(tmp_path):
    """Validates dual rope bases (local vs global), qk-norm, 5:1 iSWA
    (reference: llm_build_gemma3_iswa)."""
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma

    torch.manual_seed(5)
    hf = Gemma3ForCausalLM(
        Gemma3TextConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            max_position_embeddings=128, tie_word_embeddings=True,
            rope_scaling=None,
        )
    ).eval()
    path = str(tmp_path / "tiny-gemma3-f32.gguf")
    convert_hf_gemma(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="gemma3")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.rope_local_base == 10000.0
    assert eng.cfg.qk_norm
    assert eng.cfg.swa_layers == (True,) * 5 + (False,)

    ids = [3, 17, 42, 9, 88, 5, 63, 21, 40, 6, 28, 13]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)
    _greedy_check(eng, hf)


def test_qwen2(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(6)
    hf = Qwen2ForCausalLM(
        Qwen2Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-qwen2-f32.gguf")
    convert_hf_llama(hf, dummy_vocab("llama"), path, quant_type=GGMLType.F32, arch="qwen2")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert not eng.cfg.rope_interleaved

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_qwen3(tmp_path):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(7)
    hf = Qwen3ForCausalLM(
        Qwen3Config(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-qwen3-f32.gguf")
    convert_hf_llama(hf, dummy_vocab("llama"), path, quant_type=GGMLType.F32, arch="qwen3")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.qk_norm

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_qwen3_moe(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(8)
    hf = Qwen3MoeForCausalLM(
        Qwen3MoeConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            moe_intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
            decoder_sparse_step=1, mlp_only_layers=[],
            max_position_embeddings=128, tie_word_embeddings=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-qwen3moe-f32.gguf")
    convert_hf_llama(hf, dummy_vocab("llama"), path, quant_type=GGMLType.F32, arch="qwen3moe")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.qk_norm and eng.cfg.expert_weights_norm

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
    _greedy_check(eng, hf)


def test_minicpm(tmp_path):
    """MiniCPM rides the verified granite mechanics (reference:
    LLM_ARCH_MINICPM → llm_build_granite): same weights converted under
    both archs with equivalent scale keys must produce identical logits."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_minicpm

    torch.manual_seed(3)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
    ).eval()
    # minicpm: scale_emb=12, scale_depth=1.4, dim_model_base=32
    p_m = str(tmp_path / "tiny-minicpm-f32.gguf")
    convert_hf_minicpm(hf, dummy_vocab(), p_m, quant_type=GGMLType.F32,
                       scale_emb=12.0, scale_depth=1.4, dim_model_base=32.0)
    eng_m = Engine.from_gguf(p_m, max_seq=32, dtype=jnp.float32)
    assert eng_m.cfg.embedding_scale == 12.0
    assert abs(eng_m.cfg.residual_scale - 1.4 / 2.0) < 1e-6  # 1.4/sqrt(4)
    assert abs(eng_m.cfg.logit_scale - 0.5) < 1e-6  # 1/(64/32)

    p_g = str(tmp_path / "tiny-minicpm-as-granite.gguf")
    convert_hf_llama(
        hf, dummy_vocab(), p_g, quant_type=GGMLType.F32, arch="granite",
        extra_kv={
            "granite.embedding_scale": 12.0,
            "granite.residual_scale": 1.4 / 2.0,
            "granite.logit_scale": 2.0,
        },
    )
    eng_g = Engine.from_gguf(p_g, max_seq=32, dtype=jnp.float32)

    ids = [3, 17, 42, 9, 88]
    from llama_cpp_gfx906_tpu.models.llama import forward

    got_m, _ = forward(eng_m.params, eng_m.cfg, jnp.asarray([ids], jnp.int32), eng_m.kv)
    got_g, _ = forward(eng_g.params, eng_g.cfg, jnp.asarray([ids], jnp.int32), eng_g.kv)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(got_g), rtol=1e-6, atol=1e-6)

    # the scales must actually bite: plain-llama conversion differs
    p_l = str(tmp_path / "tiny-minicpm-as-llama.gguf")
    convert_hf_llama(hf, dummy_vocab(), p_l, quant_type=GGMLType.F32)
    eng_l = Engine.from_gguf(p_l, max_seq=32, dtype=jnp.float32)
    got_l, _ = forward(eng_l.params, eng_l.cfg, jnp.asarray([ids], jnp.int32), eng_l.kv)
    assert np.abs(np.asarray(got_m) - np.asarray(got_l)).max() > 1e-2
