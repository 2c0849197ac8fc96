"""Architecture wave 2 parity vs HF transformers (reference builders:
llm_build_olmoe, llm_build_glm4, llm_build_dbrx, llm_build_cohere2_iswa,
llm_build_smollm3, llm_build_llama_iswa (llama4), llm_build_granite MoE,
llm_build_ernie4_5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import (
    convert_hf_cohere2,
    convert_hf_dbrx,
    convert_hf_glm4,
    convert_hf_granitemoe,
    convert_hf_llama,
    convert_hf_llama4,
)

VOCAB = 96


def dummy_vocab(model="gpt2"):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    d = {"model": model, "tokens": tokens,
         "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1}
    if model == "llama":
        d["scores"] = [0.0] * VOCAB
    return d


def _parity(eng, hf, prompt=(3, 17, 42, 9, 88), tol=3e-3, n_greedy=6, tie_tol=0.02):
    ids = list(prompt)
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=tol, atol=tol)
    # greedy walk through decode path
    eng.reset()
    logits = eng.prefill(ids)
    for _ in range(n_greedy):
        with torch.no_grad():
            r = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
        np.testing.assert_allclose(logits, r, rtol=2e-2, atol=2e-2)
        t = int(np.argmax(r))
        gap = np.sort(r)[-1] - np.sort(r)[-2]
        if gap > tie_tol:
            assert int(np.argmax(logits)) == t
        ids.append(t)
        logits = eng.decode_one(t)


def test_olmoe(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    torch.manual_seed(0)
    hf = OlmoeForCausalLM(OlmoeConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "olmoe.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="olmoe")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.qk_norm_full and not eng.cfg.rope_interleaved
    _parity(eng, hf)


def test_glm4(tmp_path):
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(1)
    hf = Glm4ForCausalLM(Glm4Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, pad_token_id=0, max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "glm4.gguf")
    convert_hf_glm4(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.post_attn_norm and eng.cfg.post_ffn_norm
    assert eng.cfg.rope_dim == 8  # partial rotary
    _parity(eng, hf)


def test_dbrx(tmp_path):
    from transformers import DbrxConfig, DbrxForCausalLM

    torch.manual_seed(2)
    hf = DbrxForCausalLM(DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=VOCAB,
        attn_config={"kv_n_heads": 2, "clip_qkv": 6.0, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4, "moe_top_k": 2},
    )).eval()
    path = str(tmp_path / "dbrx.gguf")
    convert_hf_dbrx(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.clamp_kqv == 6.0 and eng.cfg.norm_type == "layer"
    _parity(eng, hf)


def test_cohere2(tmp_path):
    from transformers import Cohere2Config, Cohere2ForCausalLM

    torch.manual_seed(3)
    hf = Cohere2ForCausalLM(Cohere2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8, sliding_window_pattern=4, logit_scale=0.25,
        max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "cohere2.gguf")
    convert_hf_cohere2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.rope_swa_only and eng.cfg.sliding_window == 8
    # prompt longer than the window exercises both layer kinds
    _parity(eng, hf, prompt=(3, 17, 42, 9, 88, 5, 61, 33, 70, 12, 44, 2), tol=5e-3)


def test_smollm3(tmp_path):
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    torch.manual_seed(4)
    hf = SmolLM3ForCausalLM(SmolLM3Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        pad_token_id=0, max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "smollm3.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="smollm3")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.nope_interval == 4
    assert eng.cfg.rope_layers == (True, True, True, False) * 2
    _parity(eng, hf)


def test_llama4(tmp_path):
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(5)
    hf = Llama4ForCausalLM(Llama4TextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2,
        use_qk_norm=True, attn_temperature_tuning=True,
        attention_chunk_size=4096, max_position_embeddings=256,
        pad_token_id=0,
    )).eval()
    path = str(tmp_path / "llama4.gguf")
    convert_hf_llama4(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.moe_scale_input and eng.cfg.qk_norm_l2
    assert eng.cfg.rope_layers == (True, True, True, False)
    _parity(eng, hf, tol=5e-3)


def test_granitemoe(tmp_path):
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    torch.manual_seed(6)
    hf = GraniteMoeForCausalLM(GraniteMoeConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, logits_scaling=4.0,
        residual_multiplier=0.5, attention_multiplier=0.1,
        max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "granitemoe.gguf")
    convert_hf_granitemoe(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    assert eng.cfg.embedding_scale == 2.0 and abs(eng.cfg.attn_scale - 0.1) < 1e-6
    _parity(eng, hf)


def test_ernie4_5(tmp_path):
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    torch.manual_seed(7)
    hf = Ernie4_5ForCausalLM(Ernie4_5Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, pad_token_id=0, max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "ernie.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32, arch="ernie4_5")
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    _parity(eng, hf, tol=8e-3)
