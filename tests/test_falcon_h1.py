"""Falcon-H1 hybrid (parallel attention + mamba2) parity (reference:
llm_build_falcon_h1, src/llama-model.cpp:16600)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_falcon_h1

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


def _make_hf(**over):
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(0)
    kw = dict(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        mamba_d_ssm=64,
        mamba_n_heads=4,
        mamba_d_head=16,
        mamba_n_groups=1,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_rms_norm=True,
        mamba_norm_before_gate=False,
        mamba_chunk_size=8,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    kw.update(over)
    return FalconH1ForCausalLM(FalconH1Config(**kw)).eval()


@pytest.fixture(scope="module")
def h1_pair(tmp_path_factory):
    # non-trivial MuP multipliers: the converter must bake every one
    hf = _make_hf(
        embedding_multiplier=1.5,
        lm_head_multiplier=0.75,
        attention_in_multiplier=1.25,
        attention_out_multiplier=0.8,
        key_multiplier=0.5,
        ssm_in_multiplier=1.1,
        ssm_out_multiplier=0.9,
        mlp_multipliers=[1.2, 0.7],
        ssm_multipliers=[0.9, 1.1, 1.3, 0.6, 1.4],
    )
    path = str(tmp_path_factory.mktemp("falconh1") / "tiny-falcon-h1-f32.gguf")
    convert_hf_falcon_h1(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_falcon_h1_logits_parity(h1_pair):
    path, hf = h1_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "falcon-h1"
    assert eng.cfg.ssm_dt_rank == 4 and eng.cfg.head_dim == 8
    ids = [3, 17, 42, 9, 88, 5, 63, 21]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.falcon_h1 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_falcon_h1_greedy_decode(h1_pair):
    """Incremental decode through BOTH memories (KV rows + SSD state) must
    equal HF full re-forward."""
    path, hf = h1_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    n_steps = 10
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


def test_falcon_h1_no_mamba_norm(tmp_path):
    """mamba_rms_norm=False checkpoints ship no ssm_norm tensor; the graph
    must skip the grouped norm (optional in the reference too)."""
    hf = _make_hf(mamba_rms_norm=False)
    path = str(tmp_path / "tiny-h1-nonorm.gguf")
    convert_hf_falcon_h1(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert "ssm_norm" not in eng.params["layers"]
    ids = [3, 17, 42, 9]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.falcon_h1 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_falcon_h1_padding_state_clean(h1_pair):
    """Bucket padding must leave both memory kinds identical."""
    path, _ = h1_pair
    from llama_cpp_gfx906_tpu.models.falcon_h1 import FalconH1State, forward

    eng = Engine.from_gguf(path, max_seq=16, dtype=jnp.float32)

    s0 = FalconH1State.create(eng.cfg, 1, 16, jnp.float32)
    _, st_a = forward(eng.params, eng.cfg, jnp.asarray([[5, 6, 7]], jnp.int32),
                      s0, jnp.asarray([3], jnp.int32))

    s0 = FalconH1State.create(eng.cfg, 1, 16, jnp.float32)
    _, st_b = forward(eng.params, eng.cfg, jnp.asarray([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32),
                      s0, jnp.asarray([3], jnp.int32))

    np.testing.assert_allclose(np.asarray(st_a.ssm), np.asarray(st_b.ssm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.conv), np.asarray(st_b.conv), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.k[:, :, :3]), np.asarray(st_b.k[:, :, :3]),
                               rtol=1e-5, atol=1e-6)


def test_granitehybrid(tmp_path):
    """Granite 4.0 hybrid: interleaved mamba2/attention (recurrent layers
    marked by per-layer head_count_kv=0), granite multipliers, fused
    shared-MLP split (reference llm_build_granite_hybrid)."""
    from transformers import GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_granitehybrid

    torch.manual_seed(30)
    hf = GraniteMoeHybridForCausalLM(GraniteMoeHybridConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["mamba", "attention", "mamba"],
        mamba_n_heads=4, mamba_d_head=16, mamba_n_groups=1, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2, shared_intermediate_size=48,
        num_local_experts=0, num_experts_per_tok=0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-granitehybrid.gguf")
    convert_hf_granitehybrid(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "granitehybrid"
    assert eng.cfg.pos_emb == "none" and eng.cfg.residual_scale == 0.5
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.granite_hybrid import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)

    # greedy decode continuity through both memory kinds
    prompt = [3, 17, 42, 9]
    ids2 = list(prompt)
    with torch.no_grad():
        for _ in range(6):
            lg = hf(torch.tensor([ids2])).logits[0, -1]
            ids2.append(int(torch.argmax(lg)))
    logits = eng.prefill(prompt)
    got_toks = []
    for _ in range(6):
        tok = int(np.argmax(logits))
        got_toks.append(tok)
        logits = eng.decode_one(tok)
    assert got_toks == ids2[len(prompt):]


def test_bamba(tmp_path):
    """Bamba: granitehybrid layout with layers_block_type scheduling and a
    plain llama MLP under feed_forward.* (reference: BambaForCausalLM
    registered on GraniteHybridModel, convert_hf_to_gguf.py:7435)."""
    from transformers import BambaConfig, BambaForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_granitehybrid

    torch.manual_seed(31)
    hf = BambaForCausalLM(BambaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_indices=[1],
        mamba_n_heads=4, mamba_d_head=16, mamba_n_groups=1, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-bamba.gguf")
    convert_hf_granitehybrid(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "granitehybrid"
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.granite_hybrid import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_granitemoeshared(tmp_path):
    """granitemoeshared: granitemoe + fused shared-expert MLP
    (GraniteMoeModel shared_mlp branches, convert_hf_to_gguf.py:7381)."""
    from transformers import (GraniteMoeSharedConfig,
                              GraniteMoeSharedForCausalLM)

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_granitemoe

    torch.manual_seed(32)
    hf = GraniteMoeSharedForCausalLM(GraniteMoeSharedConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=48,
        shared_intermediate_size=40, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-gms.gguf")
    convert_hf_granitemoe(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    got, _ = eng.family.forward(eng.params, eng.cfg,
                                jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)
