"""Arch wave 5c parity: bitnet (sub-norms + per-tensor weight scales) and
chameleon (per-head LayerNorm qk norms, swin variant)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine

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


def _check_hf(path, hf, arch, ids=(3, 17, 42, 9, 88), rtol=3e-3):
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.arch == arch
    ids = list(ids)
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=rtol, atol=rtol)
    return eng


def test_bitnet(tmp_path):
    """bitnet: attn/ffn sub-norms before the out/down projections + relu²
    (llm_build_bitnet, src/llama-model.cpp:12954; HF semantics carried via
    the activation key)."""
    from transformers import BitNetConfig, BitNetForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_bitnet

    torch.manual_seed(80)
    hf = BitNetForCausalLM(BitNetConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-bitnet.gguf")
    convert_hf_bitnet(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "bitnet")
    assert eng.cfg.act_fn == "relu2" and not eng.cfg.rope_interleaved


def test_bitnet_weight_scales(tmp_path):
    """Per-tensor .scale tensors multiply back into the projections (the
    TQ-quantized GGUF layout): halved weights + scale 2.0 must reproduce
    the unscaled logits."""
    from transformers import BitNetConfig, BitNetForCausalLM

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_bitnet

    torch.manual_seed(81)
    hf = BitNetForCausalLM(BitNetConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )).eval()
    base = str(tmp_path / "bitnet-base.gguf")
    convert_hf_bitnet(hf, dummy_vocab(), base, quant_type=GGMLType.F32)

    # rewrite: halve the scaled projections, add .scale = 2.0 tensors
    r = GGUFReader(base)
    scaled = str(tmp_path / "bitnet-scaled.gguf")
    w = GGUFWriter(scaled, "bitnet")
    for key, val in r.metadata.items():
        if key == "general.architecture":
            continue  # GGUFWriter writes it
        w.add_kv(key, val)
    scale_targets = ("attn_q.weight", "attn_k.weight", "attn_v.weight",
                     "attn_output.weight", "ffn_gate.weight",
                     "ffn_up.weight", "ffn_down.weight")
    for name, t in r.tensors.items():
        arr = t.to_f32()
        if any(name.endswith(s) for s in scale_targets) and name.startswith("blk."):
            w.add_tensor(name, arr * 0.5, GGMLType.F32)
            w.add_tensor(name.replace(".weight", ".scale"),
                         np.asarray([2.0], np.float32), GGMLType.F32)
        else:
            w.add_tensor(name, arr, GGMLType.F32)
    w.write()

    ids = [3, 17, 42, 9, 88]
    from llama_cpp_gfx906_tpu.models.llama import forward

    e1 = Engine.from_gguf(base, max_seq=64, dtype=jnp.float32)
    e2 = Engine.from_gguf(scaled, max_seq=64, dtype=jnp.float32)
    l1, _ = forward(e1.params, e1.cfg, jnp.asarray([ids], jnp.int32), e1.kv)
    l2, _ = forward(e2.params, e2.cfg, jnp.asarray([ids], jnp.int32), e2.kv)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)


def test_chameleon(tmp_path):
    """chameleon (7B layout): per-head LayerNorm q/k norms with bias,
    NORM rope (llm_build_chameleon, src/llama-model.cpp:15505)."""
    chameleon = pytest.importorskip("transformers.models.chameleon")
    from transformers.models.chameleon.configuration_chameleon import (
        ChameleonConfig, ChameleonVQVAEConfig)
    from transformers.models.chameleon.modeling_chameleon import (
        ChameleonForConditionalGeneration)

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_chameleon

    torch.manual_seed(82)
    hf = ChameleonForConditionalGeneration(ChameleonConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        swin_norm=False, vocabulary_map={}, vq_config=ChameleonVQVAEConfig(
        embed_dim=32, num_embeddings=16, base_channels=32,
        channel_multiplier=[1, 1], num_res_blocks=1, resolution=32,
        latent_channels=32).to_dict(),
    )).eval()
    # randomize the qk-norm affines (init is ones/zeros — keep the test sharp)
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.self_attn.q_norm.weight.add_(torch.randn_like(layer.self_attn.q_norm.weight) * 0.1)
            layer.self_attn.q_norm.bias.add_(torch.randn_like(layer.self_attn.q_norm.bias) * 0.1)
            layer.self_attn.k_norm.weight.add_(torch.randn_like(layer.self_attn.k_norm.weight) * 0.1)
            layer.self_attn.k_norm.bias.add_(torch.randn_like(layer.self_attn.k_norm.bias) * 0.1)
    path = str(tmp_path / "tiny-chameleon.gguf")
    convert_hf_chameleon(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "chameleon")
    assert eng.cfg.qk_norm_layer and eng.cfg.rope_interleaved


def test_chameleon_swin(tmp_path):
    """chameleon 30B 'swin' layout: norms on the branch outputs
    (post-norm; hparams.swin_norm branch of llm_build_chameleon)."""
    chameleon = pytest.importorskip("transformers.models.chameleon")
    from transformers.models.chameleon.configuration_chameleon import (
        ChameleonConfig, ChameleonVQVAEConfig)
    from transformers.models.chameleon.modeling_chameleon import (
        ChameleonForConditionalGeneration)

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_chameleon

    torch.manual_seed(83)
    hf = ChameleonForConditionalGeneration(ChameleonConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        swin_norm=True, vocabulary_map={}, vq_config=ChameleonVQVAEConfig(
        embed_dim=32, num_embeddings=16, base_channels=32,
        channel_multiplier=[1, 1], num_res_blocks=1, resolution=32,
        latent_channels=32).to_dict(),
    )).eval()
    path = str(tmp_path / "tiny-chameleon-swin.gguf")
    convert_hf_chameleon(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "chameleon")
    assert not eng.cfg.pre_norm and eng.cfg.post_attn_norm
