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


def test_openelm_ragged_oracle(tmp_path):
    """openelm: per-layer head counts and FFN widths, fused per-layer qkv,
    per-head q/k rms norms, NEOX rope — oracle transcribed from
    llm_build_openelm (src/llama-model.cpp:12116).  The engine zero-pads
    ragged layers to a uniform scan layout; parity must be exact."""
    import torch.nn as nn
    import torch.nn.functional as Fn

    from llama_cpp_gfx906_tpu.gguf.constants import Keys
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter

    D, Dh, L = 32, 8, 2
    heads = [2, 4]
    kvs = [1, 2]
    ffs = [48, 64]
    rng = np.random.default_rng(90)

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + eps) * w

    def rope_neox(x, pos, dim, base=10000.0):
        half = dim // 2
        inv = 1.0 / (base ** (torch.arange(half, dtype=torch.float32) / half))
        ang = pos.float()[:, None] * inv[None, :]
        cos, sin = ang.cos()[:, None, :], ang.sin()[:, None, :]
        x1, x2 = x[..., :half], x[..., half:dim]
        return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)

    def mk(out_d, in_d):
        return torch.tensor(rng.standard_normal((out_d, in_d)) * 0.08).float()

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for il in range(L):
        nh, nkv, F = heads[il], kvs[il], ffs[il]
        layers.append({
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "qkv": mk((nh + 2 * nkv) * Dh, D),
            "qn": torch.tensor(1 + rng.standard_normal(Dh) * 0.1).float(),
            "kn": torch.tensor(1 + rng.standard_normal(Dh) * 0.1).float(),
            "o": mk(D, nh * Dh),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "g": mk(F, D), "u": mk(F, D), "d": mk(D, F),
        })
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk(VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for il, m in enumerate(layers):
            nh, nkv = heads[il], kvs[il]
            h = rms(x, m["an"])
            qkv = (h @ m["qkv"].T).reshape(T, nh + 2 * nkv, Dh)
            q, k, v = qkv[:, :nh], qkv[:, nh:nh + nkv], qkv[:, nh + nkv:]
            q = rope_neox(rms(q, m["qn"]), pos, Dh)
            k = rope_neox(rms(k, m["kn"]), pos, Dh)
            G = nh // nkv
            kk = k.repeat_interleave(G, dim=1)
            vv = v.repeat_interleave(G, dim=1)
            scores = torch.einsum("thd,shd->hts", q, kk) * Dh ** -0.5
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            scores = scores.masked_fill(~mask, float("-inf"))
            attn = torch.einsum("hts,shd->thd", scores.softmax(-1), vv)
            x = x + attn.reshape(T, nh * Dh) @ m["o"].T
            hh = rms(x, m["fn"])
            x = x + (Fn.silu(hh @ m["g"].T) * (hh @ m["u"].T)) @ m["d"].T
        ref = (rms(x, onorm) @ head.T).numpy()

    path = str(tmp_path / "tiny-openelm.gguf")
    w = GGUFWriter(path, "openelm")
    w.add_string(Keys.General.NAME, "openelm-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_array(Keys.LLM.FEED_FORWARD_LENGTH, np.asarray(ffs, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT, np.asarray(heads, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(kvs, np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _write_vocab_w(w)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    for il, m in enumerate(layers):
        b = f"blk.{il}."
        w.add_tensor(b + "attn_norm.weight", m["an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_qkv.weight", m["qkv"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_q_norm.weight", m["qn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_k_norm.weight", m["kn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", m["o"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", m["fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_gate.weight", m["g"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_up.weight", m["u"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_down.weight", m["d"].numpy(), GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.numpy(), GGMLType.F32)
    w.write()

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.n_heads == 4 and eng.cfg.n_kv_heads == 2 and eng.cfg.n_ff == 64
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def _write_vocab_w(w):
    from llama_cpp_gfx906_tpu.gguf.constants import Keys

    tv = dummy_vocab()
    w.add_string(Keys.Tokenizer.MODEL, tv["model"])
    w.add_array(Keys.Tokenizer.LIST, tv["tokens"])
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.asarray(tv["token_types"], np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, tv["bos"])
    w.add_uint32(Keys.Tokenizer.EOS_ID, tv["eos"])


def test_deci_ragged_oracle(tmp_path):
    """deci / NAS llama: per-layer GQA ratios (loaded as MHA via exact K/V
    replication), attention-free layers, linear-attention layers, ragged
    FFN widths — oracle from llm_build_deci (src/llama-model.cpp:6308)."""
    import torch.nn.functional as Fn

    from llama_cpp_gfx906_tpu.gguf.constants import Keys
    from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter

    D, Dh, L = 32, 8, 4
    heads = [4, 4, 0, 4]   # L2 attention-free
    kvs = [2, 1, 0, 0]     # varying ratios; L3 linear attention
    ffs = [64, 48, 64, 64]
    rng = np.random.default_rng(91)

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + eps) * w

    def rope_interleaved(x, pos, dim, base=10000.0):
        half = dim // 2
        inv = 1.0 / (base ** (torch.arange(half, dtype=torch.float32) / half))
        ang = pos.float()[:, None] * inv[None, :]
        cos, sin = ang.cos()[:, None, :], ang.sin()[:, None, :]
        xr = x.reshape(*x.shape[:-1], half, 2)
        x1, x2 = xr[..., 0], xr[..., 1]
        return torch.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1).reshape(x.shape)

    def mk(out_d, in_d):
        return torch.tensor(rng.standard_normal((out_d, in_d)) * 0.08).float()

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for il in range(L):
        nh, nkv, F = heads[il], kvs[il], ffs[il]
        m = {"fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
             "g": mk(F, D), "u": mk(F, D), "d": mk(D, F)}
        if nh > 0:
            m["an"] = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
            if nkv > 0:
                m["q"] = mk(nh * Dh, D)
                m["k"] = mk(nkv * Dh, D)
                m["v"] = mk(nkv * Dh, D)
                m["o"] = mk(D, nh * Dh)
            else:  # linear attention: lone wo (D, D)
                m["o"] = mk(D, D)
        layers.append(m)
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk(VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for il, m in enumerate(layers):
            nh, nkv = heads[il], kvs[il]
            if nh == 0:
                cur = x  # attention-free
                ffn_inp = cur
            else:
                h = rms(x, m["an"])
                if nkv == 0:  # linear attention
                    cur = h @ m["o"].T
                else:
                    q = rope_interleaved(
                        (h @ m["q"].T).reshape(T, nh, Dh), pos, Dh)
                    k = rope_interleaved(
                        (h @ m["k"].T).reshape(T, nkv, Dh), pos, Dh)
                    v = (h @ m["v"].T).reshape(T, nkv, Dh)
                    G = nh // nkv
                    kk = k.repeat_interleave(G, dim=1)
                    vv = v.repeat_interleave(G, dim=1)
                    scores = torch.einsum("thd,shd->hts", q, kk) * Dh ** -0.5
                    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
                    scores = scores.masked_fill(~mask, float("-inf"))
                    attn = torch.einsum("hts,shd->thd", scores.softmax(-1), vv)
                    cur = attn.reshape(T, nh * Dh) @ m["o"].T
                ffn_inp = cur + x
            hh = rms(ffn_inp, m["fn"])
            x = ffn_inp + (Fn.silu(hh @ m["g"].T) * (hh @ m["u"].T)) @ m["d"].T
        ref = (rms(x, onorm) @ head.T).numpy()

    path = str(tmp_path / "tiny-deci.gguf")
    w = GGUFWriter(path, "deci")
    w.add_string(Keys.General.NAME, "deci-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_array(Keys.LLM.FEED_FORWARD_LENGTH, np.asarray(ffs, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT, np.asarray(heads, np.uint32))
    w.add_array(Keys.Attention.HEAD_COUNT_KV, np.asarray(kvs, np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _write_vocab_w(w)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    for il, m in enumerate(layers):
        b = f"blk.{il}."
        for mk_, gg in (("an", "attn_norm.weight"), ("q", "attn_q.weight"),
                        ("k", "attn_k.weight"), ("v", "attn_v.weight"),
                        ("o", "attn_output.weight"), ("fn", "ffn_norm.weight"),
                        ("g", "ffn_gate.weight"), ("u", "ffn_up.weight"),
                        ("d", "ffn_down.weight")):
            if mk_ in m:
                w.add_tensor(b + gg, m[mk_].numpy(), GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.numpy(), GGMLType.F32)
    w.write()

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.kv_expand and eng.cfg.n_kv_heads == eng.cfg.n_heads
    assert eng.cfg.attn_linear_layers == (False, False, False, True)
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_lfm2_hybrid(tmp_path):
    """lfm2: gated shortconv layers interleaved with qk-normed attention
    (llm_build_lfm2, src/llama-model.cpp:17740).  HF parity incl. decode
    continuity through the conv state."""
    from transformers import Lfm2Config, Lfm2ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_lfm2

    torch.manual_seed(84)
    hf = Lfm2ForCausalLM(Lfm2Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False,
        block_ff_dim=64,
    )).eval()
    path = str(tmp_path / "tiny-lfm2.gguf")
    convert_hf_lfm2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "lfm2"
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.lfm2 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)
    # decode continuity: conv state must carry across steps
    logits = eng.prefill(ids)
    t0 = int(np.argmax(logits))
    with torch.no_grad():
        ref2 = hf(torch.tensor([ids + [t0]])).logits[0, -1].float().numpy()
    np.testing.assert_allclose(eng.decode_one(t0), ref2, rtol=4e-3, atol=4e-3)


def test_phimoe(tmp_path):
    """phimoe (phi-3.5-MoE): LayerNorms with bias + top-2 MoE + biased
    lm_head.  Routing follows the reference's plain normalized top-k
    (build_moe_ffn) — HF's sparsemixer is patched to the same rule so
    every other component checks against real HF code."""
    import torch.nn.functional as Fn
    from transformers.models.phimoe import modeling_phimoe as pm
    from transformers import PhimoeConfig, PhimoeForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_phimoe

    def plain_topk(scores, jitter_eps, training, top_k=2):
        probs = Fn.softmax(scores, dim=-1)
        topv, topi = torch.topk(probs, 2, dim=-1)
        topv = topv / topv.sum(-1, keepdim=True)
        # sparsemixer API returns per-expert (weights, selected) twice
        return (torch.cat([topv[:, :1], topv[:, 1:]], 1),
                torch.cat([topi[:, :1], topi[:, 1:]], 1))

    orig = pm.sparsemixer
    pm.sparsemixer = plain_topk
    try:
        torch.manual_seed(85)
        hf = PhimoeForCausalLM(PhimoeConfig(
            vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            attention_bias=True, lm_head_bias=True,
        )).eval()
        path = str(tmp_path / "tiny-phimoe.gguf")
        convert_hf_phimoe(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
        eng = _check_hf(path, hf, "phimoe", rtol=4e-3)
        assert eng.cfg.norm_type == "layer" and eng.cfg.n_experts == 4
    finally:
        pm.sparsemixer = orig
