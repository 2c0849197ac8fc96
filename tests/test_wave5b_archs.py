"""Arch wave 5b parity: ernie4_5-moe (HF), grok, arctic, smallthinker,
bailingmoe, plm (torch oracles transcribed from the cited reference
builders)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as Fn

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.gguf.constants import Keys
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


def _write_vocab(w):
    tv = dummy_vocab()
    w.add_string(Keys.Tokenizer.MODEL, tv["model"])
    w.add_array(Keys.Tokenizer.LIST, tv["tokens"])
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.asarray(tv["token_types"], np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, tv["bos"])
    w.add_uint32(Keys.Tokenizer.EOS_ID, tv["eos"])


def rms_t(x, w, eps=1e-5):
    return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + eps) * w


def rope_neox_t(x, pos, dim, base=10000.0):
    half = dim // 2
    inv = 1.0 / (base ** (torch.arange(half, dtype=torch.float32) / half))
    ang = pos.float()[:, None] * inv[None, :]
    cos, sin = ang.cos()[:, None, :], ang.sin()[:, None, :]
    x1, x2, rest = x[..., :half], x[..., half:dim], x[..., dim:]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos, rest], -1)


def rope_interleaved_t(x, pos, dim, base=10000.0):
    """ggml NORM rope: consecutive pairs (0,1),(2,3)… rotate together."""
    half = dim // 2
    inv = 1.0 / (base ** (torch.arange(half, dtype=torch.float32) / half))
    ang = pos.float()[:, None] * inv[None, :]
    cos, sin = ang.cos()[:, None, :], ang.sin()[:, None, :]
    xr = x[..., :dim].reshape(*x.shape[:-1], half, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    out = torch.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
    return torch.cat([out.reshape(*x.shape[:-1], dim), x[..., dim:]], -1)


def attn_t(q, k, v, scale):
    T, Hq, Dh = q.shape
    G = Hq // k.shape[1]
    k = k.repeat_interleave(G, dim=1)
    v = v.repeat_interleave(G, dim=1)
    scores = torch.einsum("thd,shd->hts", q, k) * scale
    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    scores = scores.masked_fill(~mask, float("-inf"))
    return torch.einsum("hts,shd->thd", scores.softmax(-1), v).reshape(T, Hq * Dh)


def moe_t(x, gate_w, gates, ups, downs, k, act, gate_x=None, norm=True,
          bias=None, softmax=True):
    """Routed MoE matching build_moe_ffn (llama-graph.cpp:776-1024)."""
    gx = gate_x if gate_x is not None else x
    logits = gx @ gate_w.T  # (T, E)
    probs = logits.softmax(-1) if softmax else torch.sigmoid(logits)
    sel = probs + bias if bias is not None else probs
    topv_sel, topi = torch.topk(sel, k, dim=-1)
    topv = torch.gather(probs, -1, topi)
    if norm:
        topv = topv / topv.sum(-1, keepdim=True).clamp_min(1e-9)
    out = torch.zeros_like(x)
    for t in range(x.shape[0]):
        for j in range(k):
            e = int(topi[t, j])
            g = act(gates[e](x[t]))
            out[t] += topv[t, j] * downs[e](g * ups[e](x[t]))
    return out


def mk_lin(rng, out_d, in_d):
    lin = torch.nn.Linear(in_d, out_d, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(rng.standard_normal((out_d, in_d)) * 0.08))
    return lin.float()


def _check(path, ref_logits, arch, ids, rtol=4e-3, forward=None):
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.arch == arch
    if forward is None:
        from llama_cpp_gfx906_tpu.models.llama import forward
    got, _ = forward(eng.params, eng.cfg, jnp.asarray([list(ids)], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref_logits, rtol=rtol, atol=rtol)
    return eng


def test_ernie45_moe(tmp_path):
    """ernie4_5-moe: dense lead + interval-1 MoE with probs-bias routing and
    shared experts (llm_build_ernie4_5_moe, src/llama-model.cpp:16430)."""
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_moe_lead

    torch.manual_seed(70)
    hf = Ernie4_5_MoeForCausalLM(Ernie4_5_MoeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, moe_num_experts=4, moe_k=2,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        max_position_embeddings=128, tie_word_embeddings=False,
        use_bias=False,
    )).eval()
    path = str(tmp_path / "tiny-ernie-moe.gguf")
    convert_hf_moe_lead(hf, dummy_vocab(), path, arch="ernie4_5-moe",
                        quant_type=GGMLType.F32, permute=True, gating_func=1)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "moe_lead"
    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.moe_lead import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)


def _moe_gguf_header(w, D, H, HKV, Dh, F, L, E, K, Fexp, extra=()):
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, HKV)
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, K)
    w.add_uint32(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, Fexp)
    for k, v in extra:
        w.add_kv(k, v)
    _write_vocab(w)


def test_grok_oracle(tmp_path):
    """grok: embedding×78.38…, kq_scale 1.0, GELU MoE, post-attention +
    post-ffn norms, logits×0.5773…  (llm_build_grok,
    src/llama-model.cpp:6821)."""
    D, H, HKV, Dh, F, L, E, K = 32, 4, 2, 8, 64, 2, 4, 2
    rng = np.random.default_rng(71)
    torch.manual_seed(71)

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for _ in range(L):
        layers.append({
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "q": mk_lin(rng, H * Dh, D), "k": mk_lin(rng, HKV * Dh, D),
            "v": mk_lin(rng, HKV * Dh, D), "o": mk_lin(rng, D, H * Dh),
            "post_an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "post_fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "gw": mk_lin(rng, E, D),
            "ge": [mk_lin(rng, F, D) for _ in range(E)],
            "ue": [mk_lin(rng, F, D) for _ in range(E)],
            "de": [mk_lin(rng, D, F) for _ in range(E)],
        })
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk_lin(rng, VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)] * 78.38367176906169
        T = len(ids)
        pos = torch.arange(T)
        gelu = lambda v: Fn.gelu(v, approximate="tanh")
        for m in layers:
            h = rms_t(x, m["an"])
            q = rope_neox_t(m["q"](h).reshape(T, H, Dh), pos, Dh)
            k = rope_neox_t(m["k"](h).reshape(T, HKV, Dh), pos, Dh)
            v = m["v"](h).reshape(T, HKV, Dh)
            attn = m["o"](attn_t(q, k, v, 1.0))
            x = x + rms_t(attn, m["post_an"])
            h = rms_t(x, m["fn"])
            mlp = moe_t(h, m["gw"].weight, m["ge"], m["ue"], m["de"], K, gelu)
            x = x + rms_t(mlp, m["post_fn"])
        ref = (head(rms_t(x, onorm)) * 0.5773502691896257).numpy()

    # GGUF with grok's tensor names (llama-arch.cpp grok table :381-401)
    path = str(tmp_path / "tiny-grok.gguf")
    w = GGUFWriter(path, "grok")
    w.add_string(Keys.General.NAME, "grok-oracle")
    _moe_gguf_header(w, D, H, HKV, Dh, F, L, E, K, F)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    for i, m in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", m["an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_q.weight", m["q"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_k.weight", m["k"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_v.weight", m["v"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", m["o"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_output_norm.weight", m["post_an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", m["fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "layer_output_norm.weight", m["post_fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_gate_inp.weight", m["gw"].weight.detach().numpy(), GGMLType.F32)
        for key, mods in (("ffn_gate_exps", "ge"), ("ffn_up_exps", "ue"),
                          ("ffn_down_exps", "de")):
            stacked = np.stack([mm.weight.detach().numpy() for mm in m[mods]])
            w.add_tensor(b + key + ".weight", stacked, GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.weight.detach().numpy(), GGMLType.F32)
    w.write()

    eng = _check(path, ref, "grok", ids)
    assert eng.cfg.embedding_scale == pytest.approx(78.38367176906169)


def test_arctic_oracle(tmp_path):
    """arctic: dense FFN residual + parallel MoE on the layer input through
    ffn_norm_exps (llm_build_arctic, src/llama-model.cpp:12391)."""
    D, H, HKV, Dh, F, L, E, K = 32, 4, 2, 8, 64, 2, 4, 2
    rng = np.random.default_rng(72)
    torch.manual_seed(72)

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for _ in range(L):
        layers.append({
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "q": mk_lin(rng, H * Dh, D), "k": mk_lin(rng, HKV * Dh, D),
            "v": mk_lin(rng, HKV * Dh, D), "o": mk_lin(rng, D, H * Dh),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "fne": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "g": mk_lin(rng, F, D), "u": mk_lin(rng, F, D), "d": mk_lin(rng, D, F),
            "gw": mk_lin(rng, E, D),
            "ge": [mk_lin(rng, F, D) for _ in range(E)],
            "ue": [mk_lin(rng, F, D) for _ in range(E)],
            "de": [mk_lin(rng, D, F) for _ in range(E)],
        })
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk_lin(rng, VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for m in layers:
            x_in = x
            h = rms_t(x, m["an"])
            q = rope_interleaved_t(m["q"](h).reshape(T, H, Dh), pos, Dh)
            k = rope_interleaved_t(m["k"](h).reshape(T, HKV, Dh), pos, Dh)
            v = m["v"](h).reshape(T, HKV, Dh)
            x = x + m["o"](attn_t(q, k, v, Dh ** -0.5))
            h = rms_t(x, m["fn"])
            dense = m["d"](Fn.silu(m["g"](h)) * m["u"](h))
            moe = moe_t(rms_t(x_in, m["fne"]), m["gw"].weight,
                        m["ge"], m["ue"], m["de"], K, Fn.silu)
            x = x + dense + moe
        ref = head(rms_t(x, onorm)).numpy()

    path = str(tmp_path / "tiny-arctic.gguf")
    w = GGUFWriter(path, "arctic")
    w.add_string(Keys.General.NAME, "arctic-oracle")
    _moe_gguf_header(w, D, H, HKV, Dh, F, L, E, K, F)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    # oracle applies ggml-interleaved rope directly → no q/k permutation
    for i, m in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", m["an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_q.weight", m["q"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_k.weight", m["k"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_v.weight", m["v"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", m["o"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", m["fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm_exps.weight", m["fne"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_gate.weight", m["g"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_up.weight", m["u"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_down.weight", m["d"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_gate_inp.weight", m["gw"].weight.detach().numpy(), GGMLType.F32)
        for key, mods in (("ffn_gate_exps", "ge"), ("ffn_up_exps", "ue"),
                          ("ffn_down_exps", "de")):
            stacked = np.stack([mm.weight.detach().numpy() for mm in m[mods]])
            w.add_tensor(b + key + ".weight", stacked, GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.weight.detach().numpy(), GGMLType.F32)
    w.write()

    _check(path, ref, "arctic", ids)


def test_smallthinker_oracle(tmp_path):
    """smallthinker: router fed the raw layer input, gated-ReLU experts
    (llm_build_smallthinker, src/llama-model.cpp:17918 — probs from inpL
    at :17948)."""
    D, H, HKV, Dh, F, L, E, K = 32, 4, 2, 8, 64, 2, 4, 2
    rng = np.random.default_rng(73)
    torch.manual_seed(73)

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for _ in range(L):
        layers.append({
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "q": mk_lin(rng, H * Dh, D), "k": mk_lin(rng, HKV * Dh, D),
            "v": mk_lin(rng, HKV * Dh, D), "o": mk_lin(rng, D, H * Dh),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "gw": mk_lin(rng, E, D),
            "ge": [mk_lin(rng, F, D) for _ in range(E)],
            "ue": [mk_lin(rng, F, D) for _ in range(E)],
            "de": [mk_lin(rng, D, F) for _ in range(E)],
        })
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk_lin(rng, VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for m in layers:
            x_in = x
            h = rms_t(x, m["an"])
            q = rope_neox_t(m["q"](h).reshape(T, H, Dh), pos, Dh)
            k = rope_neox_t(m["k"](h).reshape(T, HKV, Dh), pos, Dh)
            v = m["v"](h).reshape(T, HKV, Dh)
            x = x + m["o"](attn_t(q, k, v, Dh ** -0.5))
            h = rms_t(x, m["fn"])
            x = x + moe_t(h, m["gw"].weight, m["ge"], m["ue"], m["de"], K,
                          Fn.relu, gate_x=x_in)
        ref = head(rms_t(x, onorm)).numpy()

    path = str(tmp_path / "tiny-smallthinker.gguf")
    w = GGUFWriter(path, "smallthinker")
    w.add_string(Keys.General.NAME, "smallthinker-oracle")
    _moe_gguf_header(w, D, H, HKV, Dh, F, L, E, K, F)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    for i, m in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", m["an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_q.weight", m["q"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_k.weight", m["k"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_v.weight", m["v"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", m["o"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", m["fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_gate_inp.weight", m["gw"].weight.detach().numpy(), GGMLType.F32)
        for key, mods in (("ffn_gate_exps", "ge"), ("ffn_up_exps", "ue"),
                          ("ffn_down_exps", "de")):
            stacked = np.stack([mm.weight.detach().numpy() for mm in m[mods]])
            w.add_tensor(b + key + ".weight", stacked, GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.weight.detach().numpy(), GGMLType.F32)
    w.write()

    eng = _check(path, ref, "smallthinker", ids)
    assert eng.cfg.moe_gate_prenorm and eng.cfg.act_fn == "relu"


def test_smallthinker_swa_config():
    """SWA smallthinker: dense-first iSWA(4) + il%4==0 NoPE
    (hparams :1853-1864; set_swa_pattern(4, true))."""
    from llama_cpp_gfx906_tpu.models.config import ModelConfig

    cfg = ModelConfig(arch="smallthinker", n_layers=8, n_embd=32, n_heads=4,
                      n_kv_heads=2, head_dim=8, n_ff=64, n_vocab=VOCAB,
                      n_ctx_train=128, sliding_window=4096, swa_pattern=4,
                      swa_pattern_zero=True, nope_interval_zero=4)
    assert cfg.swa_layers == (False, True, True, True, False, True, True, True)
    assert cfg.rope_layers == (False, True, True, True, False, True, True, True)


def test_bailingmoe_oracle(tmp_path):
    """bailingmoe: dense-lead + softmax-routed MoE with shared experts and
    NORM rope (llm_build_bailingmoe, src/llama-model.cpp:16006)."""
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_moe_lead

    D, H, HKV, Dh, F, Fe, L, E, K = 32, 4, 2, 8, 64, 16, 3, 4, 2
    rng = np.random.default_rng(74)
    torch.manual_seed(74)

    # oracle layers in HF-ish naming consumed by convert_hf_moe_lead
    state = {}
    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    state["model.embed_tokens.weight"] = emb
    mods = []
    for i in range(L):
        p = f"model.layers.{i}."
        m = {
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "q": mk_lin(rng, H * Dh, D), "k": mk_lin(rng, HKV * Dh, D),
            "v": mk_lin(rng, HKV * Dh, D), "o": mk_lin(rng, D, H * Dh),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
        }
        state.update({
            p + "input_layernorm.weight": m["an"],
            p + "self_attn.q_proj.weight": m["q"].weight,
            p + "self_attn.k_proj.weight": m["k"].weight,
            p + "self_attn.v_proj.weight": m["v"].weight,
            p + "self_attn.o_proj.weight": m["o"].weight,
            p + "post_attention_layernorm.weight": m["fn"],
        })
        if i == 0:  # dense lead
            m.update({"g": mk_lin(rng, F, D), "u": mk_lin(rng, F, D),
                      "d": mk_lin(rng, D, F)})
            state.update({
                p + "mlp.gate_proj.weight": m["g"].weight,
                p + "mlp.up_proj.weight": m["u"].weight,
                p + "mlp.down_proj.weight": m["d"].weight,
            })
        else:
            m.update({
                "gw": mk_lin(rng, E, D),
                "ge": [mk_lin(rng, Fe, D) for _ in range(E)],
                "ue": [mk_lin(rng, Fe, D) for _ in range(E)],
                "de": [mk_lin(rng, D, Fe) for _ in range(E)],
                "sg": mk_lin(rng, Fe, D), "su": mk_lin(rng, Fe, D),
                "sd": mk_lin(rng, D, Fe),
            })
            state[p + "mlp.gate.weight"] = m["gw"].weight
            for e in range(E):
                state[p + f"mlp.experts.{e}.gate_proj.weight"] = m["ge"][e].weight
                state[p + f"mlp.experts.{e}.up_proj.weight"] = m["ue"][e].weight
                state[p + f"mlp.experts.{e}.down_proj.weight"] = m["de"][e].weight
            state[p + "mlp.shared_experts.gate_proj.weight"] = m["sg"].weight
            state[p + "mlp.shared_experts.up_proj.weight"] = m["su"].weight
            state[p + "mlp.shared_experts.down_proj.weight"] = m["sd"].weight
        mods.append(m)
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk_lin(rng, VOCAB, D)
    state["model.norm.weight"] = onorm
    state["lm_head.weight"] = head.weight

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for i, m in enumerate(mods):
            h = rms_t(x, m["an"])
            # HF half-rotation rope; the converter permutes q/k so the
            # engine's interleaved (NORM) rope matches
            q = rope_neox_t(m["q"](h).reshape(T, H, Dh), pos, Dh)
            k = rope_neox_t(m["k"](h).reshape(T, HKV, Dh), pos, Dh)
            v = m["v"](h).reshape(T, HKV, Dh)
            x = x + m["o"](attn_t(q, k, v, Dh ** -0.5))
            h = rms_t(x, m["fn"])
            if i == 0:
                x = x + m["d"](Fn.silu(m["g"](h)) * m["u"](h))
            else:
                moe = moe_t(h, m["gw"].weight, m["ge"], m["ue"], m["de"], K,
                            Fn.silu, norm=True)
                shexp = m["sd"](Fn.silu(m["sg"](h)) * m["su"](h))
                x = x + moe + shexp
        ref = head(rms_t(x, onorm)).numpy()

    class Oracle:
        class config:
            num_attention_heads = H
            num_key_value_heads = HKV
            head_dim = Dh
            hidden_size = D
            intermediate_size = F
            num_hidden_layers = L
            max_position_embeddings = 128
            vocab_size = VOCAB
            rms_norm_eps = 1e-5
            rope_theta = 10000.0
            n_routed_experts = E
            num_experts_per_tok = K
            moe_intermediate_size = Fe
            first_k_dense_replace = 1
            n_shared_experts = 1
            norm_topk_prob = True
            routed_scaling_factor = 1.0

        def state_dict(self):
            return state

    path = str(tmp_path / "tiny-bailing.gguf")
    convert_hf_moe_lead(Oracle(), dummy_vocab(), path, arch="bailingmoe",
                        quant_type=GGMLType.F32, permute=True, gating_func=1)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "moe_lead"
    from llama_cpp_gfx906_tpu.models.moe_lead import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)


def test_plm_oracle(tmp_path):
    """plm: MLA attention with a direct wq (no q low-rank) + relu² ungated
    FFN, NORM rope (llm_build_plm, src/llama-model.cpp:15834)."""
    D, H, L = 32, 4, 2
    rope_d, nope_d, v_d, rank = 4, 12, 8, 16
    qk_d = rope_d + nope_d
    rng = np.random.default_rng(75)
    torch.manual_seed(75)
    F = 64

    emb = torch.tensor(rng.standard_normal((VOCAB, D)) * 0.1).float()
    layers = []
    for _ in range(L):
        layers.append({
            "an": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "wq": mk_lin(rng, H * qk_d, D),
            "wkv_a": mk_lin(rng, rank + rope_d, D),
            "kvn": torch.tensor(1 + rng.standard_normal(rank) * 0.1).float(),
            "wkv_b": mk_lin(rng, H * (nope_d + v_d), rank),
            "wo": mk_lin(rng, D, H * v_d),
            "fn": torch.tensor(1 + rng.standard_normal(D) * 0.1).float(),
            "u": mk_lin(rng, F, D), "d": mk_lin(rng, D, F),
        })
    onorm = torch.tensor(1 + rng.standard_normal(D) * 0.1).float()
    head = mk_lin(rng, VOCAB, D)

    ids = [3, 17, 42, 9, 88]
    with torch.no_grad():
        x = emb[torch.tensor(ids)]
        T = len(ids)
        pos = torch.arange(T)
        for m in layers:
            h = rms_t(x, m["an"])
            q = m["wq"](h).reshape(T, H, qk_d)
            q_nope, q_pe = q[..., :nope_d], q[..., nope_d:]
            q_pe = rope_interleaved_t(q_pe, pos, rope_d)
            kv_pe = m["wkv_a"](h)  # (T, rank + rope_d)
            kv_c = rms_t(kv_pe[..., :rank], m["kvn"])
            k_pe = rope_interleaved_t(kv_pe[:, None, rank:], pos, rope_d)  # (T,1,rope)
            kv = m["wkv_b"](kv_c).reshape(T, H, nope_d + v_d)
            k_nope, v_st = kv[..., :nope_d], kv[..., nope_d:]
            q_full = torch.cat([q_nope, q_pe], -1)
            k_full = torch.cat([k_nope, k_pe.expand(T, H, rope_d)], -1)
            scores = torch.einsum("thd,shd->hts", q_full, k_full) * qk_d ** -0.5
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            scores = scores.masked_fill(~mask, float("-inf"))
            ctx = torch.einsum("hts,shd->thd", scores.softmax(-1), v_st)
            x = x + m["wo"](ctx.reshape(T, H * v_d))
            h = rms_t(x, m["fn"])
            x = x + m["d"](Fn.relu(m["u"](h)) ** 2)
        ref = head(rms_t(x, onorm)).numpy()

    path = str(tmp_path / "tiny-plm.gguf")
    w = GGUFWriter(path, "plm")
    w.add_string(Keys.General.NAME, "plm-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, 1)
    w.add_uint32(Keys.Attention.KEY_LENGTH, qk_d)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, v_d)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, rope_d)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.Attention.KV_LORA_RANK, rank)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _write_vocab(w)
    w.add_tensor("token_embd.weight", emb.numpy(), GGMLType.F32)
    for i, m in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", m["an"].numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_q.weight", m["wq"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_kv_a_mqa.weight", m["wkv_a"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "attn_kv_a_norm.weight", m["kvn"].numpy(), GGMLType.F32)
        # split kv_b into per-head k_b (H, rank, nope) and v_b (H, v, rank)
        kvb = m["wkv_b"].weight.detach().numpy().reshape(H, nope_d + v_d, rank)
        k_b = np.ascontiguousarray(kvb[:, :nope_d, :].transpose(0, 2, 1))  # (H, rank, nope)
        v_b = np.ascontiguousarray(kvb[:, nope_d:, :])  # (H, v, rank)
        w.add_tensor(b + "attn_k_b.weight", k_b, GGMLType.F32)
        w.add_tensor(b + "attn_v_b.weight", v_b, GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", m["wo"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", m["fn"].numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_up.weight", m["u"].weight.detach().numpy(), GGMLType.F32)
        w.add_tensor(b + "ffn_down.weight", m["d"].weight.detach().numpy(), GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm.numpy(), GGMLType.F32)
    w.add_tensor("output.weight", head.weight.detach().numpy(), GGMLType.F32)
    w.write()

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "deepseek2"
    from llama_cpp_gfx906_tpu.models.deepseek2 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=4e-3, atol=4e-3)
