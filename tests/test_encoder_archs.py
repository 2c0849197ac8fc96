"""neo-bert + nomic-bert-moe encoder parity vs per-token numpy oracles
(llm_build_neo_bert src/llama-model.cpp:7502; llm_build_bert MoE branch
:7438-7452)."""

import numpy as np

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.constants import Keys
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.models.bert import forward, load_params
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader

VOCAB = 96
D, Dh, H, L = 32, 8, 4, 2
RNG = np.random.default_rng(97)


def rand(*shape, scale=0.3):
    return ((RNG.random(shape) - 0.5) * 2 * scale).astype(np.float32)


def rmsn(x, w, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def lnorm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(v + eps) * w + b


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(0.7978845608 * (x + 0.044715 * x ** 3)))


def rope_half(x, pos, base=10000.0):
    # NEOX half-split rotation over the full head dim
    half = x.shape[-1] // 2
    inv = 1.0 / (base ** (np.arange(half) / half))
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


def rope_interleaved(x, pos, base=10000.0):
    half = x.shape[-1] // 2
    inv = 1.0 / (base ** (np.arange(half) / half))
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    xr = x.reshape(*x.shape[:-1], half, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    return np.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1).reshape(x.shape)


def attn_bidir(q, k, v):
    # (T, H, Dh) bidirectional
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(q.shape[-1])
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v).reshape(q.shape[0], -1)


def _vocab_meta(w):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_string(Keys.Tokenizer.MODEL, "gpt2")
    w.add_array(Keys.Tokenizer.LIST, tokens)
    w.add_array(Keys.Tokenizer.TOKEN_TYPE,
                np.asarray([3, 3, 2] + [4] * (VOCAB - 3), np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, 0)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 1)


def test_neo_bert_oracle(tmp_path):
    F = 64  # logical ffn dim; up matrix holds [gate|up] = 2F rows
    layers = []
    for _ in range(L):
        layers.append({
            "an": 1 + rand(D, scale=0.1), "fn": 1 + rand(D, scale=0.1),
            "qkv": rand(3 * D, D), "o": rand(D, D),
            "up": rand(2 * F, D), "down": rand(D, F),
        })
    emb = rand(VOCAB, D)
    onorm = 1 + rand(D, scale=0.1)

    ids = [3, 17, 42, 9, 88]
    T = len(ids)
    pos = np.arange(T)
    x = emb[ids].copy()
    for p in layers:
        h = rmsn(x, p["an"])
        qkv = h @ p["qkv"].T
        q = rope_interleaved(qkv[:, :D].reshape(T, H, Dh), pos)
        k = rope_interleaved(qkv[:, D:2 * D].reshape(T, H, Dh), pos)
        v = qkv[:, 2 * D:].reshape(T, H, Dh)
        x = x + attn_bidir(q, k, v) @ p["o"].T
        h = rmsn(x, p["fn"])
        gu = h @ p["up"].T
        x = x + (silu(gu[:, :F]) * gu[:, F:]) @ p["down"].T
    ref = rmsn(x, onorm)

    path = str(tmp_path / "tiny-neobert.gguf")
    w = GGUFWriter(path, "neo-bert")
    w.add_string(Keys.General.NAME, "neobert-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _vocab_meta(w)
    w.add_tensor("token_embd.weight", emb, GGMLType.F32)
    for i, p in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", p["an"], GGMLType.F32)
        w.add_tensor(b + "attn_qkv.weight", p["qkv"], GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", p["o"], GGMLType.F32)
        w.add_tensor(b + "ffn_norm.weight", p["fn"], GGMLType.F32)
        w.add_tensor(b + "ffn_up.weight", p["up"], GGMLType.F32)
        w.add_tensor(b + "ffn_down.weight", p["down"], GGMLType.F32)
    w.add_tensor("output_norm.weight", onorm, GGMLType.F32)
    w.write()

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    got = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                  jnp.asarray([T], jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)


def test_nomic_bert_moe_oracle(tmp_path):
    F, E, K = 64, 4, 2
    layers = []
    for il in range(L):
        p = {
            "q": rand(D, D), "k": rand(D, D), "v": rand(D, D), "o": rand(D, D),
            "bq": rand(D), "bk": rand(D), "bv": rand(D),
            "aon": 1 + rand(D, scale=0.1), "aob": rand(D, scale=0.1),
            "fon": 1 + rand(D, scale=0.1), "fob": rand(D, scale=0.1),
        }
        if il % 2 == 1:  # MoE layer
            p.update(gate_w=rand(E, D),
                     ups=[rand(F, D) for _ in range(E)],
                     downs=[rand(D, F) for _ in range(E)])
        else:
            p.update(up=rand(F, D), bup=rand(F), down=rand(D, F), bdown=rand(D))
        layers.append(p)
    emb = rand(VOCAB, D)
    en, eb = 1 + rand(D, scale=0.1), rand(D, scale=0.1)

    ids = [3, 17, 42, 9, 88]
    T = len(ids)
    pos = np.arange(T)
    x = lnorm(emb[ids].copy(), en, eb)
    for il, p in enumerate(layers):
        q = rope_half((x @ p["q"].T + p["bq"]).reshape(T, H, Dh), pos)
        k = rope_half((x @ p["k"].T + p["bk"]).reshape(T, H, Dh), pos)
        v = (x @ p["v"].T + p["bv"]).reshape(T, H, Dh)
        x = lnorm(x + attn_bidir(q, k, v) @ p["o"].T, p["aon"], p["aob"])
        if il % 2 == 1:
            logits = x @ p["gate_w"].T
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            hf = np.zeros_like(x)
            for t in range(T):
                top = np.argsort(-probs[t])[:K]
                for e in top:
                    hf[t] += probs[t, e] * (
                        gelu_tanh(x[t] @ p["ups"][e].T) @ p["downs"][e].T)
        else:
            hf = gelu_tanh(x @ p["up"].T + p["bup"]) @ p["down"].T + p["bdown"]
        x = lnorm(x + hf, p["fon"], p["fob"])
    ref = x

    path = str(tmp_path / "tiny-nomicmoe.gguf")
    w = GGUFWriter(path, "nomic-bert-moe")
    w.add_string(Keys.General.NAME, "nomicmoe-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, 1e-12)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.LLM.EXPERT_COUNT, E)
    w.add_uint32(Keys.LLM.EXPERT_USED_COUNT, K)
    w.add_uint32("nomic-bert-moe.moe_every_n_layers", 2)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _vocab_meta(w)
    w.add_tensor("token_embd.weight", emb, GGMLType.F32)
    w.add_tensor("token_embd_norm.weight", en, GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", eb, GGMLType.F32)
    for i, p in enumerate(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_q.weight", p["q"], GGMLType.F32)
        w.add_tensor(b + "attn_q.bias", p["bq"], GGMLType.F32)
        w.add_tensor(b + "attn_k.weight", p["k"], GGMLType.F32)
        w.add_tensor(b + "attn_k.bias", p["bk"], GGMLType.F32)
        w.add_tensor(b + "attn_v.weight", p["v"], GGMLType.F32)
        w.add_tensor(b + "attn_v.bias", p["bv"], GGMLType.F32)
        w.add_tensor(b + "attn_output.weight", p["o"], GGMLType.F32)
        w.add_tensor(b + "attn_output_norm.weight", p["aon"], GGMLType.F32)
        w.add_tensor(b + "attn_output_norm.bias", p["aob"], GGMLType.F32)
        w.add_tensor(b + "layer_output_norm.weight", p["fon"], GGMLType.F32)
        w.add_tensor(b + "layer_output_norm.bias", p["fob"], GGMLType.F32)
        if "gate_w" in p:
            w.add_tensor(b + "ffn_gate_inp.weight", p["gate_w"], GGMLType.F32)
            w.add_tensor(b + "ffn_up_exps.weight", np.stack(p["ups"]), GGMLType.F32)
            w.add_tensor(b + "ffn_down_exps.weight", np.stack(p["downs"]), GGMLType.F32)
        else:
            w.add_tensor(b + "ffn_up.weight", p["up"], GGMLType.F32)
            w.add_tensor(b + "ffn_up.bias", p["bup"], GGMLType.F32)
            w.add_tensor(b + "ffn_down.weight", p["down"], GGMLType.F32)
            w.add_tensor(b + "ffn_down.bias", p["bdown"], GGMLType.F32)
    w.write()

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    got = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                  jnp.asarray([T], jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)
