"""jina-bert-v2 encoder parity vs a numpy oracle.

Reference semantics: llm_build_bert JINA_BERT_V2 branches
(src/llama-model.cpp:760-766 ALiBi max_bias=8 / no position inputs;
:7465-7471 gated-GELU FFN — fused GEGLU when ffn_gate absent; :7434
attn_norm_2 re-add; :7380 full-width q/k LayerNorms) and the tensor table
at src/llama-model.cpp:2705-2748.
"""

import numpy as np

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.constants import Keys
from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.models.bert import forward, load_params
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.ops.attention import alibi_slopes_for

VOCAB = 96
D, Dh, H, L, F = 32, 8, 4, 2, 48
RNG = np.random.default_rng(31)


def rand(*shape, scale=0.3):
    return ((RNG.random(shape) - 0.5) * 2 * scale).astype(np.float32)


def lnorm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    v = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(v + eps) * w + b


def gelu_erf(x):
    from scipy.special import erf

    return 0.5 * x * (1 + erf(x / np.sqrt(2.0)))


def attn_alibi(q, k, v):
    """(T, H, Dh) bidirectional attention + ALiBi slope * -|i-j|."""
    T = q.shape[0]
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(q.shape[-1])
    slopes = np.asarray(alibi_slopes_for(H), np.float32)
    dist = -np.abs(np.arange(T)[:, None] - np.arange(T)[None, :])
    scores = scores + slopes[:, None, None] * dist[None]
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v).reshape(T, -1)


def _vocab_meta(w):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_string(Keys.Tokenizer.MODEL, "gpt2")
    w.add_array(Keys.Tokenizer.LIST, tokens)
    w.add_array(Keys.Tokenizer.TOKEN_TYPE,
                np.asarray([3, 3, 2] + [4] * (VOCAB - 3), np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, 0)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 1)


def _header(w):
    w.add_string(Keys.General.NAME, "jina-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, 1e-12)
    w.add_bool(Keys.Attention.CAUSAL, False)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _vocab_meta(w)


def _mk_layer(code_variant):
    p = {
        "q": rand(D, D), "bq": rand(D), "k": rand(D, D), "bk": rand(D),
        "v": rand(D, D), "bv": rand(D), "o": rand(D, D), "bo": rand(D),
        "aon": 1 + rand(D, scale=0.1), "aob": rand(D),
        "down": rand(D, F), "bdown": rand(D),
        "lon": 1 + rand(D, scale=0.1), "lob": rand(D),
    }
    if code_variant:
        p.update(gate=rand(F, D), up=rand(F, D),
                 qn=1 + rand(D, scale=0.1), qnb=rand(D),
                 kn=1 + rand(D, scale=0.1), knb=rand(D),
                 n2=1 + rand(D, scale=0.1), n2b=rand(D))
    else:
        p.update(gup=rand(2 * F, D))  # fused GEGLU [act|linear]
    return p


def _oracle(layers, emb, ty, en, eb, ids, code_variant):
    T = len(ids)
    x = emb[np.asarray(ids)] + ty[0]
    x = lnorm(x, en, eb)
    for p in layers:
        q = x @ p["q"].T + p["bq"]
        k = x @ p["k"].T + p["bk"]
        v = x @ p["v"].T + p["bv"]
        if code_variant:
            q = lnorm(q, p["qn"], p["qnb"])
            k = lnorm(k, p["kn"], p["knb"])
        attn = attn_alibi(q.reshape(T, H, Dh), k.reshape(T, H, Dh),
                          v.reshape(T, H, Dh)) @ p["o"].T + p["bo"]
        inp = x
        x = lnorm(x + attn, p["aon"], p["aob"])
        if code_variant:
            x = lnorm(x + inp, p["n2"], p["n2b"])
        if code_variant:
            hf = gelu_erf(x @ p["gate"].T) * (x @ p["up"].T)
        else:
            gu = x @ p["gup"].T
            hf = gelu_erf(gu[:, :F]) * gu[:, F:]
        hf = hf @ p["down"].T + p["bdown"]
        x = lnorm(x + hf, p["lon"], p["lob"])
    return x


def _write(path, layers, emb, ty, en, eb, code_variant):
    w = GGUFWriter(path, "jina-bert-v2")
    _header(w)

    def t(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    t("token_embd.weight", emb)
    t("token_types.weight", ty)
    t("token_embd_norm.weight", en)
    t("token_embd_norm.bias", eb)
    for i, p in enumerate(layers):
        b = f"blk.{i}."
        t(b + "attn_q.weight", p["q"]); t(b + "attn_q.bias", p["bq"])
        t(b + "attn_k.weight", p["k"]); t(b + "attn_k.bias", p["bk"])
        t(b + "attn_v.weight", p["v"]); t(b + "attn_v.bias", p["bv"])
        t(b + "attn_output.weight", p["o"]); t(b + "attn_output.bias", p["bo"])
        t(b + "attn_output_norm.weight", p["aon"])
        t(b + "attn_output_norm.bias", p["aob"])
        if code_variant:
            t(b + "attn_q_norm.weight", p["qn"]); t(b + "attn_q_norm.bias", p["qnb"])
            t(b + "attn_k_norm.weight", p["kn"]); t(b + "attn_k_norm.bias", p["knb"])
            t(b + "attn_norm_2.weight", p["n2"]); t(b + "attn_norm_2.bias", p["n2b"])
            t(b + "ffn_gate.weight", p["gate"])
            t(b + "ffn_up.weight", p["up"])
        else:
            t(b + "ffn_up.weight", p["gup"])
        t(b + "ffn_down.weight", p["down"]); t(b + "ffn_down.bias", p["bdown"])
        t(b + "layer_output_norm.weight", p["lon"])
        t(b + "layer_output_norm.bias", p["lob"])
    return w.write()


def _run(tmp_path, code_variant, fname):
    layers = [_mk_layer(code_variant) for _ in range(L)]
    emb, ty = rand(VOCAB, D), rand(2, D)
    en, eb = 1 + rand(D, scale=0.1), rand(D)
    ids = [3, 17, 42, 9, 88]
    ref = _oracle(layers, emb, ty, en, eb, ids, code_variant)

    path = str(tmp_path / fname)
    _write(path, layers, emb, ty, en, eb, code_variant)
    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    assert cfg.arch == "jina-bert-v2" and cfg.alibi and cfg.ffn_gated
    params = load_params(reader, cfg)
    got = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                  jnp.asarray([len(ids)], jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)


def test_jina_bert_v2_geglu_oracle(tmp_path):
    """jina-embeddings-v2 layout: fused GEGLU up, no extra norms."""
    _run(tmp_path, False, "tiny-jina.gguf")


def test_jina_v2_code_oracle(tmp_path):
    """jina-v2-code layout: split gate, q/k LayerNorms, attn_norm_2."""
    _run(tmp_path, True, "tiny-jina-code.gguf")
