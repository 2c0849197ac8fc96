"""rwkv6qwen2 (QRWKV) + arwkv7 parity vs independent per-token numpy
oracles transcribed from the reference formulas
(llm_build_rwkv6qwen2 :14628 — qrwkv branches of build_rwkv6_time_mix
:14374; llm_build_arwkv7 :14978)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.constants import Keys
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.runtime.engine import Engine

VOCAB = 96
D, S, L, F = 32, 8, 2, 64
H = D // S
RANK = 8
RNG = np.random.default_rng(95)


def rand(*shape, scale=0.4):
    return ((RNG.random(shape) - 0.5) * 2 * scale).astype(np.float32)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def rmsn(x, w, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def silu(x):
    return x * sigmoid(x)


def _vocab_meta(w):
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_string(Keys.Tokenizer.MODEL, "gpt2")
    w.add_array(Keys.Tokenizer.LIST, tokens)
    w.add_array(Keys.Tokenizer.TOKEN_TYPE, np.asarray([3, 3, 2] + [4] * (VOCAB - 3), np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, 0)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 1)


def _common_meta(w, arch):
    w.add_string(Keys.General.NAME, f"{arch}-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H)
    w.add_uint32(Keys.Attention.HEAD_COUNT_KV, H)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(f"{arch}.wkv.head_size", S)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    _vocab_meta(w)


# -- rwkv6qwen2 --------------------------------------------------------------


def make_q6_weights():
    layers = []
    for _ in range(L):
        layers.append({
            "attn_norm": 1 + rand(D, scale=0.1),
            "ffn_norm": 1 + rand(D, scale=0.1),
            "lerp_x": rand(D), "lerp_fused": rand(5, D),
            "w1": rand(D, 5 * RANK), "w2": rand(5, RANK, D),
            "decay_w1": rand(D, RANK), "decay_w2": rand(RANK, D),
            "decay": rand(D),
            "wr": rand(D, D), "wk": rand(D, D), "wv": rand(D, D),
            "br": rand(D), "bk": rand(D), "bv": rand(D),
            "wg": rand(D, D), "wo": rand(D, D),
            "g": rand(F, D), "u": rand(F, D), "d": rand(D, F),
        })
    return {
        "emb": rand(VOCAB, D),
        "layers": layers,
        "out_norm": 1 + rand(D, scale=0.1),
        "head": rand(VOCAB, D),
    }


def write_q6_gguf(ws, path):
    w = GGUFWriter(path, "rwkv6qwen2")
    _common_meta(w, "rwkv6qwen2")

    def t(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    t("token_embd.weight", ws["emb"])
    for i, p in enumerate(ws["layers"]):
        b = f"blk.{i}."
        t(b + "attn_norm.weight", p["attn_norm"])
        t(b + "ffn_norm.weight", p["ffn_norm"])
        t(b + "time_mix_lerp_x.weight", p["lerp_x"])
        t(b + "time_mix_lerp_fused.weight", p["lerp_fused"])
        t(b + "time_mix_w1.weight", p["w1"].T)  # GGUF (out, in)
        t(b + "time_mix_w2.weight", p["w2"].transpose(0, 2, 1))  # (5, D, RANK)
        t(b + "time_mix_decay_w1.weight", p["decay_w1"].T)
        t(b + "time_mix_decay_w2.weight", p["decay_w2"].T)
        t(b + "time_mix_decay.weight", p["decay"])
        t(b + "time_mix_receptance.weight", p["wr"].T)
        t(b + "time_mix_key.weight", p["wk"].T)
        t(b + "time_mix_value.weight", p["wv"].T)
        t(b + "time_mix_receptance.bias", p["br"])
        t(b + "time_mix_key.bias", p["bk"])
        t(b + "time_mix_value.bias", p["bv"])
        t(b + "time_mix_gate.weight", p["wg"].T)
        t(b + "time_mix_output.weight", p["wo"].T)
        t(b + "ffn_gate.weight", p["g"])
        t(b + "ffn_up.weight", p["u"])
        t(b + "ffn_down.weight", p["d"])
    t("output_norm.weight", ws["out_norm"])
    t("output.weight", ws["head"])
    return w.write()


def oracle_q6(ws, ids):
    """Per-token reference loop (qrwkv semantics)."""
    shift = [np.zeros(D, np.float32) for _ in range(L)]
    state = [np.zeros((H, S, S), np.float32) for _ in range(L)]
    rows = []
    for tok in ids:
        x = ws["emb"][tok].copy()
        for il, p in enumerate(ws["layers"]):
            att = rmsn(x, p["attn_norm"])
            sx = shift[il] - att
            base = att + sx * p["lerp_x"]
            xxx = np.tanh(base @ p["w1"]).reshape(5, RANK)
            xxx = np.einsum("ce,ced->cd", xxx, p["w2"])
            mixed = att[None, :] + (xxx + p["lerp_fused"]) * sx[None, :]
            xw, xk, xv, xr, xg = mixed
            r = xr @ p["wr"] + p["br"]
            k = xk @ p["wk"] + p["bk"]
            v = xv @ p["wv"] + p["bv"]
            g = sigmoid(xg @ p["wg"])
            w_ = np.exp(-np.exp(np.tanh(xw @ p["decay_w1"]) @ p["decay_w2"] + p["decay"]))
            k = k * (1.0 - w_)
            out = np.zeros(D, np.float32)
            for h in range(H):
                rs, ks, vs, wsl = (a[h * S:(h + 1) * S] for a in (r, k, v, w_))
                state[il][h] = state[il][h] * wsl[:, None] + np.outer(ks, vs)
                out[h * S:(h + 1) * S] = (rs @ state[il][h]) * S ** -0.5
            x = x + (out * g) @ p["wo"]
            shift[il] = att
            hh = rmsn(x, p["ffn_norm"])
            x = x + (silu(hh @ p["g"].T) * (hh @ p["u"].T)) @ p["d"].T
        rows.append(rmsn(x, ws["out_norm"]) @ ws["head"].T)
    return np.stack(rows)


def test_rwkv6qwen2_oracle(tmp_path):
    ws = make_q6_weights()
    path = str(tmp_path / "tiny-qrwkv6.gguf")
    write_q6_gguf(ws, path)
    eng = Engine.from_gguf(path, max_seq=64)
    assert eng.family.name == "rwkv_hybrid"
    ids = [3, 17, 42, 9, 88, 5]
    ref = oracle_q6(ws, ids)
    from llama_cpp_gfx906_tpu.models.rwkv_hybrid import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)


def test_rwkv6qwen2_decode_continuity(tmp_path):
    """Prefill then decode_one must match one-shot prefill (token-shift +
    gla state carry)."""
    ws = make_q6_weights()
    path = str(tmp_path / "tiny-qrwkv6b.gguf")
    write_q6_gguf(ws, path)
    ids = [3, 17, 42, 9, 88]
    eng = Engine.from_gguf(path, max_seq=64)
    eng.prefill(ids[:-1])
    stepped = eng.decode_one(ids[-1])
    eng2 = Engine.from_gguf(path, max_seq=64)
    oneshot = eng2.prefill(ids)
    np.testing.assert_allclose(stepped, oneshot, rtol=2e-4, atol=2e-4)


# -- arwkv7 ------------------------------------------------------------------


def make_a7_weights():
    layers = []
    for il in range(L):
        p = {
            "attn_norm": 1 + rand(D, scale=0.1),
            "ffn_norm": 1 + rand(D, scale=0.1),
            "lerp_fused": rand(6, D),
            "w0": rand(D), "w1": rand(D, RANK), "w2": rand(RANK, D),
            "a0": rand(D), "a1": rand(D, RANK), "a2": rand(RANK, D),
            "k_k": rand(D), "k_a": rand(D), "r_k": rand(D),
            "wr": rand(D, D), "wk": rand(D, D), "wv": rand(D, D),
            "wo": rand(D, D),
            "g1": rand(D, RANK), "g2": rand(RANK, D),
            "g": rand(F, D), "u": rand(F, D), "d": rand(D, F),
        }
        if il > 0:
            p.update(v0=rand(D), v1=rand(D, RANK), v2=rand(RANK, D))
        layers.append(p)
    return {"emb": rand(VOCAB, D), "layers": layers,
            "out_norm": 1 + rand(D, scale=0.1), "head": rand(VOCAB, D)}


def write_a7_gguf(ws, path):
    w = GGUFWriter(path, "arwkv7")
    _common_meta(w, "arwkv7")

    def t(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    t("token_embd.weight", ws["emb"])
    for i, p in enumerate(ws["layers"]):
        b = f"blk.{i}."
        t(b + "attn_norm.weight", p["attn_norm"])
        t(b + "ffn_norm.weight", p["ffn_norm"])
        t(b + "time_mix_lerp_fused.weight", p["lerp_fused"])
        t(b + "time_mix_w0.weight", p["w0"])
        t(b + "time_mix_w1.weight", p["w1"].T)
        t(b + "time_mix_w2.weight", p["w2"].T)
        t(b + "time_mix_a0.weight", p["a0"])
        t(b + "time_mix_a1.weight", p["a1"].T)
        t(b + "time_mix_a2.weight", p["a2"].T)
        if "v0" in p:
            t(b + "time_mix_v0.weight", p["v0"])
            t(b + "time_mix_v1.weight", p["v1"].T)
            t(b + "time_mix_v2.weight", p["v2"].T)
        t(b + "time_mix_g1.weight", p["g1"].T)
        t(b + "time_mix_g2.weight", p["g2"].T)
        t(b + "time_mix_k_k.weight", p["k_k"])
        t(b + "time_mix_k_a.weight", p["k_a"])
        t(b + "time_mix_r_k.weight", p["r_k"])
        t(b + "time_mix_receptance.weight", p["wr"].T)
        t(b + "time_mix_key.weight", p["wk"].T)
        t(b + "time_mix_value.weight", p["wv"].T)
        t(b + "time_mix_output.weight", p["wo"].T)
        t(b + "ffn_gate.weight", p["g"])
        t(b + "ffn_up.weight", p["u"])
        t(b + "ffn_down.weight", p["d"])
    t("output_norm.weight", ws["out_norm"])
    t("output.weight", ws["head"])
    return w.write()


def oracle_a7(ws, ids):
    """Per-token rwkv7 time-mix inside the gated-FFN shell
    (formulas per build_rwkv7_time_mix; no group-norm ln in arwkv7? —
    arwkv7 keeps the optional ln, omitted here and in the weights)."""
    shift = [np.zeros(D, np.float32) for _ in range(L)]
    state = [np.zeros((H, S, S), np.float32) for _ in range(L)]
    rows = []
    for tok in ids:
        x = ws["emb"][tok].copy()
        v_first = None
        for il, p in enumerate(ws["layers"]):
            att = rmsn(x, p["attn_norm"])
            sx = shift[il] - att
            mixed = att[None, :] + p["lerp_fused"] * sx[None, :]
            xr, xw, xk, xv, xa, xg = mixed
            r = xr @ p["wr"]
            w_ = np.exp(-0.606531 * sigmoid(np.tanh(xw @ p["w1"]) @ p["w2"] + p["w0"]))
            k = xk @ p["wk"]
            v = xv @ p["wv"]
            if v_first is None:
                v_first = v.copy()
            else:
                vg = sigmoid((xv @ p["v1"]) @ p["v2"] + p["v0"])
                v = v + (v_first - v) * vg
            a = sigmoid((xa @ p["a1"]) @ p["a2"] + p["a0"])
            kk = (k * p["k_k"]).reshape(H, S)
            kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
            ka = k * p["k_a"]
            k2 = k + (a * ka - ka)
            out = np.zeros(D, np.float32)
            for h in range(H):
                rs = r[h * S:(h + 1) * S]
                wsl = w_[h * S:(h + 1) * S]
                ks = k2[h * S:(h + 1) * S]
                vs = v[h * S:(h + 1) * S]
                ah = a[h * S:(h + 1) * S]
                kkh = kk[h]
                sa = (-kkh) @ state[il][h]
                state[il][h] = (state[il][h] * wsl[:, None] + np.outer(ks, vs)
                                + np.outer(kkh * ah, sa))
                out[h * S:(h + 1) * S] = rs @ state[il][h]
            # per-head group norm (no affine)
            of = out.reshape(H, S)
            of = (of - of.mean(-1, keepdims=True)) / np.sqrt(
                of.var(-1) + 64e-5)[:, None]
            cur = of.reshape(D)
            rk = (k2.reshape(H, S) * r.reshape(H, S) * p["r_k"].reshape(H, S)).sum(-1)
            cur = cur + (v.reshape(H, S) * rk[:, None]).reshape(D)
            gg = sigmoid(xg @ p["g1"]) @ p["g2"]
            cur = cur * gg
            x = x + cur @ p["wo"]
            shift[il] = att
            hh = rmsn(x, p["ffn_norm"])
            x = x + (silu(hh @ p["g"].T) * (hh @ p["u"].T)) @ p["d"].T
        rows.append(rmsn(x, ws["out_norm"]) @ ws["head"].T)
    return np.stack(rows)


def test_arwkv7_oracle(tmp_path):
    ws = make_a7_weights()
    path = str(tmp_path / "tiny-arwkv7.gguf")
    write_a7_gguf(ws, path)
    eng = Engine.from_gguf(path, max_seq=64)
    assert eng.family.name == "rwkv_hybrid"
    ids = [3, 17, 42, 9, 88, 5]
    ref = oracle_a7(ws, ids)
    from llama_cpp_gfx906_tpu.models.rwkv_hybrid import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)
