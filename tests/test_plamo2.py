"""PLaMo-2 hybrid parity vs a per-token numpy oracle transcribed from
llm_build_plamo2 (src/llama-model.cpp:16726): per-head [z|x] in_proj,
conv-on-x, normed B/C/dt from ssm_x, SSD scan, double-norm blocks,
split-swiglu FFN."""

import numpy as np

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.constants import Keys
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.runtime.engine import Engine

VOCAB = 96
D, Dh, H_ATT, HKV, L = 32, 8, 4, 2, 2
D_INNER, N_STATE, H_SSM, D_CONV = 32, 8, 4, 4
P = D_INNER // H_SSM
DT_DIM = 16
F = 32  # logical FFN width; ffn_up holds [gate|up] = 2F rows
RNG = np.random.default_rng(99)


def rand(*shape, scale=0.3):
    return ((RNG.random(shape) - 0.5) * 2 * scale).astype(np.float32)


def rmsn(x, w, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def silu(x):
    return x / (1.0 + np.exp(-x))


def softplus(x):
    return np.log1p(np.exp(x))


def rope_neox(x, pos, base=10000.0):
    half = x.shape[-1] // 2
    inv = 1.0 / (base ** (np.arange(half) / half))
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


def make_weights():
    layers = []
    for il in range(L):
        p = {
            "an": 1 + rand(D, scale=0.1), "pan": 1 + rand(D, scale=0.1),
            "fn": 1 + rand(D, scale=0.1), "pfn": 1 + rand(D, scale=0.1),
            "up": rand(2 * F, D), "down": rand(D, F),
        }
        if il % 2 == 0:  # mamba layer
            p.update(
                ssm_in=rand(2 * D_INNER, D),
                conv=rand(D_INNER, D_CONV),
                ssm_x=rand(2 * N_STATE + DT_DIM, D_INNER),
                dtn=1 + rand(DT_DIM, scale=0.1),
                bn=1 + rand(N_STATE, scale=0.1),
                cn=1 + rand(N_STATE, scale=0.1),
                dtw=rand(H_SSM, DT_DIM), dtb=rand(H_SSM),
                a=-np.abs(rand(H_SSM)) - 0.1, d=rand(H_SSM),
                out=rand(D, D_INNER),
            )
        else:
            p.update(
                qkv=rand((H_ATT + 2 * HKV) * Dh, D),
                qn=1 + rand(Dh, scale=0.1), kn=1 + rand(Dh, scale=0.1),
                o=rand(D, H_ATT * Dh),
            )
        layers.append(p)
    return {"emb": rand(VOCAB, D), "layers": layers,
            "onorm": 1 + rand(D, scale=0.1), "head": rand(VOCAB, D)}


def oracle_full(ws, ids):
    """Sequence-level oracle (attention needs all positions)."""
    T = len(ids)
    pos = np.arange(T)
    x = ws["emb"][np.asarray(ids)].copy()  # (T, D)
    conv_state = [np.zeros((D_CONV - 1, D_INNER), np.float32) for _ in range(L)]
    ssm_state = [np.zeros((H_SSM, P, N_STATE), np.float32) for _ in range(L)]
    for il, p in enumerate(ws["layers"]):
        h = rmsn(x, p["an"])
        if il % 2 == 0:
            mix = np.zeros_like(x)
            for t in range(T):
                zx = (h[t] @ p["ssm_in"].T).reshape(H_SSM, 2 * P)
                z = zx[:, :P].reshape(D_INNER)
                xi = zx[:, P:].reshape(D_INNER)
                seq = np.concatenate([conv_state[il], xi[None]], 0)
                y = (seq * p["conv"].T).sum(0)
                conv_state[il] = seq[1:]
                xi2 = silu(y)
                bcdt = xi2 @ p["ssm_x"].T
                Bm = rmsn(bcdt[:N_STATE], p["bn"])
                Cm = rmsn(bcdt[N_STATE:2 * N_STATE], p["cn"])
                dt = softplus(rmsn(bcdt[2 * N_STATE:], p["dtn"]) @ p["dtw"].T + p["dtb"])
                xs = xi2.reshape(H_SSM, P)
                out = np.zeros((H_SSM, P), np.float32)
                for hh in range(H_SSM):
                    dA = np.exp(dt[hh] * p["a"][hh])
                    ssm_state[il][hh] = (dA * ssm_state[il][hh]
                                         + dt[hh] * np.outer(xs[hh], Bm))
                    out[hh] = ssm_state[il][hh] @ Cm
                out = out + p["d"][:, None] * xs
                mix[t] = (out.reshape(D_INNER) * silu(z)) @ p["out"].T
        else:
            qkv = h @ p["qkv"].T
            Dq = H_ATT * Dh
            Dkv = HKV * Dh
            q = rmsn(qkv[:, :Dq].reshape(T, H_ATT, Dh), p["qn"])
            k = rmsn(qkv[:, Dq:Dq + Dkv].reshape(T, HKV, Dh), p["kn"])
            v = qkv[:, Dq + Dkv:].reshape(T, HKV, Dh)
            q = rope_neox(q, pos)
            k = rope_neox(k, pos)
            G = H_ATT // HKV
            kk = np.repeat(k, G, axis=1)
            vv = np.repeat(v, G, axis=1)
            scores = np.einsum("thd,shd->hts", q, kk) / np.sqrt(Dh)
            mask = np.tril(np.ones((T, T), bool))
            scores = np.where(mask, scores, -1e30)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            pr = e / e.sum(-1, keepdims=True)
            attn = np.einsum("hts,shd->thd", pr, vv).reshape(T, Dq)
            mix = attn @ p["o"].T
        x = x + rmsn(mix, p["pan"])
        h2 = rmsn(x, p["fn"])
        gu = h2 @ p["up"].T
        mlp = (silu(gu[:, :F]) * gu[:, F:]) @ p["down"].T
        x = x + rmsn(mlp, p["pfn"])
    return rmsn(x, ws["onorm"]) @ ws["head"].T


def write_gguf(ws, path):
    w = GGUFWriter(path, "plamo2")
    w.add_string(Keys.General.NAME, "plamo2-oracle")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 128)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, D)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, L)
    w.add_uint32(Keys.LLM.FEED_FORWARD_LENGTH, F)
    w.add_uint32(Keys.Attention.HEAD_COUNT, H_ATT)
    w.add_array(Keys.Attention.HEAD_COUNT_KV,
                np.asarray([0 if il % 2 == 0 else HKV for il in range(L)], np.uint32))
    w.add_uint32(Keys.Attention.KEY_LENGTH, Dh)
    w.add_uint32(Keys.Attention.VALUE_LENGTH, Dh)
    w.add_float32(Keys.Attention.LAYERNORM_RMS_EPS, 1e-5)
    w.add_uint32(Keys.Rope.DIMENSION_COUNT, Dh)
    w.add_float32(Keys.Rope.FREQ_BASE, 10000.0)
    w.add_uint32(Keys.SSM.CONV_KERNEL.format(arch="plamo2")
                 if "{arch}" in str(Keys.SSM.CONV_KERNEL) else Keys.SSM.CONV_KERNEL, D_CONV)
    w.add_kv("plamo2.ssm.inner_size", D_INNER)
    w.add_kv("plamo2.ssm.state_size", N_STATE)
    w.add_kv("plamo2.ssm.time_step_rank", H_SSM)
    w.add_kv("plamo2.ssm.group_count", 1)
    w.add_uint32(Keys.LLM.VOCAB_SIZE, VOCAB)
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    w.add_string(Keys.Tokenizer.MODEL, "gpt2")
    w.add_array(Keys.Tokenizer.LIST, tokens)
    w.add_array(Keys.Tokenizer.TOKEN_TYPE,
                np.asarray([3, 3, 2] + [4] * (VOCAB - 3), np.int32))
    w.add_uint32(Keys.Tokenizer.BOS_ID, 0)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 1)

    def t(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    t("token_embd.weight", ws["emb"])
    for il, p in enumerate(ws["layers"]):
        b = f"blk.{il}."
        t(b + "attn_norm.weight", p["an"])
        t(b + "post_attention_norm.weight", p["pan"])
        t(b + "ffn_norm.weight", p["fn"])
        t(b + "post_ffw_norm.weight", p["pfn"])
        t(b + "ffn_up.weight", p["up"])
        t(b + "ffn_down.weight", p["down"])
        if il % 2 == 0:
            t(b + "ssm_in.weight", p["ssm_in"])
            t(b + "ssm_conv1d.weight", p["conv"])
            t(b + "ssm_x.weight", p["ssm_x"])
            t(b + "ssm_dt_norm.weight", p["dtn"])
            t(b + "ssm_b_norm.weight", p["bn"])
            t(b + "ssm_c_norm.weight", p["cn"])
            t(b + "ssm_dt.weight", p["dtw"])
            t(b + "ssm_dt.bias", p["dtb"])
            t(b + "ssm_a", p["a"])
            t(b + "ssm_d", p["d"])
            t(b + "ssm_out.weight", p["out"])
        else:
            t(b + "attn_qkv.weight", p["qkv"])
            t(b + "attn_q_norm.weight", p["qn"])
            t(b + "attn_k_norm.weight", p["kn"])
            t(b + "attn_output.weight", p["o"])
    t("output_norm.weight", ws["onorm"])
    t("output.weight", ws["head"])
    return w.write()


def test_plamo2_oracle(tmp_path):
    ws = make_weights()
    path = str(tmp_path / "tiny-plamo2.gguf")
    write_gguf(ws, path)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "plamo2"
    ids = [3, 17, 42, 9, 88, 5]
    ref = oracle_full(ws, ids)
    from llama_cpp_gfx906_tpu.models.plamo2 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)


def test_plamo2_decode_continuity(tmp_path):
    ws = make_weights()
    path = str(tmp_path / "tiny-plamo2b.gguf")
    write_gguf(ws, path)
    ids = [3, 17, 42, 9, 88]
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    eng.prefill(ids[:-1])
    stepped = eng.decode_one(ids[-1])
    eng2 = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    oneshot = eng2.prefill(ids)
    np.testing.assert_allclose(stepped, oneshot, rtol=2e-4, atol=2e-4)
