"""T5 encoder-decoder family.

Reference: ``llm_build_t5_enc`` / ``llm_build_t5_dec``
(src/llama-model.cpp:13114/13215): RMS-norm pre-LN blocks, relative
position-bucket attention bias (shared from layer 0), unscaled attention
(scale folded into init), cross-attention over the encoder output, and
an optionally gated FFN (v1.1 gated-gelu vs v1.0 relu).

TPU notes: the encoder is one jitted pass; the decoder runs with a
self-attn KV cache plus cross K/V computed once per request.  Layers run
as a Python loop inside jit (T5 depth is modest and the rel-bias share +
cross-attn make per-layer pytrees ragged for scan); the compiled graph is
identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from .config import ModelConfig


def relative_buckets(rel_pos: jnp.ndarray, bidirectional: bool,
                     num_buckets: int = 32, max_distance: int = 128) -> jnp.ndarray:
    """T5 relative-position bucketing (HF semantics, which the GGUF tables
    were trained with)."""
    ret = jnp.zeros_like(rel_pos)
    n = num_buckets
    if bidirectional:
        n = n // 2
        ret = ret + (rel_pos > 0).astype(jnp.int32) * n
        rel = jnp.abs(rel_pos)
    else:
        rel = -jnp.minimum(rel_pos, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return ret + jnp.where(is_small, rel, large)


def _pos_bias(table: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
              bidirectional: bool) -> jnp.ndarray:
    """(H, Tq, Tk) additive attention bias from the (n_buckets, H) table."""
    rel = k_pos[None, :] - q_pos[:, None]  # (Tq, Tk)
    bkt = relative_buckets(rel, bidirectional, num_buckets=table.shape[0])
    bias = table[bkt]  # (Tq, Tk, H)
    return bias.transpose(2, 0, 1).astype(jnp.float32)


def _attn(q, k, v, bias, mask):
    """q (B,T,H,D), k/v (B,S,H,D), bias (H,T,S)|None, mask (B,T,S)|None.
    T5 uses scale = 1.0."""
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias[None]
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _proj(x, w):
    return x @ w


def _ffn(h, p, cfg):
    if "w_gate" in p:  # v1.1 gated
        act = jax.nn.gelu(_proj(h, p["w_gate"]).astype(jnp.float32), approximate=False)
        inner = act.astype(h.dtype) * _proj(h, p["w_up"])
    else:  # v1.0 relu
        inner = jax.nn.relu(_proj(h, p["w_up"]).astype(jnp.float32)).astype(h.dtype)
    return _proj(inner, p["w_down"])


@dataclass
class T5State:
    """Decoder memory: self-attn KV per layer + fixed cross K/V."""

    self_k: jnp.ndarray  # (L, B, S, H, D)
    self_v: jnp.ndarray
    cross_k: jnp.ndarray  # (L, B, S_enc, H, D)
    cross_v: jnp.ndarray
    enc_len: jnp.ndarray  # (B,)
    n_past: jnp.ndarray  # (B,)


jax.tree_util.register_dataclass(
    T5State, ["self_k", "self_v", "cross_k", "cross_v", "enc_len", "n_past"], []
)


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
           n_tokens: jnp.ndarray) -> jnp.ndarray:
    """Encoder pass → (B, T, D) hidden states (enc lengths handled by mask)."""
    B, T = tokens.shape
    H, Dh = cfg.n_heads, cfg.head_dim
    x = params["tok_emb"][tokens]
    pos = jnp.arange(T)
    bias = _pos_bias(params["enc_rel_b"], pos, pos, bidirectional=True)
    valid = (jnp.arange(T)[None, :] < n_tokens[:, None])  # (B, T)
    mask = valid[:, None, :] & valid[:, :, None]  # (B, T, T)
    for p in params["enc_layers"]:
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _proj(h, p["wq"]).reshape(B, T, H, Dh)
        k = _proj(h, p["wk"]).reshape(B, T, H, Dh)
        v = _proj(h, p["wv"]).reshape(B, T, H, Dh)
        x = x + _proj(_attn(q, k, v, bias, mask).reshape(B, T, H * Dh), p["wo"])
        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(h, p, cfg)
    return rms_norm(x, params["enc_out_norm"], cfg.rms_eps)


@partial(jax.jit, static_argnames=("cfg", "max_seq"))
def init_decoder_state(params: dict, cfg: ModelConfig, enc_out: jnp.ndarray,
                       enc_len: jnp.ndarray, max_seq: int) -> T5State:
    """Precompute cross-attention K/V from the encoder output."""
    B, S, D = enc_out.shape
    H, Dh = cfg.n_heads, cfg.head_dim
    cks, cvs = [], []
    for p in params["dec_layers"]:
        cks.append(_proj(enc_out, p["cross_wk"]).reshape(B, S, H, Dh))
        cvs.append(_proj(enc_out, p["cross_wv"]).reshape(B, S, H, Dh))
    L = len(params["dec_layers"])
    return T5State(
        self_k=jnp.zeros((L, B, max_seq, H, Dh), enc_out.dtype),
        self_v=jnp.zeros((L, B, max_seq, H, Dh), enc_out.dtype),
        cross_k=jnp.stack(cks),
        cross_v=jnp.stack(cvs),
        enc_len=enc_len.astype(jnp.int32),
        n_past=jnp.zeros((B,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def decode_step(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
                state: T5State) -> tuple[jnp.ndarray, T5State]:
    """Decoder forward over (B, T) new tokens; returns (logits, state)."""
    from ..ops.attention import insert_kv

    B, T = tokens.shape
    H, Dh = cfg.n_heads, cfg.head_dim
    S = state.self_k.shape[2]
    Se = state.cross_k.shape[2]
    x = params["tok_emb"][tokens]
    q_pos_row = state.n_past[0] + jnp.arange(T)  # rel bias per batch-uniform pos
    bias = _pos_bias(params["dec_rel_b"], q_pos_row, jnp.arange(S), bidirectional=False)
    q_pos = state.n_past[:, None] + jnp.arange(T)[None, :]
    self_mask = jnp.arange(S)[None, None, :] <= q_pos[:, :, None]
    cross_mask = (jnp.arange(Se)[None, :] < state.enc_len[:, None])[:, None, :].repeat(T, 1)

    new_sk, new_sv = [], []
    for il, p in enumerate(params["dec_layers"]):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _proj(h, p["wq"]).reshape(B, T, H, Dh)
        k = _proj(h, p["wk"]).reshape(B, T, H, Dh)
        v = _proj(h, p["wv"]).reshape(B, T, H, Dh)
        k_cache = insert_kv(state.self_k[il], k, state.n_past)
        v_cache = insert_kv(state.self_v[il], v, state.n_past)
        new_sk.append(k_cache)
        new_sv.append(v_cache)
        x = x + _proj(_attn(q, k_cache, v_cache, bias, self_mask).reshape(B, T, H * Dh), p["wo"])

        h = rms_norm(x, p["cross_attn_norm"], cfg.rms_eps)
        q = _proj(h, p["cross_wq"]).reshape(B, T, H, Dh)
        x = x + _proj(
            _attn(q, state.cross_k[il], state.cross_v[il], None, cross_mask).reshape(B, T, H * Dh),
            p["cross_wo"],
        )

        h = rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(h, p, cfg)

    x = rms_norm(x, params["dec_out_norm"], cfg.rms_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if params.get("logit_scale") is not None:
        logits = logits * params["logit_scale"]
    new_state = T5State(
        self_k=jnp.stack(new_sk),
        self_v=jnp.stack(new_sv),
        cross_k=state.cross_k,
        cross_v=state.cross_v,
        enc_len=state.enc_len,
        n_past=state.n_past + T,
    )
    return logits, new_state


class T5Model:
    """Encoder-decoder runner (the enc-dec analog of runtime.engine.Engine)."""

    def __init__(self, cfg: ModelConfig, params: dict, tokenizer, max_seq: int = 512):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_seq = max_seq
        self.decoder_start = params.get("decoder_start_token_id", 0)

    @classmethod
    def from_gguf(cls, path: str, max_seq: int = 512, dtype=jnp.float32) -> "T5Model":
        from ..gguf.reader import GGUFModelReader
        from ..models.config import config_from_gguf
        from ..tokenizers import tokenizer_from_gguf

        reader = GGUFModelReader(path)
        cfg = config_from_gguf(reader)
        tok = tokenizer_from_gguf(reader.readers[0])
        params = load_params(reader, cfg, dtype)
        m = cls(cfg, params, tok, max_seq)
        start = reader.get("{arch}.decoder_start_token_id", arch=cfg.arch)
        if start is not None:
            m.decoder_start = int(start)
        return m

    def generate(self, text: str, n_predict: int = 32) -> tuple[str, list[int]]:
        import numpy as np

        ids = self.tokenizer.tokenize(text, add_special=True, parse_special=True)
        toks = jnp.asarray([ids], jnp.int32)
        enc = encode(self.params, self.cfg, toks, jnp.asarray([len(ids)], jnp.int32))
        state = init_decoder_state(self.params, self.cfg, enc,
                                   jnp.asarray([len(ids)], jnp.int32), self.max_seq)
        cur = self.decoder_start
        out: list[int] = []
        eos = self.tokenizer.vocab.special.eos
        for _ in range(n_predict):
            logits, state = decode_step(
                self.params, self.cfg, jnp.asarray([[cur]], jnp.int32), state
            )
            cur = int(np.argmax(np.asarray(logits[0, -1])))
            if eos is not None and cur == eos:
                break
            out.append(cur)
        return self.tokenizer.detokenize(out), out


# ---------------------------------------------------------------------------
# loading (tensor names: llama-arch.cpp T5 table :1452-1489)
# ---------------------------------------------------------------------------


def load_params(reader, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    t = reader.tensors

    def w(name, transpose=True):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return jnp.asarray(a.astype(dtype))

    params: dict = {}
    emb = t["token_embd.weight"].to_f32()
    params["tok_emb"] = jnp.asarray(emb.astype(dtype))
    if "output.weight" in t:
        params["lm_head"] = w("output.weight")
        params["logit_scale"] = None
    else:  # tied: HF scales logits by d_model^-0.5
        params["lm_head"] = jnp.asarray(np.ascontiguousarray(emb.T).astype(dtype))
        params["logit_scale"] = jnp.asarray(cfg.n_embd ** -0.5, jnp.float32)

    def layer_group(prefix, keys):
        out = []
        for i in range(cfg.n_layers):
            p = {}
            for key, suffix, transpose in keys:
                name = f"{prefix}.blk.{i}.{suffix}"
                if name in t:
                    p[key] = w(name, transpose)
            out.append(p)
        return out

    enc_keys = [
        ("attn_norm", "attn_norm.weight", False),
        ("wq", "attn_q.weight", True),
        ("wk", "attn_k.weight", True),
        ("wv", "attn_v.weight", True),
        ("wo", "attn_o.weight", True),
        ("ffn_norm", "ffn_norm.weight", False),
        ("w_gate", "ffn_gate.weight", True),
        ("w_up", "ffn_up.weight", True),
        ("w_down", "ffn_down.weight", True),
    ]
    dec_keys = enc_keys + [
        ("cross_attn_norm", "cross_attn_norm.weight", False),
        ("cross_wq", "cross_attn_q.weight", True),
        ("cross_wk", "cross_attn_k.weight", True),
        ("cross_wv", "cross_attn_v.weight", True),
        ("cross_wo", "cross_attn_o.weight", True),
    ]
    if "enc.blk.0.attn_q.weight" in t:
        params["enc_layers"] = layer_group("enc", enc_keys)
        params["enc_out_norm"] = w("enc.output_norm.weight", False)
        params["enc_rel_b"] = w("enc.blk.0.attn_rel_b.weight", False)
    if "dec.blk.0.attn_q.weight" in t:  # absent for arch "t5encoder"
        params["dec_layers"] = layer_group("dec", dec_keys)
        params["dec_out_norm"] = w("dec.output_norm.weight", False)
        params["dec_rel_b"] = w("dec.blk.0.attn_rel_b.weight", False)
    return params
