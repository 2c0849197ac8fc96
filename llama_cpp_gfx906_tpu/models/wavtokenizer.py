"""WavTokenizer decoder (arch "wavtokenizer-dec") — audio codes → samples.

Reference: ``llm_build_wavtokenizer_dec`` (src/llama-model.cpp:15682) +
the ISTFT epilogue in ``tools/tts/tts.cpp`` (``embd_to_audio`` :201).
Graph: code embeddings → conv1d → PosNet (2 resnet blocks, 1 attention
block, 2 resnet blocks, group norm) → token layer-norm → ConvNeXt stack
(depthwise conv, layer norm, gelu MLP, learned gamma, residual) → output
head producing a (T, n_embd_features) log-magnitude/phase spectrogram,
converted to waveform with a hann-windowed inverse STFT (n_fft 1280,
hop 320, overlap-add with window-envelope normalization).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import Keys


@dataclass(frozen=True)
class WavTokConfig:
    n_embd: int  # model width (codebook embedding dim)
    n_features: int  # output spectrogram dim (2 × (n_fft/2 + 1))
    posnet_embd: int
    posnet_layers: int
    convnext_embd: int
    convnext_layers: int
    norm_eps: float = 1e-5
    group_eps: float = 1e-5
    n_groups: int = 32


def config_from_gguf(reader) -> WavTokConfig:
    arch = reader.architecture

    def g(key, default=None):
        v = reader.get(key, arch=arch)
        return default if v is None else v

    # reference key layout (llama-model.cpp:481-487 + convert hidden_size):
    # embedding_length = OUTPUT spectrogram dim (n_embd, 1282);
    # features_length = codebook embedding dim (n_embd_features, 512)
    return WavTokConfig(
        n_embd=int(g("{arch}.features_length", 512)),
        n_features=int(g(Keys.LLM.EMBEDDING_LENGTH)),
        posnet_embd=int(g("{arch}.posnet.embedding_length", 768)),
        posnet_layers=int(g("{arch}.posnet.block_count", 6)),
        convnext_embd=int(g("{arch}.convnext.embedding_length", 768)),
        convnext_layers=int(g("{arch}.convnext.block_count", 12)),
        norm_eps=float(g(Keys.Attention.LAYERNORM_EPS, 1e-5)),
        group_eps=float(g("{arch}.attention.group_norm_epsilon", 1e-5)),
        n_groups=int(g("{arch}.attention.group_norm_groups", 32)),
    )


def _conv1d(x, w, b, groups: int = 1):
    """Same-padded conv over (C_in, T) with GGUF kernel (C_out, C_in/g, k)."""
    k = w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x[None],  # (1, C, T)
        w,
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=groups,
    )[0]
    return out + b[:, None]


def _group_norm(x, w, b, n_groups, eps):
    """ggml LLM_NORM_GROUP over (C, T)."""
    C, T = x.shape
    g = x.reshape(n_groups, C // n_groups, T)
    mu = g.mean(axis=(1, 2), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(C, T) * w[:, None] + b[:, None]


def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def forward(params: dict, cfg: WavTokConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (T,) int32 → spectrogram embd (T, n_features) float32."""
    x = params["tok_emb"][codes]  # (T, D)
    x = x.T  # (C, T) — ggml's conv layout

    x = _conv1d(x, params["conv1d"], params["conv1d_b"])

    for il, p in enumerate(params["posnet"]):
        inp = x
        kind = p["kind"]
        if kind == "resnet":
            h = _group_norm(x, p["norm1"], p["norm1_b"], cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d(h, p["conv1"], p["conv1_b"])
            h = _group_norm(h, p["norm2"], p["norm2_b"], cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d(h, p["conv2"], p["conv2_b"])
            x = h + inp
        elif kind == "attn":
            h = _group_norm(x, p["attn_norm"], p["attn_norm_b"], cfg.n_groups, cfg.group_eps)
            q = _conv1d(h, p["attn_q"], p["attn_q_b"])  # (C, T)
            k = _conv1d(h, p["attn_k"], p["attn_k_b"])
            v = _conv1d(h, p["attn_v"], p["attn_v_b"])
            scores = (q.T @ k) / jnp.sqrt(jnp.float32(cfg.posnet_embd))  # (T, T)
            probs = jax.nn.softmax(scores, axis=-1)
            h = v @ probs.T  # (C, T)
            h = _conv1d(h, p["attn_o"], p["attn_o_b"])
            x = h + inp
        else:  # final group norm
            x = _group_norm(x, p["norm"], p["norm_b"], cfg.n_groups, cfg.group_eps)

    x = x.T  # (T, C)
    x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"], cfg.norm_eps)
    x = x.T

    for p in params["convnext"]:
        inp = x
        h = _conv1d(x, p["dw"], p["dw_b"], groups=x.shape[0])
        h = h.T  # (T, C)
        h = _layer_norm(h, p["norm"], p["norm_b"], cfg.norm_eps)
        h = jax.nn.gelu(h @ p["pw1"] + p["pw1_b"], approximate=False)
        h = h @ p["pw2"] + p["pw2_b"]
        h = h * p["gamma"]
        x = h.T + inp

    x = x.T  # (T, C)
    x = _layer_norm(x, params["out_norm"], params["out_norm_b"], cfg.norm_eps)
    return (x @ params["output"] + params["output_b"]).astype(jnp.float32)


def embd_to_audio(
    embd: np.ndarray, n_fft: int = 1280, n_hop: int = 320
) -> np.ndarray:
    """Spectrogram embd (T, 2·(n_fft/2+1)) → waveform (tts.cpp:201).

    First half = log magnitude, second half = phase; hann-windowed inverse
    FFT per frame, overlap-add, normalized by the folded window envelope."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # (T, n_fft/2+1)
    frames = np.fft.irfft(spec, n=n_fft, axis=-1)  # (T, n_fft)
    hann = np.hanning(n_fft + 1)[:-1]  # periodic hann
    frames = frames * hann

    n_out = (n_codes - 1) * n_hop + n_fft
    audio = np.zeros(n_out, np.float64)
    env = np.zeros(n_out, np.float64)
    for l in range(n_codes):
        s = l * n_hop
        audio[s : s + n_fft] += frames[l]
        env[s : s + n_fft] += hann * hann
    n_pad = (n_fft - n_hop) // 2
    audio = audio[n_pad : n_out - n_pad]
    env = env[n_pad : n_out - n_pad]
    return (audio / np.maximum(env, 1e-8)).astype(np.float32)


def load_params(reader, cfg: WavTokConfig) -> dict:
    """GGUF → param pytree (tensor table: LLM_ARCH_WAVTOKENIZER_DEC)."""
    t = reader.tensors

    def get(name, transpose=False):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return jnp.asarray(a, jnp.float32)

    params: dict = {
        "tok_emb": get("token_embd.weight"),
        "conv1d": get("conv1d.weight"),
        "conv1d_b": get("conv1d.bias").reshape(-1),
        "tok_norm": get("token_embd_norm.weight"),
        "tok_norm_b": get("token_embd_norm.bias"),
        "out_norm": get("output_norm.weight"),
        "out_norm_b": get("output_norm.bias"),
        "output": get("output.weight", transpose=True),
        "output_b": get("output.bias"),
    }
    posnet = []
    for il in range(cfg.posnet_layers):
        b = f"posnet.{il}."
        if b + "attn_q.weight" in t:
            posnet.append({
                "kind": "attn",
                "attn_norm": get(b + "attn_norm.weight"),
                "attn_norm_b": get(b + "attn_norm.bias"),
                **{
                    f"attn_{x}": get(b + f"attn_{n}.weight")
                    for x, n in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "output"))
                },
                **{
                    f"attn_{x}_b": get(b + f"attn_{n}.bias").reshape(-1)
                    for x, n in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "output"))
                },
            })
        elif b + "conv1.weight" in t:
            posnet.append({
                "kind": "resnet",
                "norm1": get(b + "norm1.weight"), "norm1_b": get(b + "norm1.bias"),
                "conv1": get(b + "conv1.weight"), "conv1_b": get(b + "conv1.bias").reshape(-1),
                "norm2": get(b + "norm2.weight"), "norm2_b": get(b + "norm2.bias"),
                "conv2": get(b + "conv2.weight"), "conv2_b": get(b + "conv2.bias").reshape(-1),
            })
        else:
            posnet.append({
                "kind": "norm",
                "norm": get(b + "norm.weight"), "norm_b": get(b + "norm.bias"),
            })
    params["posnet"] = posnet
    params["convnext"] = [
        {
            "dw": get(f"convnext.{il}.dw.weight"),
            "dw_b": get(f"convnext.{il}.dw.bias").reshape(-1),
            "norm": get(f"convnext.{il}.norm.weight"),
            "norm_b": get(f"convnext.{il}.norm.bias"),
            "pw1": get(f"convnext.{il}.pw1.weight", transpose=True),
            "pw1_b": get(f"convnext.{il}.pw1.bias"),
            "pw2": get(f"convnext.{il}.pw2.weight", transpose=True),
            "pw2_b": get(f"convnext.{il}.pw2.bias"),
            "gamma": get(f"convnext.{il}.gamma.weight").reshape(-1),
        }
        for il in range(cfg.convnext_layers)
    ]
    return params
