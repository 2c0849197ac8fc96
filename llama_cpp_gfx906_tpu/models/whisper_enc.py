"""Whisper-style audio encoder + mel front end (mtmd audio path).

Reference: tools/mtmd/mtmd-audio.cpp (log-mel DSP) + the audio branch of
clip.cpp (:1445-1520): conv1d(k3,s1)+gelu → conv1d(k3,s2)+gelu →
+sinusoidal positions → pre-LN transformer (q/v biased, k unbiased) →
post-LN → projector.  Encoder runs as one jitted function; the mel
spectrogram is host-side numpy DSP like the reference's CPU front end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm

# whisper DSP constants (mtmd-audio.cpp / HF WhisperFeatureExtractor)
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160


def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filterbank (the matrix whisper ships precomputed)."""
    fmin, fmax = 0.0, sr / 2
    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + 27.0 * np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lower = (fft_freqs - freqs[i]) / max(freqs[i + 1] - freqs[i], 1e-10)
        upper = (freqs[i + 2] - fft_freqs) / max(freqs[i + 2] - freqs[i + 1], 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (freqs[2 : n_mels + 2] - freqs[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """waveform (n_samples,) float32 [-1,1] → (n_mels, n_frames) log-mel,
    whisper normalization (mtmd-audio.cpp / HF WhisperFeatureExtractor)."""
    audio = np.asarray(audio, np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP_LENGTH
    frames = np.lib.stride_tricks.as_strided(
        padded,
        shape=(n_frames, N_FFT),
        strides=(padded.strides[0] * HOP_LENGTH, padded.strides[0]),
    )
    stft = np.fft.rfft(frames * window, axis=1)
    magnitudes = np.abs(stft[:-1]) ** 2  # drop the last frame like whisper
    mel = mel_filterbank(n_mels) @ magnitudes.T  # (n_mels, T)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


@dataclass(frozen=True)
class WhisperEncConfig:
    n_mels: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_ff: int
    eps: float = 1e-5
    # qwen2audio/voxtral: AvgPool1d(2) over time before the post-norm
    # (clip.cpp audio_has_avgpool, :1680)
    avgpool: bool = False


@partial(jax.jit, static_argnames=("cfg",))
def encode_audio(params: dict, cfg: WhisperEncConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, n_mels, T) → hidden states (B, T//2, D)."""
    B = mel.shape[0]
    x = jax.lax.conv_general_dilated(
        mel, params["conv1_w"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv1_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2_w"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    ) + params["conv2_b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T', D)
    T = x.shape[1]
    x = x + params["pos_embd"][None, :T]

    H = cfg.n_heads
    D = cfg.n_embd
    Dh = D // H
    for p in params["layers"]:
        h = layer_norm(x, p["ln1"], p["ln1_b"], cfg.eps)
        q = (h @ p["wq"] + p["bq"]).reshape(B, T, H, Dh)
        k = (h @ p["wk"]).reshape(B, T, H, Dh)  # whisper: no k bias
        v = (h @ p["wv"] + p["bv"]).reshape(B, T, H, Dh)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * Dh**-0.5, axis=-1)
        attn = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + (attn.reshape(B, T, D) @ p["wo"] + p["bo"])
        h = layer_norm(x, p["ln2"], p["ln2_b"], cfg.eps)
        h = jax.nn.gelu((h @ p["ffn_up"] + p["b_up"]).astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + (h @ p["ffn_down"] + p["b_down"])
    if cfg.avgpool:
        Tp = (T // 2) * 2
        x = x[:, :Tp].reshape(B, Tp // 2, 2, D).mean(axis=2)
    return layer_norm(x, params["post_ln"], params["post_ln_b"], cfg.eps)


def load_from_hf_whisper_encoder(encoder, dtype=jnp.float32) -> tuple[WhisperEncConfig, dict]:
    """Directly load a transformers WhisperEncoder module (test/convert path)."""
    sd = {k: v.detach().cpu().float().numpy() for k, v in encoder.state_dict().items()}
    hf = encoder.config
    cfg = WhisperEncConfig(
        n_mels=hf.num_mel_bins, n_embd=hf.d_model,
        n_layers=hf.encoder_layers, n_heads=hf.encoder_attention_heads,
        n_ff=hf.encoder_ffn_dim,
    )
    J = lambda a: jnp.asarray(a.astype(np.float32))
    params = {
        "conv1_w": J(sd["conv1.weight"]), "conv1_b": J(sd["conv1.bias"]),
        "conv2_w": J(sd["conv2.weight"]), "conv2_b": J(sd["conv2.bias"]),
        "pos_embd": J(sd["embed_positions.weight"]),
        "post_ln": J(sd["layer_norm.weight"]), "post_ln_b": J(sd["layer_norm.bias"]),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        params["layers"].append({
            "ln1": J(sd[p + "self_attn_layer_norm.weight"]),
            "ln1_b": J(sd[p + "self_attn_layer_norm.bias"]),
            "wq": J(sd[p + "self_attn.q_proj.weight"].T), "bq": J(sd[p + "self_attn.q_proj.bias"]),
            "wk": J(sd[p + "self_attn.k_proj.weight"].T),
            "wv": J(sd[p + "self_attn.v_proj.weight"].T), "bv": J(sd[p + "self_attn.v_proj.bias"]),
            "wo": J(sd[p + "self_attn.out_proj.weight"].T), "bo": J(sd[p + "self_attn.out_proj.bias"]),
            "ln2": J(sd[p + "final_layer_norm.weight"]), "ln2_b": J(sd[p + "final_layer_norm.bias"]),
            "ffn_up": J(sd[p + "fc1.weight"].T), "b_up": J(sd[p + "fc1.bias"]),
            "ffn_down": J(sd[p + "fc2.weight"].T), "b_down": J(sd[p + "fc2.bias"]),
        })
    return cfg, params


# ---------------------------------------------------------------------------
# audio mmproj: GGUF loading + LM-space projectors
# (reference: clip.cpp build_whisper_enc:1445-1545 — ultravox stacked-swiglu,
# qwen2audio fc, voxtral stacked-gelu projectors; names clip-impl.h TN_*/"a.")
# ---------------------------------------------------------------------------


def project_audio(params: dict, feats: jnp.ndarray, projector: str,
                  stack_factor: int = 8) -> jnp.ndarray:
    """Whisper-encoder output (B, T, D) → LM embeddings.

    - "ultravox": StackAudioFrames(stack_factor) → RMS pre-norm → mm.1 →
      swiglu_swapped (second half gates) → RMS mid-norm → mm.2
    - "qwen2a": single fc (weight + bias)
    - "voxtral": stack → mm.1 → gelu_erf → mm.2
    """
    B, T, D = feats.shape

    def stack(x):
        # StackAudioFrames: flatten and regroup rows of stack_factor frames,
        # zero-padding the tail (ultravox_model.py via clip.cpp:1496)
        stride = D * stack_factor
        flat = x.reshape(B, T * D)
        pad = (-flat.shape[1]) % stride
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
        return flat.reshape(B, -1, stride)

    def rms(x, w):
        xf = x.astype(jnp.float32)
        return (xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + 1e-6)
                * w.astype(jnp.float32)).astype(x.dtype)

    if projector == "ultravox":
        x = stack(feats)
        x = rms(x, params["mm_norm_pre"])
        x = x @ params["mm1_w"]
        half = x.shape[-1] // 2
        # swiglu_swapped: the SECOND half is silu'd and gates the first
        x = x[..., :half] * jax.nn.silu(x[..., half:].astype(jnp.float32)).astype(x.dtype)
        x = rms(x, params["mm_norm_mid"])
        return x @ params["mm2_w"]
    if projector == "qwen2a":
        return feats @ params["mm_fc_w"] + params["mm_fc_b"]
    if projector == "voxtral":
        x = stack(feats)
        x = x @ params["mm1_w"]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        return x @ params["mm2_w"]
    raise ValueError(f"unknown audio projector: {projector}")


def load_audio_mmproj(reader, dtype=jnp.float32):
    """Audio mmproj GGUF → (cfg, params, projector, stack_factor).

    Keys clip.audio.* (clip-impl.h KEY_N_* with the "audio" prefix),
    tensors under the "a." prefix plus mm.a.* projector weights."""
    g = lambda k, d=None: reader.get(k) if reader.get(k) is not None else d
    projector = str(g("clip.projector_type", "ultravox"))
    cfg = WhisperEncConfig(
        n_mels=int(g("clip.audio.num_mel_bins", 80)),
        n_embd=int(g("clip.audio.embedding_length")),
        n_layers=int(g("clip.audio.block_count")),
        n_heads=int(g("clip.audio.attention.head_count")),
        n_ff=int(g("clip.audio.feed_forward_length")),
        eps=float(g("clip.audio.attention.layer_norm_epsilon", 1e-5)),
        avgpool=projector in ("qwen2a", "voxtral"),
    )
    stack_factor = int(g("clip.audio.projector.stack_factor", 8))
    t = reader.tensors

    def w(name, transpose=False):
        a = t[name].to_f32()
        if transpose:
            a = np.ascontiguousarray(a.T)
        return jnp.asarray(a.astype(dtype))

    params = {
        "conv1_w": w("a.conv1d.1.weight"), "conv1_b": w("a.conv1d.1.bias"),
        "conv2_w": w("a.conv1d.2.weight"), "conv2_b": w("a.conv1d.2.bias"),
        "pos_embd": w("a.position_embd.weight"),
        "post_ln": w("a.post_ln.weight"), "post_ln_b": w("a.post_ln.bias"),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        b = f"a.blk.{i}."
        params["layers"].append({
            "ln1": w(b + "ln1.weight"), "ln1_b": w(b + "ln1.bias"),
            "wq": w(b + "attn_q.weight", True), "bq": w(b + "attn_q.bias"),
            "wk": w(b + "attn_k.weight", True),
            "wv": w(b + "attn_v.weight", True), "bv": w(b + "attn_v.bias"),
            "wo": w(b + "attn_out.weight", True), "bo": w(b + "attn_out.bias"),
            "ln2": w(b + "ln2.weight"), "ln2_b": w(b + "ln2.bias"),
            "ffn_up": w(b + "ffn_up.weight", True), "b_up": w(b + "ffn_up.bias"),
            "ffn_down": w(b + "ffn_down.weight", True), "b_down": w(b + "ffn_down.bias"),
        })
    if projector == "ultravox":
        params["mm_norm_pre"] = w("mm.a.norm_pre.weight")
        params["mm_norm_mid"] = w("mm.a.norm_mid.weight")
        params["mm1_w"] = w("mm.a.mlp.1.weight", True)
        params["mm2_w"] = w("mm.a.mlp.2.weight", True)
    elif projector == "qwen2a":
        params["mm_fc_w"] = w("mm.a.fc.weight", True)
        params["mm_fc_b"] = w("mm.a.fc.bias")
    elif projector == "voxtral":
        params["mm1_w"] = w("mm.a.mlp.1.weight", True)
        params["mm2_w"] = w("mm.a.mlp.2.weight", True)
    return cfg, params, projector, stack_factor
