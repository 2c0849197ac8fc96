"""Audio mtmd path: whisper encoder parity vs HF + mel front-end parity
vs WhisperFeatureExtractor (reference: tools/mtmd/mtmd-audio.cpp +
clip.cpp audio branch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.models.whisper_enc import (
    encode_audio,
    load_from_hf_whisper_encoder,
    log_mel_spectrogram,
)


@pytest.fixture(scope="module")
def whisper_enc():
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    m = WhisperModel(
        WhisperConfig(
            vocab_size=64, d_model=48, encoder_layers=2, encoder_attention_heads=4,
            decoder_layers=1, decoder_attention_heads=4, encoder_ffn_dim=96,
            decoder_ffn_dim=96, num_mel_bins=80, max_source_positions=1500,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1, suppress_tokens=None, begin_suppress_tokens=None,
        )
    ).eval()
    return m.encoder


def test_whisper_encoder_parity(whisper_enc):
    cfg, params = load_from_hf_whisper_encoder(whisper_enc)
    rng = np.random.default_rng(0)
    # whisper expects exactly max_source_positions*2 frames
    T = whisper_enc.config.max_source_positions * 2
    mel = rng.standard_normal((1, 80, T)).astype(np.float32)
    with torch.no_grad():
        ref = whisper_enc(torch.tensor(mel)).last_hidden_state[0].numpy()
    got = np.asarray(encode_audio(params, cfg, jnp.asarray(mel))[0])
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)  # 2s
    ref = fe(audio, sampling_rate=16000, return_tensors="np", padding="max_length").input_features[0]
    # our mel over the same 30s-padded window
    padded = np.zeros(16000 * 30, np.float32)
    padded[: len(audio)] = audio
    got = log_mel_spectrogram(padded)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
