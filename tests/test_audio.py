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


def test_qwen2audio_mmproj_parity(tmp_path):
    """qwen2a audio path: whisper tower + avgpool(2) + post-LN + fc must
    match HF Qwen2Audio's audio branch (reference clip.cpp:1525, :1680)."""
    from transformers import Qwen2AudioForConditionalGeneration
    from transformers.models.qwen2_audio import Qwen2AudioConfig

    from llama_cpp_gfx906_tpu.gguf import GGUFReader
    from llama_cpp_gfx906_tpu.models.whisper_enc import (
        encode_audio,
        load_audio_mmproj,
        project_audio,
    )
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_audio_mmproj

    torch.manual_seed(8)
    cfg = Qwen2AudioConfig(
        audio_config=dict(num_mel_bins=20, d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          max_source_positions=64),
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2),
    )
    hf = Qwen2AudioForConditionalGeneration(cfg).eval()
    path = str(tmp_path / "q2a-mmproj.gguf")
    convert_hf_audio_mmproj(hf, path, projector="qwen2a")

    acfg, params, projector, stack = load_audio_mmproj(GGUFReader(path))
    assert projector == "qwen2a" and acfg.avgpool

    rng = np.random.default_rng(0)
    # HF requires mel length = max_source_positions · conv strides (= 128)
    mel = rng.standard_normal((1, 20, 128)).astype(np.float32)
    with torch.no_grad():
        tower = hf.audio_tower if hasattr(hf, "audio_tower") else hf.model.audio_tower
        enc = tower(torch.tensor(mel)).last_hidden_state
        proj_mod = (hf.multi_modal_projector if hasattr(hf, "multi_modal_projector")
                    else hf.model.multi_modal_projector)
        ref = proj_mod(enc)[0].numpy()

    feats = encode_audio(params, acfg, jnp.asarray(mel))
    got = np.asarray(project_audio(params, feats, projector, stack))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_ultravox_projector_oracle():
    """Ultravox stacked-swiglu projector vs a literal numpy transcription
    (clip.cpp:1505-1523; swiglu_swapped: second half gates)."""
    from llama_cpp_gfx906_tpu.models.whisper_enc import project_audio

    rng = np.random.default_rng(3)
    B, T, D, SF, HID, OUT = 1, 10, 16, 4, 24, 32
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    mm1 = (rng.standard_normal((D * SF, 2 * HID)) * 0.2).astype(np.float32)
    mm2 = (rng.standard_normal((HID, OUT)) * 0.2).astype(np.float32)
    npre = (1 + rng.standard_normal(D * SF) * 0.05).astype(np.float32)
    nmid = (1 + rng.standard_normal(HID) * 0.05).astype(np.float32)
    params = {"mm1_w": jnp.asarray(mm1), "mm2_w": jnp.asarray(mm2),
              "mm_norm_pre": jnp.asarray(npre), "mm_norm_mid": jnp.asarray(nmid)}
    got = np.asarray(project_audio(params, jnp.asarray(feats), "ultravox", SF))[0]

    flat = feats.reshape(-1)
    pad = (-len(flat)) % (D * SF)
    flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    x = flat.reshape(-1, D * SF)
    x = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * npre
    x = x @ mm1
    a, b = x[:, :HID], x[:, HID:]
    x = a * (b / (1 + np.exp(-b)))
    x = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * nmid
    want = x @ mm2
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
