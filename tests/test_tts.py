"""TTS pipeline (reference: tools/tts — OuteTTS + WavTokenizer decoder).

No real OuteTTS weights ship with the repo, so coverage is structural +
numeric: a synthetic WavTokenizer GGUF drives the full decoder graph, and
the ISTFT epilogue is validated by round-tripping an actual STFT of a
known signal."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.constants import Keys
from llama_cpp_gfx906_tpu.gguf.writer import GGUFWriter
from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
from llama_cpp_gfx906_tpu.models import wavtokenizer as wtk
from llama_cpp_gfx906_tpu.tools.tts import (
    build_prompt, extract_codes, process_text, save_wav16,
)

RNG = np.random.default_rng(0)

D = 32           # model width
FEAT = 2 * (64 // 2 + 1)  # tiny n_fft=64 spectrogram
PN = 16          # posnet width (n_groups must divide)


def _w(*shape, s=0.2):
    return (RNG.standard_normal(shape) * s).astype(np.float32)


def make_wavtok_gguf(path):
    w = GGUFWriter(path, "wavtokenizer-dec")
    w.add_uint32(Keys.LLM.CONTEXT_LENGTH, 8192)
    # reference format: embedding_length = spectrogram dim, features_length
    # = codebook dim (llama-model.cpp:481-487)
    w.add_uint32(Keys.LLM.EMBEDDING_LENGTH, FEAT)
    w.add_uint32(Keys.LLM.BLOCK_COUNT, 0)
    w.add_uint32("wavtokenizer-dec.features_length", D)
    w.add_uint32("wavtokenizer-dec.posnet.embedding_length", PN)
    w.add_uint32("wavtokenizer-dec.posnet.block_count", 6)
    w.add_uint32("wavtokenizer-dec.convnext.embedding_length", D)
    w.add_uint32("wavtokenizer-dec.convnext.block_count", 2)
    w.add_float32(Keys.Attention.LAYERNORM_EPS, 1e-5)
    w.add_float32("wavtokenizer-dec.attention.group_norm_epsilon", 1e-5)
    w.add_uint32("wavtokenizer-dec.attention.group_norm_groups", 4)

    def t(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    t("token_embd.weight", _w(100, D))
    t("conv1d.weight", _w(PN, D, 7))
    t("conv1d.bias", _w(PN))
    for il in range(6):
        b = f"posnet.{il}."
        if il == 2:
            t(b + "attn_norm.weight", 1 + _w(PN, s=0.05))
            t(b + "attn_norm.bias", _w(PN))
            for n in ("q", "k", "v", "output"):
                t(b + f"attn_{n}.weight", _w(PN, PN, 1))
                t(b + f"attn_{n}.bias", _w(PN))
        elif il == 5:
            t(b + "norm.weight", 1 + _w(PN, s=0.05))
            t(b + "norm.bias", _w(PN))
        else:
            t(b + "norm1.weight", 1 + _w(PN, s=0.05))
            t(b + "norm1.bias", _w(PN))
            t(b + "conv1.weight", _w(PN, PN, 3))
            t(b + "conv1.bias", _w(PN))
            t(b + "norm2.weight", 1 + _w(PN, s=0.05))
            t(b + "norm2.bias", _w(PN))
            t(b + "conv2.weight", _w(PN, PN, 3))
            t(b + "conv2.bias", _w(PN))
    t("token_embd_norm.weight", 1 + _w(PN, s=0.05))
    t("token_embd_norm.bias", _w(PN))
    for il in range(2):
        b = f"convnext.{il}."
        t(b + "dw.weight", _w(PN, 1, 7))
        t(b + "dw.bias", _w(PN))
        t(b + "norm.weight", 1 + _w(PN, s=0.05))
        t(b + "norm.bias", _w(PN))
        t(b + "pw1.weight", _w(48, PN))
        t(b + "pw1.bias", _w(48))
        t(b + "pw2.weight", _w(PN, 48))
        t(b + "pw2.bias", _w(PN))
        t(b + "gamma.weight", 1 + _w(PN, s=0.05))
    t("output_norm.weight", 1 + _w(PN, s=0.05))
    t("output_norm.bias", _w(PN))
    t("output.weight", _w(FEAT, PN))
    t("output.bias", _w(FEAT))
    return w.write()


def test_wavtokenizer_decoder_forward(tmp_path):
    path = make_wavtok_gguf(str(tmp_path / "wtk.gguf"))
    reader = GGUFReader(path)
    cfg = wtk.config_from_gguf(reader)
    assert cfg.n_features == FEAT and cfg.posnet_layers == 6
    params = wtk.load_params(reader, cfg)
    codes = jnp.asarray(RNG.integers(0, 100, 24), jnp.int32)
    embd = np.asarray(wtk.forward(params, cfg, codes))
    assert embd.shape == (24, FEAT)
    assert np.isfinite(embd).all()
    # different codes → different spectrogram (graph actually depends on input)
    embd2 = np.asarray(wtk.forward(params, cfg, codes[::-1]))
    assert not np.allclose(embd, embd2)


def test_istft_roundtrip():
    """embd_to_audio inverts an actual STFT of a known signal."""
    n_fft, n_hop = 1280, 320
    t = np.arange(n_hop * 40 + n_fft)
    # keep spectral magnitudes under the reference's 1e2 clip
    sig = 0.05 * np.sin(2 * np.pi * 440 * t / 24000).astype(np.float64)
    hann = np.hanning(n_fft + 1)[:-1]
    # forward STFT with the same framing (frame l starts at l*n_hop)
    n_frames = (len(sig) - n_fft) // n_hop + 1
    spec = np.stack([
        np.fft.rfft(sig[l * n_hop : l * n_hop + n_fft] * hann)
        for l in range(n_frames)
    ])
    mag = np.abs(spec)
    embd = np.concatenate([
        np.log(np.maximum(mag, 1e-10)), np.angle(spec)
    ], axis=1).astype(np.float32)
    audio = wtk.embd_to_audio(embd, n_fft=n_fft, n_hop=n_hop)
    # compare the interior (edges lack full overlap); account for the
    # n_pad trim offset
    n_pad = (n_fft - n_hop) // 2
    ref = sig[n_pad : n_pad + len(audio)]
    a, b = audio[n_fft:-n_fft], ref[n_fft:-n_fft]
    err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert err < 2e-3, err


def test_prompt_and_code_extraction():
    words = process_text("Hello, World! It's 42 degrees.")
    assert words == ["hello", "world", "its", "degrees"]
    p = build_prompt(words)
    assert p.startswith("<|im_start|>\n<|text_start|>hello<|text_sep|>")
    assert p.endswith("<|audio_start|>\n")

    class V:
        tokens = ["x", "<|123|>", "<|text_end|>", "<|7|>", "<|im_end|>"]

    assert extract_codes([0, 1, 2, 3, 4], V()) == [123, 7]


def test_save_wav16(tmp_path):
    path = str(tmp_path / "t.wav")
    audio = np.sin(np.linspace(0, 40, 2400)).astype(np.float32) * 0.3
    save_wav16(path, audio)
    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert len(raw) == 44 + 2 * len(audio)


def test_wavtokenizer_hf_converter_roundtrip(tmp_path):
    """An HF-layout WavTokenizerDec checkpoint (backbone.* names, reference
    convert_pt_to_hf.py output format) converts via convert_hf_auto and
    produces the exact forward of the directly-authored GGUF."""
    import json

    import torch

    from llama_cpp_gfx906_tpu.tools.convert_auto import convert_hf_auto

    # source of truth: the fixture GGUF this file already validates
    direct = make_wavtok_gguf(str(tmp_path / "direct.gguf"))
    reader = GGUFReader(direct)
    cfg = wtk.config_from_gguf(reader)
    params = wtk.load_params(reader, cfg)

    # re-express the same tensors under HF names
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    state = {}
    t = reader.tensors
    back = {
        "token_embd.": "backbone.embedding.",
        "conv1d.": "backbone.embed.",
        "token_embd_norm.": "backbone.norm.",
        "output_norm.": "backbone.final_layer_norm.",
        "output.": "head.out.",
    }
    for name in t:
        new = name
        for g, h in back.items():
            if new.startswith(g):
                new = h + new[len(g):]
                break
        else:
            import re as _re
            new = _re.sub(r"^posnet\.(\d+)\.attn_output\.", r"backbone.posnet.\1.proj_out.", new)
            new = _re.sub(r"^posnet\.(\d+)\.attn_([qkv])\.", r"backbone.posnet.\1.\2.", new)
            new = _re.sub(r"^posnet\.(\d+)\.attn_norm\.", r"backbone.posnet.\1.norm.", new)
            new = _re.sub(r"^posnet\.", "backbone.posnet.", new)
            new = _re.sub(r"^convnext\.(\d+)\.dw\.", r"backbone.convnext.\1.dwconv.", new)
            new = _re.sub(r"^convnext\.(\d+)\.pw1\.", r"backbone.convnext.\1.pwconv1.", new)
            new = _re.sub(r"^convnext\.(\d+)\.pw2\.", r"backbone.convnext.\1.pwconv2.", new)
            new = _re.sub(r"^convnext\.", "backbone.convnext.", new)
        state[new] = torch.from_numpy(np.ascontiguousarray(t[name].to_f32()))
    # dropped bookkeeping tensors must be tolerated
    state["feature_extractor.encodec.quantizer.vq.layers.0._codebook.cluster_size"] = torch.zeros(4)
    torch.save(state, hf_dir / "pytorch_model.bin")
    (hf_dir / "config.json").write_text(json.dumps({
        "architectures": ["WavTokenizerDec"],
        "hidden_size": FEAT, "n_embd_features": D, "n_ff": 48,
        "vocab_size": 100, "layer_norm_epsilon": 1e-5,
        "group_norm_epsilon": 1e-5, "group_norm_groups": 4,
        "max_position_embeddings": 8192, "n_layer": 2,
        "posnet": {"n_embd": PN, "n_layer": 6},
        "convnext": {"n_embd": D, "n_layer": 2},
    }))

    out = convert_hf_auto(hf_dir, str(tmp_path / "conv.gguf"), outtype="f32")
    r2 = GGUFReader(out)
    cfg2 = wtk.config_from_gguf(r2)
    assert (cfg2.n_embd, cfg2.n_features) == (cfg.n_embd, cfg.n_features)
    assert cfg2.n_groups == 4
    params2 = wtk.load_params(r2, cfg2)
    codes = jnp.asarray(RNG.integers(0, 100, 17), jnp.int32)
    a = np.asarray(wtk.forward(params, cfg, codes))
    b = np.asarray(wtk.forward(params2, cfg2, codes))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # --outtype f16 is honored for matrix weights (1D stays f32)
    out16 = convert_hf_auto(hf_dir, str(tmp_path / "conv16.gguf"), outtype="f16")
    r16 = GGUFReader(out16)
    assert r16.tensors["token_embd.weight"].ggml_type == GGMLType.F16
    assert r16.tensors["output_norm.weight"].ggml_type == GGMLType.F32
    c = np.asarray(wtk.forward(wtk.load_params(r16, cfg2), cfg2, codes))
    np.testing.assert_allclose(a, c, rtol=1e-2, atol=1e-2)
