"""OuteTTS text-to-speech pipeline (reference: ``tools/tts/tts.cpp``).

Two models cooperate:
1. the OuteTTS LLM turns text into audio-code tokens (``<|N|>`` pieces
   between ``<|audio_start|>`` and end-of-generation);
2. the WavTokenizer decoder (models/wavtokenizer.py) turns the code
   sequence into a spectrogram, converted to waveform by the hann ISTFT.

    python -m llama_cpp_gfx906_tpu.tools.tts -m outetts.gguf \
        -mv wavtokenizer.gguf -p "Hello world" -o out.wav
"""

from __future__ import annotations

import argparse
import re
import struct

import numpy as np

SAMPLE_RATE = 24000


def process_text(text: str) -> list[str]:
    """Reference process_text: lowercase, strip punctuation to spaces."""
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    return [w for w in text.split() if w]


def build_prompt(words: list[str], version: str = "0.2") -> str:
    """OuteTTS prompt layout (tts.cpp:436-520)."""
    sep = "<|text_sep|>" if version in ("0.2", "0.3") else " "
    return (
        "<|im_start|>\n<|text_start|>"
        + sep.join(words)
        + "<|text_end|>\n<|audio_start|>\n"
    )


def extract_codes(token_ids: list[int], vocab) -> list[int]:
    """Generated tokens → decoder code ids.

    The audio tokens are the ``<|N|>`` pieces (reference keeps ids in
    [151672, 155772] and subtracts the base; here the base is found from
    the vocabulary so any OuteTTS variant works)."""
    codes = []
    for tid in token_ids:
        text = vocab.tokens[tid]
        m = re.fullmatch(r"<\|(\d+)\|>", text)
        if m:
            codes.append(int(m.group(1)))
    return codes


def save_wav16(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    """Mono 16-bit PCM WAV writer (tts.cpp save_wav16)."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def codes_to_audio(codes: list[int], wtk_reader) -> np.ndarray:
    """Run the WavTokenizer decoder over a code sequence."""
    import jax.numpy as jnp

    from ..models.wavtokenizer import (
        config_from_gguf, embd_to_audio, forward, load_params,
    )

    cfg = config_from_gguf(wtk_reader)
    params = load_params(wtk_reader, cfg)
    embd = np.asarray(forward(params, cfg, jnp.asarray(codes, jnp.int32)))
    return embd_to_audio(embd)


def speaker_from_file(path: str) -> dict:
    """--tts-speaker-file json (tts.cpp speaker_from_file)."""
    import json

    with open(path, encoding="utf-8") as f:
        return json.load(f)


def speaker_text(speaker: dict, sep: str = "<|text_sep|>") -> str:
    """Words of the speaker profile, prepended to the text section
    (tts.cpp audio_text_from_speaker)."""
    return "".join(w["word"] + sep for w in speaker.get("words", ()))


def speaker_data(speaker: dict) -> str:
    """Audio-code section seeding the voice (tts.cpp
    audio_data_from_speaker, v0.2 layout)."""
    parts = []
    for w in speaker.get("words", ()):
        codes = "".join(f"<|{c}|>" for c in w.get("codes", ()))
        parts.append(f"{w['word']}<|t_{w.get('duration', 0.0):.2f}|>"
                     f"<|code_start|>{codes}<|code_end|>\n")
    return "".join(parts)


def _generate_guided(eng, prompt: str, n_predict: int, sp, guide: list[int]):
    """tts.cpp guide-token loop: after each newline the next sampled token
    is replaced by the first token of the next prompt word — prevents the
    TTS from hallucinating or skipping words."""
    from ..sampling.samplers import SamplerChain

    chain = SamplerChain(sp, eng.cfg.n_vocab)
    ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
    eng.reset()
    logits = eng.prefill(ids)
    vocab = eng.tokenizer.vocab
    eog = set(vocab.special.eog_ids())
    nl = eng.tokenizer.tokenize("\n", add_special=False)[0]
    out_ids: list[int] = []
    all_ids = list(ids)
    pending = list(guide)
    use_guide = True
    for _ in range(n_predict):
        tok = chain.sample(logits, all_ids)
        if (pending and use_guide and tok not in eog
                and not vocab.is_special(tok)):
            tok = pending.pop(0)
        use_guide = tok == nl
        chain.accept(tok, is_eog=tok in eog)
        if tok in eog:
            break
        out_ids.append(tok)
        all_ids.append(tok)
        logits = eng.decode_one(tok)
    return out_ids


def main(argv=None) -> int:
    from ..common.args import build_parser, maybe_print_completion
    from ..gguf.reader import GGUFModelReader
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    ap = build_parser("tts", description="OuteTTS text → WAV")
    ap.prog = "llama-tts (TPU)"
    args = ap.parse_args(argv)
    if maybe_print_completion(args, "tts", "llama-tts"):
        return 0
    if not args.model_vocoder or not args.prompt:
        raise SystemExit("-mv/--model-vocoder and -p are required")
    args.output = args.output or "output.wav"
    if args.n_predict <= 0 or args.n_predict == 128:  # registry default
        args.n_predict = 4096
    temp = args.temp if args.temp != 0.8 else 0.4  # tts default 0.4 (tts.cpp)

    eng = Engine.from_gguf(args.model, max_seq=8192)
    words = process_text(args.prompt)
    if args.tts_speaker_file:
        speaker = speaker_from_file(args.tts_speaker_file)
        prompt = ("<|im_start|>\n<|text_start|>" + speaker_text(speaker)
                  + "<|text_sep|>".join(words)
                  + "<|text_end|>\n<|audio_start|>\n" + speaker_data(speaker))
    else:
        prompt = build_prompt(words)
    sp = SamplerParams(temp=temp, top_k=40, greedy=temp <= 0)
    if args.tts_use_guide_tokens:
        tok = eng.tokenizer
        guide = [tok.tokenize("\n", add_special=False)[0]]
        for w in words:
            t = tok.tokenize(w, add_special=False)
            if t:
                guide.append(t[0])
        out_ids = _generate_guided(eng, prompt, args.n_predict, sp, guide)
    else:
        _, out_ids = eng.generate(prompt, n_predict=args.n_predict,
                                  sampler=sp)
    codes = extract_codes(out_ids, eng.tokenizer.vocab)
    if not codes:
        print("no audio codes generated")
        return 1
    print(f"[tts] {len(codes)} audio codes")
    audio = codes_to_audio(codes, GGUFModelReader(args.model_vocoder))
    save_wav16(args.output, audio)
    print(f"[tts] wrote {args.output}: {len(audio) / SAMPLE_RATE:.2f}s @ {SAMPLE_RATE} Hz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
