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


def main(argv=None) -> int:
    import jax.numpy as jnp

    from ..gguf.reader import GGUFModelReader
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    ap = argparse.ArgumentParser(prog="llama-tts (TPU)")
    ap.add_argument("-m", "--model", required=True, help="OuteTTS LLM GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer decoder GGUF")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--n-predict", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.4)
    args = ap.parse_args(argv)

    eng = Engine.from_gguf(args.model, max_seq=8192)
    words = process_text(args.prompt)
    prompt = build_prompt(words)
    text, out_ids = eng.generate(
        prompt, n_predict=args.n_predict,
        sampler=SamplerParams(temp=args.temp, top_k=40, greedy=args.temp <= 0),
    )
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
