"""Multimodal runtime: image chunks into the LM context (mtmd analog).

Reference: tools/mtmd/mtmd.{h,cpp} — text is split around media markers,
each image is encoded (clip.cpp) and its embeddings are injected as a
chunk of positions in the sequence (mtmd.h:87-100 chunk API).  Here the
chunks become rows of an ``embeds`` prefill into the same engine forward.
"""

from __future__ import annotations

import numpy as np

IMAGE_MARKER = "<image>"

# CLIP-family defaults (clip.cpp image_mean/image_std fallbacks)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_image_bytes(
    data: bytes,
    image_size: int,
    mean=CLIP_MEAN,
    std=CLIP_STD,
) -> np.ndarray:
    """Encoded image bytes → normalized (3, S, S) float32 pixels (the stb
    load + bicubic resize + normalize pipeline of clip.cpp)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    img = img.resize((image_size, image_size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0  # (S, S, 3)
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


class MtmdEngine:
    """Wraps a text Engine with a CLIP encoder + projector (mmproj GGUF)."""

    def __init__(self, engine, clip_cfg, clip_params):
        self.engine = engine
        self.clip_cfg = clip_cfg
        self.clip_params = clip_params

    @classmethod
    def from_gguf(cls, model_path: str, mmproj_path: str, **engine_kw) -> "MtmdEngine":
        import jax.numpy as jnp

        from ..gguf.reader import GGUFReader
        from ..models.clip import load_mmproj
        from .engine import Engine

        eng = Engine.from_gguf(model_path, **engine_kw)
        cfg, params = load_mmproj(GGUFReader(mmproj_path),
                                  jnp.float32 if eng.kv_dtype == jnp.float32 else jnp.bfloat16)
        return cls(eng, cfg, params)

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        """(B, 3, H, W) normalized pixels → (B, n_patches, n_embd_lm)."""
        import jax.numpy as jnp

        from ..models.clip import encode_image

        return np.asarray(encode_image(self.clip_params, self.clip_cfg, jnp.asarray(pixels)))

    def build_embeds(self, prompt: str, pixels: np.ndarray) -> tuple[np.ndarray, list[int]]:
        """Tokenize text around IMAGE_MARKER and splice projected image
        features at the marker.  Returns (embeds (1, T, D), token_ids with
        0 placeholders at image positions)."""
        tok = self.engine.tokenizer
        emb_table = np.asarray(self.engine.params["tok_emb"], np.float32)
        parts = prompt.split(IMAGE_MARKER)
        if len(parts) - 1 != 1:
            raise ValueError("exactly one <image> marker supported per prompt")
        pre = tok.tokenize(parts[0], add_special=True, parse_special=True)
        post = tok.tokenize(parts[1], add_special=False, parse_special=True)
        img = self.encode_image(pixels[None] if pixels.ndim == 3 else pixels)[0]
        embeds = np.concatenate(
            [emb_table[pre], img.astype(np.float32), emb_table[post]], axis=0
        )[None]
        ids = pre + [0] * img.shape[0] + post
        return embeds, ids

    def generate(self, prompt: str, pixels: np.ndarray, n_predict: int = 64,
                 sampler=None) -> tuple[str, list[int]]:
        import jax.numpy as jnp

        from ..sampling.samplers import SamplerChain, SamplerParams

        eng = self.engine
        chain = sampler if isinstance(sampler, SamplerChain) else SamplerChain(
            sampler or SamplerParams(greedy=True), eng.cfg.n_vocab
        )
        embeds, ids = self.build_embeds(prompt, pixels)
        n = embeds.shape[1]
        from .engine import bucket_len

        padded = bucket_len(n)
        emb_pad = np.zeros((1, padded, embeds.shape[2]), np.float32)
        emb_pad[:, :n] = embeds
        toks = np.zeros((1, padded), np.int32)
        eng.reset()
        logits, eng.kv = eng._forward(
            eng.params, eng.cfg, jnp.asarray(toks), eng.kv,
            jnp.asarray([n], jnp.int32), embeds=jnp.asarray(emb_pad),
        )
        logits = np.asarray(logits[0, n - 1])
        eog = eng.tokenizer.vocab.special.eog_ids()
        out: list[int] = []
        all_ids = list(ids)
        for _ in range(n_predict):
            t = chain.sample(logits, all_ids)
            chain.accept(t, is_eog=t in eog)
            if t in eog:
                break
            out.append(t)
            all_ids.append(t)
            logits = eng.decode_one(t)
        return eng.tokenizer.detokenize(out), out
