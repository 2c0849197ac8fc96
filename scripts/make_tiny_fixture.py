"""Build the committed real-weights GGUF fixture (round-3 VERDICT item 8).

The environment has no network egress, so instead of a downloaded
stories15M-class checkpoint the fixture is a byte-level llama TRAINED IN
REPO on the repository's own documentation text (deterministic: pinned
seeds, pinned corpus slice).  The reference commits real vocab GGUFs and
pulls tiny real models in CI (`/root/reference/tests/CMakeLists.txt:
114-126`); this is the offline equivalent — real (trained, non-random)
weights whose greedy continuations and perplexity are pinned so parity
stops depending on random-init oracles.

Outputs (committed):
  tests/fixtures/tinydoc-byte.f16.gguf   — trained model, f16
  tests/fixtures/tinydoc_expected.json   — pinned greedy tokens + ppl

Rebuild with:  python scripts/make_tiny_fixture.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT_DIR = os.path.join(REPO, "tests", "fixtures")
SEED = 1234
CTX = 128
STEPS = int(os.environ.get("FIXTURE_STEPS", "600"))


def corpus_text() -> str:
    """Deterministic corpus: the repo's own top-level docs."""
    parts = []
    for name in ("README.md", "SURVEY.md", "PARITY.md", "BASELINE.md"):
        p = os.path.join(REPO, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                parts.append(f.read())
    text = "\n\n".join(parts)
    return text[:262144]  # pinned slice


def byte_vocab() -> dict:
    tokens = ["<s>", "</s>", "<unk>"] + [f"<0x{b:02X}>" for b in range(256)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * len(tokens),
        "token_types": [3, 3, 2] + [6] * 256,  # CONTROL×2, UNK, BYTE×256
        "bos": 0,
        "eos": 1,
    }


def encode(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-8"), np.uint8).astype(np.int64) + 3


def build_model():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(SEED)
    cfg = LlamaConfig(
        vocab_size=259,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=CTX,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    return LlamaForCausalLM(cfg)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    ids = encode(corpus_text())
    n_train = int(len(ids) * 0.95)
    train, held = ids[:n_train], ids[n_train:]
    print(f"corpus: {len(ids)} byte-tokens ({n_train} train)")

    gguf_path = os.path.join(OUT_DIR, "tinydoc-byte.f16.gguf")
    if "--reuse" in sys.argv and os.path.exists(gguf_path):
        return pin_expectations(gguf_path, held)

    model = build_model()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    rng = np.random.default_rng(SEED)
    B = 16
    for step in range(STEPS):
        starts = rng.integers(0, n_train - CTX - 1, B)
        batch = np.stack([train[s : s + CTX + 1] for s in starts])
        x = torch.from_numpy(batch[:, :-1])
        y = torch.from_numpy(batch[:, 1:])
        loss = torch.nn.functional.cross_entropy(
            model(input_ids=x).logits.reshape(-1, 259), y.reshape(-1)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 100 == 0 or step == STEPS - 1:
            print(f"step {step}: loss {loss.item():.4f}")
    model.eval()

    from llama_cpp_gfx906_tpu.gguf import GGMLType
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    convert_hf_llama(model, byte_vocab(), gguf_path, quant_type=GGMLType.F16)
    print("wrote", gguf_path, os.path.getsize(gguf_path), "bytes")
    pin_expectations(gguf_path, held)


def pin_expectations(gguf_path: str, held: np.ndarray):
    """Pin greedy continuations + held-out ppl through OUR engine (f32)."""
    import jax
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    eng = Engine.from_gguf(gguf_path, max_seq=192, dtype=jnp.float32,
                           keep_quantized=False)
    prompts = ["The ", "# ", "quant", "tensor parallel"]
    greedy = {}
    for p in prompts:
        _, toks = eng.generate(p, n_predict=24, stop_on_eog=False)
        greedy[p] = toks

    # held-out byte perplexity through the engine's prefill logits
    held_ids = [int(t) for t in held[: CTX + 1]]
    toks = np.asarray([held_ids[:-1]], np.int32)
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward

    kv = KVCache.create(eng.cfg, 1, CTX, jnp.float32)
    logits, _ = forward(eng.params, eng.cfg, jnp.asarray(toks), kv)
    logp = np.asarray(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1),
            jnp.asarray(held_ids[1:], jnp.int32)[:, None], axis=-1,
        )[:, 0]
    )
    ppl = float(np.exp(-logp.mean()))
    print("held-out byte-ppl:", ppl)

    with open(os.path.join(OUT_DIR, "tinydoc_expected.json"), "w") as f:
        json.dump({
            "greedy": greedy,
            "held_ids": held_ids,
            "ppl": ppl,
            "steps": STEPS,
            "seed": SEED,
        }, f, indent=1)
    print("wrote expectations")


if __name__ == "__main__":
    main()
