"""iSWA ring cache: SWA layers store only ~window rows; logits must match
the full-cache forward exactly (the window mask already hides everything
the ring evicts).  Reference: llama-kv-cache-unified-iswa.cpp."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama", "tokens": tokens, "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1,
    }


@pytest.fixture(scope="module")
def gemma2_path(tmp_path_factory):
    """gemma2-style iSWA: every other layer sliding (pattern 2)."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_gemma

    torch.manual_seed(70)
    hf = Gemma2ForCausalLM(Gemma2Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=8, max_position_embeddings=256,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )).eval()
    path = str(tmp_path_factory.mktemp("swar") / "tiny-gemma2.gguf")
    convert_hf_gemma(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     arch="gemma2")
    return path


def test_swa_ring_matches_full_cache(gemma2_path):
    ids = list(np.random.default_rng(0).integers(3, VOCAB, 40))
    ids = [int(t) for t in ids]

    full = Engine.from_gguf(gemma2_path, max_seq=96, dtype=jnp.float32)
    ring = Engine.from_gguf(gemma2_path, max_seq=96, dtype=jnp.float32,
                            swa_ring=True)
    lf = full.prefill(ids)
    lr = ring.prefill(ids)
    np.testing.assert_allclose(lr, lf, rtol=2e-4, atol=2e-4)
    # decode continuity past the window (ring rows recycle)
    t = int(np.argmax(lf))
    for _ in range(20):
        lf = full.decode_one(t)
        lr = ring.decode_one(t)
        np.testing.assert_allclose(lr, lf, rtol=2e-4, atol=2e-4)
        t = int(np.argmax(lf))


def test_swa_ring_memory_saving(gemma2_path):
    """SWA layers allocate ≈ window(+chunk) rows, not max_seq — the
    iSWA memory point at long contexts (VERDICT item 6b).  Accounting
    uses a large max_seq so the ring's chunk slack is negligible."""
    ring = Engine.from_gguf(gemma2_path, max_seq=8192, dtype=jnp.float32,
                            swa_ring=True)
    full = Engine.from_gguf(gemma2_path, max_seq=8192, dtype=jnp.float32)
    ring_bytes = ring.kv.memory_bytes()
    full_bytes = full.kv.k.nbytes + full.kv.v.nbytes
    # 2 of 4 layers are SWA with window 8 (+512 chunk slack, rounded):
    # expect roughly half the full allocation, and strictly well below it
    assert ring_bytes < 0.6 * full_bytes
    assert ring.kv.k_swa.shape[2] <= 8 + 512 + 128