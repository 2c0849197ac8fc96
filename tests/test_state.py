"""State save/load + context shift (reference strategy:
examples/save-load-state, test of llama_state_* round trip;
context-shift semantics from server.cpp:3049-3090)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("m") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_state_roundtrip(model_path, tmp_path):
    """save → new engine → load → continued decode must match."""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    prompt = [3, 17, 42, 9, 7]
    logits = eng.prefill(prompt)
    toks = [int(np.argmax(logits))]
    for _ in range(3):
        toks.append(int(np.argmax(eng.decode_one(toks[-1]))))

    sfile = str(tmp_path / "sess.bin")
    eng.save_state(sfile, prompt + toks)

    # continue original
    cont_a = [int(np.argmax(eng.decode_one(toks[-1])))]
    for _ in range(4):
        cont_a.append(int(np.argmax(eng.decode_one(cont_a[-1]))))

    # fresh engine + load
    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    hist = eng2.load_state(sfile)
    assert hist == prompt + toks
    cont_b = [int(np.argmax(eng2.decode_one(toks[-1])))]
    for _ in range(4):
        cont_b.append(int(np.argmax(eng2.decode_one(cont_b[-1]))))
    assert cont_a == cont_b


def test_state_rejects_other_model(model_path, tmp_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng.prefill([1, 2, 3])
    sfile = str(tmp_path / "sess.bin")
    eng.save_state(sfile, [1, 2, 3])

    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng2.cfg = eng2.cfg.with_(n_layers=99)
    with pytest.raises(ValueError):
        eng2.load_state(sfile)


def test_context_shift_layer0_exact(model_path):
    """Layer-0 K/V after a shift must equal a fresh prefill of the
    survivors: layer-0 keys depend only on the token + its position, so
    this isolates the row-move + re-rope correctness.  (Deeper layers
    legitimately differ — their K/V embed the dropped context; the
    reference's context shift has the same approximation.)"""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25, 33, 11, 40, 6, 28, 13]
    n_keep, n_discard = 2, 4
    eng.prefill(tokens)
    eng.context_shift(n_keep, n_discard)
    survivors = tokens[:n_keep] + tokens[n_keep + n_discard :]
    assert eng.n_past == len(survivors)

    eng2 = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    eng2.prefill(survivors)
    n = len(survivors)
    np.testing.assert_allclose(
        np.asarray(eng.kv.k)[0, :, :n], np.asarray(eng2.kv.k)[0, :, :n], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(eng.kv.v)[0, :, :n], np.asarray(eng2.kv.v)[0, :, :n], rtol=1e-5, atol=1e-5
    )


def test_context_shift_zero_discard_noop(model_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25]
    eng.prefill(tokens)
    k_before = np.asarray(eng.kv.k).copy()
    eng.context_shift(2, 0)
    assert eng.n_past == len(tokens)
    np.testing.assert_allclose(np.asarray(eng.kv.k), k_before, rtol=1e-6, atol=1e-6)


def test_context_shift_decode_continues(model_path):
    """After a shift the engine keeps decoding deterministically."""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25, 33, 11, 40, 6, 28, 13]
    eng.prefill(tokens)
    eng.context_shift(4, 4)
    out = []
    logits = eng.decode_one(50)
    for _ in range(4):
        tok = int(np.argmax(logits))
        out.append(tok)
        logits = eng.decode_one(tok)
    assert all(0 <= t < VOCAB for t in out)
    assert eng.n_past == len(tokens) - 4 + 5


def test_seq_state_file_roundtrip(model_path, tmp_path):
    from llama_cpp_gfx906_tpu.runtime.state import load_seq_state_file, save_seq_state_file

    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    state = {
        "k": np.random.randn(3, 5, 2, 16).astype(np.float32),
        "v": np.random.randn(3, 5, 2, 16).astype(np.float32),
        "n_past": 5,
        "prompt_ids": [1, 2, 3],
        "generated": [4, 5],
    }
    f = str(tmp_path / "seq.bin")
    save_seq_state_file(f, state, eng.cfg)
    back = load_seq_state_file(f, eng.cfg)
    np.testing.assert_array_equal(back["k"], state["k"])
    assert back["n_past"] == 5 and back["generated"] == [4, 5]


def test_seq_div_self_extend(model_path):
    """Grouped self-extend (passkey recipe): dividing positions by g must
    equal a fresh prefill at the grouped positions for layer-0 keys, and
    decoding continues at the compressed position."""
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25, 33, 11]
    eng.prefill(tokens)
    eng.seq_div(0, 8, 2)  # positions 0..7 -> 0,0,1,1,2,2,3,3
    assert int(eng.kv.pos_next[0]) == 4
    want_pos = [0, 0, 1, 1, 2, 2, 3, 3]
    np.testing.assert_array_equal(np.asarray(eng.kv.pos[0, :8]), want_pos)

    # layer-0 K rows must equal raw keys roped at the grouped positions
    import jax.numpy as jnp2

    from llama_cpp_gfx906_tpu.models.llama import forward
    from llama_cpp_gfx906_tpu.ops.rope import apply_rope, rope_frequencies

    layers = eng.params["layers"]
    emb = np.asarray(eng.params["tok_emb"], np.float32)[tokens][None]
    from llama_cpp_gfx906_tpu.models.llama import _norm

    h = _norm(jnp2.asarray(emb), layers["attn_norm"][0], None, eng.cfg)
    if "wk" in layers:
        wk0 = layers["wk"][0]
    else:  # loader-fused qkv: slice the K block back out
        Dq = eng.cfg.n_heads * eng.cfg.head_dim
        Dkv = eng.cfg.n_kv_heads * eng.cfg.head_dim
        wk0 = layers["wqkv_fused"][0][:, Dq : Dq + Dkv]
    k_raw = (h @ wk0).reshape(1, 8, eng.cfg.n_kv_heads, eng.cfg.head_dim)
    inv = jnp2.asarray(rope_frequencies(eng.cfg))
    k_want = apply_rope(k_raw, jnp2.asarray([want_pos]), inv, eng.cfg.rope_interleaved)
    np.testing.assert_allclose(
        np.asarray(eng.kv.k)[0, 0, :8], np.asarray(k_want[0]), rtol=2e-4, atol=2e-4
    )

    # decoding still works and uses position 4 next
    logits = eng.decode_one(50)
    assert np.isfinite(logits).all()
    assert int(eng.kv.pos[0, 8]) == 4
    assert int(eng.kv.pos_next[0]) == 5


def test_seq_add_shift(model_path):
    eng = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    tokens = [3, 17, 42, 9, 7, 25]
    eng.prefill(tokens)
    eng.seq_add(2, 6, -2)  # drop-like reposition of the tail
    np.testing.assert_array_equal(np.asarray(eng.kv.pos[0, :6]), [0, 1, 0, 1, 2, 3])
    assert int(eng.kv.pos_next[0]) == 4
    logits = eng.decode_one(50)
    assert np.isfinite(logits).all()


def test_swa_prefix_reuse_no_checkpoints(tmp_path):
    """SWA models: branching from a shorter cached prefix must be exact.

    The reference prunes SWA KV rows outside the window, so branching needs
    saved snapshots (server.cpp swa_checkpoint, :3319-3360).  This design
    keeps every row resident and applies the window in the attention mask,
    so prefix reuse needs no checkpoints — this test pins that property."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig

    torch.manual_seed(11)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path / "tiny-swa.gguf")
    # mistral-style sliding window of 6 tokens on every layer
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     arch="mistral",
                     extra_kv={"mistral.attention.sliding_window": 6})
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.sliding_window == 6

    base = [3, 17, 42, 9, 88, 5, 63, 21, 7, 11, 30, 2]  # longer than the window

    def run(be, prompt, n):
        s = be.add_request(list(prompt), n, SamplerConfig(temp=0.0))
        out = None
        for _ in range(300):
            for slot, tok, finished in be.step():
                if finished:
                    out = list(slot.generated)
                    be.release(slot)
            if out is not None:
                return out
        raise AssertionError("no completion")

    be = BatchedEngine(eng.cfg, eng.params, eng.tokenizer, n_slots=1,
                       max_seq=64, dtype=jnp.float32)
    # long request fills the cache well past the window...
    first = run(be, base, 6)
    # ...then a request sharing only a SHORT prefix (n_match < n_past - n_swa)
    branch = base[:3] + [44, 45]
    got = run(be, branch, 6)

    fresh = BatchedEngine(eng.cfg, eng.params, eng.tokenizer, n_slots=1,
                          max_seq=64, dtype=jnp.float32)
    want = run(fresh, branch, 6)
    assert got == want
    # and re-running the original long prompt (now a prefix-cache hit from
    # the branch) is also exact
    again = run(be, base, 6)
    assert again == first
