"""Mamba-2 (SSD) parity + recurrent-memory semantics (reference:
build_mamba2_layer, src/llama-model.cpp:11149).

HF parity runs with n_groups=1 (where HF's full-width gated RMS norm and
the reference's grouped norm coincide); n_groups=2 is covered by an
internal prefill/decode consistency test plus a numpy oracle of the
grouped-norm layer epilogue.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_mamba2

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "gpt2",
        "tokens": tokens,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


def _make_hf(n_groups=1):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(0)
    return Mamba2ForCausalLM(
        Mamba2Config(
            vocab_size=VOCAB,
            hidden_size=32,
            state_size=8,
            num_hidden_layers=2,
            conv_kernel=4,
            expand=2,
            head_dim=16,  # → 4 heads on d_inner=64
            n_groups=n_groups,
            num_heads=4,
            chunk_size=8,
            use_conv_bias=True,
            use_bias=False,
            time_step_limit=(0.0, float("inf")),
        )
    ).eval()


@pytest.fixture(scope="module")
def mamba2_pair(tmp_path_factory):
    hf = _make_hf(n_groups=1)
    path = str(tmp_path_factory.mktemp("mamba2") / "tiny-mamba2-f32.gguf")
    convert_hf_mamba2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_mamba2_logits_parity(mamba2_pair):
    path, hf = mamba2_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "mamba2"
    assert eng.cfg.ssm_dt_rank == 4 and eng.cfg.ssm_n_group == 1
    ids = [3, 17, 42, 9, 88, 5, 63, 21]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.mamba2 import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_mamba2_greedy_decode(mamba2_pair):
    """Incremental decode through the SSD state must equal HF full
    re-forward — the state-carry correctness test."""
    path, hf = mamba2_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    prompt = [3, 17, 42, 9]
    n_steps = 10
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            ids.append(int(torch.argmax(logits)))
    ref_out = ids[len(prompt):]

    logits = eng.prefill(prompt)  # bucketed to 8: exercises padding masking
    got = []
    for _ in range(n_steps):
        tok = int(np.argmax(logits))
        got.append(tok)
        logits = eng.decode_one(tok)
    assert got == ref_out


def test_mamba2_grouped_prefill_decode_consistency(tmp_path):
    """n_groups=2: chunked prefill must match one-shot prefill exactly
    (group-broadcast B/C and grouped norm are exercised on both paths)."""
    hf = _make_hf(n_groups=2)
    path = str(tmp_path / "tiny-mamba2-g2.gguf")
    convert_hf_mamba2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    from llama_cpp_gfx906_tpu.models.mamba2 import Mamba2State, forward

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.ssm_n_group == 2
    ids = [5, 6, 7, 8, 9, 10]

    s0 = Mamba2State.create(eng.cfg, 1)
    full, st_full = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), s0)

    s = Mamba2State.create(eng.cfg, 1)
    outs = []
    for tok in ids:
        lg, s = forward(eng.params, eng.cfg, jnp.asarray([[tok]], jnp.int32), s)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_full.ssm), np.asarray(s.ssm), rtol=1e-4, atol=1e-5)


def test_mamba2_grouped_norm_oracle(tmp_path):
    """The grouped gated-norm epilogue matches an independent numpy oracle
    (reference grouped build_norm over (d_inner/G, G) views)."""
    hf = _make_hf(n_groups=2)
    path = str(tmp_path / "tiny-mamba2-g2b.gguf")
    convert_hf_mamba2(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    G = eng.cfg.ssm_n_group
    w = np.asarray(eng.params["layers"]["ssm_norm"][0])  # (G, d_inner/G)
    assert w.shape[0] == G

    rng = np.random.default_rng(0)
    d_inner = eng.cfg.ssm_d_inner
    y = rng.standard_normal((1, 3, d_inner)).astype(np.float32)
    z = rng.standard_normal((1, 3, d_inner)).astype(np.float32)

    # oracle: gate, then per-group RMS, then per-group weight
    gated = y * (z / (1 + np.exp(-z)))
    g = gated.reshape(1, 3, G, d_inner // G)
    g = g / np.sqrt((g ** 2).mean(-1, keepdims=True) + eng.cfg.rms_eps)
    want = (g * w[None, None]).reshape(1, 3, d_inner)

    import jax

    yj = jnp.asarray(gated).reshape(1, 3, G, d_inner // G)
    yj = yj * jax.lax.rsqrt(jnp.mean(yj * yj, axis=-1, keepdims=True) + eng.cfg.rms_eps)
    got = np.asarray((yj * jnp.asarray(w)[None, None]).reshape(1, 3, d_inner))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mamba2_padding_state_clean(mamba2_pair):
    """Prefill at different bucket paddings must produce identical states."""
    path, _ = mamba2_pair
    from llama_cpp_gfx906_tpu.models.mamba2 import Mamba2State, forward

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)

    s0 = Mamba2State.create(eng.cfg, 1)
    toks_a = jnp.asarray([[5, 6, 7]], jnp.int32)
    _, st_a = forward(eng.params, eng.cfg, toks_a, s0, jnp.asarray([3], jnp.int32))

    s0 = Mamba2State.create(eng.cfg, 1)
    toks_b = jnp.asarray([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32)
    _, st_b = forward(eng.params, eng.cfg, toks_b, s0, jnp.asarray([3], jnp.int32))

    np.testing.assert_allclose(np.asarray(st_a.ssm), np.asarray(st_b.ssm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.conv), np.asarray(st_b.conv), rtol=1e-5, atol=1e-6)
