"""Mamba family parity + recurrent-memory semantics (reference:
llm_build_mamba, src/llama-memory-recurrent.cpp)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_mamba

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


@pytest.fixture(scope="module")
def mamba_pair(tmp_path_factory):
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(0)
    hf = MambaForCausalLM(
        MambaConfig(
            vocab_size=VOCAB,
            hidden_size=48,
            state_size=8,
            num_hidden_layers=3,
            conv_kernel=4,
            expand=2,
            time_step_rank=8,
            use_conv_bias=True,
            use_bias=False,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("mamba") / "tiny-mamba-f32.gguf")
    convert_hf_mamba(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_mamba_logits_parity(mamba_pair):
    path, hf = mamba_pair
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.family.name == "mamba"
    ids = [3, 17, 42, 9, 88, 5, 63, 21]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.mamba import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_mamba_greedy_decode(mamba_pair):
    """Incremental decode through the recurrent state must equal HF full
    re-forward — this is the state-carry correctness test."""
    path, hf = mamba_pair
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


def test_mamba_padding_state_clean(mamba_pair):
    """Prefill at different bucket paddings must produce identical states."""
    path, _ = mamba_pair
    from llama_cpp_gfx906_tpu.models.mamba import MambaState, forward

    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    ids = [5, 6, 7]

    s0 = MambaState.create(eng.cfg, 1)
    toks_a = jnp.asarray([[5, 6, 7]], jnp.int32)
    _, st_a = forward(eng.params, eng.cfg, toks_a, s0, jnp.asarray([3], jnp.int32))

    s0 = MambaState.create(eng.cfg, 1)
    toks_b = jnp.asarray([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32)
    _, st_b = forward(eng.params, eng.cfg, toks_b, s0, jnp.asarray([3], jnp.int32))

    np.testing.assert_allclose(np.asarray(st_a.ssm), np.asarray(st_b.ssm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.conv), np.asarray(st_b.conv), rtol=1e-5, atol=1e-6)


def test_falcon_mamba_logits_parity(tmp_path):
    """falcon-mamba: the dt/B/C unweighted-rms flag
    (MambaModel/FalconMamba registration, convert_hf_to_gguf.py:5485/:5541;
    llm_build_mamba rms branch src/llama-model.cpp:11096-11101)."""
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    torch.manual_seed(1)
    hf = FalconMambaForCausalLM(
        FalconMambaConfig(
            vocab_size=VOCAB, hidden_size=48, state_size=8,
            num_hidden_layers=2, conv_kernel=4, expand=2, time_step_rank=8,
            use_conv_bias=True, use_bias=False,
        )
    ).eval()
    path = str(tmp_path / "tiny-falcon-mamba-f32.gguf")
    convert_hf_mamba(hf, dummy_vocab(), path, quant_type=GGMLType.F32,
                     dt_b_c_rms=True)
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.ssm_dt_b_c_rms
    ids = [3, 17, 42, 9, 88, 5]
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.mamba import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([ids], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=2e-3, atol=2e-3)
