"""T5 encoder-decoder parity vs HF transformers (reference builders:
llm_build_t5_enc/t5_dec, src/llama-model.cpp:13114/13215)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.models.t5 import T5Model, decode_step, encode, init_decoder_state
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_t5

VOCAB = 96


def dummy_vocab():
    tokens = ["<pad>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "t5",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
        "bos": None,
        "eos": 1,
    }


@pytest.fixture(scope="module", params=["relu", "gated-gelu"])
def t5_pair(request, tmp_path_factory):
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(
        T5Config(
            vocab_size=VOCAB,
            d_model=48,
            d_kv=12,
            d_ff=96,
            num_layers=2,
            num_heads=4,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=20,
            feed_forward_proj=request.param,
            tie_word_embeddings=True,
            decoder_start_token_id=0,
            pad_token_id=0,
            eos_token_id=1,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("t5") / f"tiny-t5-{request.param}.gguf")
    convert_hf_t5(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path, hf


def test_t5_encoder_parity(t5_pair):
    path, hf = t5_pair
    m = T5Model.from_gguf(path, max_seq=32)
    ids = [3, 17, 42, 9, 5]
    with torch.no_grad():
        ref = hf.encoder(torch.tensor([ids])).last_hidden_state[0].numpy()
    got = encode(m.params, m.cfg, jnp.asarray([ids], jnp.int32),
                 jnp.asarray([len(ids)], jnp.int32))
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=3e-3, atol=3e-3)


def test_t5_full_parity(t5_pair):
    path, hf = t5_pair
    m = T5Model.from_gguf(path, max_seq=32)
    src = [3, 17, 42, 9, 5]
    dec_in = [0, 7, 21, 4]  # starts with decoder_start_token
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([src]), decoder_input_ids=torch.tensor([dec_in])
        ).logits[0].numpy()
    enc = encode(m.params, m.cfg, jnp.asarray([src], jnp.int32),
                 jnp.asarray([len(src)], jnp.int32))
    state = init_decoder_state(m.params, m.cfg, enc, jnp.asarray([len(src)], jnp.int32), 32)
    logits, _ = decode_step(m.params, m.cfg, jnp.asarray([dec_in], jnp.int32), state)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=3e-3, atol=3e-3)


def test_t5_incremental_matches_hf_greedy(t5_pair):
    path, hf = t5_pair
    m = T5Model.from_gguf(path, max_seq=32)
    src = [3, 17, 42, 9]
    n_steps = 6
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([src]), max_new_tokens=n_steps, do_sample=False,
            num_beams=1, min_new_tokens=n_steps,
        )[0].tolist()
    # strip decoder_start; HF may stop early on eos even with min_new_tokens
    ref = out[1:]

    enc = encode(m.params, m.cfg, jnp.asarray([src], jnp.int32),
                 jnp.asarray([len(src)], jnp.int32))
    state = init_decoder_state(m.params, m.cfg, enc, jnp.asarray([len(src)], jnp.int32), 32)
    cur = 0
    got = []
    for _ in range(len(ref)):
        logits, state = decode_step(m.params, m.cfg, jnp.asarray([[cur]], jnp.int32), state)
        cur = int(np.argmax(np.asarray(logits[0, -1])))
        got.append(cur)
    assert got == ref


def test_t5_generate_api(t5_pair):
    path, _ = t5_pair
    m = T5Model.from_gguf(path, max_seq=32)
    text, ids = m.generate("<t3><t4>", n_predict=5)
    assert isinstance(text, str) and len(ids) <= 5


def test_t5encoder_arch(tmp_path):
    """T5EncoderModel converts to arch "t5encoder" (no decoder tensors)
    and the encoder output matches HF last_hidden_state."""
    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(2)
    hf = T5EncoderModel(T5Config(
        vocab_size=VOCAB, d_model=48, d_kv=12, d_ff=96, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        pad_token_id=0, eos_token_id=1)).eval()
    path = str(tmp_path / "tiny-t5enc.gguf")
    convert_hf_t5(hf, dummy_vocab(), path, quant_type=GGMLType.F32)

    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf
    from llama_cpp_gfx906_tpu.models.t5 import load_params

    reader = GGUFReader(path)
    assert reader.architecture == "t5encoder"
    assert not any(n.startswith("dec.") for n in reader.tensors)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    assert "dec_layers" not in params
    ids = [5, 17, 42, 9, 1]
    out = encode(params, cfg, jnp.asarray([ids], jnp.int32),
                 jnp.asarray([len(ids)], jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=2e-3, atol=2e-3)
