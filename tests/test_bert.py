"""BERT encoder parity vs HF transformers (embeddings + rank head).

Reference coverage: llm_build_bert (src/llama-model.cpp), build_pooling
(src/llama-graph.cpp:1802), server rerank (server.cpp:4810).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import BertConfig, BertForSequenceClassification, BertModel

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFReader
from llama_cpp_gfx906_tpu.models.bert import forward, load_params, pool, rank_score
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.runtime.encoder import EncoderEngine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_bert

VOCAB = 96


def wpm_vocab():
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(VOCAB - 5)
    ]
    return {
        "model": "bert",
        "tokens": tokens,
        "token_types": [3, 2, 3, 3, 3] + [1] * (VOCAB - 5),
        "bos": 2,  # [CLS]
        "eos": 3,
        "sep": 3,
        "pad": 0,
        "unk": 1,
    }


def tiny_bert_cfg():
    return BertConfig(
        vocab_size=VOCAB,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=80,
        max_position_embeddings=64,
        type_vocab_size=2,
    )


@pytest.fixture(scope="module")
def bert_gguf(tmp_path_factory):
    torch.manual_seed(0)
    model = BertModel(tiny_bert_cfg()).eval()
    path = str(tmp_path_factory.mktemp("b") / "tiny-bert.gguf")
    convert_hf_bert(model, wpm_vocab(), path, quant_type=GGMLType.F32)
    return path, model


def test_bert_hidden_parity(bert_gguf):
    path, hf = bert_gguf
    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    assert cfg.arch == "bert" and cfg.norm_type == "layer" and not cfg.ffn_gated
    params = load_params(reader, cfg)

    ids = [2, 10, 34, 55, 7, 3]  # [CLS] ... [SEP]
    n = len(ids)
    toks = np.zeros((1, 8), np.int32)
    toks[0, :n] = ids
    got = np.asarray(
        forward(params, cfg, jnp.asarray(toks), jnp.asarray([n], jnp.int32))
    )[0, :n]
    with torch.no_grad():
        ref = hf(
            torch.tensor([ids]), attention_mask=torch.ones(1, n, dtype=torch.long)
        ).last_hidden_state[0].numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_bert_padding_invariance(bert_gguf):
    """Padded positions must not leak into valid-token hidden states."""
    path, _ = bert_gguf
    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    ids = [2, 10, 34, 3]
    a = np.zeros((1, 8), np.int32); a[0, :4] = ids
    b = np.zeros((1, 16), np.int32); b[0, :4] = ids; b[0, 4:] = 77
    ha = np.asarray(forward(params, cfg, jnp.asarray(a), jnp.asarray([4])))[0, :4]
    hb = np.asarray(forward(params, cfg, jnp.asarray(b), jnp.asarray([4])))[0, :4]
    np.testing.assert_allclose(ha, hb, rtol=1e-5, atol=1e-5)


def test_bert_rank_head_parity(tmp_path):
    torch.manual_seed(1)
    model = BertForSequenceClassification(tiny_bert_cfg()).eval()
    path = str(tmp_path / "tiny-rerank.gguf")
    convert_hf_bert(model, wpm_vocab(), path, quant_type=GGMLType.F32, pooling=2)
    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    assert "cls_out_w" in params and "cls_w" in params

    ids = [2, 11, 30, 9, 3, 40, 41, 3]
    n = len(ids)
    toks = np.zeros((1, 8), np.int32)
    toks[0, :n] = ids
    hidden = forward(params, cfg, jnp.asarray(toks), jnp.asarray([n], jnp.int32))
    got = float(np.asarray(rank_score(params, hidden, jnp.asarray([n])))[0])
    with torch.no_grad():
        ref = float(model(torch.tensor([ids])).logits[0, 0])
    assert abs(got - ref) < 2e-3 * (abs(ref) + 1)


def test_encoder_engine_embed_and_rerank(bert_gguf, tmp_path):
    path, _ = bert_gguf
    eng = EncoderEngine.from_gguf(path)
    vecs = eng.embed(["tok1 tok2", "tok3 tok4 tok5"])
    assert vecs.shape[0] == 2 and np.isfinite(vecs).all()
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, rtol=1e-4)

    # rank-head model end-to-end
    torch.manual_seed(1)
    model = BertForSequenceClassification(tiny_bert_cfg()).eval()
    rpath = str(tmp_path / "rr.gguf")
    convert_hf_bert(model, wpm_vocab(), rpath, quant_type=GGMLType.F32, pooling=2)
    rr = EncoderEngine.from_gguf(rpath)
    assert rr.has_rank_head
    scores = rr.rerank("tok1 tok2", ["tok3 tok4", "tok5", "tok1 tok2 tok3"])
    assert len(scores) == 3 and all(np.isfinite(s) for s in scores)
