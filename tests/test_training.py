"""Training epoch/dataset API (reference: llama_opt_init/llama_opt_epoch,
llama-context.cpp:2039-2188; tests/test-opt.cpp behavior contract)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.training import TokenDataset, Trainer
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import dummy_vocab, tiny_hf_model


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    hf = tiny_hf_model(seed=21)
    path = str(tmp_path_factory.mktemp("t") / "train.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=False)


def make_dataset(ctx=16, n_repeat=40):
    # a highly learnable periodic sequence
    ids = ([5, 9, 13, 7, 21, 33, 11, 4] * n_repeat)
    return TokenDataset.from_tokens(ids, ctx)


def test_dataset_chunking():
    ds = TokenDataset.from_tokens(list(range(50)), ctx=16)
    assert ds.seqs.shape == (3, 17)  # starts at 0, 16, 32 (stride = ctx)
    toks, tgts, mask = next(ds.batches(1, 0, len(ds)))
    np.testing.assert_array_equal(np.asarray(toks)[0], np.arange(16))
    np.testing.assert_array_equal(np.asarray(tgts)[0], np.arange(1, 17))
    assert float(mask.sum()) == 16
    with pytest.raises(ValueError):
        TokenDataset.from_tokens([1, 2, 3], ctx=16)


def test_epoch_loss_decreases(tiny_engine):
    """Mirrors test-opt.cpp's core assertion: optimizing on a learnable
    dataset reduces both train and eval loss over epochs."""
    ds = make_dataset()
    tr = Trainer(tiny_engine.cfg, tiny_engine.params, optimizer="adamw", lr=5e-3)
    t0, e0 = tr.epoch(ds, batch_size=2, split=0.25, shuffle_seed=0)
    t2 = e2 = None
    for ep in range(2):
        t2, e2 = tr.epoch(ds, batch_size=2, split=0.25, shuffle_seed=ep + 1)
    assert t2 < t0, (t0, t2)
    assert e2 < e0, (e0, e2)


def test_epoch_callbacks_and_split(tiny_engine):
    ds = make_dataset()
    n = len(ds)
    n_eval = int(n * 0.25)
    calls = {"train": 0, "eval": 0}
    tr = Trainer(tiny_engine.cfg, tiny_engine.params, lr=1e-4)
    tr.epoch(
        ds, batch_size=1, split=0.25,
        callback_train=lambda i, nb, l: calls.__setitem__("train", calls["train"] + 1),
        callback_eval=lambda i, nb, l: calls.__setitem__("eval", calls["eval"] + 1),
    )
    assert calls["train"] == n - n_eval
    assert calls["eval"] == n_eval


def test_checkpoint_roundtrip(tiny_engine, tmp_path):
    ds = make_dataset()
    tr = Trainer(tiny_engine.cfg, tiny_engine.params, lr=1e-3)
    tr.epoch(ds, batch_size=2)
    path = str(tmp_path / "ck.npz")
    tr.save_checkpoint(path)
    # fresh trainer, restore, continue — loss continuity (state preserved)
    tr2 = Trainer(tiny_engine.cfg, tiny_engine.params, lr=1e-3)
    tr2.load_checkpoint(path)
    l_resumed, _ = tr2.epoch(ds, batch_size=2)
    l_fresh, _ = Trainer(tiny_engine.cfg, tiny_engine.params, lr=1e-3).epoch(ds, batch_size=2)
    assert l_resumed < l_fresh  # resumed run continues from trained weights


def test_sgd_optimizer(tiny_engine):
    ds = make_dataset(n_repeat=20)
    tr = Trainer(tiny_engine.cfg, tiny_engine.params, optimizer="sgd", lr=1e-2)
    t0, _ = tr.epoch(ds, batch_size=2)
    t1, _ = tr.epoch(ds, batch_size=2)
    assert t1 < t0
