"""k-quant scale folding: int8 sub-scales + per-superblock f32 super-
scales kept on device instead of the expanded f32 per-group plane.

The fold is EXACT: GGUF k-quant group scales are ``d · sc`` with ``d``
f16-valued (11-bit significand) and ``sc`` a ≤8-bit int, so the f32
product is identical whether computed at pack time (plain layout) or in
the kernel (folded layout).  Reference layout being folded:
``block_q4_K``/``block_q6_K`` in the reference's ggml quant formats
(`ggml/src/ggml-common.h` block structs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize
from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

KQ_TYPES = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
            GGMLType.Q6_K]


def _pack_both(rng, ggml_type, N=64, K=512):
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.08
    raw = quantize(w, ggml_type)
    plain = qmm.pack_gguf_tensor(raw, ggml_type, (N, K))
    folded = qmm.pack_gguf_tensor(raw, ggml_type, (N, K), fold_scales=True)
    return plain, folded


@pytest.mark.parametrize("ggml_type", KQ_TYPES)
def test_fold_is_exact(ggml_type):
    """Folded dequant is bit-identical to the plain f32-scale layout."""
    rng = np.random.default_rng(int(ggml_type))
    plain, folded = _pack_both(rng, ggml_type)
    assert folded.sd is not None and folded.sgroup == 128
    assert folded.s.dtype == jnp.int8
    assert (folded.m is None) == (plain.m is None)
    # unfold reproduces the plain scale planes exactly
    unf = qmm.unfold_qt(folded)
    np.testing.assert_array_equal(np.asarray(unf.s), np.asarray(plain.s))
    if plain.m is not None:
        np.testing.assert_array_equal(np.asarray(unf.m), np.asarray(plain.m))
    wp = np.asarray(qmm.dequantize_qt(plain, jnp.float32))
    wf = np.asarray(qmm.dequantize_qt(folded, jnp.float32))
    np.testing.assert_array_equal(wp, wf)


@pytest.mark.parametrize("ggml_type", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_fold_linear_matches(ggml_type):
    rng = np.random.default_rng(7)
    plain, folded = _pack_both(rng, ggml_type)
    x = jnp.asarray(rng.standard_normal((3, plain.K)) * 0.1, jnp.float32)
    yp = np.asarray(qmm.linear(x, plain), np.float32)
    yf = np.asarray(qmm.linear(x, folded), np.float32)
    np.testing.assert_allclose(yp, yf, rtol=1e-6, atol=1e-6)


def test_fold_scale_stream_bytes():
    """The point of the fold: scale bytes drop ~2.7× on min-carrying
    Q4_K (int8 sub-planes + f32/8-groups super rows vs f32 per group)
    and ~2.7× on Q6_K (finer g=16 groups, no mins; super planes at
    K/128 rows for 8-aligned DMA)."""
    rng = np.random.default_rng(3)
    plain, folded = _pack_both(rng, GGMLType.Q4_K, N=128, K=1024)
    plain_scale = plain.s.nbytes + plain.m.nbytes
    folded_scale = (folded.s.nbytes + folded.m.nbytes
                    + folded.sd.nbytes + folded.md.nbytes)
    assert folded_scale * 1.9 < plain_scale
    plain6, folded6 = _pack_both(rng, GGMLType.Q6_K, N=128, K=1024)
    assert (folded6.s.nbytes + folded6.sd.nbytes) * 2.5 <= plain6.s.nbytes


def test_fold_repack_nib4_to_int8_keeps_fold():
    rng = np.random.default_rng(5)
    plain, folded = _pack_both(rng, GGMLType.Q4_K)
    rp = qmm.repack_nib4_to_int8(folded)
    assert rp.fmt == "int8" and rp.sd is not None and rp.sgroup == 128
    np.testing.assert_array_equal(
        np.asarray(qmm.dequantize_qt(rp, jnp.float32)),
        np.asarray(qmm.dequantize_qt(plain, jnp.float32)))


def test_fold_pad_qt_n():
    rng = np.random.default_rng(9)
    _, folded = _pack_both(rng, GGMLType.Q6_K, N=100, K=512)
    padded = qmm.pad_qt_n(folded, multiple=256)
    assert padded.q.shape[-1] == 256 and padded.sd.shape[-1] == 256
    np.testing.assert_array_equal(
        np.asarray(qmm.dequantize_qt(padded, jnp.float32)),
        np.asarray(qmm.dequantize_qt(folded, jnp.float32)))


def test_fold_concat_and_split():
    """Fusion (q|k|v concat) with group harmonization over folded planes,
    then the inverse split, both preserve dequantized values exactly."""
    from llama_cpp_gfx906_tpu.runtime.weights import (_concat_weights,
                                                      _split_weight)

    rng = np.random.default_rng(11)
    _, f4 = _pack_both(rng, GGMLType.Q4_K, N=64, K=512)   # g=32, has mins
    _, f6 = _pack_both(rng, GGMLType.Q6_K, N=32, K=512)   # g=16, no mins
    f4 = qmm.repack_nib4_to_int8(f4)
    fused = _concat_weights([f4, f6], ["a", "b"])
    assert fused is not None and fused.group == 16 and fused.sd is not None
    w = np.asarray(qmm.dequantize_qt(fused, jnp.float32))
    np.testing.assert_array_equal(
        w[:, :64], np.asarray(qmm.dequantize_qt(f4, jnp.float32)))
    np.testing.assert_array_equal(
        w[:, 64:], np.asarray(qmm.dequantize_qt(f6, jnp.float32)))
    back_a, back_b = _split_weight(fused, [64, 32])
    np.testing.assert_array_equal(
        np.asarray(qmm.dequantize_qt(back_a, jnp.float32)), w[:, :64])

    # mixed folded/plain parts must refuse to fuse (kernel streams one
    # scale layout per fused tensor)
    plain6 = qmm.unfold_qt(f6)
    assert _concat_weights([f4, plain6], ["a", "b"]) is None


def test_fold_engine_end_to_end(tmp_path):
    """Engine(kq_fold=True) loads folded k-quant weights (+ implied int8
    repack) and produces EXACTLY the logits of the plain repacked load —
    the fold is a storage change, not a numeric one."""
    pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_llama_parity import VOCAB, dummy_vocab

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    # k-quant superblocks need K % 256 == 0 — the shared 64-wide tiny
    # model never folds, so build a 256-wide one
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(5)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny-q4k.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.Q4_K)

    eng_p = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32,
                             repack_int8=True)
    eng_f = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32,
                             kq_fold=True)
    layers_f = eng_f.params["layers"]
    folded = [t for t in layers_f.values()
              if isinstance(t, qmm.QuantTensor) and t.sd is not None]
    assert folded, "kq_fold load must produce folded layer tensors"
    ids = [3, 17, 42, 9, 88]
    lp = eng_p.prefill(ids)
    lf = eng_f.prefill(ids)
    np.testing.assert_array_equal(lp, lf)


def test_fold_qt_expert_and_routed():
    rng = np.random.default_rng(13)
    E, N, K = 4, 64, 512
    plains, folds = [], []
    for e in range(E):
        p, f = _pack_both(np.random.default_rng(100 + e), GGMLType.Q4_K,
                          N=N, K=K)
        plains.append(qmm.repack_nib4_to_int8(p))
        folds.append(qmm.repack_nib4_to_int8(f))

    def stack(qts):
        proto = qts[0]
        return qmm.QuantTensor(
            q=jnp.stack([t.q for t in qts]), s=jnp.stack([t.s for t in qts]),
            m=jnp.stack([t.m for t in qts]),
            fmt=proto.fmt, group=proto.group, shape=proto.shape,
            sd=(jnp.stack([t.sd for t in qts]) if proto.sd is not None
                else None),
            md=(jnp.stack([t.md for t in qts]) if proto.md is not None
                else None),
            sgroup=proto.sgroup)

    sp, sf = stack(plains), stack(folds)
    x = jnp.asarray(rng.standard_normal((6, K)) * 0.1, jnp.float32)
    idx = jnp.asarray([0, 3, 1, 1, 2, 0], jnp.int32)
    yp = np.asarray(qmm.routed_quant_matmul(x, sp, idx, use_pallas=False))
    yf = np.asarray(qmm.routed_quant_matmul(x, sf, idx, use_pallas=False))
    np.testing.assert_allclose(yp, yf, rtol=1e-6, atol=1e-6)
    e1p = qmm.dequantize_qt(qmm.qt_expert(sp, 1), jnp.float32)
    e1f = qmm.dequantize_qt(qmm.qt_expert(sf, 1), jnp.float32)
    np.testing.assert_array_equal(np.asarray(e1p), np.asarray(e1f))
