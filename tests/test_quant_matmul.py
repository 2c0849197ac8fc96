"""Fused dequant-matmul tests (test-backend-ops analog).

Three oracles, strongest first:
1. grid decode == gguf.quants dequantize, bit-exact per type
2. quant_matmul_xla == x @ dequantized weight
3. Pallas kernel (interpret mode on CPU) == XLA fallback
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize, dequantize
from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

RNG = np.random.default_rng(7)

TYPES = qmm.supported_qmm_types()


def make_qt(qtype, N=64, K=512):
    w = RNG.standard_normal((N, K)).astype(np.float32)
    raw = quantize(w, qtype)
    qt = qmm.pack_gguf_tensor(raw, qtype, (N, K))
    ref_w = dequantize(raw, qtype, (N, K)).T  # (K, N) dequant oracle
    return qt, ref_w


@pytest.mark.parametrize("qtype", TYPES)
def test_grid_decode_bit_exact(qtype):
    qt, ref_w = make_qt(qtype)
    got = np.asarray(qmm.dequantize_qt(qt, jnp.float32))
    np.testing.assert_allclose(got, ref_w, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("qtype", TYPES)
def test_xla_matmul_matches_dequant(qtype):
    qt, ref_w = make_qt(qtype)
    x = RNG.standard_normal((4, 512)).astype(np.float32)
    got = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x), qt))
    ref = x.astype(np.float32) @ ref_w  # bf16 compute in the op → loose tol
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, qtype.name


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q5_K, GGMLType.MXFP4])
@pytest.mark.parametrize("M", [1, 8, 100])
def test_pallas_kernel_interpret(qtype, M):
    qt, ref_w = make_qt(qtype, N=256, K=512)
    x = (RNG.standard_normal((M, 512)) * 0.5).astype(np.float32)
    got = np.asarray(
        qmm._quant_matmul_pallas(
            jnp.asarray(x, jnp.float32), qt.q, qt.s, qt.m,
            fmt=qt.fmt, group=qt.group, shape=qt.shape, interpret=True,
        )
    )
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, (qtype.name, M)


def test_linear_dispatch():
    qt, ref_w = make_qt(GGMLType.Q8_0)
    x = jnp.asarray(RNG.standard_normal((2, 3, 512)), jnp.bfloat16)
    out = qmm.linear(x, qt)
    assert out.shape == (2, 3, 64)
    dense = jnp.asarray(ref_w, jnp.bfloat16)
    out2 = qmm.linear(x, dense)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out2, np.float32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q6_K])
@pytest.mark.parametrize("M", [1, 3, 8])
def test_gemv_kernel_interpret(qtype, M):
    """Streamed full-K GEMV kernel (decode shape) == XLA oracle."""
    qt, _ = make_qt(qtype, N=256, K=1024)
    x = (RNG.standard_normal((M, 1024)) * 0.5).astype(np.float32)
    assert qmm._gemv_tiles(qt) is not None
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), qt.q, qt.s, qt.m, qt.sd, qt.md,
        fmt=qt.fmt, group=qt.group, sgroup=qt.sgroup or 0, shape=qt.shape,
        interpret=True))
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, (qtype.name, M)


@pytest.mark.parametrize("qtype", [GGMLType.Q6_K, GGMLType.Q2_K])
def test_gemv_kernel_folded_interpret(qtype):
    """Folded scales (int8 sub-planes + f32 super-planes) stream through
    the GEMV kernel natively; Q2_K also exercises the affine min path."""
    w = RNG.standard_normal((256, 1024)).astype(np.float32)
    raw = quantize(w, qtype)
    qt = qmm.pack_gguf_tensor(raw, qtype, (256, 1024), fold_scales=True)
    assert qt.sd is not None and qmm._gemv_tiles(qt) is not None
    x = (RNG.standard_normal((1, 1024)) * 0.5).astype(np.float32)
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), qt.q, qt.s, qt.m, qt.sd, qt.md,
        fmt=qt.fmt, group=qt.group, sgroup=qt.sgroup, shape=qt.shape,
        interpret=True))
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, qtype.name


def test_gemv_kernel_padded_n():
    """pad_qt_n tensors: pad columns sliced off, logical N preserved."""
    qt, _ = make_qt(GGMLType.Q6_K, N=200, K=1024)
    qtp = qmm.pad_qt_n(qt, multiple=256)
    assert qtp.q.shape[-1] == 256 and qtp.shape == (1024, 200)
    assert qmm._gemv_tiles(qtp) is not None
    x = (RNG.standard_normal((1, 1024)) * 0.5).astype(np.float32)
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), qtp.q, qtp.s, qtp.m, qtp.sd, qtp.md,
        fmt=qtp.fmt, group=qtp.group, sgroup=qtp.sgroup or 0, shape=qtp.shape,
        interpret=True))
    assert got.shape == (1, 200)
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02


def test_gemv_kernel_repacked_affine():
    """Lossless int8 repack of an affine nib4 type (Q4_1 has mins) rides
    the GEMV kernel with the min correction applied outside."""
    qt, _ = make_qt(GGMLType.Q4_1, N=256, K=1024)
    rp = qmm.repack_nib4_to_int8(qt)
    assert rp.fmt == "int8" and rp.m is not None
    assert qmm._gemv_tiles(rp) is not None
    x = (RNG.standard_normal((2, 1024)) * 0.5).astype(np.float32)
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), rp.q, rp.s, rp.m, rp.sd, rp.md,
        fmt=rp.fmt, group=rp.group, sgroup=rp.sgroup or 0, shape=rp.shape,
        interpret=True))
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02


def test_gemv_tiles_eligibility():
    """Ineligible shapes (K not tileable, legacy split-K nib4) return
    None; the chunk-local nib4c packing IS GEMV-eligible."""
    qt, _ = make_qt(GGMLType.Q8_0, N=256, K=640)  # 640 % 256 != 0
    assert qmm._gemv_tiles(qt) is None
    qt4, _ = make_qt(GGMLType.Q4_0, N=256, K=1024)
    assert qt4.fmt == "nib4c" and qmm._gemv_tiles(qt4) is not None
    legacy = qmm.QuantTensor(q=qt4.q, s=qt4.s, m=qt4.m, fmt="nib4",
                             group=qt4.group, shape=qt4.shape)
    assert qmm._gemv_tiles(legacy) is None


def make_experts(qtype, E=4, N=128, K=256):
    w = RNG.standard_normal((E, N, K)).astype(np.float32)
    raw = quantize(w.reshape(E * N, K), qtype)
    qt = qmm.pack_gguf_experts(raw, qtype, (E, N, K))
    ref = dequantize(raw, qtype, (E * N, K)).reshape(E, N, K).transpose(0, 2, 1)
    return qt, ref  # ref (E, K, N)


@pytest.mark.parametrize(
    "qtype",
    [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.MXFP4],
)
def test_experts_decode_bit_exact(qtype):
    qt, ref = make_experts(qtype)
    got = np.asarray(qmm.dequantize_qt_experts(qt, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "qtype",
    [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.MXFP4],
)
def test_routed_xla_matches_dense(qtype):
    qt, ref = make_experts(qtype)
    P, K = 6, 256
    x = (RNG.standard_normal((P, K)) * 0.5).astype(np.float32)
    idx = RNG.integers(0, 4, size=P).astype(np.int32)
    got = np.asarray(qmm.routed_quant_matmul_xla(jnp.asarray(x), qt, jnp.asarray(idx)))
    ref_out = np.stack([x[p] @ ref[idx[p]] for p in range(P)])
    scale = np.abs(ref_out).max() + 1e-6
    assert np.abs(got - ref_out).max() / scale < 0.02, qtype.name


@pytest.mark.parametrize(
    "qtype", [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q4_1]
)
def test_routed_pallas_interpret(qtype):
    qt, _ = make_experts(qtype, E=4, N=128, K=512)
    P, K = 5, 512
    if qt.fmt == "nib4c":
        # the loader packs 4-bit experts chunk-local (for the MoE
        # megakernel); rebuild the legacy split-K nib4 layout this routed
        # kernel tiles
        vals = np.asarray(
            qmm._unpack4_jnp(qt.q, "nib4c", K), np.uint8)  # (E, K, N)
        packed = (vals[:, : K // 2] | (vals[:, K // 2 :] << 4)).view(np.int8)
        qt = qmm.QuantTensor(q=jnp.asarray(packed), s=qt.s, m=qt.m,
                             fmt="nib4", group=qt.group, shape=qt.shape)
    x = (RNG.standard_normal((P, K)) * 0.5).astype(np.float32)
    idx = RNG.integers(0, 4, size=P).astype(np.int32)
    got = np.asarray(
        qmm._routed_qmm_pallas(
            jnp.asarray(x), qt.q, qt.s, qt.m, jnp.asarray(idx),
            fmt=qt.fmt, group=qt.group, shape=qt.shape,
            has_m=qt.m is not None, interpret=True,
        )
    )
    ref = np.asarray(qmm.routed_quant_matmul_xla(jnp.asarray(x), qt, jnp.asarray(idx)))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, qtype.name


def test_quantized_engine_end_to_end(tmp_path):
    """Engine with keep_quantized=True matches the dequantized engine."""
    pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_llama_parity import tiny_hf_model, dummy_vocab

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

    hf = tiny_hf_model(seed=3)
    path = str(tmp_path / "tiny-q8.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.Q8_0)

    eng_q = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=True)
    eng_d = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    ids = [3, 17, 42, 9, 88]
    lq = eng_q.prefill(ids)
    ld = eng_d.prefill(ids)
    assert int(np.argmax(lq)) == int(np.argmax(ld))
    assert np.abs(lq - ld).max() < 0.05 * (np.abs(ld).max() + 1)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K])
def test_repack_nib4_to_int8_bit_exact(qtype):
    """Lossless 4-bit → int8 repack: dequantized values must be
    BIT-IDENTICAL (memory-for-bandwidth trade, Engine repack_int8)."""
    qt, ref_w = make_qt(qtype)
    assert qt.fmt == "nib4c"
    rp = qmm.repack_nib4_to_int8(qt)
    assert rp.fmt == "int8" and rp.shape == qt.shape
    a = np.asarray(qmm.dequantize_qt(qt, jnp.float32))
    b = np.asarray(qmm.dequantize_qt(rp, jnp.float32))
    np.testing.assert_array_equal(a, b)
    # matmul parity through the dispatcher
    x = jnp.asarray(RNG.standard_normal((3, qt.shape[0])), jnp.float32)
    y0 = np.asarray(qmm.quant_matmul(x, qt, use_pallas=False))
    y1 = np.asarray(qmm.quant_matmul(x, rp, use_pallas=False))
    np.testing.assert_allclose(y1, y0, rtol=2e-2, atol=2e-2)


def test_repack_params_tree():
    qt, _ = make_qt(GGMLType.Q4_K)
    q8, _ = make_qt(GGMLType.Q8_0)
    tree = {"a": qt, "b": q8, "c": jnp.ones(4)}
    out = qmm.repack_params_int8(tree)
    assert out["a"].fmt == "int8" and out["a"].q.shape[-2] == qt.shape[0]
    assert out["b"] is q8  # already int8: untouched
    assert out["c"] is tree["c"]


def test_untileable_n_falls_back_to_xla():
    """N not divisible by 128 cannot be covered by the Pallas grids (they
    floor-divide tiles — the tail columns would come back uninitialized);
    the dispatcher must route such weights to the XLA path even when
    Pallas is requested (regression: falcon-7b's 4672-wide fused qkv)."""
    from llama_cpp_gfx906_tpu.gguf import GGMLType, dequantize, quantize
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm

    rng = np.random.default_rng(0)
    K, N = 256, 192  # 192 % 128 != 0
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    qt = qmm.pack_gguf_tensor(quantize(w, GGMLType.Q8_0), GGMLType.Q8_0, (N, K))
    assert not qmm._pallas_tileable(qt.fmt, qt.group, qt.shape, qt.q.shape[-1])
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    got = np.asarray(qmm.quant_matmul(x, qt, use_pallas=True), np.float32)
    ref = np.asarray(x, np.float32) @ dequantize(
        quantize(w, GGMLType.Q8_0), GGMLType.Q8_0, (N, K)).T
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # tileable shapes still qualify for the kernels
    assert qmm._pallas_tileable("int8", 32, (256, 256), 256)
    assert qmm._pallas_tileable("nib4", 32, (512, 1024), 1024)
    assert not qmm._pallas_tileable("nib4c", 32, (512, 1024), 1024)
    assert not qmm._pallas_tileable("int8", 32, (9000, 256), 256)  # K untileable


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K])
@pytest.mark.parametrize("M", [1, 8])
def test_gemv_kernel_nib4c_interpret(qtype, M):
    """Chunk-local 4-bit packing through the streamed GEMV kernel: packed
    bytes stream directly (half the int8 bytes), min correction outside."""
    qt, _ = make_qt(qtype, N=256, K=1024)
    assert qt.fmt == "nib4c" and qmm._gemv_tiles(qt) is not None
    x = (RNG.standard_normal((M, 1024)) * 0.5).astype(np.float32)
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), qt.q, qt.s, qt.m, qt.sd, qt.md,
        fmt=qt.fmt, group=qt.group, sgroup=qt.sgroup or 0, shape=qt.shape,
        interpret=True))
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02, (qtype.name, M)


def test_gemv_kernel_nib4c_folded_interpret():
    """nib4c + folded k-quant scales (Q4_K: int8 sub-scales, f32 super
    planes, affine mins) — the production Q4_K decode configuration."""
    w = RNG.standard_normal((256, 1024)).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    qt = qmm.pack_gguf_tensor(raw, GGMLType.Q4_K, (256, 1024), fold_scales=True)
    assert qt.fmt == "nib4c" and qt.sd is not None
    assert qmm._gemv_tiles(qt) is not None
    x = (RNG.standard_normal((1, 1024)) * 0.5).astype(np.float32)
    got = np.asarray(qmm._quant_gemv_pallas(
        jnp.asarray(x, jnp.float32), qt.q, qt.s, qt.m, qt.sd, qt.md,
        fmt=qt.fmt, group=qt.group, sgroup=qt.sgroup, shape=qt.shape,
        interpret=True))
    ref = np.asarray(qmm.quant_matmul_xla(jnp.asarray(x, jnp.float32), qt))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 0.02


def test_fuse_mixed_nib4c_int8_splits_v():
    """Q4_K_M disposition: Q4_K q/k (nib4c) + Q6_K v (int8) fuse q|k only
    and keep v separate — the streamed megakernel runs v as its own
    window (split-v path), so q/k stream at native 4-bit width instead of
    repacking everything to int8 (runtime/weights.fuse_projections)."""
    from llama_cpp_gfx906_tpu.runtime.weights import fuse_projections

    def stack(qt):
        return qmm.QuantTensor(
            q=jnp.stack([qt.q]), s=jnp.stack([qt.s]),
            m=jnp.stack([qt.m]) if qt.m is not None else None,
            fmt=qt.fmt, group=qt.group, shape=qt.shape,
            sd=jnp.stack([qt.sd]) if qt.sd is not None else None,
            md=jnp.stack([qt.md]) if qt.md is not None else None,
            sgroup=qt.sgroup)

    K = 256
    wq, _ = make_qt(GGMLType.Q4_K, N=128, K=K)
    wk, _ = make_qt(GGMLType.Q4_K, N=64, K=K)
    wv, _ = make_qt(GGMLType.Q6_K, N=64, K=K)
    assert wq.fmt == "nib4c" and wv.fmt == "int8"
    layers = {"wq": stack(wq), "wk": stack(wk), "wv": stack(wv),
              "w_gate": stack(wq), "w_up": stack(wq)}
    fused = fuse_projections(layers)
    assert "wqkv_fused" not in fused
    assert fused["wqk_fused"].fmt == "nib4c"
    assert fused["wv"].fmt == "int8"  # untouched
    # gate/up are homogeneous nib4c: they fuse WITHOUT repacking
    assert fused["wgateup_fused"].fmt == "nib4c"
    got = np.asarray(qmm.dequantize_qt(
        qmm.QuantTensor(
            q=fused["wqk_fused"].q[0], s=fused["wqk_fused"].s[0],
            m=(fused["wqk_fused"].m[0]
               if fused["wqk_fused"].m is not None else None),
            fmt="nib4c", group=fused["wqk_fused"].group,
            shape=(K, 192),
            sd=(fused["wqk_fused"].sd[0]
                if fused["wqk_fused"].sd is not None else None),
            md=(fused["wqk_fused"].md[0]
                if fused["wqk_fused"].md is not None else None),
            sgroup=fused["wqk_fused"].sgroup), jnp.float32))
    ref = np.concatenate([
        np.asarray(qmm.dequantize_qt(t, jnp.float32)) for t in (wq, wk)
    ], axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # biased layers (qwen2) keep the full int8-harmonized fuse
    biased = dict(layers, bq=jnp.zeros((1, 128)), bk=jnp.zeros((1, 64)),
                  bv=jnp.zeros((1, 64)))
    fused_b = fuse_projections(biased)
    assert fused_b["wqkv_fused"].fmt == "int8"
