"""Sharding tests on the virtual 8-device CPU mesh: TP/DP/EP forward
equivalence vs single-device, sharded training step (reference analog:
SPLIT_MODE_ROW/LAYER multi-GPU + RPC multi-node, SURVEY §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llama_cpp_gfx906_tpu.models.config import ModelConfig
from llama_cpp_gfx906_tpu.models.llama import KVCache, forward
from llama_cpp_gfx906_tpu.parallel.sharding import (
    kv_pspec,
    make_mesh,
    param_pspecs,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _synth_params(cfg, seed=0, moe=False):
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    L, D, F, V = cfg.n_layers, cfg.n_embd, cfg.n_ff, cfg.n_vocab
    HqD = cfg.n_heads * cfg.head_dim
    HkD = cfg.n_kv_heads * cfg.head_dim
    layers = {
        "attn_norm": jnp.ones((L, D)),
        "ffn_norm": jnp.ones((L, D)),
        "wq": r(L, D, HqD), "wk": r(L, D, HkD), "wv": r(L, D, HkD),
        "wo": r(L, HqD, D),
    }
    if moe:
        E, EF = cfg.n_experts, cfg.expert_ff or F
        layers.update(
            moe_gate_inp=r(L, D, E),
            moe_gate=r(L, E, D, EF), moe_up=r(L, E, D, EF), moe_down=r(L, E, EF, D),
        )
    else:
        layers.update(w_gate=r(L, D, F), w_up=r(L, D, F), w_down=r(L, F, D))
    return {
        "tok_emb": r(V, D), "out_norm": jnp.ones(D), "lm_head": r(D, V),
        "layers": layers,
    }


def _run(params, cfg, tokens, mesh=None):
    B, T = tokens.shape
    kv = KVCache.create(cfg, B, T + 4, jnp.float32)
    if mesh is not None:
        n_model = mesh.shape["model"]
        kv = KVCache(
            k=jax.device_put(kv.k, NamedSharding(mesh, kv_pspec(cfg, n_model))),
            v=jax.device_put(kv.v, NamedSharding(mesh, kv_pspec(cfg, n_model))),
            n_past=jax.device_put(kv.n_past, NamedSharding(mesh, P("data"))),
        )
        tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    logits, kv2 = jax.jit(forward, static_argnames=("cfg",))(params, cfg, tokens, kv)
    return np.asarray(logits), kv2


def test_tp_forward_matches_single_device():
    cfg = ModelConfig(
        arch="llama", n_layers=2, n_embd=32, n_heads=8, n_kv_heads=8,
        head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=64,
    )
    params = _synth_params(cfg)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 6)), jnp.int32)

    ref, _ = _run(params, cfg, tokens)

    mesh = make_mesh(n_model=4, n_data=2)
    sp = shard_params(params, mesh, cfg)
    got, kv2 = _run(sp, cfg, tokens, mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # the KV cache came out distributed (XLA may pick an equivalent layout,
    # e.g. sharding Dh instead of heads — both ride the "model" axis)
    assert not kv2.k.sharding.is_fully_replicated


def test_ep_moe_forward_matches_single_device():
    cfg = ModelConfig(
        arch="mixtral", n_layers=2, n_embd=32, n_heads=4, n_kv_heads=4,
        head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=64,
        n_experts=8, n_experts_used=2, expert_ff=48, expert_weights_norm=True,
    )
    params = _synth_params(cfg, moe=True)
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 64, (2, 6)), jnp.int32)

    ref, _ = _run(params, cfg, tokens)

    mesh = make_mesh(n_model=4, n_data=2)
    specs = param_pspecs(cfg, 4)
    assert specs["layers"]["moe_gate"] == P(None, "model", None, None)  # EP active
    sp = shard_params(params, mesh, cfg)
    got, _ = _run(sp, cfg, tokens, mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sharded_train_step_runs():
    from llama_cpp_gfx906_tpu.runtime.training import sgd_train_step

    cfg = ModelConfig(
        arch="llama", n_layers=2, n_embd=32, n_heads=4, n_kv_heads=4,
        head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=64,
    )
    mesh = make_mesh(n_model=4, n_data=2)
    params = shard_params(_synth_params(cfg), mesh, cfg)
    data_sh = NamedSharding(mesh, P("data", None))
    toks = jax.device_put(jnp.zeros((2, 8), jnp.int32), data_sh)
    tgts = jax.device_put(jnp.ones((2, 8), jnp.int32), data_sh)
    mask = jax.device_put(jnp.ones((2, 8), jnp.float32), data_sh)
    new_params, loss = sgd_train_step(params, cfg, toks, tgts, mask)
    assert np.isfinite(float(loss))
    # TP sharding preserved through the update
    assert new_params["layers"]["wq"].sharding.spec == param_pspecs(cfg, 4)["layers"]["wq"]


def test_mesh_shapes():
    m = make_mesh(n_model=8, n_data=1)
    assert m.shape == {"data": 1, "model": 8}
    m2 = make_mesh(n_model=2, n_data=4)
    assert m2.shape == {"data": 4, "model": 2}


def test_pipeline_forward_matches_single_device():
    """GPipe stages over a 4-stage mesh must reproduce the dense forward
    exactly (reference analog: backend-scheduler pipeline parallelism,
    llama-context.cpp:255-285)."""
    from jax.sharding import Mesh

    from llama_cpp_gfx906_tpu.parallel.pipeline import (
        make_pipeline_forward,
        shard_for_pipeline,
    )

    cfg = ModelConfig(
        arch="llama", n_layers=4, n_embd=32, n_heads=4, n_kv_heads=2,
        head_dim=8, n_ff=48, n_vocab=64, n_ctx_train=64,
    )
    params = _synth_params(cfg, seed=3)
    B, T = 4, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)

    ref, ref_kv = _run(params, cfg, tokens)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))
    kv = KVCache.create(cfg, B, T + 4, jnp.float32)
    p_sh, kv_sh = shard_for_pipeline(params, kv, mesh)
    run = make_pipeline_forward(cfg, mesh, n_micro=2)
    logits, kv2 = run(p_sh, tokens, kv_sh)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)
    # KV written identically (stage-sharded layer axis gathers back)
    np.testing.assert_allclose(
        np.asarray(kv2.k[:, :, :T]), np.asarray(ref_kv.k[:, :, :T]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(kv2.n_past), np.asarray(ref_kv.n_past))


def test_pipeline_decode_step_after_prefill():
    """Pipelined prefill then a pipelined decode step: the carried KV must
    line up stage-by-stage."""
    from jax.sharding import Mesh

    from llama_cpp_gfx906_tpu.parallel.pipeline import (
        make_pipeline_forward,
        shard_for_pipeline,
    )

    cfg = ModelConfig(
        arch="llama", n_layers=4, n_embd=32, n_heads=4, n_kv_heads=2,
        head_dim=8, n_ff=48, n_vocab=64, n_ctx_train=64,
    )
    params = _synth_params(cfg, seed=4)
    B, T = 2, 6
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    nxt = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, 1)), jnp.int32)

    kv0 = KVCache.create(cfg, B, T + 4, jnp.float32)
    ref1, kv_r = _run(params, cfg, tokens)
    ref2, _ = jax.jit(forward, static_argnames=("cfg",))(params, cfg, nxt, kv_r)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    p_sh, kv_sh = shard_for_pipeline(params, kv0, mesh)
    run = make_pipeline_forward(cfg, mesh, n_micro=2)
    _, kv1 = run(p_sh, tokens, kv_sh)
    logits2, _ = run(p_sh, nxt, kv1)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_quantized_weights():
    """PP over QuantTensor stage params: quantized layer stacks shard on
    the layer axis (q/s/m leaves) and the quantized lm_head runs through
    linear() — parity vs the single-device quantized forward
    (reference: PP composes with quantized models, llama-context.cpp:255)."""
    from jax.sharding import Mesh

    from llama_cpp_gfx906_tpu.gguf import GGMLType, quantize
    from llama_cpp_gfx906_tpu.ops import quant_matmul as qmm
    from llama_cpp_gfx906_tpu.parallel.pipeline import (
        make_pipeline_forward,
        shard_for_pipeline,
    )

    cfg = ModelConfig(
        arch="llama", n_layers=4, n_embd=32, n_heads=4, n_kv_heads=2,
        head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=64,
    )
    rng = np.random.default_rng(7)
    L, D, F, V = cfg.n_layers, cfg.n_embd, cfg.n_ff, cfg.n_vocab
    HqD = cfg.n_heads * cfg.head_dim
    HkD = cfg.n_kv_heads * cfg.head_dim

    def qstack(K, N):
        qts = []
        for _ in range(L):
            w = rng.standard_normal((N, K)).astype(np.float32) * 0.05
            qts.append(qmm.pack_gguf_tensor(quantize(w, GGMLType.Q8_0),
                                            GGMLType.Q8_0, (N, K)))
        return qmm.QuantTensor(
            q=jnp.stack([t.q for t in qts]),
            s=jnp.stack([t.s for t in qts]),
            m=None, fmt=qts[0].fmt, group=qts[0].group, shape=qts[0].shape,
        )

    w_head = rng.standard_normal((V, D)).astype(np.float32) * 0.05
    params = {
        "tok_emb": jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.05),
        "out_norm": jnp.ones(D),
        "lm_head": qmm.pack_gguf_tensor(quantize(w_head, GGMLType.Q8_0),
                                        GGMLType.Q8_0, (V, D)),
        "layers": {
            "attn_norm": jnp.ones((L, D)),
            "ffn_norm": jnp.ones((L, D)),
            "wq": qstack(D, HqD), "wk": qstack(D, HkD), "wv": qstack(D, HkD),
            "wo": qstack(HqD, D),
            "w_gate": qstack(D, F), "w_up": qstack(D, F), "w_down": qstack(F, D),
        },
    }
    B, T = 4, 8
    tokens = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)

    ref, _ = _run(params, cfg, tokens)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))
    kv = KVCache.create(cfg, B, T + 4, jnp.float32)
    p_sh, kv_sh = shard_for_pipeline(params, kv, mesh)
    run = make_pipeline_forward(cfg, mesh, n_micro=2)
    logits, _ = run(p_sh, tokens, kv_sh)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)
