"""2-process multi-host test (SURVEY Phase 5): the same SPMD program over
a (2 hosts × 4 devices) localhost mesh must produce the single-process
logits exactly — the TPU-native replacement for the reference's RPC
multi-node path (tools/rpc), which has no automated test at all."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_forward_matches_single(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out_path = str(tmp_path / "logits.npy")
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    got = np.load(out_path)

    # single-process reference: same deterministic weights, plain forward
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.models.config import ModelConfig
    from llama_cpp_gfx906_tpu.models.llama import KVCache, forward

    cfg = ModelConfig(
        arch="llama", n_layers=2, n_embd=32, n_heads=4, n_kv_heads=4,
        head_dim=8, n_ff=64, n_vocab=64, n_ctx_train=128,
    )
    rng = np.random.default_rng(0)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    params = {
        "tok_emb": jnp.asarray(w(64, 32)),
        "out_norm": jnp.ones(32, jnp.float32),
        "lm_head": jnp.asarray(w(32, 64)),
        "layers": {
            "attn_norm": jnp.ones((2, 32), jnp.float32),
            "ffn_norm": jnp.ones((2, 32), jnp.float32),
            "wq": jnp.asarray(w(2, 32, 32)), "wk": jnp.asarray(w(2, 32, 32)),
            "wv": jnp.asarray(w(2, 32, 32)), "wo": jnp.asarray(w(2, 32, 32)),
            "w_gate": jnp.asarray(w(2, 32, 64)), "w_up": jnp.asarray(w(2, 32, 64)),
            "w_down": jnp.asarray(w(2, 64, 32)),
        },
    }
    toks = np.tile(np.asarray([[3, 7, 11, 2]], np.int32), (2, 1))
    kv = KVCache.create(cfg, 2, 16, jnp.float32)
    ref, _ = forward(params, cfg, jnp.asarray(toks), kv)
    ref = np.asarray(ref, np.float32)

    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
