"""On-device TPU smoke (tests force CPU; this runs the real-chip paths:
flash-attention prefill, fused dequant decode, q8 KV).  Run directly:
    python ci/tpu_smoke.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import jax

from transformers import LlamaConfig, LlamaForCausalLM
from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama
from llama_cpp_gfx906_tpu.tools.quantize import quantize_file

def main():
    print("backend:", jax.default_backend())
    torch.manual_seed(0)
    VOCAB = 128
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512)).eval()
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    vocab = {"model": "llama", "tokens": tokens, "scores": [0.0] * VOCAB,
             "token_types": [3, 3, 2] + [4] * (VOCAB - 3), "bos": 0, "eos": 1}
    f16 = "/tmp/tpu-smoke-f16.gguf"
    q4k = "/tmp/tpu-smoke-q4k.gguf"
    convert_hf_llama(hf, vocab, f16, quant_type=GGMLType.F16)
    quantize_file(f16, q4k, "Q4_K")

    for path, kvt in [(f16, None), (q4k, None), (q4k, "q8")]:
        eng = Engine.from_gguf(path, max_seq=256, kv_cache_dtype=kvt)
        ids = [int(t) for t in np.random.default_rng(0).integers(3, VOCAB, 100)]
        logits = eng.prefill(ids)  # T=100 -> flash path on TPU
        assert np.isfinite(logits).all(), (path, kvt)
        l = logits
        for _ in range(8):
            l = eng.decode_one(int(np.argmax(l)))
        print(f"OK {path} kv={kvt}")

    # flash-path parity vs HF (bf16 weights: top-1 agreement)
    eng = Engine.from_gguf(f16, max_seq=256)
    ids = [3, 17, 42, 9, 88, 5, 63, 21] * 9
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0, -1].float().numpy()
    got = eng.prefill(ids)
    assert int(np.argmax(got)) == int(np.argmax(ref)), "flash-path top1 mismatch"
    print("flash-path parity OK")

    # flash-decode kernel paths: bf16 / q8 / sinks / window vs einsum oracle
    import jax.numpy as jnp
    from llama_cpp_gfx906_tpu.ops.attention import mha_with_cache
    from llama_cpp_gfx906_tpu.ops.flash_decode import flash_decode
    from llama_cpp_gfx906_tpu.ops.kv_quant import quantize_rows

    rng = np.random.default_rng(1)
    B, T, Hq, Hkv, D, S = 4, 1, 8, 4, 128, 512
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)) * 0.3, jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3, jnp.float32)
    n_past = jnp.asarray(rng.integers(10, S - 4, size=B), jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(Hq), jnp.float32)
    for quant in (False, True):
        kc = rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3
        vc = rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3
        k_cache = quantize_rows(jnp.asarray(kc)) if quant else jnp.asarray(kc)
        v_cache = quantize_rows(jnp.asarray(vc)) if quant else jnp.asarray(vc)
        for kw in ({}, {"sinks": sinks}, {"sliding_window": 64}):
            from llama_cpp_gfx906_tpu.ops.attention import insert_kv
            from llama_cpp_gfx906_tpu.ops.kv_quant import (
                dequantize_rows, insert_quant,
            )
            if quant:
                k_st = insert_quant(k_cache, kn, n_past)
                v_st = insert_quant(v_cache, vn, n_past)
                kd = dequantize_rows(k_st, jnp.float32)
                vd = dequantize_rows(v_st, jnp.float32)
            else:
                k_st = insert_kv(k_cache, kn, n_past)
                v_st = insert_kv(v_cache, vn, n_past)
                kd, vd = k_st, v_st
            got = flash_decode(q, k_st, v_st, n_past, D**-0.5, **kw)
            # einsum oracle over the dequantized store
            G = Hq // Hkv
            qg = q.reshape(B, T, Hkv, G, D)
            s = jnp.einsum("bthgd,bshd->bhgts", qg, kd,
                           preferred_element_type=jnp.float32) * D**-0.5
            qp = n_past[:, None] + jnp.arange(T)[None, :]
            mask = jnp.arange(S)[None, None, :] <= qp[:, :, None]
            w = kw.get("sliding_window", 0)
            if w:
                mask &= jnp.arange(S)[None, None, :] > qp[:, :, None] - w
            s = jnp.where(mask[:, None, None, :, :], s, -1e30)
            if "sinks" in kw:
                sk = sinks.reshape(Hkv, G)
                m = jnp.maximum(s.max(-1), sk[None, :, :, None])
                e = jnp.exp(s - m[..., None])
                p = e / (e.sum(-1) + jnp.exp(sk[None, :, :, None] - m))[..., None]
            else:
                p = jax.nn.softmax(s, -1)
            refo = jnp.einsum("bhgts,bshd->bthgd", p, vd).reshape(B, T, Hq, D)
            err = float(np.abs(np.asarray(got, np.float32) - np.asarray(refo, np.float32)).max()
                        / (np.abs(np.asarray(refo)).max() + 1e-6))
            assert err < 0.03, (quant, kw, err)
        print(f"flash-decode OK quant={quant}")

    flash_decode_features()


def flash_decode_features():
    """Real-Mosaic lowering of the round-4 flash_decode features (ALiBi,
    self-extend positions, shared-prefix segment) — the repo tests run
    these combos interpret-only on CPU, and the kvpos BlockSpec's
    lane-dim-1 VMEM block is exactly the shape class Mosaic has rejected
    before (advisor r4 item 2).  Oracle: mha_with_cache under
    force_einsum() on the same chip."""
    import jax.numpy as jnp
    from llama_cpp_gfx906_tpu.ops.attention import (
        alibi_slopes_for, force_einsum, mha_with_cache,
    )
    from llama_cpp_gfx906_tpu.ops.flash_decode import flash_decode
    from llama_cpp_gfx906_tpu.ops.kv_quant import quantize_rows

    rng = np.random.default_rng(2)
    B, Hq, Hkv, D, S = 2, 8, 4, 128, 512
    n_past = jnp.asarray(rng.integers(10, S - 8, size=B), jnp.int32)
    alibi = alibi_slopes_for(Hq)
    sh = rng.standard_normal((2, 1, 40, Hkv, D)).astype(np.float32) * 0.3
    sk, sv = jnp.asarray(sh[0]), jnp.asarray(sh[1])

    def self_extend(T, group=2):
        kv_pos = jnp.broadcast_to(jnp.arange(S)[None, :] // group, (B, S))
        q_pos = (n_past[:, None] + jnp.arange(T)[None, :]) // group
        return kv_pos.astype(jnp.int32), q_pos.astype(jnp.int32)

    combos = []
    for T in (1, 4):
        kvp, qp = self_extend(T)
        combos += [
            (f"alibi T={T}", T, dict(alibi_slopes=alibi)),
            (f"self-extend T={T}", T, dict(kv_pos=kvp, q_pos=qp)),
            (f"shared-prefix T={T}", T, dict(shared_k=sk, shared_v=sv)),
            (f"alibi+window T={T}", T,
             dict(alibi_slopes=alibi, sliding_window=64)),
            (f"shared+alibi T={T}", T,
             dict(shared_k=sk, shared_v=sv, alibi_slopes=alibi)),
        ]
    for quant in (False, True):
        for name, T, kw in combos:
            q = jnp.asarray(rng.standard_normal((B, T, Hq, D)) * 0.3,
                            jnp.float32)
            kn = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3,
                             jnp.float32)
            vn = jnp.asarray(rng.standard_normal((B, T, Hkv, D)) * 0.3,
                             jnp.float32)
            kc = rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3
            vc = rng.standard_normal((B, S, Hkv, D)).astype(np.float32) * 0.3
            k_cache = quantize_rows(jnp.asarray(kc)) if quant else jnp.asarray(kc)
            v_cache = quantize_rows(jnp.asarray(vc)) if quant else jnp.asarray(vc)
            with force_einsum():
                ref, k_st, v_st = mha_with_cache(
                    q, kn, vn, k_cache, v_cache, n_past, D**-0.5, **kw)
            got = flash_decode(q, k_st, v_st, n_past, D**-0.5, **kw)
            ref = np.asarray(ref, np.float32)
            err = float(np.abs(np.asarray(got, np.float32) - ref).max()
                        / (np.abs(ref).max() + 1e-6))
            assert err < 0.03, (name, quant, err)
        print(f"flash-decode features OK quant={quant} "
              f"({len(combos)} combos, real Mosaic lowering)")


if __name__ == "__main__":
    main()
