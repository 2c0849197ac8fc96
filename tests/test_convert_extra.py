"""Converter breadth: real-HF checkpoint layouts → GGUF (convert_extra.py).

Two tiers (behavioral contract: the per-arch ``Model`` subclasses of the
reference's ``convert_hf_to_gguf.py`` + ``tensor_mapping.py`` name maps):

- transformers-class parity — gpt_neox / falcon / gpt_bigcode / stablelm
  random-init HF models convert and the engine forward matches HF logits.
- layout equality — trust_remote_code families (exaone, baichuan,
  internlm2, plamo, refact, jais, codeshell, deepseek v1, llada) whose HF
  classes aren't in this environment: the HF-native tensor naming must
  convert to value-identical GGUF tensors as the canonical llama-named
  path through ``convert_hf_llama`` (which the wave-5/arch-parity tests
  already pin against oracles).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.tools import convert_extra as CE
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

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


class Shim:
    def __init__(self, config, state):
        self.config = config
        self._state = state

    def state_dict(self):
        return self._state


class Cfg:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _tensors(path):
    return {n: t.to_f32() for n, t in GGUFReader(path).tensors.items()}


def _assert_same_gguf_tensors(path_a, path_b):
    ta, tb = _tensors(path_a), _tensors(path_b)
    assert set(ta) == set(tb), (sorted(set(ta) ^ set(tb)))
    for n in ta:
        np.testing.assert_array_equal(ta[n], tb[n], err_msg=n)


def _check_hf(path, hf, arch, ids=(3, 17, 42, 9, 88), rtol=3e-3):
    eng = Engine.from_gguf(path, max_seq=64, dtype=jnp.float32)
    assert eng.cfg.arch == arch
    with torch.no_grad():
        ref = hf(torch.tensor([list(ids)])).logits[0].float().numpy()
    from llama_cpp_gfx906_tpu.models.llama import forward

    got, _ = forward(eng.params, eng.cfg, jnp.asarray([list(ids)], jnp.int32), eng.kv)
    np.testing.assert_allclose(np.asarray(got[0]), ref, rtol=rtol, atol=rtol)
    return eng


# -- transformers-class parity ----------------------------------------------


@pytest.mark.parametrize("parallel", [True, False])
def test_gptneox_hf_parity(tmp_path, parallel):
    """Fused per-head-interleaved query_key_value de-interleaves; partial
    rotary_pct rides rope.dimension_count (GPTNeoXModel.modify_tensors)."""
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(60)
    hf = GPTNeoXForCausalLM(GPTNeoXConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=128, use_parallel_residual=parallel,
    )).eval()
    path = str(tmp_path / "neox.gguf")
    CE.convert_hf_gptneox(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "gptneox")
    assert eng.cfg.parallel_residual is parallel
    assert eng.cfg.rope_dim == 4  # 0.5 * head_dim


def test_falcon_hf_parity(tmp_path):
    """7B layout: MQA fused query_key_value splits [q|k|v], single norm,
    parallel residual (FalconModel.modify_tensors)."""
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(61)
    hf = FalconForCausalLM(FalconConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
    )).eval()
    path = str(tmp_path / "falcon.gguf")
    CE.convert_hf_falcon(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "falcon")
    assert eng.cfg.n_kv_heads == 1 and eng.cfg.parallel_residual


def test_falcon_40b_layout_rejected(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    hf = FalconForCausalLM(FalconConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
    )).eval()
    with pytest.raises(NotImplementedError):
        CE.convert_hf_falcon(hf, dummy_vocab(), str(tmp_path / "x.gguf"))


def test_gpt_bigcode_hf_parity(tmp_path):
    """starcoder v1: fused MQA c_attn stays fused (loader splits), learned
    positions ride position_embd (StarCoderModel spec)."""
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(62)
    hf = GPTBigCodeForCausalLM(GPTBigCodeConfig(
        vocab_size=VOCAB, n_embd=32, n_inner=64, n_layer=2, n_head=4,
        n_positions=128, multi_query=True,
    )).eval()
    path = str(tmp_path / "bigcode.gguf")
    CE.convert_hf_gpt_bigcode(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    _check_hf(path, hf, "starcoder")


def test_stablelm_hf_parity(tmp_path):
    """LayerNorm+bias blocks, partial_rotary_factor → rope.dimension_count
    (StableLMModel spec)."""
    from transformers import StableLmConfig, StableLmForCausalLM

    torch.manual_seed(63)
    hf = StableLmForCausalLM(StableLmConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=128,
    )).eval()
    path = str(tmp_path / "stablelm.gguf")
    CE.convert_hf_stablelm(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "stablelm")
    assert eng.cfg.rope_dim == 4


# -- layout-equality families ------------------------------------------------


def _canon_llama_state(seed, L=2, D=32, n_head=4, n_kv=2, ff=64, vocab=VOCAB,
                       hd=None, biases=False, tied=False):
    """Random canonical llama-named torch state dict."""
    g = torch.Generator().manual_seed(seed)
    hd = hd or D // n_head

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    s = {"model.embed_tokens.weight": t(vocab, D),
         "model.norm.weight": 1 + t(D) * 0}
    if not tied:
        s["lm_head.weight"] = t(vocab, D)
    for i in range(L):
        p = f"model.layers.{i}."
        s[p + "input_layernorm.weight"] = 1 + t(D)
        s[p + "post_attention_layernorm.weight"] = 1 + t(D)
        s[p + "self_attn.q_proj.weight"] = t(n_head * hd, D)
        s[p + "self_attn.k_proj.weight"] = t(n_kv * hd, D)
        s[p + "self_attn.v_proj.weight"] = t(n_kv * hd, D)
        s[p + "self_attn.o_proj.weight"] = t(D, n_head * hd)
        s[p + "mlp.gate_proj.weight"] = t(ff, D)
        s[p + "mlp.up_proj.weight"] = t(ff, D)
        s[p + "mlp.down_proj.weight"] = t(D, ff)
        if biases:
            for k, dim in (("input_layernorm", D), ("post_attention_layernorm", D)):
                s[p + k + ".bias"] = t(dim)
    return s


_CANON_CFG = dict(num_attention_heads=4, num_key_value_heads=2, hidden_size=32,
                  intermediate_size=64, num_hidden_layers=2,
                  max_position_embeddings=128, vocab_size=VOCAB,
                  rms_norm_eps=1e-5, rope_theta=10000.0,
                  name_or_path="t")


def test_exaone_rename(tmp_path):
    canon = _canon_llama_state(70)
    hf = {}
    for k, v in canon.items():
        nk = (k.replace("model.embed_tokens.", "transformer.wte.")
               .replace("model.norm.", "transformer.ln_f."))
        nk = nk.replace("model.layers.", "transformer.h.")
        nk = (nk.replace(".input_layernorm.", ".ln_1.")
                .replace(".post_attention_layernorm.", ".ln_2.")
                .replace(".self_attn.o_proj.", ".attn.attention.out_proj.")
                .replace(".self_attn.", ".attn.attention.")
                .replace(".mlp.gate_proj.", ".mlp.c_fc_0.")
                .replace(".mlp.up_proj.", ".mlp.c_fc_1.")
                .replace(".mlp.down_proj.", ".mlp.c_proj."))
        hf[nk] = v
    cfg = Cfg(**{**_CANON_CFG, "num_layers": 2})
    a = str(tmp_path / "a.gguf")
    b = str(tmp_path / "b.gguf")
    CE.convert_hf_exaone(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    convert_hf_llama(Shim(Cfg(**_CANON_CFG), canon), dummy_vocab(), b,
                     GGMLType.F32, arch="exaone", permute=False)
    _assert_same_gguf_tensors(a, b)


def test_baichuan_wpack_split(tmp_path):
    canon = _canon_llama_state(71, n_kv=4)  # W_pack is MHA-only
    hf = {}
    done = set()
    for k, v in canon.items():
        if ".self_attn.q_proj." in k:
            p = k.split("q_proj")[0]
            hf[p + "W_pack.weight"] = torch.cat(
                [canon[p + "q_proj.weight"], canon[p + "k_proj.weight"],
                 canon[p + "v_proj.weight"]])
            done.add(p)
        elif ".self_attn.k_proj." in k or ".self_attn.v_proj." in k:
            continue
        else:
            hf[k] = v
    assert done
    cfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_baichuan(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    convert_hf_llama(Shim(cfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="baichuan", permute=True)
    _assert_same_gguf_tensors(a, b)


def test_internlm2_wqkv_degroup(tmp_path):
    n_head, n_kv, hd, D = 4, 2, 8, 32
    canon = _canon_llama_state(72, n_head=n_head, n_kv=n_kv)
    g = n_head // n_kv
    hf = {"model.tok_embeddings.weight": canon["model.embed_tokens.weight"],
          "model.norm.weight": canon["model.norm.weight"],
          "output.weight": canon["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}."
        q = canon[p + "self_attn.q_proj.weight"].reshape(n_kv, g, hd, D)
        k = canon[p + "self_attn.k_proj.weight"].reshape(n_kv, 1, hd, D)
        v = canon[p + "self_attn.v_proj.weight"].reshape(n_kv, 1, hd, D)
        hf[p + "attention.wqkv.weight"] = torch.cat([q, k, v], dim=1).reshape(-1, D)
        hf[p + "attention.wo.weight"] = canon[p + "self_attn.o_proj.weight"]
        hf[p + "attention_norm.weight"] = canon[p + "input_layernorm.weight"]
        hf[p + "ffn_norm.weight"] = canon[p + "post_attention_layernorm.weight"]
        hf[p + "feed_forward.w1.weight"] = canon[p + "mlp.gate_proj.weight"]
        hf[p + "feed_forward.w3.weight"] = canon[p + "mlp.up_proj.weight"]
        hf[p + "feed_forward.w2.weight"] = canon[p + "mlp.down_proj.weight"]
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_internlm2(Shim(Cfg(**_CANON_CFG), hf), dummy_vocab(), a, GGMLType.F32)
    convert_hf_llama(Shim(Cfg(**_CANON_CFG), canon), dummy_vocab(), b,
                     GGMLType.F32, arch="internlm2", permute=True)
    _assert_same_gguf_tensors(a, b)


def test_plamo_shared_norm_rename(tmp_path):
    canon = _canon_llama_state(73, n_kv=4)
    hf = {}
    for k, v in canon.items():
        if ".post_attention_layernorm." in k:
            continue  # plamo has one shared norm per block
        nk = k.replace(".input_layernorm.", ".norm.")
        nk = nk.replace("model.layers.", "model.layers.layers.")
        hf[nk] = v
    canon2 = {k: v for k, v in canon.items() if ".post_attention_layernorm." not in k}
    cfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_plamo(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    convert_hf_llama(Shim(cfg, canon2), dummy_vocab(), b, GGMLType.F32,
                     arch="plamo", permute=False, layer_map=CE._PLAMO_MAP)
    _assert_same_gguf_tensors(a, b)


def test_refact_fused_split(tmp_path):
    D, n_head = 32, 4
    hd = D // n_head
    inner = 4 * D
    ff = 256 * ((int(2 * inner / 3) + 255) // 256)
    canon = _canon_llama_state(74, n_head=n_head, n_kv=1, ff=ff, tied=True)
    hf = {"transformer.wte.weight": canon["model.embed_tokens.weight"],
          "transformer.ln_f.weight": canon["model.norm.weight"]}
    for i in range(2):
        p, q = f"model.layers.{i}.", f"transformer.h.{i}."
        hf[q + "ln_1.weight"] = canon[p + "input_layernorm.weight"]
        hf[q + "ln_2.weight"] = canon[p + "post_attention_layernorm.weight"]
        hf[q + "attn.q.weight"] = canon[p + "self_attn.q_proj.weight"]
        hf[q + "attn.kv.weight"] = torch.cat(
            [canon[p + "self_attn.k_proj.weight"], canon[p + "self_attn.v_proj.weight"]])
        hf[q + "attn.c_proj.weight"] = canon[p + "self_attn.o_proj.weight"]
        hf[q + "mlp.gate_up_proj.weight"] = torch.cat(
            [canon[p + "mlp.gate_proj.weight"], canon[p + "mlp.up_proj.weight"]])
        hf[q + "mlp.c_proj.weight"] = canon[p + "mlp.down_proj.weight"]
    cfg = Cfg(n_embd=D, n_head=n_head, n_layer=2, vocab_size=VOCAB,
              layer_norm_epsilon=1e-5)
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_refact(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    canon["lm_head.weight"] = canon["model.embed_tokens.weight"]
    ccfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 1, "intermediate_size": ff})
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="refact", permute=False,
                     layer_map=CE._PLAMO_MAP + [("post_attention_layernorm.weight",
                                                 "ffn_norm.weight")])
    _assert_same_gguf_tensors(a, b)
    assert Engine.from_gguf(a, max_seq=32, dtype=jnp.float32).cfg.arch == "refact"


def test_jais_conv1d_and_fused_attn(tmp_path):
    D = 32
    canon = _canon_llama_state(75, n_kv=4, biases=True)
    for i in range(2):  # jais carries projection biases too
        p = f"model.layers.{i}."
        g2 = torch.Generator().manual_seed(200 + i)
        for proj, dim in (("self_attn.q_proj", D), ("self_attn.k_proj", D),
                          ("self_attn.v_proj", D), ("self_attn.o_proj", D),
                          ("mlp.gate_proj", 64), ("mlp.up_proj", 64),
                          ("mlp.down_proj", D)):
            canon[p + proj + ".bias"] = torch.randn(dim, generator=g2) * 0.05
    canon["model.norm.bias"] = torch.randn(D) * 0.05
    canon["lm_head.weight"] = canon["model.embed_tokens.weight"]
    hf = {"transformer.wte.weight": canon["model.embed_tokens.weight"],
          "transformer.ln_f.weight": canon["model.norm.weight"],
          "transformer.ln_f.bias": canon["model.norm.bias"],
          "transformer.relative_pe.slopes": torch.zeros(4)}
    for i in range(2):
        p, q = f"model.layers.{i}.", f"transformer.h.{i}."
        hf[q + "ln_1.weight"] = canon[p + "input_layernorm.weight"]
        hf[q + "ln_1.bias"] = canon[p + "input_layernorm.bias"]
        hf[q + "ln_2.weight"] = canon[p + "post_attention_layernorm.weight"]
        hf[q + "ln_2.bias"] = canon[p + "post_attention_layernorm.bias"]
        # Conv1D stores (in, out): transpose of the canonical (out, in)
        hf[q + "attn.c_attn.weight"] = torch.cat(
            [canon[p + "self_attn.q_proj.weight"], canon[p + "self_attn.k_proj.weight"],
             canon[p + "self_attn.v_proj.weight"]]).t().contiguous()
        hf[q + "attn.c_attn.bias"] = torch.cat(
            [canon[p + "self_attn.q_proj.bias"], canon[p + "self_attn.k_proj.bias"],
             canon[p + "self_attn.v_proj.bias"]])
        hf[q + "attn.c_proj.weight"] = canon[p + "self_attn.o_proj.weight"].t().contiguous()
        hf[q + "attn.c_proj.bias"] = canon[p + "self_attn.o_proj.bias"]
        hf[q + "mlp.c_fc2.weight"] = canon[p + "mlp.gate_proj.weight"].t().contiguous()
        hf[q + "mlp.c_fc2.bias"] = canon[p + "mlp.gate_proj.bias"]
        hf[q + "mlp.c_fc.weight"] = canon[p + "mlp.up_proj.weight"].t().contiguous()
        hf[q + "mlp.c_fc.bias"] = canon[p + "mlp.up_proj.bias"]
        hf[q + "mlp.c_proj.weight"] = canon[p + "mlp.down_proj.weight"].t().contiguous()
        hf[q + "mlp.c_proj.bias"] = canon[p + "mlp.down_proj.bias"]
    cfg = Cfg(n_embd=D, n_head=4, n_layer=2, n_inner=64, n_positions=128,
              vocab_size=VOCAB, layer_norm_epsilon=1e-5)
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_jais(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    ccfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4})
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="jais", permute=False, layer_map=CE._BIAS_LAYER_MAP)
    _assert_same_gguf_tensors(a, b)


def test_codeshell_fused_mqa(tmp_path):
    D, n_head, n_kv = 32, 4, 1
    canon = _canon_llama_state(76, n_kv=n_kv, tied=True)
    canon["lm_head.weight"] = canon["model.embed_tokens.weight"]
    del canon["model.layers.0.mlp.gate_proj.weight"]
    del canon["model.layers.1.mlp.gate_proj.weight"]
    hf = {"transformer.wte.weight": canon["model.embed_tokens.weight"],
          "transformer.ln_f.weight": canon["model.norm.weight"]}
    for i in range(2):
        p, q = f"model.layers.{i}.", f"transformer.h.{i}."
        hf[q + "ln_1.weight"] = canon[p + "input_layernorm.weight"]
        hf[q + "ln_2.weight"] = canon[p + "post_attention_layernorm.weight"]
        hf[q + "attn.c_attn.weight"] = torch.cat(
            [canon[p + "self_attn.q_proj.weight"], canon[p + "self_attn.k_proj.weight"],
             canon[p + "self_attn.v_proj.weight"]])
        hf[q + "attn.c_proj.weight"] = canon[p + "self_attn.o_proj.weight"]
        hf[q + "mlp.c_fc.weight"] = canon[p + "mlp.up_proj.weight"]
        hf[q + "mlp.c_proj.weight"] = canon[p + "mlp.down_proj.weight"]
    cfg = Cfg(n_embd=D, n_head=n_head, num_query_groups=n_kv, n_layer=2,
              vocab_size=VOCAB, layer_norm_epsilon=1e-5, n_inner=64)
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_codeshell(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    ccfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": n_kv})
    no_gate = [x for x in CE._BIAS_LAYER_MAP if "ffn_gate" not in x[1]]
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="codeshell", permute=False, layer_map=no_gate)
    _assert_same_gguf_tensors(a, b)


def test_deepseek_v1_moe(tmp_path):
    torch.manual_seed(77)

    def t(*shape):
        return torch.randn(*shape) * 0.05

    D, ff, mff, n_exp = 32, 64, 16, 4
    canon = _canon_llama_state(77, D=D, ff=ff)
    # layer 0 dense (first_k_dense_replace=1); layer 1 MoE
    p = "model.layers.1."
    for k in ("gate_proj", "up_proj", "down_proj"):
        del canon[p + f"mlp.{k}.weight"]
    canon[p + "mlp.gate.weight"] = t(n_exp, D)
    for e in range(n_exp):
        canon[p + f"mlp.experts.{e}.gate_proj.weight"] = t(mff, D)
        canon[p + f"mlp.experts.{e}.up_proj.weight"] = t(mff, D)
        canon[p + f"mlp.experts.{e}.down_proj.weight"] = t(D, mff)
    hf = {k.replace(".mlp.shared_expert.", ".mlp.shared_experts."): v
          for k, v in canon.items()}
    hf[p + "mlp.shared_experts.gate_proj.weight"] = t(mff, D)
    hf[p + "mlp.shared_experts.up_proj.weight"] = t(mff, D)
    hf[p + "mlp.shared_experts.down_proj.weight"] = t(D, mff)
    canon[p + "mlp.shared_expert.gate_proj.weight"] = hf[p + "mlp.shared_experts.gate_proj.weight"]
    canon[p + "mlp.shared_expert.up_proj.weight"] = hf[p + "mlp.shared_experts.up_proj.weight"]
    canon[p + "mlp.shared_expert.down_proj.weight"] = hf[p + "mlp.shared_experts.down_proj.weight"]
    from llama_cpp_gfx906_tpu.gguf.constants import Keys

    cfg = Cfg(**{**_CANON_CFG, "n_routed_experts": n_exp,
                 "num_experts_per_tok": 2, "moe_intermediate_size": mff,
                 "first_k_dense_replace": 1, "n_shared_experts": 1})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_deepseek_v1(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    extra = {Keys.LLM.LEADING_DENSE_BLOCK_COUNT: 1, Keys.LLM.EXPERT_SHARED_COUNT: 1}
    ccfg = Cfg(**{**_CANON_CFG, "num_experts": n_exp, "num_experts_per_tok": 2,
                  "moe_intermediate_size": mff})
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="deepseek", permute=True, extra_kv=extra)
    _assert_same_gguf_tensors(a, b)
    r = GGUFReader(a)
    assert r.get(Keys.LLM.LEADING_DENSE_BLOCK_COUNT, arch="deepseek") == 1
    assert r.get(Keys.LLM.EXPERT_SHARED_COUNT, arch="deepseek") == 1
    assert Engine.from_gguf(a, max_seq=32, dtype=jnp.float32).cfg.arch == "deepseek"


def test_llada_olmo_rename(tmp_path):
    canon = _canon_llama_state(78)
    hf = {}
    for k, v in canon.items():
        nk = (k.replace("model.embed_tokens.", "model.transformer.wte.")
               .replace("model.norm.", "model.transformer.ln_f.")
               .replace("lm_head.", "model.transformer.ff_out."))
        nk = nk.replace("model.layers.", "model.transformer.blocks.")
        nk = (nk.replace(".input_layernorm.", ".attn_norm.")
                .replace(".post_attention_layernorm.", ".ff_norm.")
                .replace(".self_attn.q_proj.", ".q_proj.")
                .replace(".self_attn.k_proj.", ".k_proj.")
                .replace(".self_attn.v_proj.", ".v_proj.")
                .replace(".self_attn.o_proj.", ".attn_out.")
                .replace(".mlp.gate_proj.", ".ff_proj.")
                .replace(".mlp.up_proj.", ".up_proj.")
                .replace(".mlp.down_proj.", ".ff_out."))
        hf[nk] = v
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_llada(Shim(Cfg(**_CANON_CFG), hf), dummy_vocab(), a, GGMLType.F32)
    convert_hf_llama(Shim(Cfg(**_CANON_CFG), canon), dummy_vocab(), b,
                     GGMLType.F32, arch="llada", permute=True)
    _assert_same_gguf_tensors(a, b)
    from llama_cpp_gfx906_tpu.runtime.diffusion import DiffusionEngine

    assert DiffusionEngine.from_gguf(a, dtype=jnp.float32).cfg.arch == "llada"


# -- auto-dispatch through a real HF directory -------------------------------


def test_auto_dispatch_gptneox_dir(tmp_path):
    """convert_hf_auto picks the gpt_neox converter from config.json and the
    result matches HF logits (reference entrypoint behavior)."""
    from safetensors.torch import save_file
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    from llama_cpp_gfx906_tpu.tools.convert_auto import convert_hf_auto

    torch.manual_seed(64)
    cfg = GPTNeoXConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=1.0,
        max_position_embeddings=128, bos_token_id=0, eos_token_id=1,
    )
    hf = GPTNeoXForCausalLM(cfg).eval()
    d = tmp_path / "hfdir"
    d.mkdir()
    (d / "config.json").write_text(cfg.to_json_string())
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    toks = {f"<t{i}>": i for i in range(VOCAB)}
    tj = {"model": {"type": "BPE", "vocab": toks, "merges": []},
          "added_tokens": []}
    (d / "tokenizer.json").write_text(json.dumps(tj))
    out = str(tmp_path / "auto.gguf")
    convert_hf_auto(d, out, outtype="f32")
    _check_hf(out, hf, "gptneox")


# -- wave 2: olmo / grok / arctic / smallthinker -----------------------------


def test_olmo_hf_parity(tmp_path):
    """OLMo v1: non-parametric LayerNorm → synthesized ones-weights;
    clip_qkv → attention.clamp_kqv (OlmoModel spec)."""
    from transformers import OlmoConfig, OlmoForCausalLM

    torch.manual_seed(65)
    hf = OlmoForCausalLM(OlmoConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, clip_qkv=0.2, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "olmo.gguf")
    CE.convert_hf_olmo(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    eng = _check_hf(path, hf, "olmo")
    assert eng.cfg.norm_type == "layer" and eng.cfg.clamp_kqv == pytest.approx(0.2)


def test_grok_rename(tmp_path):
    torch.manual_seed(80)

    def t(*s):
        return torch.randn(*s) * 0.05

    D, F, E, L = 32, 64, 4, 2
    canon = {"model.embed_tokens.weight": t(VOCAB, D),
             "model.norm.weight": 1 + t(D)}
    hf = {"transformer.in_out_embed.weight": canon["model.embed_tokens.weight"],
          "transformer.rms_norm.weight": canon["model.norm.weight"]}
    for i in range(L):
        p, q = f"model.layers.{i}.", f"transformer.decoder_layer.{i}."
        for cn, gn in (("input_layernorm", "rms_norm"),
                       ("post_attn_norm", "rms_norm_1"),
                       ("post_attention_layernorm", "rms_norm_2"),
                       ("layer_out_norm", "rms_norm_3")):
            canon[p + cn + ".weight"] = 1 + t(D)
            hf[q + gn + ".weight"] = canon[p + cn + ".weight"]
        for cn, gn in (("self_attn.q_proj", "multi_head_attention.query"),
                       ("self_attn.k_proj", "multi_head_attention.key"),
                       ("self_attn.v_proj", "multi_head_attention.value"),
                       ("self_attn.o_proj", "multi_head_attention.linear")):
            canon[p + cn + ".weight"] = t(D, D)
            hf[q + gn + ".weight"] = canon[p + cn + ".weight"]
        canon[p + "mlp.gate.weight"] = t(E, D)
        hf[q + "router.weight"] = canon[p + "mlp.gate.weight"]
        for e in range(E):
            for cn, gn, shp in (("gate_proj", "linear", (F, D)),
                                ("up_proj", "linear_v", (F, D)),
                                ("down_proj", "linear_1", (D, F))):
                canon[p + f"mlp.experts.{e}.{cn}.weight"] = t(*shp)
                hf[q + f"moe.{e}.{gn}.weight"] = canon[p + f"mlp.experts.{e}.{cn}.weight"]
    cfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4,
                 "num_local_experts": E, "num_experts_per_tok": 2})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_grok(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    from llama_cpp_gfx906_tpu.tools.convert_hf import _LAYER_MAP

    lm = _LAYER_MAP + [("post_attn_norm.weight", "attn_output_norm.weight"),
                       ("layer_out_norm.weight", "layer_output_norm.weight")]
    ccfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4,
                  "num_experts": E, "num_experts_per_tok": 2})
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="grok", permute=False, layer_map=lm)
    _assert_same_gguf_tensors(a, b)
    assert Engine.from_gguf(a, max_seq=32, dtype=jnp.float32).cfg.arch == "grok"


def test_arctic_rename(tmp_path):
    torch.manual_seed(81)

    def t(*s):
        return torch.randn(*s) * 0.05

    D, F, E = 32, 64, 4
    canon = _canon_llama_state(81, n_kv=4)
    hf = {}
    for k, v in canon.items():
        nk = (k.replace(".post_attention_layernorm.", ".residual_layernorm.")
               .replace(".mlp.gate_proj.", ".residual_mlp.w1.")
               .replace(".mlp.up_proj.", ".residual_mlp.w3.")
               .replace(".mlp.down_proj.", ".residual_mlp.w2."))
        hf[nk] = v
    for i in range(2):
        p = f"model.layers.{i}."
        moe_norm = 1 + t(D)
        hf[p + "post_attention_layernorm.weight"] = moe_norm
        canon[p + "moe_norm.weight"] = moe_norm
        gate = t(E, D)
        hf[p + "block_sparse_moe.gate.weight"] = gate
        canon[p + "block_sparse_moe.gate.weight"] = gate
        for e in range(E):
            for wn, shp in (("w1", (F, D)), ("w3", (F, D)), ("w2", (D, F))):
                w_ = t(*shp)
                hf[p + f"block_sparse_moe.experts.{e}.{wn}.weight"] = w_
                canon[p + f"block_sparse_moe.experts.{e}.{wn}.weight"] = w_
    cfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4,
                 "num_local_experts": E, "num_experts_per_tok": 2})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_arctic(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    from llama_cpp_gfx906_tpu.tools.convert_hf import _LAYER_MAP

    lm = _LAYER_MAP + [("moe_norm.weight", "ffn_norm_exps.weight")]
    convert_hf_llama(Shim(cfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="arctic", permute=True, layer_map=lm)
    _assert_same_gguf_tensors(a, b)
    assert Engine.from_gguf(a, max_seq=32, dtype=jnp.float32).cfg.arch == "arctic"


def test_smallthinker_rename(tmp_path):
    torch.manual_seed(82)

    def t(*s):
        return torch.randn(*s) * 0.05

    D, mff, E = 32, 16, 4
    canon = _canon_llama_state(82, n_kv=4)
    for i in range(2):  # MoE everywhere: drop the dense FFN
        for k in ("gate_proj", "up_proj", "down_proj"):
            del canon[f"model.layers.{i}.mlp.{k}.weight"]
    hf = dict(canon)
    for i in range(2):
        p = f"model.layers.{i}."
        canon[p + "mlp.gate.weight"] = t(E, D)
        hf[p + "block_sparse_moe.primary_router.weight"] = canon[p + "mlp.gate.weight"]
        for e in range(E):
            for cn, gn, shp in (("gate_proj", "gate", (mff, D)),
                                ("up_proj", "up", (mff, D)),
                                ("down_proj", "down", (D, mff))):
                canon[p + f"mlp.experts.{e}.{cn}.weight"] = t(*shp)
                hf[p + f"block_sparse_moe.experts.{e}.{gn}.weight"] = \
                    canon[p + f"mlp.experts.{e}.{cn}.weight"]
    from llama_cpp_gfx906_tpu.gguf.constants import Keys

    cfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4, "num_experts": E,
                 "num_experts_per_tok": 2, "moe_ffn_hidden_size": mff,
                 "moe_primary_router_apply_softmax": True})
    a, b = str(tmp_path / "a.gguf"), str(tmp_path / "b.gguf")
    CE.convert_hf_smallthinker(Shim(cfg, hf), dummy_vocab(), a, GGMLType.F32)
    ccfg = Cfg(**{**_CANON_CFG, "num_key_value_heads": 4, "num_experts": E,
                  "num_experts_per_tok": 2, "moe_intermediate_size": mff})
    convert_hf_llama(Shim(ccfg, canon), dummy_vocab(), b, GGMLType.F32,
                     arch="smallthinker", permute=False,
                     extra_kv={Keys.LLM.EXPERT_GATING_FUNC: 1})
    _assert_same_gguf_tensors(a, b)
    r = GGUFReader(a)
    assert r.get(Keys.LLM.EXPERT_GATING_FUNC, arch="smallthinker") == 1
    assert Engine.from_gguf(a, max_seq=32, dtype=jnp.float32).cfg.arch == "smallthinker"


# -- wave 3: ragged per-layer archs ------------------------------------------


def test_openelm_convert(tmp_path):
    """Per-layer head counts / FFN widths become header arrays; proj_1
    splits at the per-layer ff_dim; qkv stays fused (OpenELMModel spec)."""
    torch.manual_seed(83)

    def t(*s):
        return torch.randn(*s) * 0.05

    D, hd, L = 32, 8, 2
    heads, kvs, mults = [4, 2], [2, 1], [1.0, 1.5]
    ffs = [32, 48]  # _make_divisible(m * 32, 16)
    state = {"transformer.token_embeddings.weight": t(VOCAB, D),
             "transformer.norm.weight": 1 + t(D)}
    for i in range(L):
        p = f"transformer.layers.{i}."
        q, kv, ff = heads[i], kvs[i], ffs[i]
        state[p + "attn_norm.weight"] = 1 + t(D)
        state[p + "attn.qkv_proj.weight"] = t((q + 2 * kv) * hd, D)
        state[p + "attn.q_norm.weight"] = 1 + t(hd)
        state[p + "attn.k_norm.weight"] = 1 + t(hd)
        state[p + "attn.out_proj.weight"] = t(D, q * hd)
        state[p + "ffn_norm.weight"] = 1 + t(D)
        state[p + "ffn.proj_1.weight"] = t(2 * ff, D)
        state[p + "ffn.proj_2.weight"] = t(D, ff)
    cfg = Cfg(model_dim=D, num_transformer_layers=L, head_dim=hd,
              num_query_heads=heads, num_kv_heads=kvs, ffn_multipliers=mults,
              ffn_dim_divisor=16, rope_freq_constant=10000.0,
              max_context_length=128, vocab_size=VOCAB)
    path = str(tmp_path / "openelm.gguf")
    CE.convert_hf_openelm(Shim(cfg, state), dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    np.testing.assert_array_equal(
        got["blk.1.ffn_gate.weight"],
        state["transformer.layers.1.ffn.proj_1.weight"][:48].numpy())
    np.testing.assert_array_equal(
        got["blk.1.ffn_up.weight"],
        state["transformer.layers.1.ffn.proj_1.weight"][48:].numpy())
    np.testing.assert_array_equal(
        got["blk.0.attn_qkv.weight"],
        state["transformer.layers.0.attn.qkv_proj.weight"].numpy())
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "openelm" and eng.cfg.qk_norm


def test_deci_convert(tmp_path):
    """block_configs → per-layer head/kv/ffn arrays; linear-attention
    layers keep a lone linear_attn → attn_output; per-layer q/k permute
    (DeciModel spec)."""
    from llama_cpp_gfx906_tpu.tools.convert_hf import permute_qk

    torch.manual_seed(84)

    def t(*s):
        return torch.randn(*s) * 0.05

    D, hd, n_head, L = 32, 8, 4, 3
    blocks = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
    ]
    ff = int(2 * 1.0 * D / 3)
    ff += (-ff) % 256  # 256 for tiny D → 256
    state = {"model.embed_tokens.weight": t(VOCAB, D),
             "model.norm.weight": 1 + t(D),
             "lm_head.weight": t(VOCAB, D)}
    p0 = "model.layers.0."
    state[p0 + "input_layernorm.weight"] = 1 + t(D)
    state[p0 + "self_attn.q_proj.weight"] = t(n_head * hd, D)
    state[p0 + "self_attn.k_proj.weight"] = t(2 * hd, D)
    state[p0 + "self_attn.v_proj.weight"] = t(2 * hd, D)
    state[p0 + "self_attn.o_proj.weight"] = t(D, n_head * hd)
    p1 = "model.layers.1."
    state[p1 + "input_layernorm.weight"] = 1 + t(D)
    state[p1 + "self_attn.linear_attn.weight"] = t(D, D)
    for p in (p0, p1, "model.layers.2."):
        state[p + "post_attention_layernorm.weight"] = 1 + t(D)
        state[p + "mlp.gate_proj.weight"] = t(ff, D)
        state[p + "mlp.up_proj.weight"] = t(ff, D)
        state[p + "mlp.down_proj.weight"] = t(D, ff)
    cfg = Cfg(num_attention_heads=n_head, hidden_size=D, head_dim=hd,
              num_hidden_layers=L, block_configs=blocks, rms_norm_eps=1e-5,
              max_position_embeddings=128, vocab_size=VOCAB)
    path = str(tmp_path / "deci.gguf")
    CE.convert_hf_deci(Shim(cfg, state), dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    np.testing.assert_array_equal(
        got["blk.0.attn_k.weight"],
        permute_qk(state[p0 + "self_attn.k_proj.weight"].numpy(), 2))
    np.testing.assert_array_equal(
        got["blk.1.attn_output.weight"],
        state[p1 + "self_attn.linear_attn.weight"].numpy())
    assert "blk.2.attn_q.weight" not in got  # attention-free layer
    r = GGUFReader(path)
    assert list(r.get("deci.attention.head_count", arch="deci")) == [4, 4, 0]
    assert list(r.get("deci.attention.head_count_kv", arch="deci")) == [2, 0, 0]
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "deci"
    assert eng.cfg.attn_linear_layers == (False, True, False)


# -- wave 4: MLA archs -------------------------------------------------------


def _mla_state(seed, L=2, D=32, H=4, rope_d=4, nope_d=8, v_d=8, rank=16,
               ff=64, q_lora=None):
    torch.manual_seed(seed)

    def t(*s):
        return torch.randn(*s) * 0.05

    s = {"model.embed_tokens.weight": t(VOCAB, D),
         "model.norm.weight": 1 + t(D),
         "lm_head.weight": t(VOCAB, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        s[p + "input_layernorm.weight"] = 1 + t(D)
        s[p + "post_attention_layernorm.weight"] = 1 + t(D)
        if q_lora:
            s[p + "self_attn.q_a_proj.weight"] = t(q_lora, D)
            s[p + "self_attn.q_a_layernorm.weight"] = 1 + t(q_lora)
            s[p + "self_attn.q_b_proj.weight"] = t(H * (nope_d + rope_d), q_lora)
        else:
            s[p + "self_attn.q_proj.weight"] = t(H * (nope_d + rope_d), D)
        s[p + "self_attn.kv_a_proj_with_mqa.weight"] = t(rank + rope_d, D)
        s[p + "self_attn.kv_a_layernorm.weight"] = 1 + t(rank)
        s[p + "self_attn.kv_b_proj.weight"] = t(H * (nope_d + v_d), rank)
        s[p + "self_attn.o_proj.weight"] = t(D, H * v_d)
        s[p + "mlp.up_proj.weight"] = t(ff, D)
        s[p + "mlp.down_proj.weight"] = t(D, ff)
        s[p + "mlp.gate_proj.weight"] = t(ff, D)
    return s


def test_minicpm3_convert(tmp_path):
    """MLA under minicpm3 keys + longrope factor tensors (MiniCPM3Model
    spec)."""
    state = _mla_state(85, q_lora=12)
    cfg = Cfg(num_attention_heads=4, hidden_size=32, num_hidden_layers=2,
              intermediate_size=64, qk_rope_head_dim=4, qk_nope_head_dim=8,
              v_head_dim=8, kv_lora_rank=16, q_lora_rank=12,
              max_position_embeddings=128, vocab_size=VOCAB, rms_norm_eps=1e-5,
              rope_scaling={"long_factor": [1.0, 2.0], "short_factor": [1.0, 1.0],
                            "original_max_position_embeddings": 64})
    path = str(tmp_path / "mini3.gguf")
    CE.convert_hf_minicpm3(Shim(cfg, state), dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    assert "rope_factors_long.weight" in got and "blk.0.attn_q_b.weight" in got
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "minicpm3" and eng.cfg.embedding_scale == 12.0


def test_plm_convert(tmp_path):
    """MLA without q low-rank; kv_b splits into transposed k_b + v_b (PLM
    spec)."""
    H, rope_d, nope_d, v_d, rank = 4, 4, 8, 8, 16
    state = _mla_state(86)
    for i in range(2):  # plm is ungated relu²
        del state[f"model.layers.{i}.mlp.gate_proj.weight"]
    cfg = Cfg(num_attention_heads=H, hidden_size=32, num_hidden_layers=2,
              intermediate_size=64, qk_rope_head_dim=rope_d,
              qk_nope_head_dim=nope_d, v_head_dim=v_d, kv_lora_rank=rank,
              max_position_embeddings=128, vocab_size=VOCAB, rms_norm_eps=1e-5)
    path = str(tmp_path / "plm.gguf")
    CE.convert_hf_plm(Shim(cfg, state), dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    kv_b = state["model.layers.0.self_attn.kv_b_proj.weight"].numpy().reshape(
        H, nope_d + v_d, rank)
    np.testing.assert_array_equal(got["blk.0.attn_k_b.weight"],
                                  kv_b[:, :nope_d, :].transpose(0, 2, 1))
    np.testing.assert_array_equal(got["blk.0.attn_v_b.weight"], kv_b[:, nope_d:, :])
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "plm" and eng.cfg.act_fn == "relu2" and not eng.cfg.ffn_gated


# -- wave 5: RWKV family -----------------------------------------------------


def _decode_ok(path, n=3):
    eng = Engine.from_gguf(path, max_seq=16, dtype=jnp.float32)
    text, ids = eng.generate("<t3><t7>", n_predict=n, stop_on_eog=False)
    assert len(ids) == n and np.isfinite(
        np.asarray(eng.family.forward(eng.params, eng.cfg,
                                      jnp.asarray([[3, 7]], jnp.int32),
                                      eng.kv)[0])).all()
    return eng


def test_rwkv6_convert(tmp_path):
    rng = np.random.default_rng(90)
    D, S, L, E, FF = 32, 8, 2, 8, 64
    H = D // S

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"rwkv.embeddings.weight": r(VOCAB, D),
          "rwkv.blocks.0.pre_ln.weight": 1 + r(D), "rwkv.blocks.0.pre_ln.bias": r(D),
          "rwkv.ln_out.weight": 1 + r(D), "rwkv.ln_out.bias": r(D),
          "head.weight": r(VOCAB, D)}
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        st[p + "ln1.weight"] = 1 + r(D); st[p + "ln1.bias"] = r(D)
        st[p + "ln2.weight"] = 1 + r(D); st[p + "ln2.bias"] = r(D)
        a = p + "attention."
        st[a + "time_maa_x"] = r(1, 1, D)
        for c in "wkvrg":
            st[a + f"time_maa_{c}"] = r(1, 1, D)
        st[a + "time_maa_w1"] = r(D, 5 * E)
        st[a + "time_maa_w2"] = r(5, E, D)
        st[a + "time_decay"] = r(1, 1, D)
        st[a + "time_decay_w1"] = r(D, E)
        st[a + "time_decay_w2"] = r(E, D)
        st[a + "time_faaaa"] = r(H, S)
        for nn in ("receptance", "key", "value", "gate", "output"):
            st[a + nn + ".weight"] = r(D, D)
        st[a + "ln_x.weight"] = 1 + r(D); st[a + "ln_x.bias"] = r(D)
        f = p + "feed_forward."
        st[f + "time_maa_k"] = r(1, 1, D)
        st[f + "time_maa_r"] = r(1, 1, D)
        st[f + "key.weight"] = r(FF, D)
        st[f + "receptance.weight"] = r(D, D)
        st[f + "value.weight"] = r(D, FF)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, head_size=S,
              layer_norm_epsilon=1e-5, intermediate_size=FF, vocab_size=VOCAB,
              rescale_every=6)
    path = str(tmp_path / "rwkv6.gguf")
    CE.convert_hf_rwkv6(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                        dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    a0 = "rwkv.blocks.0.attention."
    np.testing.assert_array_equal(
        got["blk.0.time_mix_lerp_fused.weight"].reshape(5, D),
        np.stack([st[a0 + f"time_maa_{c}"].squeeze() for c in "wkvrg"]))
    np.testing.assert_array_equal(got["blk.0.time_mix_w1.weight"],
                                  st[a0 + "time_maa_w1"].T)
    np.testing.assert_array_equal(got["blk.0.time_mix_w2.weight"],
                                  st[a0 + "time_maa_w2"].transpose(0, 2, 1))
    # rescale division must NOT be applied (engine computes unscaled)
    np.testing.assert_array_equal(got["blk.1.time_mix_output.weight"],
                                  st["rwkv.blocks.1.attention.output.weight"])
    _decode_ok(path)


def test_rwkv6qwen2_convert(tmp_path):
    rng = np.random.default_rng(91)
    D, S, L, R, FF = 32, 8, 2, 8, 64

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"model.embed_tokens.weight": r(VOCAB, D),
          "model.norm.weight": 1 + r(D), "lm_head.weight": r(VOCAB, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        a = p + "self_attn."
        st[p + "input_layernorm.weight"] = 1 + r(D)
        st[p + "post_attention_layernorm.weight"] = 1 + r(D)
        st[a + "time_maa_x"] = r(1, 1, D)
        for c in "wkvrg":
            st[a + f"time_maa_{c}"] = r(1, 1, D)
        st[a + "time_maa_w1"] = r(D, 5 * R)
        st[a + "time_maa_w2"] = r(5, R, D)
        st[a + "time_decay"] = r(1, 1, D)
        st[a + "time_decay_w1"] = r(D, R)
        st[a + "time_decay_w2"] = r(R, D)
        for nn in ("q_proj", "k_proj", "v_proj", "gate", "o_proj"):
            st[a + nn + ".weight"] = r(D, D)
        for nn in ("q_proj", "k_proj", "v_proj"):
            st[a + nn + ".bias"] = r(D)
        st[p + "mlp.gate_proj.weight"] = r(FF, D)
        st[p + "mlp.up_proj.weight"] = r(FF, D)
        st[p + "mlp.down_proj.weight"] = r(D, FF)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, num_attention_heads=D // S,
              num_key_value_heads=D // S, rms_norm_eps=1e-5,
              intermediate_size=FF, vocab_size=VOCAB)
    path = str(tmp_path / "q6.gguf")
    CE.convert_hf_rwkv6qwen2(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                             dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    a0 = "model.layers.0.self_attn."
    # rkvwg → wkvrg reorder of the 5 low-rank groups
    w1 = st[a0 + "time_maa_w1"].T.reshape(5, R, D)
    np.testing.assert_array_equal(got["blk.0.time_mix_w1.weight"].reshape(5, R, D),
                                  w1[[3, 1, 2, 0, 4]])
    w2 = st[a0 + "time_maa_w2"].transpose(0, 2, 1)
    np.testing.assert_array_equal(got["blk.0.time_mix_w2.weight"],
                                  w2[[3, 1, 2, 0, 4]])
    np.testing.assert_array_equal(got["blk.0.time_mix_receptance.bias"],
                                  st[a0 + "q_proj.bias"])
    _decode_ok(path)


def _v7_attn_state(r, D, R, with_v):
    a = {"x_r": r(1, 1, D), "x_w": r(1, 1, D), "x_k": r(1, 1, D),
         "x_v": r(1, 1, D), "x_a": r(1, 1, D), "x_g": r(1, 1, D),
         "w0": r(1, 1, D), "w1": r(D, R), "w2": r(R, D),
         "a0": r(1, 1, D), "a1": r(D, R), "a2": r(R, D),
         "g1": r(D, R), "g2": r(R, D),
         "k_k": r(1, 1, D), "k_a": r(1, 1, D), "r_k": r(D // 8, 8),
         "receptance.weight": r(D, D), "key.weight": r(D, D),
         "value.weight": r(D, D), "output.weight": r(D, D),
         "ln_x.weight": 1 + r(D), "ln_x.bias": r(D)}
    if with_v:
        a.update({"v0": r(1, 1, D), "v1": r(D, R), "v2": r(R, D)})
    return a


def test_rwkv7_convert(tmp_path):
    rng = np.random.default_rng(92)
    D, S, L, R, FF = 32, 8, 2, 8, 64

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"model.embeddings.weight": r(VOCAB, D),
          "model.pre_ln.weight": 1 + r(D), "model.pre_ln.bias": r(D),
          "model.ln_out.weight": 1 + r(D), "model.ln_out.bias": r(D),
          "head.weight": r(VOCAB, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "ln1.weight"] = 1 + r(D); st[p + "ln1.bias"] = r(D)
        st[p + "ln2.weight"] = 1 + r(D); st[p + "ln2.bias"] = r(D)
        for k, v in _v7_attn_state(r, D, R, with_v=i > 0).items():
            st[p + "attention." + k] = v
        st[p + "feed_forward.x_k"] = r(1, 1, D)
        st[p + "feed_forward.key.weight"] = r(FF, D)
        st[p + "feed_forward.value.weight"] = r(D, FF)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, head_size=S,
              layer_norm_epsilon=1e-5, intermediate_size=FF, vocab_size=VOCAB)
    path = str(tmp_path / "rwkv7.gguf")
    CE.convert_hf_rwkv7(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                        dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    a0 = "model.layers.0.attention."
    np.testing.assert_array_equal(
        got["blk.0.time_mix_lerp_fused.weight"].reshape(6, D),
        np.stack([st[a0 + f"x_{c}"].squeeze() for c in "rwkvag"]))
    np.testing.assert_array_equal(got["blk.0.time_mix_w1.weight"],
                                  st[a0 + "w1"].T)
    np.testing.assert_array_equal(got["blk.1.time_mix_v1.weight"],
                                  st["model.layers.1.attention.v1"].T)
    assert "blk.0.time_mix_v1.weight" not in got  # layer-0 dummy v skipped
    np.testing.assert_array_equal(got["blk.0.time_mix_r_k.weight"],
                                  st[a0 + "r_k"].reshape(-1))
    _decode_ok(path)


def test_arwkv7_convert(tmp_path):
    rng = np.random.default_rng(93)
    D, S, L, R, FF = 32, 8, 2, 8, 64

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"model.embed_tokens.weight": r(VOCAB, D),
          "model.norm.weight": 1 + r(D), "lm_head.weight": r(VOCAB, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + r(D)
        st[p + "post_attention_layernorm.weight"] = 1 + r(D)
        a7 = _v7_attn_state(r, D, R, with_v=i > 0)
        del a7["ln_x.weight"], a7["ln_x.bias"]  # arwkv7 group norm only
        for k, v in a7.items():
            st[p + "self_attn.time_mixer." + k] = v
        st[p + "mlp.gate_proj.weight"] = r(FF, D)
        st[p + "mlp.up_proj.weight"] = r(FF, D)
        st[p + "mlp.down_proj.weight"] = r(D, FF)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, head_size=S,
              rms_norm_eps=1e-5, intermediate_size=FF, vocab_size=VOCAB,
              wkv_has_gate=True, wkv_version=7)
    path = str(tmp_path / "arwkv7.gguf")
    CE.convert_hf_arwkv7(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                         dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    assert "blk.0.ffn_gate.weight" in got and "blk.1.time_mix_v2.weight" in got
    _decode_ok(path)


# -- wave 6: encoder families + plamo2 ---------------------------------------


def _enc_forward_ok(path, arch):
    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.models.bert import forward, load_params
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    assert cfg.arch == arch
    params = load_params(reader, cfg)
    out = forward(params, cfg, jnp.asarray([[3, 7, 9]], jnp.int32),
                  jnp.asarray([3], jnp.int32))
    assert np.isfinite(np.asarray(out)).all()
    return cfg


def test_nomic_bert_convert(tmp_path):
    rng = np.random.default_rng(60)
    D, H, L, FF = 32, 4, 2, 48

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"embeddings.word_embeddings.weight": r(VOCAB, D),
          "embeddings.token_type_embeddings.weight": r(2, D),
          "emb_ln.weight": 1 + r(D), "emb_ln.bias": r(D)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        st[p + "attn.Wqkv.weight"] = r(3 * D, D)
        st[p + "attn.out_proj.weight"] = r(D, D)
        st[p + "norm1.weight"] = 1 + r(D); st[p + "norm1.bias"] = r(D)
        st[p + "norm2.weight"] = 1 + r(D); st[p + "norm2.bias"] = r(D)
        st[p + "mlp.fc11.weight"] = r(FF, D)
        st[p + "mlp.fc12.weight"] = r(FF, D)
        st[p + "mlp.fc2.weight"] = r(D, FF)
    cfg = Cfg(n_embd=D, n_layer=L, n_head=H, n_inner=FF, n_positions=8192,
              max_trained_positions=2048, layer_norm_epsilon=1e-12,
              rotary_emb_base=1000.0, vocab_size=VOCAB)
    path = str(tmp_path / "nomic.gguf")
    CE.convert_hf_nomic_bert(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                             dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    np.testing.assert_array_equal(got["blk.0.attn_qkv.weight"],
                                  st["encoder.layers.0.attn.Wqkv.weight"])
    np.testing.assert_array_equal(got["blk.0.ffn_gate.weight"],
                                  st["encoder.layers.0.mlp.fc12.weight"])
    ecfg = _enc_forward_ok(path, "nomic-bert")
    assert ecfg.n_ctx_train == 2048 and ecfg.rope_base == 1000.0  # clamp table


def test_nomic_bert_moe_convert(tmp_path):
    rng = np.random.default_rng(61)
    D, H, L, FF, E = 32, 4, 2, 48, 4

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"embeddings.word_embeddings.weight": r(VOCAB, D),
          "emb_ln.weight": 1 + r(D), "emb_ln.bias": r(D)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        st[p + "attn.Wqkv.weight"] = r(3 * D, D)
        st[p + "attn.Wqkv.bias"] = r(3 * D)
        st[p + "attn.out_proj.weight"] = r(D, D)
        st[p + "attn.out_proj.bias"] = r(D)
        st[p + "norm1.weight"] = 1 + r(D); st[p + "norm1.bias"] = r(D)
        st[p + "norm2.weight"] = 1 + r(D); st[p + "norm2.bias"] = r(D)
        if i % 2 == 1:  # MoE layers at il % every == 1
            st[p + "mlp.router.layer.weight"] = r(E, D)
            st[p + "mlp.experts.mlp.w1"] = r(E * FF, D)
            st[p + "mlp.experts.mlp.w2"] = r(E * FF, D)
            st[p + "mlp.experts.bias"] = r(E)  # must be skipped
        else:
            st[p + "mlp.fc1.weight"] = r(FF, D)
            st[p + "mlp.fc1.bias"] = r(FF)
            st[p + "mlp.fc2.weight"] = r(D, FF)
            st[p + "mlp.fc2.bias"] = r(D)
    cfg = Cfg(n_embd=D, n_layer=L, n_head=H, n_inner=FF, n_positions=2048,
              max_trained_positions=2048, layer_norm_epsilon=1e-12,
              rotary_emb_base=10000.0, vocab_size=VOCAB,
              moe_every_n_layers=2, num_experts=E, moe_top_k=2)
    path = str(tmp_path / "nomicmoe.gguf")
    CE.convert_hf_nomic_bert(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                             dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    p1 = "encoder.layers.1."
    np.testing.assert_array_equal(got["blk.1.ffn_up_exps.weight"],
                                  st[p1 + "mlp.experts.mlp.w1"].reshape(E, FF, D))
    np.testing.assert_array_equal(
        got["blk.1.ffn_down_exps.weight"],
        st[p1 + "mlp.experts.mlp.w2"].reshape(E, FF, D).transpose(0, 2, 1))
    assert "blk.1.ffn_up.weight" not in got
    _enc_forward_ok(path, "nomic-bert-moe")


def test_neobert_convert(tmp_path):
    rng = np.random.default_rng(62)
    D, H, L, FF = 32, 4, 2, 48

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"model.encoder.weight": r(VOCAB, D),
          "model.layer_norm.weight": 1 + r(D),
          "decoder.weight": r(VOCAB, D)}  # LM head: dropped
    for i in range(L):
        p = f"model.transformer_encoder.{i}."
        st[p + "attention_norm.weight"] = 1 + r(D)
        st[p + "qkv.weight"] = r(3 * D, D)
        st[p + "wo.weight"] = r(D, D)
        st[p + "ffn_norm.weight"] = 1 + r(D)
        st[p + "ffn.w12.weight"] = r(2 * FF, D)
        st[p + "ffn.w3.weight"] = r(D, FF)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
              intermediate_size=3 * FF // 2, norm_eps=1e-6, max_length=1024,
              vocab_size=VOCAB)
    path = str(tmp_path / "neobert.gguf")
    CE.convert_hf_neobert(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                          dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    assert "decoder.weight" not in got and "output.weight" not in got
    np.testing.assert_array_equal(got["blk.0.ffn_up.weight"],
                                  st["model.transformer_encoder.0.ffn.w12.weight"])
    cfg2 = _enc_forward_ok(path, "neo-bert")
    assert cfg2.n_ff == FF  # derived from the actual w12 width


def test_jina_bert_v2_convert(tmp_path):
    rng = np.random.default_rng(63)
    D, H, L, FF = 32, 4, 2, 48

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"embeddings.word_embeddings.weight": r(VOCAB, D),
          "embeddings.token_type_embeddings.weight": r(2, D),
          "embeddings.LayerNorm.weight": 1 + r(D),
          "embeddings.LayerNorm.bias": r(D)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for n in ("attention.self.query", "attention.self.key",
                  "attention.self.value", "attention.output.dense"):
            st[p + n + ".weight"] = r(D, D)
            st[p + n + ".bias"] = r(D)
        st[p + "attention.output.LayerNorm.weight"] = 1 + r(D)
        st[p + "attention.output.LayerNorm.bias"] = r(D)
        st[p + "mlp.gated_layers.weight"] = r(2 * FF, D)  # fused GEGLU
        st[p + "mlp.wo.weight"] = r(D, FF)
        st[p + "mlp.wo.bias"] = r(D)
        st[p + "mlp.layernorm.weight"] = 1 + r(D)
        st[p + "mlp.layernorm.bias"] = r(D)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
              intermediate_size=FF, layer_norm_eps=1e-12,
              max_position_embeddings=8192, vocab_size=VOCAB)
    path = str(tmp_path / "jina.gguf")
    CE.convert_hf_jina_bert_v2(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                               dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    assert "position_embd.weight" not in got  # ALiBi: no position table
    np.testing.assert_array_equal(got["blk.0.ffn_up.weight"],
                                  st["encoder.layer.0.mlp.gated_layers.weight"])
    cfg2 = _enc_forward_ok(path, "jina-bert-v2")
    assert cfg2.alibi and cfg2.ffn_gated


def test_plamo2_convert(tmp_path):
    rng = np.random.default_rng(64)
    D, L = 32, 2
    H, HKV, Dh = 4, 2, 8
    NH, P, NS, DC = 4, 8, 8, 4  # ssm heads, head dim, state, conv
    D_INNER = NH * P
    FF = 32

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    st = {"model.embed_tokens.weight": r(VOCAB, D),
          "model.norm.weight": r(D), "lm_head.weight": r(VOCAB, D)}
    for i in range(L):
        p = f"model.layers.layers.{i}."
        for n in ("pre_mixer_norm", "post_mixer_norm", "pre_mlp_norm",
                  "post_mlp_norm"):
            st[p + n + ".weight"] = r(D)
        st[p + "mlp.gate_up_proj.weight"] = r(2 * FF, D)
        st[p + "mlp.down_proj.weight"] = r(D, FF)
        m = p + "mixer."
        if i % 2 == 0:  # mamba layer (mamba_step=2 → even layers)
            st[m + "in_proj.weight"] = r(2 * D_INNER, D)
            st[m + "conv1d.weight"] = r(D_INNER, 1, DC)
            st[m + "bcdt_proj.weight"] = r(2 * NS + 16, D_INNER)
            st[m + "dt_proj.weight"] = r(NH, 16)
            st[m + "dt_bias"] = r(NH)
            st[m + "A_log"] = r(NH)
            st[m + "D"] = r(NH)
            st[m + "dt_norm_weight"] = 1 + r(16)
            st[m + "B_norm_weight"] = 1 + r(NS)
            st[m + "C_norm_weight"] = 1 + r(NS)
            st[m + "out_proj.weight"] = r(D, D_INNER)
        else:
            st[m + "qkv_proj.weight"] = r((H + 2 * HKV) * Dh, D)
            st[m + "o_proj.weight"] = r(D, H * Dh)
            st[m + "q_weight"] = 1 + r(Dh)
            st[m + "k_weight"] = 1 + r(Dh)
    cfg = Cfg(hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
              num_key_value_heads=HKV, hidden_size_per_head=Dh,
              mamba_num_heads=NH, mamba_d_state=NS, mamba_d_conv=DC,
              mamba_step=2, mamba_enabled=True, intermediate_size=FF,
              rms_norm_eps=1e-5, rope_theta=10000.0,
              max_position_embeddings=2048, vocab_size=VOCAB)
    path = str(tmp_path / "plamo2.gguf")
    CE.convert_hf_plamo2(Shim(cfg, {k: torch.tensor(v) for k, v in st.items()}),
                         dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    m0 = "model.layers.layers.0.mixer."
    np.testing.assert_allclose(got["blk.0.ssm_a"], -np.exp(st[m0 + "A_log"]),
                               rtol=1e-6)
    assert got["blk.0.ssm_conv1d.weight"].shape == (D_INNER, DC)
    np.testing.assert_allclose(
        got["blk.0.attn_norm.weight"],
        st["model.layers.layers.0.pre_mixer_norm.weight"] + 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        got["blk.0.post_attention_norm.weight"],
        st["model.layers.layers.0.post_mixer_norm.weight"] + 0.2, rtol=1e-6)
    eng = Engine.from_gguf(path, max_seq=32, dtype=jnp.float32)
    assert eng.cfg.arch == "plamo2"
    text, ids = eng.generate("<t3><t7>", n_predict=3, stop_on_eog=False)
    assert len(ids) == 3


def test_roberta_convert_parity(tmp_path):
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(7)
    hf = RobertaModel(RobertaConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=34, pad_token_id=1, type_vocab_size=1,
        layer_norm_eps=1e-12), add_pooling_layer=False).eval()
    path = str(tmp_path / "roberta.gguf")
    CE.convert_hf_roberta(hf, dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    # position table chopped by 1+pad_token_id
    assert got["position_embd.weight"].shape[0] == 34 - 2

    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.models.bert import forward, load_params
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    ids = [5, 17, 42, 9]
    out = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                  jnp.asarray([len(ids)], jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=2e-3, atol=2e-3)


def test_distilbert_convert_parity(tmp_path):
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(8)
    hf = DistilBertModel(DistilBertConfig(
        vocab_size=VOCAB, dim=32, n_layers=2, n_heads=4, hidden_dim=48,
        max_position_embeddings=64, activation="gelu")).eval()
    path = str(tmp_path / "distilbert.gguf")
    CE.convert_hf_distilbert(hf, dummy_vocab(), path, GGMLType.F32)
    got = _tensors(path)
    assert "token_types.weight" not in got  # distilbert has no segments

    from llama_cpp_gfx906_tpu.gguf.reader import GGUFReader
    from llama_cpp_gfx906_tpu.models.bert import forward, load_params
    from llama_cpp_gfx906_tpu.models.config import config_from_gguf

    reader = GGUFReader(path)
    cfg = config_from_gguf(reader)
    params = load_params(reader, cfg)
    ids = [5, 17, 42, 9]
    out = forward(params, cfg, jnp.asarray([ids], jnp.int32),
                  jnp.asarray([len(ids)], jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=2e-3, atol=2e-3)
