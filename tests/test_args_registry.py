"""Unified flag registry breadth + wiring (reference common/arg.cpp:
~300 flags, LLAMA_ARG_* env mirrors, per-tool scoping)."""

import json
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.common.args import REGISTRY, build_parser, flags_for
from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.tools.cli import parse_kv_overrides, parse_logit_bias
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [1] * (VOCAB - 3),
        "bos": 0,
        "eos": 1,
    }


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
        )
    ).eval()
    path = str(tmp_path_factory.mktemp("m") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def test_registry_breadth_and_env_mirrors(monkeypatch):
    assert len(REGISTRY) >= 100
    # every env mirror is a LLAMA_* name and unique
    envs = [f.env for f in REGISTRY if f.env]
    assert all(e.startswith("LLAMA_") or e == "HF_TOKEN"
               for e in envs)  # HF_TOKEN is the reference's own name
    assert len(envs) == len(set(envs))
    # env mirror provides the default (arg.cpp set_env contract)
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "777")
    ap = build_parser("cli", require_model=False)
    assert ap.parse_args([]).ctx_size == 777


def test_scoping():
    cli = {f.dest for f in flags_for("cli")}
    srv = {f.dest for f in flags_for("server")}
    emb = {f.dest for f in flags_for("embedding")}
    ppl = {f.dest for f in flags_for("perplexity")}
    assert "grp_attn_n" in cli and "grp_attn_n" not in srv
    assert "alias" in srv and "alias" not in cli
    assert "pooling" in emb and "embd_output_format" in emb
    assert "hellaswag" in ppl and "hellaswag" not in cli
    # sampling flags reach both generation tools
    for d in ("xtc_probability", "dry_multiplier", "mirostat_tau",
              "top_n_sigma", "logit_bias", "ignore_eos"):
        assert d in cli and d in srv, d


def test_parse_helpers():
    assert parse_logit_bias(["15+1.5", "7-2"]) == {15: 1.5, 7: -2.0}
    assert parse_logit_bias(["3-inf"])[3] == float("-inf")
    with pytest.raises(SystemExit):
        parse_logit_bias(["nope"])
    ov = parse_kv_overrides(
        ["llama.rope.freq_base=float:1e6", "llama.expert_count=int:4",
         "tokenizer.ggml.add_bos_token=bool:false", "general.name=str:x"])
    assert ov["llama.rope.freq_base"] == 1e6
    assert ov["llama.expert_count"] == 4
    assert ov["tokenizer.ggml.add_bos_token"] is False
    with pytest.raises(SystemExit):
        parse_kv_overrides(["k=weird:1"])


def _run_cli(model_path, *extra, timeout=600):
    cmd = [sys.executable, "-m", "llama_cpp_gfx906_tpu.tools.cli",
           "-m", model_path, "--platform", "cpu", "-c", "128",
           "--no-display-prompt", *extra]
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, cwd="/root/repo")


def test_cli_override_kv_accepted(model_path):
    ov = _run_cli(model_path, "-p", "<t5> <t6>", "-n", "4", "--temp", "0",
                  "--override-kv", "llama.rope.freq_base=float:250.0")
    assert ov.returncode == 0, ov.stderr[-800:]
    bad = _run_cli(model_path, "-p", "x", "-n", "1",
                   "--override-kv", "k=weird:1")
    assert bad.returncode != 0


def test_engine_kv_and_cfg_overrides_change_model(model_path):
    """Overridden metadata must actually flow into the computation
    (llama_model_kv_override + cparams rope override contract)."""
    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    base = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32)
    ov = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32,
                          kv_overrides={"llama.rope.freq_base": 250.0})
    assert base.cfg.rope_base == 10000.0 and ov.cfg.rope_base == 250.0
    prompt = list(range(3, 11))
    la = base.prefill(prompt)
    lb = ov.prefill(prompt)
    assert not np.allclose(la, lb)  # rope base reaches the math
    cfg_ov = Engine.from_gguf(model_path, max_seq=64, dtype=jnp.float32,
                              cfg_overrides={"rope_base": 250.0})
    np.testing.assert_allclose(cfg_ov.prefill(prompt), lb, atol=1e-5)


def test_cli_reverse_prompt_stops(model_path):
    r = _run_cli(model_path, "-p", "<t5>", "-n", "12", "--temp", "0")
    assert r.returncode == 0, r.stderr[-800:]
    full = r.stdout
    # find a token that appears mid-output and use it as the stop string
    import re

    toks = re.findall(r"<t\d+>", full)
    assert len(toks) >= 3
    stop = toks[1]
    r2 = _run_cli(model_path, "-p", "<t5>", "-n", "12", "--temp", "0",
                  "-r", stop)
    assert r2.returncode == 0, r2.stderr[-800:]
    assert stop not in r2.stdout  # matched stop never prints
    assert len(r2.stdout) < len(full)


def test_cli_self_extend_runs(model_path):
    r = _run_cli(model_path, "-p", "<t5> <t6> <t7> <t8>", "-n", "6",
                 "--temp", "0", "-gan", "2", "-gaw", "8")
    assert r.returncode == 0, r.stderr[-800:]
    assert "<t" in r.stdout


def test_embedding_tool_json(model_path):
    cmd = [sys.executable, "-m", "llama_cpp_gfx906_tpu.tools.embedding",
           "-m", model_path, "--platform", "cpu", "-c", "64",
           "-p", "<t5> <t6>\n<t7>", "--embd-output-format", "json+",
           "--pooling", "mean"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout)
    assert len(out["data"]) == 2
    v = np.asarray(out["data"][0]["embedding"])
    assert v.shape == (64,)
    assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-4)  # L2 default
    sim = np.asarray(out["cosineSimilarity"])
    assert sim.shape == (2, 2) and np.isclose(sim[0, 0], 1.0, atol=1e-5)


def test_registry_reference_flag_coverage():
    """The registry carries the reference's arg.cpp surface: ~300 flags
    with scoped parsers for every tool family."""
    names = set()
    for fl in REGISTRY:
        names.update(fl.names)
    # spot-check flags from each arg.cpp section added in round 3
    for must in ("--hellaswag-tasks", "--kl-divergence", "--ppl-stride",
                 "--positive-file", "--pca-iter", "--tts-speaker-file",
                 "--diffusion-steps", "--lookup-cache-static", "--junk",
                 "--learning-rate", "--cpu-mask", "--numa", "--api-key-file",
                 "--ssl-cert-file", "--no-slots", "--reasoning-format",
                 "--control-vector-scaled", "--print-token-count",
                 "--draft-p-split", "--version"):
        assert must in names, must
    assert len(REGISTRY) >= 250
    # every new tool scope builds a conflict-free parser
    for sc in ("imatrix", "cvector", "tts", "finetune", "retrieval",
               "passkey", "lookup", "diffusion"):
        build_parser(sc, require_model=False)


def test_version_flag(capsys):
    """--version exits before the required -m check (argparse version
    action, matching the reference's early handler)."""
    ap = build_parser("cli")  # require_model=True — version must still work
    with pytest.raises(SystemExit) as e:
        ap.parse_args(["--version"])
    assert e.value.code == 0
    assert "0.1.0" in capsys.readouterr().out


def test_control_vector_scaled_parses():
    ap = build_parser("cli", require_model=False)
    a = ap.parse_args(["--control-vector-scaled", "dir.gguf", "0.75",
                       "--control-vector-layer-range", "4", "12"])
    assert a.control_vector_scaled == [["dir.gguf", "0.75"]]
    assert a.control_vector_layer_range == [4, 12]


def test_perplexity_stride_and_binary(model_path, tmp_path):
    """--ppl-stride overlapping windows + --binary-file token input."""
    from llama_cpp_gfx906_tpu.tools.perplexity import evaluate

    rng = np.random.default_rng(0)
    ids = rng.integers(3, VOCAB, 300).astype("<i4")
    r1 = evaluate(model_path, "", n_ctx=64, token_ids=ids.tolist(),
                  keep_quantized=False)
    r2 = evaluate(model_path, "", n_ctx=64, token_ids=ids.tolist(),
                  stride=32, keep_quantized=False)
    assert r1["ppl"] > 0 and r2["ppl"] > 0
    # stride mode scores more windows over the same ids
    assert r2["n_chunks"] > r1["n_chunks"]
    # --from-chunk drops evaluation windows
    r3 = evaluate(model_path, "", n_ctx=64, token_ids=ids.tolist(),
                  from_chunk=1, keep_quantized=False)
    assert r3["n_chunks"] == r1["n_chunks"] - 1

    bin_path = tmp_path / "toks.bin"
    ids.tofile(bin_path)
    rc = subprocess.run(
        [sys.executable, "-m", "llama_cpp_gfx906_tpu.tools.perplexity",
         "-m", model_path, "-f", str(bin_path), "--binary-file",
         "-c", "64", "--chunks", "2"],
        capture_output=True, text=True, timeout=600)
    assert rc.returncode == 0, rc.stderr
    out = json.loads(rc.stdout.strip().splitlines()[-1])
    assert out["n_chunks"] == 2
