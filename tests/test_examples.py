"""Smoke-run the examples against a tiny model (reference strategy: the
examples double as integration tests in ci/run.sh)."""

import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

from llama_cpp_gfx906_tpu.gguf import GGMLType
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

VOCAB = 96


def dummy_vocab():
    tokens = ["<s>", "</s>", "<unk>"] + [f"<t{i}>" for i in range(VOCAB - 3)]
    return {
        "model": "llama",
        "tokens": tokens,
        "scores": [0.0] * VOCAB,
        "token_types": [3, 3, 2] + [4] * (VOCAB - 3),
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
    path = str(tmp_path_factory.mktemp("ex") / "tiny-f32.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


def _run(script, *args, timeout=300):
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, f"examples/{script}", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, (script, r.stdout[-1000:], r.stderr[-1500:])
    return r.stdout


@pytest.mark.parametrize(
    "script,extra",
    [
        ("simple.py", ["-p", "<t1><t2>", "-n", "8"]),
        ("batched.py", ["-p", "<t1><t2>", "-np", "2", "-n", "6"]),
        ("parallel.py", ["-ns", "3", "-np", "2", "-n", "4"]),
        ("save_load_state.py", ["-p", "<t1><t2>"]),
        ("embedding.py", ["-p", "<t1>", "-p", "<t2>"]),
        ("lookup.py", ["-p", "<t1><t2><t1><t2>", "-n", "8"]),
    ],
)
def test_example_runs(model_path, script, extra):
    out = _run(script, "-m", model_path, *extra)
    assert out.strip()


def test_finetune_example(model_path, tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("<t1><t2><t3> " * 200)
    out = _run("finetune.py", "-m", model_path, "-f", str(corpus), "--ctx", "16", "--epochs", "1")
    assert "mean loss" in out


def test_retrieval_example(model_path, tmp_path):
    corpus = tmp_path / "docs.txt"
    corpus.write_text("<t1> alpha text. <t2> beta text. <t3> gamma text. " * 5)
    out = _run("retrieval.py", "-m", model_path, "-f", str(corpus), "-q", "<t2>")
    assert "[" in out


def test_lookahead_example(model_path):
    out = _run("lookahead.py", "-m", model_path, "-p", "<t1><t2><t1><t2>", "-n", "12", "-W", "4")
    assert "accept-rate" in out


def test_gritlm_example(model_path):
    out = _run("gritlm.py", "-m", model_path, "-q", "<t1>", "-d", "<t1> <t2>", "-d", "<t3>")
    assert "[embed] ranking" in out and "[generate]" in out


def test_gen_docs_example():
    out = _run("gen_docs.py", "cli")
    assert "## cli flags" in out and "--ctx-size" in out


def test_regex_to_grammar_example():
    out = _run("regex_to_grammar.py", r"\d{2}")
    assert "root ::=" in out


def test_json_schema_pydantic_example():
    out = _run("json_schema_pydantic.py")
    assert "root ::=" in out and "question" in out


def test_chat_persistent_example(model_path, tmp_path):
    import os

    cache = str(tmp_path / "chat.cache")
    os.environ["N_PREDICT"] = "6"
    os.environ["CTX"] = "64"
    try:
        out1 = _run("chat_persistent.py", model_path, cache, "<t1><t2>",
                    timeout=600)
        assert "saved" in out1
        out2 = _run("chat_persistent.py", model_path, cache, "<t3>",
                    timeout=600)
        assert "resumed" in out2 and "saved" in out2
    finally:
        del os.environ["N_PREDICT"]
        del os.environ["CTX"]


def test_jeopardy_example(model_path, tmp_path):
    out_file = str(tmp_path / "results.txt")
    out = _run("jeopardy.py", "-m", model_path, "-o", out_file, "-n", "8")
    assert "Running" in out and "answered 3 questions" in out
    with open(out_file) as f:
        assert f.read().count("------") == 3


def test_reason_act_example(model_path):
    out = _run("reason_act.py", "-m", model_path, "-n", "8",
               "--max-rounds", "1")
    assert out is not None  # tiny model emits noise; loop must just terminate


def test_reason_act_calculate():
    sys.path.insert(0, "examples")
    from reason_act import calculate

    assert calculate("4 * 7 / 3").startswith("9.333333333")
    assert calculate("12 * 9 - 8") == "100"
    assert calculate("__import__('os')").startswith("error:")


def test_llama2c_converter_cli(model_path, tmp_path):
    """convert-llama2c-to-ggml analog end-to-end through the CLI module."""
    import struct

    import numpy as np

    # reuse the tiny HF model to synthesize a llama2.c checkpoint
    sys.path.insert(0, "tests")
    from test_llama2c import write_llama2c_bin, write_llama2c_tokenizer
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(31)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )).eval()
    bin_path = str(tmp_path / "tiny.bin")
    tok_path = str(tmp_path / "tokenizer.bin")
    out_path = str(tmp_path / "out.gguf")
    write_llama2c_bin(hf, bin_path)
    write_llama2c_tokenizer(tok_path, dummy_vocab())
    import os
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "llama_cpp_gfx906_tpu.tools.convert_llama2c",
         "--llama2c-model", bin_path, "--llama2c-tokenizer", tok_path,
         "--llama2c-output-model", out_path],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-1500:]
    assert os.path.exists(out_path)


def test_gguf_format_example(tmp_path):
    out = _run("gguf.py", str(tmp_path / "demo.gguf"))
    assert "all verified" in out


def test_vim_plugins_parse():
    # the vim plugins must target endpoints the server actually exposes
    import re

    app_src = open("llama_cpp_gfx906_tpu/server/app.py").read()
    for vim_file in ("examples/llm.vim", "examples/llama.vim"):
        src = open(vim_file).read()
        for url in re.findall(r"http://127\.0\.0\.1:8080(/[a-z_]+)", src):
            assert f'"{url}"' in app_src, (vim_file, url)
