"""Tool CLIs: quantize, gguf-split, gguf-dump, perplexity, llama-bench."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFModelReader, GGUFReader
from llama_cpp_gfx906_tpu.tools import gguf_dump, gguf_split, quantize as quantize_tool
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import tiny_hf_model, dummy_vocab


@pytest.fixture(scope="module")
def f16_gguf(tmp_path_factory):
    hf = tiny_hf_model(seed=5)
    path = str(tmp_path_factory.mktemp("m") / "tiny-f16.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F16)
    return path


def test_quantize_q8(f16_gguf, tmp_path):
    out = str(tmp_path / "tiny-q8.gguf")
    stats = quantize_tool.quantize_file(f16_gguf, out, "Q8_0")
    assert stats["out_bytes"] < stats["in_bytes"]
    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    # metadata survived
    assert len(r.get("tokenizer.ggml.tokens")) == 96
    # quantized model still loads and runs
    from llama_cpp_gfx906_tpu.runtime.engine import Engine

    eng = Engine.from_gguf(out, max_seq=32, dtype=jnp.float32)
    logits = eng.prefill([3, 4, 5])
    assert np.isfinite(logits).all()


def test_quantize_mix_rules(f16_gguf, tmp_path):
    out = str(tmp_path / "tiny-q4km.gguf")
    quantize_tool.quantize_file(f16_gguf, out, "Q4_K_M")
    r = GGUFReader(out)
    # head bumped to Q6_K; embd at base Q4_K — but 64-wide rows can't take
    # 256-block K-quants, so they fall back to F16
    embd = r.tensors["token_embd.weight"]
    assert embd.ggml_type in (GGMLType.Q4_K, GGMLType.F16)
    assert r.tensors["output.weight"].ggml_type in (GGMLType.Q6_K, GGMLType.F16)


def test_split_and_merge(f16_gguf, tmp_path):
    prefix = str(tmp_path / "shard.gguf")
    paths = gguf_split.split(f16_gguf, prefix, max_tensors=10)
    assert len(paths) > 1
    model = GGUFModelReader(paths[0])
    orig = GGUFReader(f16_gguf)
    assert set(model.tensors) == set(orig.tensors)
    merged = gguf_split.merge(paths[0], str(tmp_path / "merged.gguf"))
    m = GGUFReader(merged)
    assert set(m.tensors) == set(orig.tensors)
    np.testing.assert_array_equal(
        m.tensors["blk.0.attn_q.weight"].to_f32(),
        orig.tensors["blk.0.attn_q.weight"].to_f32(),
    )


def test_gguf_dump(f16_gguf):
    text = gguf_dump.dump(f16_gguf)
    assert "arch=llama" in text and "token_embd.weight" in text
    data = json.loads(gguf_dump.dump(f16_gguf, as_json=True))
    assert data["architecture"] == "llama"
    assert data["n_tensors"] == len(GGUFReader(f16_gguf).tensors)


def test_perplexity_runs(f16_gguf):
    from llama_cpp_gfx906_tpu.tools.perplexity import evaluate

    text = "<t1><t2><t3><t4>" * 40
    result = evaluate(f16_gguf, text, n_ctx=32, n_chunks=2, keep_quantized=False, dtype=jnp.float32)
    assert result["ppl"] > 0 and np.isfinite(result["ppl"])
    assert result["n_chunks"] == 2


def test_perplexity_kl_divergence(f16_gguf, tmp_path):
    from llama_cpp_gfx906_tpu.tools.perplexity import evaluate

    text = "<t1><t2><t3><t4>" * 40
    base = str(tmp_path / "base.npz")
    evaluate(f16_gguf, text, n_ctx=32, n_chunks=1, keep_quantized=False, save_logits_path=base, dtype=jnp.float32)
    result = evaluate(f16_gguf, text, n_ctx=32, n_chunks=1, keep_quantized=False, kl_base_path=base, dtype=jnp.float32)
    # same model vs itself → KL ≈ 0 (f16 logit dump quantization only)
    assert abs(result["kl_divergence_mean"]) < 1e-3


def test_bench_tool(f16_gguf):
    from llama_cpp_gfx906_tpu.tools.bench import format_rows, run_bench

    rows = run_bench(f16_gguf, [8], [4], reps=2, keep_quantized=False)
    assert len(rows) == 2
    assert all(r["t/s"] > 0 for r in rows)
    md = format_rows(rows, "md")
    assert "pp8" in md and "tg4" in md
    json.loads(format_rows(rows, "json"))


def test_tokenize_cli(f16_gguf, capsys):
    from llama_cpp_gfx906_tpu.tools import tokenize as tokenize_tool

    rc = tokenize_tool.main(["-m", f16_gguf, "-p", "<t1><t2>", "--ids"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert json.loads(out) == [0, 4, 5]  # bos + user-defined markers


def test_batched_bench(f16_gguf, capsys):
    from llama_cpp_gfx906_tpu.tools import batched_bench

    rc = batched_bench.main(["-m", f16_gguf, "-npp", "8", "-ntg", "4", "-npl", "1,2", "--json"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 2
    assert all(r["s_tg"] > 0 for r in rows)


def test_gguf_new_metadata(f16_gguf, tmp_path, capsys):
    from llama_cpp_gfx906_tpu.tools.gguf_new_metadata import rewrite_metadata
    from llama_cpp_gfx906_tpu.gguf import GGUFReader as GR

    out = str(tmp_path / "edited.gguf")
    rewrite_metadata(f16_gguf, out, set_kv={"general.name": "renamed"},
                     chat_template="{{ messages }}")
    r = GR(out)
    assert r.get("general.name") == "renamed"
    assert r.get("tokenizer.chat_template") == "{{ messages }}"
    # tensor data untouched
    from llama_cpp_gfx906_tpu.tools.gguf_hash import hash_tensors

    h_in = hash_tensors(f16_gguf)
    h_out = hash_tensors(out)
    assert h_in["__overall__"] == h_out["__overall__"]


def test_gguf_hash_detects_difference(f16_gguf, tmp_path):
    from llama_cpp_gfx906_tpu.tools.gguf_hash import hash_tensors
    from llama_cpp_gfx906_tpu.tools.quantize import quantize_file

    out = str(tmp_path / "q8.gguf")
    quantize_file(f16_gguf, out, "Q8_0")
    assert hash_tensors(f16_gguf)["__overall__"] != hash_tensors(out)["__overall__"]


def test_server_webui_served():
    from llama_cpp_gfx906_tpu.server.webui import WEBUI_HTML

    # relative endpoint path so the SPA honours --api-prefix
    assert "v1/chat/completions" in WEBUI_HTML


def test_eval_callback_trace(f16_gguf, capsys):
    """eval-callback analog: per-node stats for every layer intermediate."""
    import jax.numpy as jnp

    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    from llama_cpp_gfx906_tpu.tools.eval_callback import trace_forward

    eng = Engine.from_gguf(f16_gguf, max_seq=32, dtype=jnp.float32, keep_quantized=False)
    lines = []
    rec = trace_forward(eng, [3, 7, 11], out=lambda s: lines.append(s))
    text = "\n".join(lines)
    for il in range(eng.cfg.n_layers):
        assert f"blk.{il}.Qcur" in text and f"blk.{il}.attn_out" in text
    assert "result_output" in text
    assert rec["logits"].shape == (1, 3, eng.cfg.n_vocab)


def test_flag_registry_env_mirrors(monkeypatch):
    """The declarative flag registry honors LLAMA_ARG_* env mirrors and
    scopes flags per tool (common/arg.cpp analog)."""
    from llama_cpp_gfx906_tpu.common.args import build_parser, flags_for

    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "777")
    monkeypatch.setenv("LLAMA_ARG_MODEL", "/tmp/m.gguf")
    ap = build_parser("server")
    args = ap.parse_args([])
    assert args.ctx_size == 777 and args.model == "/tmp/m.gguf"
    # CLI flag overrides the env mirror
    args = ap.parse_args(["-c", "123"])
    assert args.ctx_size == 123
    # scoping: server-only flags don't leak into the cli scope
    cli_dests = {f.dest for f in flags_for("cli")}
    srv_dests = {f.dest for f in flags_for("server")}
    assert "port" in srv_dests and "port" not in cli_dests
    assert "prompt" in cli_dests and "prompt" not in srv_dests


def test_flag_registry_completion(capsys):
    from llama_cpp_gfx906_tpu.common.args import build_parser, maybe_print_completion

    ap = build_parser("cli", require_model=False)
    args = ap.parse_args(["--completion-bash"])
    assert maybe_print_completion(args, "cli", "llama-cli")
    out = capsys.readouterr().out
    assert "complete -F" in out and "--model" in out


def test_run_tool_oneshot_and_repl(f16_gguf, tmp_path, capsys, monkeypatch):
    from llama_cpp_gfx906_tpu.tools import run as run_tool

    # one-shot prompt with streamed output
    rc = run_tool.main([f16_gguf, "hello", "--temp", "0", "-c", "64",
                        "--n-predict", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip()

    # REPL: commands + multiline continuation + save/load round trip
    save = str(tmp_path / "conv.json")
    lines = iter(["/help", "hi \\", "there", f"/save {save}", "/clear",
                  f"/load {save}", "/regen", "/bye"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = run_tool.main([f16_gguf, "--temp", "0", "-c", "64", "--n-predict", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "commands:" in out and "(saved)" in out and "(loaded" in out
    conv = json.load(open(save))
    assert conv[0]["role"] == "user" and conv[0]["content"] == "hi \nthere"


def test_run_tool_rejects_network_protocols():
    from llama_cpp_gfx906_tpu.tools import run as run_tool

    with pytest.raises(SystemExit):
        run_tool._resolve_model("hf://org/model")
    assert run_tool._resolve_model("file:///x/y.gguf") == "/x/y.gguf"


def test_gguf_editor(f16_gguf, tmp_path):
    from llama_cpp_gfx906_tpu.tools.gguf_editor import EditorState, run_command

    st = EditorState(f16_gguf)
    assert "general.architecture" not in run_command(st, "del nothing")
    assert "token_embd.weight" in run_command(st, "tensors embd")
    run_command(st, 'set general.name "edited-model"')
    run_command(st, "set demo.custom 7")
    run_command(st, "rename output.weight output2.weight")
    out = str(tmp_path / "edited.gguf")
    msg = run_command(st, f"save {out}")
    assert "wrote" in msg

    r = GGUFReader(out)
    assert r.get("general.name") == "edited-model"
    assert r.get("demo.custom") == 7
    assert "output2.weight" in r.tensors and "output.weight" not in r.tensors
    orig = GGUFReader(f16_gguf)
    np.testing.assert_array_equal(
        r.tensors["blk.0.attn_q.weight"].to_f32(),
        orig.tensors["blk.0.attn_q.weight"].to_f32())


def test_convert_llama_ggml(f16_gguf, tmp_path):
    """Legacy GGJTv3 → GGUF migration: synthesize a GGJT file from a tiny
    llama GGUF's tensors under legacy names, convert, and check logits
    match the original engine (convert_llama_ggml_to_gguf analog)."""
    import struct

    from llama_cpp_gfx906_tpu.tools import convert_llama_ggml as cg
    from llama_cpp_gfx906_tpu.runtime.engine import Engine
    import jax.numpy as _jnp

    r = GGUFReader(f16_gguf)
    D = r.get("llama.embedding_length")
    H = r.get("llama.attention.head_count")
    L = r.get("llama.block_count")
    V = r.get("llama.vocab_size")
    inv = {v: k for k, v in cg._FIXED.items()}

    def legacy_name(gguf_name):
        if gguf_name in inv:
            return inv[gguf_name]
        assert gguf_name.startswith("blk.")
        _, i, rest = gguf_name.split(".", 2)
        linv = {v: k for k, v in cg._LAYER.items()}
        return f"layers.{i}.{linv[rest]}"

    buf = bytearray()
    buf += b"tjgg" + struct.pack("<I", 3)
    buf += struct.pack("<7I", V, D, 256, H, L, D // H, 1)
    tokens = r.get("tokenizer.ggml.tokens")
    for t in tokens:
        bt = t.encode("utf-8")
        buf += struct.pack("<I", len(bt)) + bt + struct.pack("<f", 0.0)
    for name, t in r.tensors.items():
        if name.startswith("rope_"):  # not part of the legacy format
            continue
        ln = legacy_name(name).encode("utf-8")
        buf += struct.pack("<3I", len(t.ne), len(ln), int(t.ggml_type))
        buf += struct.pack(f"<{len(t.ne)}I", *t.ne)
        buf += ln
        while len(buf) % 32:
            buf += b"\0"
        buf += bytes(np.asarray(t.data))
    legacy = tmp_path / "legacy.bin"
    legacy.write_bytes(bytes(buf))

    out = str(tmp_path / "migrated.gguf")
    # legacy GGML has no kv-head field: GQA rides the --gqa flag
    gqa = H // r.get("llama.attention.head_count_kv")
    cg.convert(str(legacy), out, context_length=128, gqa=gqa)

    eng_a = Engine.from_gguf(f16_gguf, max_seq=32, dtype=_jnp.float32)
    eng_b = Engine.from_gguf(out, max_seq=32, dtype=_jnp.float32)
    la = eng_a.prefill([3, 14, 25])
    eng_b.reset()
    lb = eng_b.prefill([3, 14, 25])
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5)

    # refuse a GGJTv2 file holding a Q8_0 tensor (reference guard: Q4/Q8
    # block layouts changed between GGJTv2 and v3)
    buf2 = bytearray()
    buf2 += b"tjgg" + struct.pack("<I", 2)
    buf2 += struct.pack("<7I", 4, 32, 256, 4, 1, 8, 7)
    for _ in range(4):
        buf2 += struct.pack("<I", 1) + b"a" + struct.pack("<f", 0.0)
    name = b"tok_embeddings.weight"
    buf2 += struct.pack("<3I", 2, len(name), int(GGMLType.Q8_0))
    buf2 += struct.pack("<2I", 32, 4) + name
    while len(buf2) % 32:
        buf2 += b"\0"
    buf2 += b"\0" * (4 * 34)  # 4 Q8_0 blocks
    legacy2 = tmp_path / "legacy-v2.bin"
    legacy2.write_bytes(bytes(buf2))
    with pytest.raises(ValueError, match="GGJT"):
        cg.convert(str(legacy2), str(tmp_path / "nope.gguf"))


def test_server_bench_script(f16_gguf):
    """scripts/server_bench.py (reference scripts/server-bench.py analog):
    spawns a server, fires concurrent streamed requests, reports
    TTFT/throughput JSON."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    r = subprocess.run(
        [sys.executable, "scripts/server_bench.py", "-m", f16_gguf,
         "--spawn", "--platform", "cpu", "--port", str(port),
         "--n-prompts", "4", "--n-predict", "4", "--parallel", "2",
         "--prompt-length-min", "3", "--prompt-length-max", "6"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.splitlines()[-1])
    assert out["n_prompts"] == 4
    assert out["gen_tokens"] > 0 and out["gen_tok_s"] > 0
    assert out["ttft_p95_ms"] >= out["ttft_p50_ms"] >= 0


def test_compare_bench_script(tmp_path):
    """scripts/compare_bench.py (compare-llama-bench.py analog)."""
    import subprocess
    import sys

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    row = {"model": "m", "arch": "llama", "test": "tg64", "batch": 1,
           "kv": "bf16", "weights": "quant", "t/s": 100.0, "stdev": 1.0}
    a.write_text(json.dumps(row) + "\n")
    row2 = dict(row, **{"t/s": 120.0})
    b.write_text(json.dumps(row2) + "\n")
    r = subprocess.run(
        [sys.executable, "scripts/compare_bench.py", str(a), str(b),
         "-o", "json"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out[0]["speedup"] == 1.2


def test_cli_interactive_mode(f16_gguf, capsys, monkeypatch):
    """tools/main interactive loop: generate, hand control back, feed user
    input with --in-prefix/--in-suffix, generate again (main.cpp REPL)."""
    from llama_cpp_gfx906_tpu.tools import cli

    lines = iter(["more please"])

    def fake_input(*_):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    rc = cli.main([
        "-m", f16_gguf, "-i", "-p", "hello", "-n", "3", "--temp", "0",
        "--in-prefix", "[", "--in-suffix", "]",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # prompt echoed, then the in-prefix/suffix pair around the user turn
    assert out.startswith("hello")
    assert "[" in out and "]" in out


def test_cli_conversation_single_turn(f16_gguf, capsys, monkeypatch):
    """-cnv -st: one templated user turn through the chat template, then
    exit (main.cpp conversation mode + single_turn)."""
    from llama_cpp_gfx906_tpu.tools import cli

    lines = iter(["hi there"])

    def fake_input(*_):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    rc = cli.main([
        "-m", f16_gguf, "-st", "--chat-template", "chatml",
        "-p", "You are terse.", "-n", "3", "--temp", "0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.strip()  # generated something


def test_cli_multiline_input_toggle(monkeypatch):
    """A trailing backslash toggles multiline mode (console.cpp analog)."""
    from llama_cpp_gfx906_tpu.tools.cli import _read_user_input

    lines = iter(["first \\", "second", "third \\", "plain"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    # "\" toggles multiline ON: Enter now inserts newlines until the
    # closing "\" toggles it back OFF and submits
    assert _read_user_input(False) == "first \nsecond\nthird "
    assert _read_user_input(False) == "plain"
