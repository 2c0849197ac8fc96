"""Batched engine + server integration tests (reference: server pytest suite,
``tools/server/tests/unit``) against a live aiohttp server on a tiny model."""

import asyncio
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
aiohttp = pytest.importorskip("aiohttp")

import jax.numpy as jnp

from llama_cpp_gfx906_tpu.gguf import GGMLType, GGUFReader
from llama_cpp_gfx906_tpu.models.config import config_from_gguf
from llama_cpp_gfx906_tpu.runtime.batch_engine import BatchedEngine, SamplerConfig
from llama_cpp_gfx906_tpu.runtime.engine import Engine
from llama_cpp_gfx906_tpu.runtime.weights import load_llama_params
from llama_cpp_gfx906_tpu.tokenizers import tokenizer_from_gguf
from llama_cpp_gfx906_tpu.tools.convert_hf import convert_hf_llama

from test_llama_parity import tiny_hf_model, dummy_vocab


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    hf = tiny_hf_model(seed=11)
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(hf, dummy_vocab(), path, quant_type=GGMLType.F32)
    return path


@pytest.fixture(scope="module")
def batched(tiny_gguf):
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    return BatchedEngine(cfg, params, tok, n_slots=3, max_seq=64, dtype=jnp.float32)


def test_batched_matches_single(batched, tiny_gguf):
    """Greedy generation in a shared-batch slot == single-stream engine."""
    eng = Engine.from_gguf(tiny_gguf, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    prompt = [3, 17, 42]
    logits = eng.prefill(prompt)
    ref = []
    for _ in range(6):
        t = int(np.argmax(logits))
        ref.append(t)
        logits = eng.decode_one(t)

    greedy = SamplerConfig(temp=0.0)
    slot = batched.add_request(prompt, 6, greedy)
    while slot.stop_reason is None:
        batched.step()
    assert slot.generated == ref
    batched.release(slot)


def test_concurrent_slots_are_isolated(batched):
    """Three interleaved sequences produce the same tokens as when run alone."""
    greedy = SamplerConfig(temp=0.0)
    prompts = [[5, 6, 7], [30, 31], [9, 10, 11, 12]]

    solo = []
    for p in prompts:
        slot = batched.add_request(p, 5, greedy)
        while slot.stop_reason is None:
            batched.step()
        solo.append(list(slot.generated))
        batched.release(slot)

    slots = [batched.add_request(p, 5, greedy) for p in prompts]
    assert all(s is not None for s in slots)
    while any(s.stop_reason is None for s in slots):
        batched.step()
    for s, expect in zip(slots, solo):
        assert s.generated == expect, f"slot {s.id}"
        batched.release(s)


def test_slot_exhaustion_and_reuse(batched):
    greedy = SamplerConfig(temp=0.0)
    slots = [batched.add_request([4, 5], 3, greedy) for _ in range(3)]
    assert batched.add_request([4, 5], 3, greedy) is None  # saturated
    while any(s.stop_reason is None for s in slots):
        batched.step()
    for s in slots:
        batched.release(s)
    assert batched.add_request([4, 5], 3, greedy) is not None


def test_slot_state_save_restore(batched):
    greedy = SamplerConfig(temp=0.0)
    slot = batched.add_request([7, 8, 9], 8, greedy)
    for _ in range(2):
        batched.step()
    mid_tokens = list(slot.generated)
    state = batched.save_slot_state(slot.id)
    # run to completion
    while slot.stop_reason is None:
        batched.step()
    full = list(slot.generated)
    batched.release(slot)
    # restore mid-state into the same slot and continue
    batched.load_slot_state(slot.id, state)
    s = batched.slots[slot.id]
    s.n_predict = 8
    s.sampler = greedy
    assert s.generated == mid_tokens
    while s.stop_reason is None:
        batched.step()
    assert s.generated == full
    batched.release(s)


# -----------------------------------------------------------------------------
# HTTP server
# -----------------------------------------------------------------------------


@pytest.fixture()
def server_client(tiny_gguf, batched):
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched, model_name="tiny")
    srv.start()
    app = build_app(srv)

    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    srv.stop()
    loop.close()


def test_http_endpoints(server_client):
    client, loop = server_client

    async def run():
        r = await client.get("/health")
        assert (await r.json())["status"] == "ok"

        r = await client.get("/v1/models")
        assert (await r.json())["data"][0]["id"] == "tiny"

        r = await client.get("/props")
        props = await r.json()
        assert props["n_slots"] == 3

        r = await client.post("/tokenize", json={"content": "<t1><t2>", "parse_special": True})
        toks = (await r.json())["tokens"]
        assert toks == [4, 5]

        r = await client.post("/detokenize", json={"tokens": toks})
        assert (await r.json())["content"] == "<t1><t2>"

        r = await client.post(
            "/v1/completions",
            json={"prompt": "<t1><t2>", "max_tokens": 4, "temperature": 0.0},
        )
        body = await r.json()
        assert body["choices"][0]["finish_reason"] in ("length", "stop")
        assert body["usage"]["completion_tokens"] >= 1

        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4,
                "temperature": 0.0,
            },
        )
        body = await r.json()
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"

        r = await client.get("/metrics")
        text = await r.text()
        assert "llamacpp_tpu:requests_total" in text

        r = await client.get("/slots")
        assert len(await r.json()) == 3

    loop.run_until_complete(run())


def test_http_streaming(server_client):
    client, loop = server_client

    async def run():
        r = await client.post(
            "/v1/completions",
            json={"prompt": "<t3>", "max_tokens": 3, "temperature": 0.0, "stream": True},
        )
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = await r.text()
        events = [ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        parsed = [json.loads(e) for e in events[:-1]]
        assert parsed[-1]["choices"][0]["finish_reason"] in ("length", "stop")

    loop.run_until_complete(run())


def test_http_embeddings(server_client):
    client, loop = server_client

    async def run():
        r = await client.post("/v1/embeddings", json={"input": ["<t1><t2>", "<t9>"]})
        body = await r.json()
        assert body["object"] == "list" and len(body["data"]) == 2
        import numpy as np

        v = np.asarray(body["data"][0]["embedding"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4

    loop.run_until_complete(run())


def test_http_rerank(server_client):
    client, loop = server_client

    async def run():
        r = await client.post(
            "/v1/rerank",
            json={"query": "<t1><t2>", "documents": ["<t1><t2>", "<t50><t60>"], "top_n": 2},
        )
        body = await r.json()
        assert len(body["results"]) == 2
        # the identical document must rank first
        assert body["results"][0]["index"] == 0
        assert body["results"][0]["relevance_score"] >= body["results"][1]["relevance_score"]

    loop.run_until_complete(run())


def test_http_infill_no_fim_tokens(server_client):
    """tiny vocab has no FIM specials -> clean 501, not a crash."""
    client, loop = server_client

    async def run():
        r = await client.post("/infill", json={"input_prefix": "a", "input_suffix": "b"})
        assert r.status == 501

    loop.run_until_complete(run())


def test_http_grammar_constrained(server_client):
    client, loop = server_client

    async def run():
        # constrain output to tokens <t1>/<t2> only
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "<t9>",
                "max_tokens": 4,
                "temperature": 0.0,
                "grammar": 'root ::= ("<t1>" | "<t2>")+',
            },
        )
        body = await r.json()
        text = body["choices"][0]["text"]
        import re
        assert re.fullmatch(r"(<t1>|<t2>)+", text), text

    loop.run_until_complete(run())


def test_prefix_cache_reuse(batched, tiny_gguf):
    """A prompt extending a previous one must reuse the slot's KV prefix
    and produce identical greedy output to an uncached run."""
    import llama_cpp_gfx906_tpu.runtime.batch_engine as BE

    eng = Engine.from_gguf(tiny_gguf, max_seq=64, dtype=jnp.float32, keep_quantized=False)
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    be = BE.BatchedEngine(cfg, params, tok, n_slots=2, max_seq=64, dtype=jnp.float32)

    base = [3, 17, 42, 9, 7, 25]
    greedy = BE.SamplerConfig(temp=0.0)
    slot = be.add_request(base, 4, greedy)
    while slot.stop_reason is None:
        be.step()
    first_out = list(slot.generated)
    be.release(slot)
    assert be.metrics["n_prompt_tokens_cached"] == 0

    # extended prompt → prefix reuse fires
    ext = base + first_out[:-1] + [11, 40]
    slot2 = be.add_request(ext, 4, greedy)
    assert be.metrics["n_prompt_tokens_cached"] > 0
    while slot2.stop_reason is None:
        be.step()
    cached_out = list(slot2.generated)
    be.release(slot2)

    # oracle: plain single-stream greedy on the extended prompt
    logits = eng.prefill(ext)
    ref = []
    for _ in range(4):
        t = int(np.argmax(logits))
        ref.append(t)
        logits = eng.decode_one(t)
    assert cached_out == ref


def test_spec_ngram_matches_plain_greedy(tiny_gguf):
    """Ngram-speculative batched decode must be token-identical to the
    plain greedy batched path (reference invariant: speculation never
    changes greedy output)."""
    import llama_cpp_gfx906_tpu.runtime.batch_engine as BE

    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)

    # repetitive prompt so the ngram cache actually fires
    prompt = [3, 7, 9, 3, 7, 9, 3, 7, 9]
    greedy = BE.SamplerConfig(temp=0.0)

    plain = BE.BatchedEngine(cfg, params, tok, n_slots=2, max_seq=64, dtype=jnp.float32)
    s1 = plain.add_request(prompt, 16, greedy)
    while s1.stop_reason is None:
        plain.step()

    spec = BE.BatchedEngine(cfg, params, tok, n_slots=2, max_seq=64,
                            dtype=jnp.float32, spec_ngram=True, n_draft=4)
    s2 = spec.add_request(prompt, 16, greedy)
    steps = 0
    while s2.stop_reason is None:
        spec.step()
        steps += 1
    assert s2.generated == s1.generated
    # with a repetitive generation, speculation should finish in fewer steps
    assert steps <= 16


def test_concurrent_requests_thread_safety(server_client):
    """Many simultaneous requests through the queue + slots (reference:
    tests/test-thread-safety.cpp — parallel decode must not corrupt)."""
    client, loop = server_client

    async def one(i):
        r = await client.post(
            "/v1/completions",
            json={"prompt": f"<t{i + 3}>", "max_tokens": 6, "temperature": 0.0},
        )
        body = await r.json()
        assert body["choices"][0]["finish_reason"] in ("length", "stop")
        return body["choices"][0]["text"]

    async def run():
        import asyncio as aio

        texts = await aio.gather(*[one(i) for i in range(8)])
        assert len(texts) == 8

    loop.run_until_complete(run())

    # determinism under concurrency: same prompt twice -> same output
    async def run2():
        import asyncio as aio

        a, b = await aio.gather(one(1), one(1))
        assert a == b

    loop.run_until_complete(run2())


# -----------------------------------------------------------------------------
# Chunked prefill / context shift / per-slot sampling isolation
# -----------------------------------------------------------------------------


def test_chunked_prefill_interleaves_with_decode(tiny_gguf):
    """A long prompt must not stall decoding slots: while it prefills in
    chunks, the already-generating slot keeps producing tokens every step
    (reference: update_slots prompt chunking, server.cpp:3104-3476)."""
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    be = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=256,
                       dtype=jnp.float32, n_chunk=32)
    greedy = SamplerConfig(temp=0.0)

    s1 = be.add_request([3, 17, 42], 40, greedy)
    # drive s1 into generation
    while s1.state.name != "GENERATING":
        be.step()
    n1_before = len(s1.generated)

    # admit a long prompt: 150 tokens / 32-token chunks → ≥5 prefill steps
    long_prompt = [int(x) for x in np.random.default_rng(0).integers(3, 90, 150)]
    s2 = be.add_request(long_prompt, 4, greedy)
    steps_while_prefilling = 0
    tokens_gained = 0
    while s2.state.name == "PREFILLING":
        got = be.step()
        steps_while_prefilling += 1
        tokens_gained += sum(1 for (s, _, _) in got if s is s1)
        if steps_while_prefilling > 50:
            break
    assert steps_while_prefilling >= 4  # really was chunked
    # decode cadence preserved: s1 earned a token on every step
    assert tokens_gained >= steps_while_prefilling - 1
    assert len(s1.generated) > n1_before


def test_batched_context_shift(tiny_gguf):
    """A slot reaching max_seq shifts its KV left and keeps generating
    instead of stopping with "length" (reference: server.cpp:3049-3090)."""
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    be = BatchedEngine(cfg, params, tok, n_slots=1, max_seq=32,
                       dtype=jnp.float32, ctx_shift=True)
    greedy = SamplerConfig(temp=0.0)
    s = be.add_request([3, 17, 42, 9], 64, greedy)
    while s.stop_reason is None:
        be.step()
    # generated far beyond the window; finished by n_predict, not length
    assert len(s.generated) == 64
    assert s.n_shifted > 0
    assert s.stop_reason == "length"  # n_predict cap
    assert s.n_past < 32


def test_grammar_slot_does_not_degrade_others(tiny_gguf):
    """With per-slot sampling isolation, a grammar-constrained slot leaves
    the other slots' on-device sampling untouched: a greedy slot produces
    the same tokens with or without a grammar neighbor."""
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)

    def run(with_grammar):
        be = BatchedEngine(cfg, params, tok, n_slots=2, max_seq=64, dtype=jnp.float32)
        greedy = SamplerConfig(temp=0.0)
        s1 = be.add_request([3, 17, 42], 8, greedy)
        if with_grammar:
            g = SamplerConfig(temp=0.0, grammar='root ::= "<t1><t2><t3>"')
            be.add_request([5, 6], 6, g)
        while s1.stop_reason is None:
            be.step()
        return list(s1.generated)

    assert run(False) == run(True)


# -----------------------------------------------------------------------------
# Server feature tail: logprobs, n>1, truncation, API keys
# -----------------------------------------------------------------------------


def test_completion_logprobs(server_client):
    client, loop = server_client

    async def run():
        r = await client.post("/v1/completions", json={
            "prompt": [3, 17, 42], "n_predict": 4, "temperature": 0,
            "logprobs": 3,
        })
        body = await r.json()
        lp = body["choices"][0]["logprobs"]
        assert len(lp["token_logprobs"]) == 4
        assert all(len(t) == 3 for t in lp["top_logprobs"])
        assert all(v <= 0 for v in lp["token_logprobs"])

    loop.run_until_complete(run())


def test_chat_logprobs(server_client):
    client, loop = server_client

    async def run():
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "<t1>"}],
            "max_tokens": 3, "temperature": 0,
            "logprobs": True, "top_logprobs": 2,
        })
        body = await r.json()
        content = body["choices"][0]["logprobs"]["content"]
        assert len(content) == 3
        assert all(len(c["top_logprobs"]) == 2 for c in content)

    loop.run_until_complete(run())


def test_completion_n_choices(server_client):
    client, loop = server_client

    async def run():
        r = await client.post("/v1/completions", json={
            "prompt": [3, 17], "n_predict": 3, "temperature": 0, "n": 2,
        })
        body = await r.json()
        assert len(body["choices"]) == 2
        assert body["choices"][0]["index"] == 0 and body["choices"][1]["index"] == 1
        # greedy: both choices identical
        assert body["choices"][0]["text"] == body["choices"][1]["text"]

    loop.run_until_complete(run())


def test_prompt_truncation(tiny_gguf):
    """Over-long prompts truncate in the middle keeping n_keep + tail
    (reference server.cpp prompt truncation)."""
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok2 = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    be = BatchedEngine(cfg, params, tok2, n_slots=1, max_seq=32, dtype=jnp.float32)
    long_prompt = [int(x) for x in np.random.default_rng(0).integers(3, 90, 100)]
    s = be.add_request(long_prompt, 4, SamplerConfig(temp=0.0), n_keep=2)
    assert s.n_truncated > 0
    assert s.prompt_ids[:2] == long_prompt[:2]  # n_keep head preserved
    assert s.prompt_ids[-5:] == long_prompt[-5:]  # newest tail preserved
    while s.stop_reason is None:
        be.step()
    assert len(s.generated) == 4
    # truncate=False raises instead
    be.release(s)
    with pytest.raises(ValueError):
        be.add_request(long_prompt, 4, SamplerConfig(temp=0.0), truncate=False)


def test_api_key_auth(tiny_gguf, batched):
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched, model_name="tiny")
    srv.start()
    app = build_app(srv, api_key="sk-test-123")
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            r = await client.get("/health")   # public
            assert r.status == 200
            r = await client.get("/props")    # blocked
            assert r.status == 401
            r = await client.post("/tokenize", json={"content": "x"})
            assert r.status == 401
            r = await client.get("/props", headers={"Authorization": "Bearer sk-test-123"})
            assert r.status == 200

        loop.run_until_complete(run())
    finally:
        loop.run_until_complete(client.close())
        srv.stop()
        loop.close()


def test_shared_prefix_kv(tiny_gguf):
    """Cross-slot shared-prefix KV: one system prompt stored once, attended
    by every slot — greedy outputs must match the unshared engine on the
    same full prompts, with zero per-request prefill for the shared part
    (reference analog: multi-seq KV cells, llama-kv-cache-unified.cpp:752)."""
    reader = GGUFReader(tiny_gguf)
    cfg = config_from_gguf(reader)
    tok = tokenizer_from_gguf(reader)
    params = load_llama_params(reader, cfg, jnp.float32)
    sys_ids = [3, 17, 42, 9, 7, 25, 33, 11]
    suffixes = [[40, 6], [28, 13, 5], [61]]

    def run(engine, prompts):
        outs = {}
        slots = {}
        for i, prompt in enumerate(prompts):
            slots[i] = engine.add_request(prompt, n_predict=6,
                                          sampler=SamplerConfig(temp=0.0))
            outs[i] = []
        for _ in range(60):
            for s, t, fin in engine.step():
                for i, sl in slots.items():
                    if sl is s:
                        outs[i].append(t)
            if all(sl.stop_reason is not None for sl in slots.values()):
                break
        return outs

    full_prompts = [sys_ids + sfx for sfx in suffixes]
    plain = BatchedEngine(cfg, params, tok, n_slots=3, max_seq=64, dtype=jnp.float32)
    ref = run(plain, full_prompts)

    shared = BatchedEngine(cfg, params, tok, n_slots=3, max_seq=64, dtype=jnp.float32)
    shared.set_system_prompt(sys_ids)
    got = run(shared, full_prompts)
    for i in range(len(suffixes)):
        assert got[i] == ref[i], f"slot {i}: {got[i]} vs {ref[i]}"

    # memory accounting: the shared rows live once (batch dim 1), and the
    # per-request prefill skipped the shared tokens
    assert shared.kv.shared_k.shape[1] == 1
    assert shared.kv.shared_k.shape[2] == len(sys_ids)
    assert shared.metrics["n_prompt_tokens_cached"] >= len(sys_ids) * len(suffixes)
    # per-slot fill covers only the suffixes
    for i, sfx in enumerate(suffixes):
        pass  # slots recycle; the parity check above is the strong assert


def test_unsatisfiable_grammar_errors_and_server_survives(server_client):
    """A grammar no vocab token can satisfy must error THAT request only —
    the engine loop keeps serving (reference: send_error per slot; a dead
    update_slots loop would wedge every later request)."""
    client, loop = server_client

    async def run():
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "<t9>",
                "max_tokens": 4,
                "temperature": 0.0,
                # 'zqx' is not spellable from the <tN> vocab pieces
                "grammar": 'root ::= "zqx"',
            },
        )
        assert r.status != 200
        assert "acceptable" in (await r.text())

        # a truncated lark grammar errors at admission (GrammarParseError,
        # never a loop-killing IndexError)
        r = await client.post(
            "/v1/completions",
            json={"prompt": "<t9>", "max_tokens": 2,
                  "grammar": "%llguidance {}\nstart"},
        )
        assert r.status != 200
        assert "lark" in (await r.text())

        # the loop survived: a normal request still completes
        r = await client.post(
            "/v1/completions",
            json={"prompt": "<t9>", "max_tokens": 3, "temperature": 0.0},
        )
        body = await r.json()
        assert r.status == 200
        assert body["choices"][0]["text"]

        # lark routing over HTTP (%llguidance prefix) still constrains
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "<t9>",
                "max_tokens": 4,
                "temperature": 0.0,
                "grammar": '%llguidance {}\nstart: TOK+\nTOK: "<t1>" | "<t2>"',
            },
        )
        body = await r.json()
        text = body["choices"][0]["text"]
        import re
        assert re.fullmatch(r"(<t1>|<t2>)+", text), body

    loop.run_until_complete(run())


def test_webui_page(tiny_gguf, batched):
    """GET / serves the built-in SPA: conversation sidebar, settings
    dialog with the reference Config.ts sampler surface, SSE chat glue,
    vision attachments, markdown renderer — and its script is
    structurally balanced (no JS engine in CI, so braces/strings are
    checked by a tokenizer-level scan)."""
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched)
    srv.start()
    app = build_app(srv)
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            r = await client.get("/")
            assert r.status == 200
            assert r.content_type == "text/html"
            html = await r.text()
            for frag in ("newchat", "v1/chat/completions", "renderMd",
                         "dry_multiplier", "xtc_probability", "image_url",
                         "localStorage", "AbortController", "tok/s"):
                assert frag in html, frag
            import re
            script = re.search(r"<script>(.*)</script>", html, re.S).group(1)
            depth = {"{": 0, "(": 0, "[": 0}
            pairs = {"}": "{", ")": "(", "]": "["}
            i, n, state, prev = 0, len(script), None, ""
            while i < n:
                c = script[i]
                if state is None:
                    if c in "\"'`":
                        state = c
                    elif c == "/" and script[i + 1 : i + 2] == "/":
                        state = "line"
                    elif c == "/" and script[i + 1 : i + 2] == "*":
                        state = "block"
                    elif c == "/" and prev in "=(,:;!&|?[":
                        state = "re"
                    elif c in depth:
                        depth[c] += 1
                    elif c in pairs:
                        depth[pairs[c]] -= 1
                        assert depth[pairs[c]] >= 0, f"unbalanced {c} at {i}"
                    if not c.isspace():
                        prev = c
                elif state in "\"'`":
                    if c == "\\":
                        i += 1
                    elif c == state:
                        state = None
                elif state == "line":
                    if c == "\n":
                        state = None
                elif state == "block":
                    if c == "*" and script[i + 1 : i + 2] == "/":
                        state = None
                        i += 1
                elif state == "re":
                    if c == "\\":
                        i += 1
                    elif c == "/":
                        state = None
                i += 1
            assert all(v == 0 for v in depth.values()) and state is None

        loop.run_until_complete(run())
    finally:
        loop.run_until_complete(client.close())
        srv.stop()


def test_webui_gate_and_slot_save_path(tiny_gguf, batched, tmp_path):
    """--no-webui removes GET /; --slot-save-path enables on-disk slot
    files with a filename body (reference server slot save endpoint)."""
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched, model_name="aliased-name")
    srv.start()
    app = build_app(srv, webui=False, slot_save_path=str(tmp_path))
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            r = await client.get("/")
            assert r.status == 404  # webui disabled

            r = await client.get("/v1/models")
            assert (await r.json())["data"][0]["id"] == "aliased-name"

            # generate something into slot 0, save to file, restore
            r = await client.post("/v1/completions", json={
                "prompt": "<t5> <t6>", "max_tokens": 2, "temperature": 0.0})
            assert r.status == 200
            r = await client.post("/slots/0?action=save",
                                  json={"filename": "s0.bin"})
            assert (await r.json())["saved"] is True
            import os
            assert any(f.startswith("s0.bin") for f in os.listdir(tmp_path))
            r = await client.post("/slots/0?action=restore",
                                  json={"filename": "s0.bin"})
            assert (await r.json())["restored"] is True
            r = await client.post("/slots/0?action=restore",
                                  json={"filename": "missing.bin"})
            assert r.status == 404
        loop.run_until_complete(run())
    finally:
        loop.run_until_complete(client.close())
        srv.stop()
        loop.close()


def test_reference_endpoint_parity(tiny_gguf, batched):
    """The reference's full route table (server.cpp:4976-5006): ollama
    aliases, /apply-template, /lora-adapters, POST /props, /api-prefix."""
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched, model_name="t")
    srv.lora_names = ["a.gguf", "b.gguf"]
    srv.start()
    app = build_app(srv, api_prefix="/llm")
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            # prefix applies to every route
            assert (await client.get("/health")).status == 404
            assert (await (await client.get("/llm/health")).json())["status"] == "ok"

            r = await client.get("/llm/api/tags")
            assert (await r.json())["models"][0]["name"] == "t"
            r = await client.post("/llm/api/show", json={"model": "t"})
            assert "general.architecture" in (await r.json())["model_info"]

            r = await client.post("/llm/apply-template", json={
                "messages": [{"role": "user", "content": "hi"}]})
            prompt = (await r.json())["prompt"]
            assert "hi" in prompt and len(prompt) > len("hi")

            r = await client.get("/llm/lora-adapters")
            lst = await r.json()
            assert [a["path"] for a in lst] == ["a.gguf", "b.gguf"]
            assert all(a["scale"] == 0.0 for a in lst)
            r = await client.post("/llm/lora-adapters",
                                  json=[{"id": 1, "scale": 0.5}])
            assert (await r.json())["success"] is True
            lst = await (await client.get("/llm/lora-adapters")).json()
            assert lst[1]["scale"] == 0.5
            r = await client.post("/llm/lora-adapters",
                                  json=[{"id": 7, "scale": 1.0}])
            assert r.status == 400
            # clear the default mix (no adapters are actually attached to
            # this engine, so a live default would 400 later requests)
            await client.post("/llm/lora-adapters", json=[])

            # POST /props sets generation defaults for later requests
            r = await client.post("/llm/props", json={"max_tokens": 2})
            assert (await r.json())["success"] is True
            r = await client.post("/llm/v1/completions",
                                  json={"prompt": "<t5>", "temperature": 0.0})
            body = await r.json()
            assert body["usage"]["completion_tokens"] <= 2

            # non-v1 chat alias + ollama chat alias
            for path in ("/llm/chat/completions", "/llm/api/chat"):
                r = await client.post(path, json={
                    "messages": [{"role": "user", "content": "x"}],
                    "max_tokens": 2, "temperature": 0.0})
                assert r.status == 200, path
        loop.run_until_complete(run())
    finally:
        srv.default_lora = None
        srv.props_defaults.clear()
        loop.run_until_complete(client.close())
        srv.stop()
        loop.close()


def test_api_key_file_no_slots_props_gate(tiny_gguf, batched):
    """round-3 server flags: --api-key-file multi-key auth, --no-slots
    removes the endpoint, POST /props is gated by --props (arg.cpp)."""
    from aiohttp.test_utils import TestClient, TestServer

    from llama_cpp_gfx906_tpu.server.app import InferenceServer, build_app

    srv = InferenceServer(batched, model_name="tiny")
    srv.start()
    app = build_app(srv, api_keys={"key-a", "key-b"}, enable_slots=False,
                    enable_props_change=False)
    loop = asyncio.new_event_loop()
    client = TestClient(TestServer(app, loop=loop), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            r = await client.get("/health")
            assert r.status == 200
            r = await client.get("/props")
            assert r.status == 401
            for key in ("key-a", "key-b"):
                r = await client.get(
                    "/props", headers={"Authorization": f"Bearer {key}"})
                assert r.status == 200
            r = await client.get(
                "/props", headers={"Authorization": "Bearer nope"})
            assert r.status == 401
            # --no-slots: endpoint not registered
            r = await client.get(
                "/slots", headers={"Authorization": "Bearer key-a"})
            assert r.status == 404
            # props changes forbidden without --props
            r = await client.post(
                "/props", json={"max_tokens": 1},
                headers={"Authorization": "Bearer key-a"})
            assert r.status in (404, 405)

        loop.run_until_complete(run())
    finally:
        loop.run_until_complete(client.close())
        srv.stop()
        loop.close()
