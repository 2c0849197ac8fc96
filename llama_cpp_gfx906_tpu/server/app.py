"""OpenAI-compatible HTTP server with continuous batching.

The TPU-native llama-server (reference: ``tools/server/server.cpp`` —
slots :1292, task queue :1634, ``update_slots`` :3017, endpoint table
:4976-4990).  Architecture: aiohttp handlers push tasks onto a queue; a
dedicated inference thread runs the BatchedEngine loop (admit → step →
emit); tokens stream back to handlers through per-request asyncio queues.

Endpoints: /health, /props, /metrics (Prometheus), /slots, /v1/models,
/tokenize, /detokenize, /completion(+/v1/completions),
/v1/chat/completions (stream + non-stream), /slots/{id}?action=save|restore|erase.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import queue
import threading
import time
import uuid

from aiohttp import web

from ..runtime.batch_engine import BatchedEngine, SamplerConfig, Slot, SlotState

log = logging.getLogger("lcg.server")


class PendingRequest:
    def __init__(self, prompt_ids, n_predict, sampler, stop_strings, loop,
                 n_keep=0, truncate=True, prompt_embeds=None, lora=None):
        self.id = f"req-{uuid.uuid4().hex[:12]}"
        self.prompt_ids = prompt_ids
        self.n_predict = n_predict
        self.sampler = sampler
        self.stop_strings = stop_strings or []
        self.loop = loop
        self.n_keep = n_keep
        self.truncate = truncate
        self.prompt_embeds = prompt_embeds  # multimodal prefill rows
        self.lora = lora  # {adapter_index: scale} per-request adapter mix
        self.token_queue: asyncio.Queue = asyncio.Queue()
        self.cancelled = False

    def emit(self, item):
        self.loop.call_soon_threadsafe(self.token_queue.put_nowait, item)


class InferenceServer:
    """Owns the engine thread and the task queue (server_queue analog)."""

    def __init__(self, engine: BatchedEngine, model_name: str = "model",
                 encoder=None, clip=None):
        self.engine = engine
        self.model_name = model_name
        # adapter bookkeeping for GET/POST /lora-adapters (names parallel
        # the engine's attach_lora order); default scales apply to
        # requests that carry no per-request "lora" field
        self.lora_names: list[str] = []
        self.default_lora: dict[int, float] | None = None
        # POST /props overrides: merged under request bodies as defaults
        self.props_defaults: dict = {}
        self.timeout = 600  # per-token wait budget (--timeout)
        self.default_n_keep = 0  # context-shift anchor default (--keep)
        # optional EncoderEngine (BERT family): real pooled embeddings and
        # rank-head rerank (reference: --embedding / rerank models)
        self.encoder = encoder
        # optional (clip_cfg, clip_params) from an mmproj GGUF — enables
        # the multimodal chat API (reference: server vision via mtmd)
        self.clip = clip
        self._tok_emb_np = None
        self.tasks: queue.Queue[PendingRequest] = queue.Queue()
        self.by_slot: dict[int, PendingRequest] = {}
        self.running = False
        self.thread: threading.Thread | None = None
        self.t_start = time.time()
        self.deferred: list[PendingRequest] = []

    def build_image_embeds(self, prompt_ids_parts, image_datas):
        """Interleave text-token embeddings with encoded image features.

        ``prompt_ids_parts``: list of token-id lists (len = images + 1);
        ``image_datas``: list of raw image bytes.  Returns (embeds, ids)."""
        import numpy as np

        from ..models.clip import encode_image
        from ..runtime.mtmd import preprocess_image_bytes

        if self.clip is None:
            raise ValueError("server started without --mmproj")
        clip_cfg, clip_params = self.clip
        if self._tok_emb_np is None:
            self._tok_emb_np = np.asarray(self.engine.params["tok_emb"], np.float32)
        import jax.numpy as jnp

        rows, ids = [], []
        for i, part_ids in enumerate(prompt_ids_parts):
            if part_ids:
                rows.append(self._tok_emb_np[part_ids])
                ids.extend(part_ids)
            if i < len(image_datas):
                px = preprocess_image_bytes(image_datas[i], clip_cfg.image_size)
                feats = np.asarray(
                    encode_image(clip_params, clip_cfg, jnp.asarray(px[None]))
                )[0].astype(np.float32)
                # forward() rescales all embeds by embedding_scale; image
                # features must arrive unscaled (HF inserts them after the
                # text normalizer)
                if self.engine.cfg.embedding_scale != 1.0:
                    feats = feats / self.engine.cfg.embedding_scale
                rows.append(feats)
                ids.extend([0] * feats.shape[0])
        embeds = np.concatenate(rows, axis=0)
        return embeds, ids

    def start(self):
        self.running = True
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def stop(self):
        self.running = False
        if self.thread:
            self.thread.join(timeout=10)

    def submit(self, req: PendingRequest):
        self.tasks.put(req)

    def embed(self, text: str, pooling: str = "mean"):
        """Pooled embedding over the engine's weights (thread-safe jit call)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models.llama import KVCache, forward
        from ..runtime.engine import bucket_len

        eng = self.engine
        ids = eng.tokenizer.tokenize(text, add_special=True, parse_special=True)
        n = len(ids)
        padded = bucket_len(n)
        toks = np.zeros((1, padded), np.int32)
        toks[0, :n] = ids
        if not hasattr(self, "_embed_fwd"):
            self._embed_fwd = jax.jit(
                forward, static_argnames=("cfg", "return_hidden")
            )
        kv = KVCache.create(eng.cfg, 1, padded, eng.dtype)
        hidden, _ = self._embed_fwd(
            eng.params, eng.cfg, jnp.asarray(toks), kv,
            jnp.asarray([n], jnp.int32), return_hidden=True,
        )
        h = np.asarray(hidden[0, :n])
        vec = h.mean(axis=0) if pooling == "mean" else h[-1]
        return vec / max(np.linalg.norm(vec), 1e-12)

    # -- inference thread -----------------------------------------------------

    def _admit(self):
        """Move queued requests into free slots (launch_slot_with_task).

        Admission only ASSIGNS the slot — the prompt prefills in chunks
        inside engine.step(), interleaved with decode, so a long prompt
        never stalls the other slots' token cadence (reference:
        server.cpp:3104-3476)."""
        pending = self.deferred
        self.deferred = []
        while True:
            if not pending:
                try:
                    pending.append(self.tasks.get_nowait())
                except queue.Empty:
                    break
            req = pending.pop(0)
            if req.cancelled:
                continue
            slot = None
            try:
                slot = self.engine.add_request(
                    req.prompt_ids, req.n_predict, req.sampler, req.id,
                    n_keep=req.n_keep, truncate=req.truncate,
                    prompt_embeds=req.prompt_embeds, lora=req.lora,
                )
            except Exception as e:
                # admission failures (bad grammar incl. non-ValueError
                # parse crashes, bad lora spec, ...) error THIS request;
                # the loop thread must never die (reference send_error)
                req.emit(("error", f"{type(e).__name__}: {e}"))
                continue
            if slot is None:
                self.deferred.append(req)
                self.deferred.extend(pending)
                break
            self.by_slot[slot.id] = req

    def _finish(self, slot: Slot):
        req = self.by_slot.pop(slot.id, None)
        if req is not None:
            req.emit(("done", {
                "reason": slot.stop_reason or "stop",
                "logprobs": list(slot.logprobs),
                "n_truncated": slot.n_truncated,
            }))
        self.engine.release(slot)

    def _loop(self):
        while self.running:
            try:
                self._admit()
                # client-disconnect cancellation, including mid-prefill
                for slot_id, req in list(self.by_slot.items()):
                    if req.cancelled:
                        self._finish(self.engine.slots[slot_id])
            except Exception:
                log.exception("request admission failed")
                time.sleep(0.05)
                continue
            try:
                results = self.engine.step()
            except Exception as e:
                # the loop must survive any engine failure: error out every
                # in-flight request, release its slot, keep serving
                # (reference: send_error per slot, server.cpp)
                log.exception("engine step failed")
                for slot_id, req in list(self.by_slot.items()):
                    req.emit(("error", f"engine: {type(e).__name__}: {e}"))
                    self.by_slot.pop(slot_id, None)
                    self.engine.release(self.engine.slots[slot_id])
                continue
            if not results and not self.by_slot:
                time.sleep(0.005)
                continue
            for slot, token, finished in results:
                req = self.by_slot.get(slot.id)
                if req is None or req.cancelled:
                    self._finish(slot)
                    continue
                if slot.stop_reason == "error":
                    req.emit(("error", slot.error_msg or "internal error"))
                    self.by_slot.pop(slot.id, None)
                    self.engine.release(slot)
                    continue
                req.emit(("token", token))
                if finished:
                    self._finish(slot)


# -----------------------------------------------------------------------------
# HTTP layer
# -----------------------------------------------------------------------------


def _sampler_from_body(body: dict) -> SamplerConfig:
    # constrained decoding: raw GBNF (`grammar`), raw schema (`json_schema`),
    # or OpenAI `response_format` (json_object / json_schema) — mirrors the
    # reference server's params_from_json_cmpl grammar plumbing
    grammar = body.get("grammar")
    json_schema = body.get("json_schema")
    rf = body.get("response_format") or {}
    if isinstance(rf, dict):
        rft = rf.get("type")
        if rft == "json_schema":
            json_schema = (rf.get("json_schema") or {}).get("schema", {})
        elif rft == "json_object":
            json_schema = rf.get("schema", {"type": "object", "additionalProperties": True})
    # OpenAI logprobs: completions use `logprobs: <N>`, chat uses
    # `logprobs: true` + `top_logprobs: N` (reference n_probs)
    lp = body.get("logprobs")
    n_probs = int(body.get("n_probs", 0) or 0)
    if isinstance(lp, bool) and lp:
        n_probs = max(n_probs, int(body.get("top_logprobs", 1) or 1))
    elif isinstance(lp, int):
        n_probs = max(n_probs, lp)
    return SamplerConfig(
        temp=float(body.get("temperature", 0.8)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        penalty_repeat=float(body.get("repeat_penalty", body.get("frequency_penalty", 0.0) + 1.0 or 1.0)),
        seed=body.get("seed"),
        grammar=grammar,
        json_schema=json_schema,
        n_probs=n_probs,
    )


def build_app(srv: InferenceServer, api_key: str | None = None,
              webui: bool = True,
              slot_save_path: str | None = None,
              api_prefix: str = "",
              api_keys: set | None = None,
              enable_slots: bool = True,
              enable_props_change: bool = True) -> web.Application:
    eng = srv.engine
    tok = eng.tokenizer
    accepted_keys = set(api_keys or ()) | ({api_key} if api_key else set())

    @web.middleware
    async def auth_middleware(request, handler):
        # API-key security (reference: tools/server/tests/unit/test_security.py):
        # /health stays public, everything else needs Bearer <key>
        # (--api-key-file loads additional accepted keys, arg.cpp analog)
        if accepted_keys and request.path not in ("/health",):
            auth = request.headers.get("Authorization", "")
            if not (auth.startswith("Bearer ")
                    and auth[len("Bearer "):] in accepted_keys):
                return web.json_response(
                    {"error": {"message": "Invalid API Key", "code": 401}},
                    status=401,
                )
        return await handler(request)

    async def collect_or_stream(req_obj: PendingRequest, stream: bool, fmt, request):
        """fmt(tokens_text_delta, finished, reason) → SSE chunk dict."""
        if stream:
            resp = web.StreamResponse(
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                }
            )
            await resp.prepare(request)
        pieces: list[int] = []
        emitted_len = 0
        text_acc = ""
        finish_reason = "stop"
        meta: dict = {}
        try:
            while True:
                kind, value = await asyncio.wait_for(
                    req_obj.token_queue.get(), timeout=srv.timeout)
                if kind == "error":
                    if stream:
                        await resp.write(b'data: {"error": ' + json.dumps(value).encode() + b"}\n\n")
                        await resp.write_eof()
                        return resp
                    raise web.HTTPBadRequest(text=json.dumps({"error": value}))
                if kind == "done":
                    if isinstance(value, dict):
                        meta = value
                        finish_reason = value.get("reason", "stop")
                    else:
                        finish_reason = value
                    break
                pieces.append(value)
                text_acc = tok.detokenize(pieces)
                # hold back bytes that might be a partial multibyte char
                new_text = text_acc[emitted_len:]
                if stream and new_text and not new_text.endswith("�"):
                    chunk = fmt(new_text, False, None)
                    await resp.write(b"data: " + json.dumps(chunk).encode() + b"\n\n")
                    emitted_len = len(text_acc)
                # stop strings
                for s in req_obj.stop_strings:
                    if s and s in text_acc:
                        text_acc = text_acc[: text_acc.index(s)]
                        req_obj.cancelled = True
                        finish_reason = "stop"
                        break
                if req_obj.cancelled:
                    break
        except asyncio.TimeoutError:
            req_obj.cancelled = True
            finish_reason = "timeout"
        if stream:
            final = fmt(text_acc[emitted_len:], True, finish_reason)
            await resp.write(b"data: " + json.dumps(final).encode() + b"\n\n")
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        return text_acc, pieces, finish_reason, meta

    # -- endpoints ------------------------------------------------------------

    async def health(request):
        return web.json_response({"status": "ok"})

    async def props(request):
        return web.json_response(
            {
                "model": srv.model_name,
                "n_ctx": eng.max_seq,
                "n_slots": eng.n_slots,
                "arch": eng.cfg.arch,
                "n_vocab": eng.cfg.n_vocab,
                "chat_template": tok.vocab.chat_template or "",
            }
        )

    async def models(request):
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": srv.model_name,
                        "object": "model",
                        "created": int(srv.t_start),
                        "owned_by": "llama_cpp_gfx906_tpu",
                    }
                ],
            }
        )

    async def metrics(request):
        m = eng.metrics
        lines = [
            "# TYPE llamacpp_tpu:prompt_tokens_total counter",
            f"llamacpp_tpu:prompt_tokens_total {m['n_prompt_tokens']}",
            "# TYPE llamacpp_tpu:tokens_predicted_total counter",
            f"llamacpp_tpu:tokens_predicted_total {m['n_generated_tokens']}",
            "# TYPE llamacpp_tpu:requests_total counter",
            f"llamacpp_tpu:requests_total {m['n_requests']}",
            "# TYPE llamacpp_tpu:prompt_seconds_total counter",
            f"llamacpp_tpu:prompt_seconds_total {m['t_prefill_s']:.3f}",
            "# TYPE llamacpp_tpu:predicted_seconds_total counter",
            f"llamacpp_tpu:predicted_seconds_total {m['t_decode_s']:.3f}",
            "# TYPE llamacpp_tpu:slots_busy gauge",
            f"llamacpp_tpu:slots_busy {eng.n_active}",
            "# TYPE llamacpp_tpu:slots_idle gauge",
            f"llamacpp_tpu:slots_idle {eng.n_slots - eng.n_active}",
        ]
        return web.Response(text="\n".join(lines) + "\n", content_type="text/plain")

    async def slots(request):
        out = []
        for s in eng.slots:
            out.append(
                {
                    "id": s.id,
                    "state": s.state.name,
                    "n_past": s.n_past,
                    "n_generated": len(s.generated),
                    "request_id": s.request_id,
                }
            )
        return web.json_response(out)

    async def tokenize(request):
        body = await request.json()
        ids = tok.tokenize(
            body.get("content", ""),
            add_special=bool(body.get("add_special", False)),
            parse_special=bool(body.get("parse_special", True)),
        )
        return web.json_response({"tokens": ids})

    async def detokenize(request):
        body = await request.json()
        return web.json_response({"content": tok.detokenize(list(body.get("tokens", [])))})

    def _lora_from_body(body) -> dict | None:
        """Reference server request format: "lora": [{"id": 0, "scale": 1.0}]
        (a bare float list is also accepted, indexed by position)."""
        spec = body.get("lora")
        if not spec:
            return dict(srv.default_lora) if srv.default_lora else None
        out = {}
        if isinstance(spec, dict):
            out = {int(k): float(v) for k, v in spec.items()}
        else:
            for i, it in enumerate(spec):
                if isinstance(it, dict):
                    out[int(it.get("id", i))] = float(it.get("scale", 1.0))
                else:
                    out[i] = float(it)
        return out or None

    def _make_req(prompt_ids, body, prompt_embeds=None) -> PendingRequest:
        if srv.props_defaults:  # POST /props generation defaults
            body = {**srv.props_defaults, **body}
        n_predict = int(body.get("n_predict", body.get("max_tokens", 128)) or 128)
        stop = body.get("stop") or []
        if isinstance(stop, str):
            stop = [stop]
        req_obj = PendingRequest(
            prompt_ids,
            n_predict,
            _sampler_from_body(body),
            stop,
            asyncio.get_event_loop(),
            n_keep=int(body.get("n_keep", srv.default_n_keep) or 0),
            truncate=bool(body.get("truncate", True)),
            prompt_embeds=prompt_embeds,
            lora=_lora_from_body(body),
        )
        srv.submit(req_obj)
        return req_obj

    def _logprobs_payload(meta, detok):
        """OpenAI-ish logprobs block from the engine records."""
        recs = meta.get("logprobs") or []
        if not recs:
            return None
        return {
            "tokens": [detok([r["token"]]) for r in recs],
            "token_logprobs": [r["logprob"] for r in recs],
            "top_logprobs": [
                {detok([t]): lp for t, lp in r["top"]} for r in recs
            ],
        }

    async def completions(request):
        body = await request.json()
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            prompt_ids = list(prompt)
        else:
            prompt_ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        n_choices = max(1, int(body.get("n", 1) or 1))
        rid = f"cmpl-{uuid.uuid4().hex[:12]}"
        stream = bool(body.get("stream", False))
        if stream and n_choices > 1:
            raise web.HTTPBadRequest(text='{"error": "streaming supports n=1"}')

        def fmt(delta, finished, reason):
            return {
                "id": rid,
                "object": "text_completion",
                "created": int(time.time()),
                "model": srv.model_name,
                "choices": [
                    {
                        "index": 0,
                        "text": delta,
                        "finish_reason": reason if finished else None,
                    }
                ],
            }

        if stream:
            req_obj = _make_req(prompt_ids, body)
            return await collect_or_stream(req_obj, True, fmt, request)

        # n > 1: one slot per choice (reference: multi-task requests)
        reqs = [_make_req(prompt_ids, body) for _ in range(n_choices)]
        choices = []
        total_completion = 0
        for i, req_obj in enumerate(reqs):
            text, pieces, reason, meta = await collect_or_stream(req_obj, False, fmt, request)
            total_completion += len(pieces)
            choice = {"index": i, "text": text, "finish_reason": reason}
            lp = _logprobs_payload(meta, tok.detokenize)
            if lp is not None:
                choice["logprobs"] = lp
            choices.append(choice)
        return web.json_response(
            {
                "id": rid,
                "object": "text_completion",
                "created": int(time.time()),
                "model": srv.model_name,
                "choices": choices,
                "usage": {
                    "prompt_tokens": len(prompt_ids),
                    "completion_tokens": total_completion,
                    "total_tokens": len(prompt_ids) + total_completion,
                },
            }
        )

    async def chat_completions(request):
        import base64

        from ..chat import parse_chat_output, render_chat_template

        body = await request.json()
        messages = body.get("messages", [])
        tools = body.get("tools")

        # multimodal content parts (reference: server vision API via mtmd):
        # flatten list-content into text with markers, collecting images
        IMG_MARK = "\x00<__media__>\x00"
        image_datas: list[bytes] = []
        flat_messages = []
        for m in messages:
            c = m.get("content")
            if isinstance(c, list):
                text_parts = []
                for part in c:
                    if part.get("type") == "image_url":
                        url = (part.get("image_url") or {}).get("url", "")
                        if not url.startswith("data:"):
                            raise web.HTTPBadRequest(
                                text='{"error": "only data: image URLs supported"}')
                        image_datas.append(base64.b64decode(url.split(",", 1)[1]))
                        text_parts.append(IMG_MARK)
                    else:
                        text_parts.append(part.get("text", ""))
                flat_messages.append({**m, "content": "".join(text_parts)})
            else:
                flat_messages.append(m)

        v = tok.vocab
        bos = v.tokens[v.special.bos] if v.special.bos is not None else ""
        eos = v.tokens[v.special.eos] if v.special.eos is not None else ""
        prompt = render_chat_template(
            v.chat_template, flat_messages, add_generation_prompt=True,
            bos_token=bos, eos_token=eos, tools=tools,
        )
        prompt_embeds = None
        if image_datas:
            parts = prompt.split(IMG_MARK)
            id_parts = [
                tok.tokenize(p, add_special=(i == 0), parse_special=True)
                for i, p in enumerate(parts)
            ]
            loop = asyncio.get_event_loop()
            prompt_embeds, prompt_ids = await loop.run_in_executor(
                None, srv.build_image_embeds, id_parts, image_datas
            )
        else:
            prompt_ids = tok.tokenize(prompt, add_special=True, parse_special=True)
        req_obj = _make_req(prompt_ids, body, prompt_embeds=prompt_embeds)
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        stream = bool(body.get("stream", False))

        def fmt(delta, finished, reason):
            d = {} if finished and not delta else {"content": delta}
            if not finished and not delta:
                d = {"role": "assistant", "content": ""}
            return {
                "id": rid,
                "object": "chat.completion.chunk",
                "created": int(time.time()),
                "model": srv.model_name,
                "choices": [
                    {
                        "index": 0,
                        "delta": d,
                        "finish_reason": reason if finished else None,
                    }
                ],
            }

        result = await collect_or_stream(req_obj, stream, fmt, request)
        if stream:
            return result
        text, pieces, reason, meta = result
        parsed = parse_chat_output(text, fmt="auto" if tools else "none")
        message: dict = {"role": "assistant", "content": parsed.content or None}
        if parsed.reasoning_content:
            message["reasoning_content"] = parsed.reasoning_content
        if parsed.tool_calls:
            message["tool_calls"] = [
                {
                    "id": c.id,
                    "type": "function",
                    "function": {"name": c.name, "arguments": c.arguments},
                }
                for c in parsed.tool_calls
            ]
            reason = "tool_calls"
        if not parsed.tool_calls and not parsed.reasoning_content:
            message["content"] = text
        choice = {"index": 0, "message": message, "finish_reason": reason}
        recs = meta.get("logprobs") or []
        if recs:  # OpenAI chat logprobs block
            choice["logprobs"] = {
                "content": [
                    {
                        "token": tok.detokenize([r["token"]]),
                        "logprob": r["logprob"],
                        "top_logprobs": [
                            {"token": tok.detokenize([t]), "logprob": lp}
                            for t, lp in r["top"]
                        ],
                    }
                    for r in recs
                ]
            }
        return web.json_response(
            {
                "id": rid,
                "object": "chat.completion",
                "created": int(time.time()),
                "model": srv.model_name,
                "choices": [choice],
                "usage": {
                    "prompt_tokens": len(prompt_ids),
                    "completion_tokens": len(pieces),
                    "total_tokens": len(prompt_ids) + len(pieces),
                },
            }
        )

    async def embeddings(request):
        import numpy as np

        body = await request.json()
        inputs = body.get("input", body.get("content", ""))
        if isinstance(inputs, str):
            inputs = [inputs]
        loop = asyncio.get_event_loop()
        data = []
        if srv.encoder is not None:
            vecs = await loop.run_in_executor(None, srv.encoder.embed, list(inputs))
            for i, vec in enumerate(vecs):
                data.append({"object": "embedding", "index": i,
                             "embedding": np.asarray(vec).tolist()})
        else:
            for i, text in enumerate(inputs):
                vec = await loop.run_in_executor(None, srv.embed, text)
                data.append(
                    {"object": "embedding", "index": i, "embedding": np.asarray(vec).tolist()}
                )
        return web.json_response(
            {"object": "list", "data": data, "model": srv.model_name,
             "usage": {"prompt_tokens": 0, "total_tokens": 0}}
        )

    async def infill(request):
        """Fill-in-the-middle completion (reference server.cpp:4492):
        builds <fim_pre>prefix<fim_suf>suffix<fim_mid> from the vocab's FIM
        specials and runs a normal completion on it."""
        body = await request.json()
        sp = tok.vocab.special
        if sp.fim_pre is None or sp.fim_suf is None or sp.fim_mid is None:
            raise web.HTTPNotImplemented(text="model has no FIM tokens")
        prefix = body.get("input_prefix", body.get("prompt", ""))
        suffix = body.get("input_suffix", "")
        ids = (
            [sp.fim_pre]
            + tok.tokenize(prefix, add_special=False, parse_special=False)
            + [sp.fim_suf]
            + tok.tokenize(suffix, add_special=False, parse_special=False)
            + [sp.fim_mid]
        )
        req_obj = _make_req(ids, body)
        stream = bool(body.get("stream", False))

        def fmt(delta, finished, reason):
            return {"content": delta, "stop": finished}

        result = await collect_or_stream(req_obj, stream, fmt, request)
        if stream:
            return result
        text, pieces, reason, meta = result
        return web.json_response({"content": text, "stop_type": reason,
                                  "tokens_predicted": len(pieces)})

    async def rerank(request):
        """Query-document relevance ranking (reference server.cpp:4810).
        With a BERT-family encoder model the scores come from a real
        rank-head cross-encoder; otherwise falls back to pooled-embedding
        cosine over the causal LM."""
        import numpy as np

        body = await request.json()
        query = body.get("query", "")
        docs = body.get("documents", [])
        loop = asyncio.get_event_loop()
        if srv.encoder is not None:
            scores = await loop.run_in_executor(
                None, srv.encoder.rerank, query, list(docs)
            )
            results = [
                {"index": i, "relevance_score": float(s)}
                for i, s in enumerate(scores)
            ]
        else:
            qv = await loop.run_in_executor(None, srv.embed, query)
            results = []
            for i, d in enumerate(docs):
                dv = await loop.run_in_executor(None, srv.embed, d)
                results.append({
                    "index": i,
                    "relevance_score": float(np.dot(np.asarray(qv), np.asarray(dv))),
                })
        results.sort(key=lambda r: -r["relevance_score"])
        top_n = body.get("top_n")
        if top_n:
            results = results[: int(top_n)]
        return web.json_response({"model": srv.model_name, "results": results})

    _saved_states: dict[int, dict] = {}

    def _slot_file(filename: str) -> str:
        import os as _os

        base = _os.path.basename(filename)  # no path traversal
        return _os.path.join(slot_save_path, base)

    async def slot_action(request):
        slot_id = int(request.match_info["slot_id"])
        action = request.query.get("action", "")
        body = {}
        if request.can_read_body:
            try:
                body = await request.json()
            except Exception:
                body = {}
        filename = body.get("filename") if isinstance(body, dict) else None
        if action == "save":
            state = eng.save_slot_state(slot_id)
            if slot_save_path and filename:
                # on-disk slot files under --slot-save-path (reference
                # server.cpp slot save endpoint).  npz, NOT pickle: slot
                # files must never be a code-execution vector (the
                # reference uses a flat binary format for the same reason)
                import numpy as _np

                def raw(a):  # bf16 has no numpy dtype: ship uint16 bits
                    a = _np.asarray(a)
                    if a.dtype.kind not in "fiu":
                        return a.view(_np.uint16), "bfloat16"
                    return a, str(a.dtype)

                kr, kd = raw(state["k"])
                vr, vd = raw(state["v"])
                _np.savez(
                    _slot_file(filename),
                    k=kr, v=vr, k_dtype=kd, v_dtype=vd,
                    n_past=_np.int64(state["n_past"]),
                    prompt_ids=_np.asarray(state["prompt_ids"], _np.int64),
                    generated=_np.asarray(state["generated"], _np.int64),
                )
            else:
                _saved_states[slot_id] = state
            return web.json_response({"saved": True, "n_past": state["n_past"]})
        if action == "restore":
            if slot_save_path and filename:
                import os as _os

                import numpy as _np

                path = _slot_file(filename)
                if not _os.path.exists(path) and _os.path.exists(path + ".npz"):
                    path += ".npz"  # np.savez appends the suffix
                if not _os.path.exists(path):
                    raise web.HTTPNotFound(text="no saved state file")
                with _np.load(path, allow_pickle=False) as z:
                    def unraw(a, dt):
                        if str(dt) == "bfloat16":
                            import ml_dtypes

                            return a.view(ml_dtypes.bfloat16)
                        return a
                    state = {
                        "k": unraw(z["k"], z["k_dtype"]),
                        "v": unraw(z["v"], z["v_dtype"]),
                        "n_past": int(z["n_past"]),
                        "prompt_ids": z["prompt_ids"].tolist(),
                        "generated": z["generated"].tolist(),
                    }
                eng.load_slot_state(slot_id, state)
                return web.json_response({"restored": True})
            if slot_id not in _saved_states:
                raise web.HTTPNotFound(text="no saved state")
            eng.load_slot_state(slot_id, _saved_states[slot_id])
            return web.json_response({"restored": True})
        if action == "erase":
            eng.release(eng.slots[slot_id])
            return web.json_response({"erased": True})
        raise web.HTTPBadRequest(text="unknown action")

    async def index(request):
        from .webui import WEBUI_HTML

        return web.Response(text=WEBUI_HTML, content_type="text/html")

    async def apply_template(request):
        """POST /apply-template: render messages through the model's chat
        template WITHOUT generating (reference handle_apply_template)."""
        from ..chat import render_chat_template

        body = await request.json()
        prompt = render_chat_template(
            tok.vocab.chat_template, body.get("messages", []),
            add_generation_prompt=bool(body.get("add_generation_prompt", True)),
            tools=body.get("tools"),
        )
        return web.json_response({"prompt": prompt})

    async def lora_list(request):
        scales = srv.default_lora or {}
        return web.json_response([
            {"id": i, "path": p, "scale": float(scales.get(i, 0.0))}
            for i, p in enumerate(srv.lora_names)
        ])

    async def lora_apply(request):
        body = await request.json()
        if not isinstance(body, list):
            raise web.HTTPBadRequest(text="want [{id, scale}, ...]")
        scales: dict[int, float] = {}
        for it in body:
            i = int(it.get("id", -1))
            if not (0 <= i < len(srv.lora_names)):
                raise web.HTTPBadRequest(text=f"invalid adapter id {i}")
            scales[i] = float(it.get("scale", 1.0))
        srv.default_lora = scales or None
        return web.json_response({"success": True})

    async def props_change(request):
        """POST /props: update server-wide generation defaults (reference
        handle_props_change); keys merge UNDER request bodies."""
        body = await request.json()
        if not isinstance(body, dict):
            raise web.HTTPBadRequest(text="want a JSON object")
        srv.props_defaults.update(body)
        return web.json_response({"success": True})

    async def api_tags(request):
        # ollama-compatible model listing
        return web.json_response({"models": [{
            "name": srv.model_name, "model": srv.model_name,
            "details": {"family": eng.cfg.arch,
                        "parameter_size": f"{eng.cfg.n_layers}L"},
        }]})

    async def api_show(request):
        # ollama-compatible model info
        return web.json_response({
            "model_info": {
                "general.architecture": eng.cfg.arch,
                f"{eng.cfg.arch}.context_length": eng.cfg.n_ctx_train,
                f"{eng.cfg.arch}.embedding_length": eng.cfg.n_embd,
                f"{eng.cfg.arch}.block_count": eng.cfg.n_layers,
            },
            "capabilities": ["completion"],
        })

    app = web.Application(
        middlewares=[auth_middleware] if accepted_keys else [])
    P = api_prefix.rstrip("/")  # LLAMA_ARG_API_PREFIX analog
    if webui:
        app.router.add_get(P + "/" if P else "/", index)
    app.router.add_get(P + "/health", health)
    app.router.add_get(P + "/props", props)
    if enable_props_change:  # gated by --props in main (reference default
        app.router.add_post(P + "/props", props_change)  # forbids changes)
    app.router.add_get(P + "/metrics", metrics)
    if enable_slots:  # --no-slots (LLAMA_ARG_NO_ENDPOINT_SLOTS)
        app.router.add_get(P + "/slots", slots)
    app.router.add_get(P + "/models", models)
    app.router.add_get(P + "/v1/models", models)
    app.router.add_get(P + "/api/tags", api_tags)  # ollama
    app.router.add_post(P + "/api/show", api_show)  # ollama
    app.router.add_post(P + "/tokenize", tokenize)
    app.router.add_post(P + "/detokenize", detokenize)
    app.router.add_post(P + "/apply-template", apply_template)
    app.router.add_post(P + "/completion", completions)
    app.router.add_post(P + "/completions", completions)
    app.router.add_post(P + "/v1/completions", completions)
    app.router.add_post(P + "/chat/completions", chat_completions)
    app.router.add_post(P + "/v1/chat/completions", chat_completions)
    app.router.add_post(P + "/api/chat", chat_completions)  # ollama
    app.router.add_post(P + "/embedding", embeddings)
    app.router.add_post(P + "/embeddings", embeddings)
    app.router.add_post(P + "/v1/embeddings", embeddings)
    app.router.add_get(P + "/lora-adapters", lora_list)
    app.router.add_post(P + "/lora-adapters", lora_apply)
    app.router.add_post(P + "/slots/{slot_id}", slot_action)
    app.router.add_post(P + "/infill", infill)
    app.router.add_post(P + "/rerank", rerank)
    app.router.add_post(P + "/v1/rerank", rerank)
    app.router.add_post(P + "/reranking", rerank)
    app.router.add_post(P + "/v1/reranking", rerank)
    return app


def main(argv=None) -> int:
    from ..common.args import build_parser as registry_parser

    ap = registry_parser("server", description="TPU-native llama-server")
    ap.prog = "llama-server (TPU)"
    ap.add_argument("--spec-ngram", action="store_true",
                    help="ngram-lookup speculation for greedy requests")
    ap.add_argument("--rerank-model", default=None,
                    help="BERT-family GGUF for /rerank and /embeddings "
                         "(rank-head cross-encoder)")
    ap.add_argument("--no-ctx-shift", dest="no_ctx_shift", action="store_true",
                    help="alias of --no-context-shift")
    args = ap.parse_args(argv)
    from ..common.args import maybe_print_completion

    if maybe_print_completion(args, "server", "llama-server"):
        return 0
    if args.model_url or args.hf_repo or args.hf_file:
        raise SystemExit(
            "model downloads (--model-url/--hf-repo) are unavailable: this "
            "environment has no network egress; fetch the GGUF out of band "
            "and pass -m")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")
    if args.list_devices:
        import jax

        for d in jax.devices():
            print(d)
        return 0

    from ..gguf.reader import GGUFModelReader
    from ..models.config import config_from_gguf
    from ..runtime.weights import load_llama_params_quantized
    from ..tokenizers import tokenizer_from_gguf

    reader = GGUFModelReader(args.model)
    if args.override_kv:
        from ..tools.cli import parse_kv_overrides

        reader.set_overrides(parse_kv_overrides(args.override_kv))
    cfg = config_from_gguf(reader)
    if args.rope_freq_base:
        cfg = cfg.with_(rope_base=args.rope_freq_base)
    if args.rope_scale_factor:
        from ..gguf.constants import RopeScalingType

        cfg = cfg.with_(rope_scaling=RopeScalingType.LINEAR,
                        rope_scale=args.rope_scale_factor)
    if args.rope_freq_scale:
        from ..gguf.constants import RopeScalingType

        cfg = cfg.with_(rope_scaling=RopeScalingType.LINEAR,
                        rope_scale=1.0 / args.rope_freq_scale)
    if args.yarn_orig_ctx:
        cfg = cfg.with_(rope_orig_ctx=args.yarn_orig_ctx)
    tokenizer = tokenizer_from_gguf(reader.readers[0])
    if args.chat_template_file:
        with open(args.chat_template_file, encoding="utf-8") as f:
            tokenizer.vocab.chat_template = f.read()
    elif args.chat_template:
        tokenizer.vocab.chat_template = args.chat_template
    # multi-device serving: --split-mode/--tensor-split build a TP mesh and
    # the weights stream straight into sharded buffers (the reference's
    # llama-model.cpp:1908-1975 device assignment, as GSPMD placement)
    from ..common.args import mesh_from_args

    mesh = mesh_from_args(args)
    put_fn = None
    if mesh is not None:
        from ..parallel.sharding import make_device_put_fn

        put_fn = make_device_put_fn(mesh, cfg)
    # LoRA hooks target per-projection weights: skip loader fusion then
    from ..ops import quant_matmul as _qmm

    prev_fold = _qmm.FOLD_KQ_SCALES
    _qmm.FOLD_KQ_SCALES = _qmm.LOADER_KQ_FOLD_DEFAULT  # default-on
    try:
        params = load_llama_params_quantized(
            reader, cfg, device_put_fn=put_fn,
            fuse=False if (args.lora or mesh is not None) else None)
    finally:
        _qmm.FOLD_KQ_SCALES = prev_fold
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from ..ops.quant_matmul import mark_xla_only

        params = mark_xla_only(params)
    if args.check_tensors:
        from ..runtime.weights import check_params_finite

        check_params_finite(params)
    if getattr(args, "repack_int8", False):
        from ..ops.quant_matmul import repack_params_int8

        params = repack_params_int8(params)
    draft = None
    if args.draft_model:
        d_reader = GGUFModelReader(args.draft_model)
        d_cfg = config_from_gguf(d_reader)
        draft = (d_cfg, load_llama_params_quantized(d_reader, d_cfg))
    kv_dtype = None
    if args.cache_type_k == "q8":
        kv_dtype = "q8"
    elif args.cache_type_k == "f32":
        import jax.numpy as jnp

        kv_dtype = jnp.float32
    n_draft = args.draft_n if args.draft_n else args.draft_max  # --draft-n
    engine = BatchedEngine(cfg, params, tokenizer, n_slots=args.n_slots,
                           max_seq=args.ctx_size, spec_ngram=args.spec_ngram,
                           n_draft=n_draft, n_chunk=args.n_batch,
                           ctx_shift=not args.no_ctx_shift, draft=draft,
                           kv_cache_dtype=kv_dtype, mesh=mesh)
    if args.lora:
        engine.attach_lora(args.lora)
    if not getattr(args, "no_warmup", False):
        # compile the hot prefill/decode programs before /health goes ok
        # (reference common_init warmup; persistent compile cache makes
        # restarts replay these from disk)
        engine.warmup()
    encoder = None
    if args.rerank_model:
        from ..runtime.encoder import EncoderEngine

        encoder = EncoderEngine.from_gguf(args.rerank_model)
    clip = None
    if args.mmproj:
        from ..gguf.reader import GGUFReader as _GR
        from ..models.clip import load_mmproj

        clip = load_mmproj(_GR(args.mmproj))
    srv = InferenceServer(engine,
                          model_name=args.alias or args.model.rsplit("/", 1)[-1],
                          encoder=encoder, clip=clip)
    srv.lora_names = list(args.lora or [])
    srv.timeout = max(args.timeout, 1)
    srv.default_n_keep = args.n_keep
    srv.start()
    extra_keys: set = set()
    if args.api_key_file:
        with open(args.api_key_file, encoding="utf-8") as f:
            extra_keys = {ln.strip() for ln in f if ln.strip()}
    app = build_app(srv, api_key=args.api_key, webui=not args.no_webui,
                    slot_save_path=args.slot_save_path,
                    api_prefix=args.api_prefix or "",
                    api_keys=extra_keys,
                    enable_slots=not args.no_slots,
                    enable_props_change=bool(args.props))
    ssl_ctx = None
    if args.ssl_cert_file and args.ssl_key_file:
        import ssl as _ssl

        ssl_ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(args.ssl_cert_file, args.ssl_key_file)
    web.run_app(app, host=args.host, port=args.port, ssl_context=ssl_ctx)
    srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
