"""aiohttp server exposing the engine: /v1/completions and
/v1/chat/completions (+SSE streaming), /v1/models, /health, /metrics.

Capability the reference has no analog for (it is a library with a
gitignored demo binary, SURVEY.md §2.11). The engine runs on a dedicated
thread (JAX dispatch is blocking); request handlers talk to it through
thread-safe queues and receive tokens via per-request asyncio queues.

``n > 1`` fans a request out into n engine requests — the prefix cache
shares the prompt's KV pages between them, so parallel sampling costs one
prompt prefill plus n suffix samples.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
from typing import Optional

from simplellminference_tpu.core.config import SamplingParams
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.tokenizer.base import StreamingDetokenizer
from simplellminference_tpu.tokenizer.chat import render_chat


class EngineWorker:
    """Runs Engine.step() on a dedicated thread while work exists."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self._wake = threading.Event()
        self._stop = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop:
            with self._lock:
                has_work = self.engine.has_work
            if not has_work:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            with self._lock:
                self.engine.step()

    def submit(self, prompt_ids, sampling: SamplingParams, on_tokens,
               lora=None):
        with self._lock:
            req = self.engine.add_request(prompt_ids=prompt_ids,
                                          sampling=sampling,
                                          on_tokens=on_tokens, lora=lora)
        self._wake.set()
        return req

    def cancel(self, req):
        with self._lock:
            return self.engine.cancel(req)

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)


def _capacity_error(msg: str) -> bool:
    """Server-capacity (retryable, 429) vs client-request (400) errors."""
    return "queue full" in msg or "pool exhausted" in msg


def _sampling_from(body: dict, tokenizer) -> SamplingParams:
    """Build SamplingParams from a request body.

    Raises ValueError on malformed client fields — handlers turn that
    into a 400 (not a 500 from an uncaught TypeError).
    """
    stop = body.get("stop")
    if isinstance(stop, str):
        stop_strings = (stop,)
    elif stop is None:
        stop_strings = ()
    elif isinstance(stop, list) and all(isinstance(s, str) for s in stop):
        stop_strings = tuple(stop)
    else:
        raise ValueError("'stop' must be a string or an array of strings")
    bias = body.get("logit_bias") or {}
    if not isinstance(bias, dict):
        raise ValueError("'logit_bias' must be an object mapping "
                         "token ids to bias values")
    try:
        logit_bias = tuple((int(t), float(v)) for t, v in bias.items())
    except (TypeError, ValueError):
        raise ValueError("'logit_bias' keys must be token ids and "
                         "values numbers")
    # guided decoding: vLLM-style extensions + OpenAI response_format
    guided_regex = body.get("guided_regex")
    guided_json = body.get("guided_json")
    guided_choice = body.get("guided_choice")
    rf = body.get("response_format")
    if rf is not None:
        if not isinstance(rf, dict) or "type" not in rf:
            raise ValueError("'response_format' must be an object with "
                             "a 'type'")
        if rf["type"] == "json_object":
            guided_json = guided_json if guided_json is not None else True
        elif rf["type"] == "json_schema":
            js = rf.get("json_schema")
            if not isinstance(js, dict) or "schema" not in js:
                raise ValueError("response_format json_schema needs "
                                 "{'json_schema': {'schema': ...}}")
            guided_json = js["schema"]
        elif rf["type"] != "text":
            raise ValueError(f"unknown response_format type "
                             f"{rf['type']!r}")
    if guided_regex is not None and not isinstance(guided_regex, str):
        raise ValueError("'guided_regex' must be a string")
    if guided_choice is not None:
        if not isinstance(guided_choice, list) or not guided_choice \
                or not all(isinstance(c, str) for c in guided_choice):
            raise ValueError("'guided_choice' must be a non-empty array "
                             "of strings")
        guided_choice = tuple(guided_choice)
    return SamplingParams(
        guided_regex=guided_regex,
        guided_json=guided_json,
        guided_choice=guided_choice,
        stop_strings=stop_strings,
        logit_bias=logit_bias,
        max_new_tokens=int(body.get("max_tokens", 128)),
        min_tokens=int(body.get("min_tokens", 0)),
        ignore_eos=bool(body.get("ignore_eos", False)),
        temperature=float(body.get("temperature", 0.0)),
        top_k=int(body.get("top_k", 0)),
        top_p=float(body.get("top_p", 1.0)),
        min_p=float(body.get("min_p", 0.0)),
        repetition_penalty=float(body.get("repetition_penalty", 1.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        seed=(int(body["seed"]) if "seed" in body and body["seed"] is not None else None),
        stop_token_ids=tuple(body.get("stop_token_ids", ())) or
        ((tokenizer.eos_id,) if tokenizer and tokenizer.eos_id >= 0
         else ()),
    )


def build_app(engine: Engine, tokenizer=None, model_id: str = "local",
              chat_template: Optional[str] = None):
    from aiohttp import web

    worker = EngineWorker(engine)
    tokenizer = tokenizer or engine.tokenizer

    async def health(_request):
        return web.json_response({"status": "ok"})

    async def metrics_json(_request):
        return web.json_response(engine.metrics.summary())

    async def metrics(_request):
        """Prometheus text exposition (scrapers); JSON at /metrics.json."""
        from simplellminference_tpu.engine.metrics import prometheus_text

        extra = {}
        alloc = getattr(engine, "allocator", None)
        ecfg = getattr(engine, "ecfg", None)
        if alloc is not None and ecfg is not None:
            extra["kv_pages_free"] = (
                "KV pages currently free", alloc.num_free)
            extra["kv_pages_total"] = (
                "KV pages in the pool", ecfg.kv.num_pages)
        text = prometheus_text(engine.metrics, extra_gauges=extra)
        return web.Response(
            body=text.encode("utf-8"),
            headers={"Content-Type":
                     "text/plain; version=0.0.4; charset=utf-8"})

    async def models(_request):
        data = [{"id": model_id, "object": "model",
                 "owned_by": "simplellminference_tpu"}]
        for name in sorted(getattr(engine, "lora_index", {})):
            data.append({"id": name, "object": "model",
                         "owned_by": "simplellminference_tpu",
                         "parent": model_id, "lora": True})
        return web.json_response({"object": "list", "data": data})

    def _lora_from(body: dict):
        """Adapter name: explicit 'lora' field, or an OpenAI 'model'
        that names a loaded adapter (multi-LoRA serving idiom)."""
        lora = body.get("lora")
        if lora is None and body.get("model") in engine.lora_index:
            lora = body["model"]
        return lora

    async def _run_one(prompt_ids, sampling, request, stream, req_id_prefix,
                       chat: bool, lora=None):
        """Single-sequence path shared by both endpoints."""
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()

        def on_tokens(req, ids, finished):
            loop.call_soon_threadsafe(q.put_nowait, (list(ids), finished))

        # submit()/cancel() contend with the engine thread's step lock (a
        # step blocks for a full JAX dispatch) — keep them off the event
        # loop so /health and other streams stay live.
        req = await loop.run_in_executor(None, worker.submit, prompt_ids,
                                         sampling, on_tokens, lora)
        detok = StreamingDetokenizer(tokenizer) if tokenizer else None

        if stream:
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream",
                         "Cache-Control": "no-cache"})
            await resp.prepare(request)
            streamed = ""
            try:
                while True:
                    ids, finished = await q.get()
                    text = ("".join(detok.push(t) for t in ids)
                            if detok else "")
                    if finished and detok:
                        if req.final_text is not None:
                            # stop-string match: the engine's truncated
                            # text is authoritative (the match may sit
                            # mid-token, so ids alone can't express it)
                            text += req.final_text[len(streamed + text):]
                        else:
                            text += detok.flush()
                    streamed += text
                    if chat:
                        payload = {"id": f"{req_id_prefix}-{req.req_id}",
                                   "object": "chat.completion.chunk",
                                   "choices": [{"index": 0, "delta":
                                                {"content": text},
                                                "finish_reason":
                                                ("stop" if finished
                                                 else None)}],
                                   "token_ids": ids}
                    else:
                        payload = {"token_ids": ids, "text": text,
                                   "finished": finished}
                    if finished and req.error:
                        payload["error"] = req.error
                    await resp.write(
                        f"data: {json.dumps(payload)}\n\n".encode())
                    if finished:
                        break
            except (asyncio.CancelledError, ConnectionResetError):
                # client went away: reclaim the slot/pages immediately
                await asyncio.shield(
                    loop.run_in_executor(None, worker.cancel, req))
                raise
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        try:
            while True:
                _ids, finished = await q.get()
                if finished:
                    break
        except asyncio.CancelledError:
            await asyncio.shield(
                loop.run_in_executor(None, worker.cancel, req))
            raise
        return req

    def _finish_reason(req, sampling):
        if req.final_text is not None:  # stop-string match
            return "stop"
        return ("stop" if req.num_generated < sampling.max_new_tokens
                else "length")

    def _choice_text(req):
        if req.final_text is not None:
            return req.final_text
        return tokenizer.decode(req.output_ids) if tokenizer else None

    def _choice_ids(req):
        """Output ids consistent with the (possibly stop-truncated) text:
        on a stop-string match, ids at/after the match are swallowed —
        clients consuming token_ids must not see stop-string content."""
        if req.final_ids_len is not None:
            return req.output_ids[:req.final_ids_len]
        return req.output_ids

    def _choice_logprobs(req):
        if req.final_ids_len is not None:
            return req.output_logprobs[:req.final_ids_len]
        return req.output_logprobs

    def _choice_tops(req, k):
        """Per-token top-k alternatives as OpenAI maps
        ({token: logprob}); requires EngineConfig.top_logprobs >= k."""
        tops = req.output_top_logprobs
        if req.final_ids_len is not None:
            tops = tops[:req.final_ids_len]
        out = []
        for alts in tops:
            row = {}
            for tid, lp in alts[:k]:
                tok_s = (tokenizer.decode([int(tid)]) if tokenizer
                         else str(int(tid)))
                row[tok_s] = lp
            out.append(row)
        return out

    def _choice_tops_list(req, k):
        """Chat format: per-token LIST of {token, token_id, logprob}
        (no string-collision collapse, unlike the completions dict)."""
        tops = req.output_top_logprobs
        if req.final_ids_len is not None:
            tops = tops[:req.final_ids_len]
        return [[{"token": (tokenizer.decode([int(t)]) if tokenizer
                            else str(int(t))),
                  "token_id": int(t), "logprob": lp}
                 for t, lp in alts[:k]] for alts in tops]

    def _want_topk(body):
        """Requested top-k alternatives count (0 = none), validated
        against the engine's configured capacity."""
        lp = body.get("logprobs")
        k = 0
        if isinstance(lp, (int, float)) and not isinstance(lp, bool):
            k = int(lp)                       # completions: logprobs=N
        if body.get("top_logprobs") is not None:
            k = int(body["top_logprobs"])     # chat: top_logprobs=N
        if k < 0:
            raise ValueError("'logprobs'/'top_logprobs' must be >= 0")
        cap = getattr(engine, "topk_lp", 0)
        if k > cap:
            raise ValueError(
                f"top_logprobs={k} exceeds the engine's configured "
                f"capacity {cap} (set EngineConfig.top_logprobs)")
        return k

    async def _fanout(prompt_ids, sampling, n, lora=None):
        """n parallel samples of one prompt (prefix-cache shares pages)."""
        import dataclasses as _dc

        loop = asyncio.get_running_loop()
        done: asyncio.Queue = asyncio.Queue()
        reqs = []

        def on_tokens(req, ids, finished):
            if finished:
                loop.call_soon_threadsafe(done.put_nowait, req)

        try:
            for i in range(n):
                # per-choice seeds: with a fixed user seed, identical
                # rows would otherwise draw identical samples
                s_i = sampling if sampling.seed is None else _dc.replace(
                    sampling, seed=sampling.seed + i)
                reqs.append(await loop.run_in_executor(
                    None, worker.submit, list(prompt_ids), s_i,
                    on_tokens, lora))
            for _ in range(n):
                await done.get()
        except asyncio.CancelledError:
            # client disconnect mid-fanout: reclaim every live member
            for r in reqs:
                await asyncio.shield(
                    loop.run_in_executor(None, worker.cancel, r))
            raise
        return reqs

    async def completions(request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"},
                                     status=400)
        prompt = body.get("prompt")
        if prompt is None:
            return web.json_response({"error": "missing 'prompt'"},
                                     status=400)
        if isinstance(prompt, list):
            prompt_ids = prompt
        else:
            if tokenizer is None:
                return web.json_response(
                    {"error": "server has no tokenizer; send token ids"},
                    status=400)
            prompt_ids = tokenizer.encode(prompt)
        try:
            sampling = _sampling_from(body, tokenizer)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        stream = bool(body.get("stream", False))
        lora = _lora_from(body)
        n = max(int(body.get("n", 1)), 1)
        best_of = max(int(body.get("best_of", n)), n)
        if stream and (n > 1 or best_of > 1):
            return web.json_response(
                {"error": "stream=true requires n == best_of == 1"},
                status=400)

        if stream:
            return await _run_one(prompt_ids, sampling, request, True,
                                  "cmpl", chat=False, lora=lora)
        if best_of == 1:
            reqs = [await _run_one(prompt_ids, sampling, request, False,
                                   "cmpl", chat=False, lora=lora)]
        else:
            # best_of > n: sample best_of candidates, return the n with
            # the highest mean token logprob (OpenAI semantics)
            reqs = await _fanout(prompt_ids, sampling, best_of, lora=lora)
        errs = [r.error for r in reqs if r.error]
        if errs:
            status = 429 if _capacity_error(errs[0]) else 400
            return web.json_response({"error": errs[0]}, status=status)
        if best_of > n:
            def _score(r):
                lp = _choice_logprobs(r)
                return sum(lp) / max(len(lp), 1)
            reqs = sorted(reqs, key=_score, reverse=True)[:n]
        want_lp = bool(body.get("logprobs"))
        try:
            want_k = _want_topk(body)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        echo = (tokenizer.decode(prompt_ids)
                if body.get("echo") and tokenizer else "")
        return web.json_response({
            "id": f"cmpl-{reqs[0].req_id}",
            "object": "text_completion",
            "created": int(time.time()),
            "model": model_id,
            "choices": [{
                "index": i,
                "text": echo + (_choice_text(r) or ""),
                "token_ids": _choice_ids(r),
                **({"logprobs":
                    {"token_logprobs": _choice_logprobs(r),
                     **({"top_logprobs": _choice_tops(r, want_k)}
                        if want_k else {})}}
                   if want_lp else {}),
                "finish_reason": _finish_reason(r, sampling),
            } for i, r in enumerate(reqs)],
            "usage": {"prompt_tokens": len(reqs[0].prompt_ids),
                      "completion_tokens":
                      sum(r.num_generated for r in reqs)},
            "ttft_ms": round((reqs[0].ttft or 0) * 1e3, 1),
        })

    async def chat_completions(request):
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid JSON body"},
                                     status=400)
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            return web.json_response({"error": "missing 'messages'"},
                                     status=400)
        if tokenizer is None:
            return web.json_response(
                {"error": "server has no tokenizer"}, status=400)
        prompt = render_chat(messages, chat_template)
        prompt_ids = tokenizer.encode(prompt)
        try:
            sampling = _sampling_from(body, tokenizer)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        stream = bool(body.get("stream", False))
        lora = _lora_from(body)
        try:
            want_k = _want_topk(body)
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        n = max(int(body.get("n", 1)), 1)
        if stream and n > 1:
            return web.json_response(
                {"error": "stream=true requires n == 1"}, status=400)

        if stream:
            return await _run_one(prompt_ids, sampling, request, True,
                                  "chatcmpl", chat=True, lora=lora)
        if n == 1:
            reqs = [await _run_one(prompt_ids, sampling, request, False,
                                   "chatcmpl", chat=True, lora=lora)]
        else:
            reqs = await _fanout(prompt_ids, sampling, n, lora=lora)
        errs = [r.error for r in reqs if r.error]
        if errs:
            status = 429 if _capacity_error(errs[0]) else 400
            return web.json_response({"error": errs[0]}, status=status)
        return web.json_response({
            "id": f"chatcmpl-{reqs[0].req_id}",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": model_id,
            "choices": [{
                "index": i,
                "message": {"role": "assistant",
                            "content": _choice_text(r)},
                **({"logprobs": {"content": [
                    {"token_id": t, "logprob": lp,
                     **({"top_logprobs": alts} if want_k else {})}
                    for t, lp, alts in zip(
                        _choice_ids(r), _choice_logprobs(r),
                        (_choice_tops_list(r, want_k) if want_k
                         else [[]] * len(_choice_ids(r))))]}}
                   if body.get("logprobs") else {}),
                "finish_reason": _finish_reason(r, sampling),
            } for i, r in enumerate(reqs)],
            "usage": {"prompt_tokens": len(reqs[0].prompt_ids),
                      "completion_tokens":
                      sum(r.num_generated for r in reqs)},
        })

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/metrics.json", metrics_json)
    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app["worker"] = worker

    async def on_cleanup(app):
        app["worker"].shutdown()

    app.on_cleanup.append(on_cleanup)
    return app


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 8000,
          tokenizer=None, model_id: str = "local",
          chat_template: Optional[str] = None):
    from aiohttp import web

    app = build_app(engine, tokenizer, model_id=model_id,
                    chat_template=chat_template)
    web.run_app(app, host=host, port=port)
