"""aiohttp server exposing the engine: /v1/completions (+SSE streaming),
/health, /metrics.

Capability the reference has no analog for (it is a library with a
gitignored demo binary, SURVEY.md §2.11). The engine runs on a dedicated
thread (JAX dispatch is blocking); request handlers talk to it through
thread-safe queues and receive tokens via per-request asyncio queues.
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

    def submit(self, prompt_ids, sampling: SamplingParams, on_tokens):
        with self._lock:
            req = self.engine.add_request(prompt_ids=prompt_ids,
                                          sampling=sampling,
                                          on_tokens=on_tokens)
        self._wake.set()
        return req

    def shutdown(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)


def build_app(engine: Engine, tokenizer=None):
    from aiohttp import web

    worker = EngineWorker(engine)
    tokenizer = tokenizer or engine.tokenizer

    async def health(_request):
        return web.json_response({"status": "ok"})

    async def metrics(_request):
        return web.json_response(engine.metrics.summary())

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
        sampling = SamplingParams(
            max_new_tokens=int(body.get("max_tokens", 128)),
            temperature=float(body.get("temperature", 0.0)),
            top_k=int(body.get("top_k", 0)),
            top_p=float(body.get("top_p", 1.0)),
            seed=int(body.get("seed", 0)),
            stop_token_ids=tuple(body.get("stop_token_ids", ())) or
            ((tokenizer.eos_id,) if tokenizer and tokenizer.eos_id >= 0
             else ()),
        )
        stream = bool(body.get("stream", False))

        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()

        def on_tokens(req, ids, finished):
            loop.call_soon_threadsafe(q.put_nowait, (list(ids), finished))

        req = worker.submit(prompt_ids, sampling, on_tokens)
        detok = StreamingDetokenizer(tokenizer) if tokenizer else None

        if stream:
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream",
                         "Cache-Control": "no-cache"})
            await resp.prepare(request)
            while True:
                ids, finished = await q.get()
                text = "".join(detok.push(t) for t in ids) if detok else ""
                if finished and detok:
                    text += detok.flush()
                payload = {"token_ids": ids, "text": text,
                           "finished": finished}
                if finished and req.error:
                    payload["error"] = req.error
                await resp.write(
                    f"data: {json.dumps(payload)}\n\n".encode())
                if finished:
                    break
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        while True:
            _ids, finished = await q.get()
            if finished:
                break
        if req.error:
            return web.json_response({"error": req.error}, status=400)
        text = tokenizer.decode(req.output_ids) if tokenizer else None
        return web.json_response({
            "id": f"cmpl-{req.req_id}",
            "object": "text_completion",
            "created": int(time.time()),
            "choices": [{"text": text, "token_ids": req.output_ids,
                         "finish_reason": "stop"
                         if req.num_generated < sampling.max_new_tokens
                         else "length"}],
            "usage": {"prompt_tokens": len(req.prompt_ids),
                      "completion_tokens": req.num_generated},
            "ttft_ms": round((req.ttft or 0) * 1e3, 1),
        })

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/v1/completions", completions)
    app["worker"] = worker

    async def on_cleanup(app):
        app["worker"].shutdown()

    app.on_cleanup.append(on_cleanup)
    return app


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 8000,
          tokenizer=None):
    from aiohttp import web

    app = build_app(engine, tokenizer)
    web.run_app(app, host=host, port=port)
