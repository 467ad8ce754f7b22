"""HTTP server tests: completions (sync + SSE streaming), health, metrics.

No pytest-asyncio in this image — each test runs its coroutine via
asyncio.run.
"""

import asyncio
import json

import jax
import pytest

pytestmark = pytest.mark.slow  # aiohttp server e2e

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.models import llama
from simplellminference_tpu.server import build_app
from simplellminference_tpu.tokenizer import ByteTokenizer


def make_app():
    cfg = ModelConfig.tiny_test(vocab_size=258)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2,
                        kv=KVCacheConfig(page_size=8, num_pages=64,
                                         max_pages_per_seq=24,
                                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, tokenizer=ByteTokenizer(),
                 decode_burst=4)
    return build_app(eng, tokenizer=ByteTokenizer())


def run_with_client(coro_fn):
    async def runner():
        async with TestClient(TestServer(make_app())) as client:
            return await coro_fn(client)
    return asyncio.run(runner())


def test_health_and_metrics():
    async def go(client):
        r = await client.get("/health")
        assert r.status == 200
        assert (await r.json())["status"] == "ok"
        # /metrics is Prometheus text exposition (scrape format)
        r = await client.get("/metrics")
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        assert "version=0.0.4" in r.headers["Content-Type"]
        text = await r.text()
        assert "# TYPE slli_tokens_generated_total counter" in text
        assert "# TYPE slli_ttft_seconds histogram" in text
        assert 'slli_ttft_seconds_bucket{le="+Inf"}' in text
        assert "slli_kv_pages_total 64" in text
        # JSON summary moved to /metrics.json
        r = await client.get("/metrics.json")
        assert r.status == 200
        assert "tokens_per_sec" in await r.json()
    run_with_client(go)


def test_completion_roundtrip():
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hi", "max_tokens": 6})
        assert r.status == 200
        body = await r.json()
        assert len(body["choices"][0]["token_ids"]) <= 6
        assert body["usage"]["completion_tokens"] > 0
        assert body["ttft_ms"] > 0
    run_with_client(go)


def test_completion_token_ids_prompt():
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3], "max_tokens": 4})
        body = await r.json()
        assert len(body["choices"][0]["token_ids"]) == 4
    run_with_client(go)


def test_streaming_sse():
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "abc", "max_tokens": 5, "stream": True})
        assert r.status == 200
        events = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                events.append(json.loads(line[6:]))
            if line == "data: [DONE]":
                break
        assert events and events[-1]["finished"]
        total = sum(len(e["token_ids"]) for e in events)
        assert 0 < total <= 5
    run_with_client(go)


def test_bad_requests():
    async def go(client):
        r = await client.post("/v1/completions", data=b"not json")
        assert r.status == 400
        r = await client.post("/v1/completions", json={"max_tokens": 3})
        assert r.status == 400
    run_with_client(go)


def test_concurrent_requests():
    async def go(client):
        async def one(p):
            r = await client.post("/v1/completions",
                                  json={"prompt": p, "max_tokens": 5})
            return await r.json()
        results = await asyncio.gather(*[one(f"req {i}") for i in range(5)])
        assert all(len(b["choices"][0]["token_ids"]) == 5 for b in results)
    run_with_client(go)


def test_models_and_chat_completions():
    async def go(client):
        r = await client.get("/v1/models")
        assert r.status == 200
        assert (await r.json())["data"][0]["object"] == "model"

        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "system", "content": "hi"},
                         {"role": "user", "content": "abc"}],
            "max_tokens": 6,
        })
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"
        assert isinstance(data["choices"][0]["message"]["content"], str)
    run_with_client(go)


def test_completions_parallel_n():
    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "xy", "max_tokens": 5, "n": 3, "temperature": 0.9,
            "top_k": 50,
        })
        assert r.status == 200
        data = await r.json()
        assert len(data["choices"]) == 3
        assert {c["index"] for c in data["choices"]} == {0, 1, 2}
        # stochastic parallel samples should not all collapse together
        texts = [tuple(c["token_ids"]) for c in data["choices"]]
        assert len(set(texts)) >= 2
    run_with_client(go)


def test_render_chat_fallback_and_jinja():
    from simplellminference_tpu.tokenizer.chat import render_chat

    msgs = [{"role": "user", "content": "hello"}]
    out = render_chat(msgs, None)
    assert "hello" in out and out.endswith("assistant\n")

    tpl = ("{% for m in messages %}[{{ m.role }}]: {{ m.content }}\n"
           "{% endfor %}{% if add_generation_prompt %}[assistant]:"
           "{% endif %}")
    out = render_chat(msgs, tpl)
    assert out == "[user]: hello\n[assistant]:"


def test_completions_echo_and_best_of():
    """`echo` prefixes the prompt text; `best_of` samples extra
    candidates and returns the n with the highest mean logprob."""

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": [65, 66, 67], "max_tokens": 4, "echo": True})
        assert r.status == 200
        body = await r.json()
        assert body["choices"][0]["text"].startswith("ABC")

        r = await client.post("/v1/completions", json={
            "prompt": [65, 66, 67], "max_tokens": 6, "n": 2,
            "best_of": 4, "temperature": 0.9, "seed": 3,
            "logprobs": True})
        assert r.status == 200
        body = await r.json()
        assert len(body["choices"]) == 2
        # returned choices are sorted best-first by mean logprob
        def mean_lp(c):
            lp = c["logprobs"]["token_logprobs"]
            return sum(lp) / max(len(lp), 1)
        assert mean_lp(body["choices"][0]) >= mean_lp(body["choices"][1])

        # streaming with best_of > 1 is a client error
        r = await client.post("/v1/completions", json={
            "prompt": [65], "best_of": 2, "stream": True})
        assert r.status == 400

    run_with_client(go)


def test_guided_decoding_api():
    """vLLM-style guided_* extensions and OpenAI response_format."""

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "pick", "max_tokens": 16,
            "guided_choice": ["alpha", "beta"]})
        assert r.status == 200
        body = await r.json()
        assert body["choices"][0]["text"] in ("alpha", "beta")

        r = await client.post("/v1/completions", json={
            "prompt": "num", "max_tokens": 12,
            "guided_regex": "[0-9]{2,4}"})
        assert r.status == 200
        t = (await r.json())["choices"][0]["text"]
        assert t.isdigit() and 2 <= len(t) <= 4

        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "json please"}],
            "max_tokens": 48,
            "response_format": {"type": "json_schema", "json_schema": {
                "name": "t", "schema": {
                    "type": "object",
                    "properties": {"n": {"enum": [1, 2, 3]},
                                   "ok": {"type": "boolean"}},
                    "required": ["n", "ok"]}}}})
        assert r.status == 200
        body = await r.json()
        doc = json.loads(body["choices"][0]["message"]["content"])
        assert doc["n"] in (1, 2, 3) and isinstance(doc["ok"], bool)

        # client errors surface as 400s, not 500s
        r = await client.post("/v1/completions", json={
            "prompt": "x", "guided_regex": "(a"})
        assert r.status == 400
        r = await client.post("/v1/completions", json={
            "prompt": "x", "guided_regex": "a",
            "guided_choice": ["b"]})
        assert r.status == 400
        r = await client.post("/v1/completions", json={
            "prompt": "x", "response_format": {"type": "bogus"}})
        assert r.status == 400

    run_with_client(go)


def test_top_logprobs_api():
    """OpenAI logprobs=N (completions) / top_logprobs=N (chat)."""
    from simplellminference_tpu.core.config import EngineConfig, KVCacheConfig
    from simplellminference_tpu.engine import Engine
    from simplellminference_tpu.models import llama as llama_mod
    from simplellminference_tpu.core.config import ModelConfig

    cfg = ModelConfig.tiny_test(vocab_size=258)
    params = llama_mod.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, top_logprobs=3,
                        kv=KVCacheConfig(page_size=8, num_pages=64,
                                         max_pages_per_seq=24,
                                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, tokenizer=ByteTokenizer(),
                 decode_burst=4)
    app = build_app(eng, tokenizer=ByteTokenizer())

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hi", "max_tokens": 4, "logprobs": 2})
        assert r.status == 200
        ch = (await r.json())["choices"][0]
        tops = ch["logprobs"]["top_logprobs"]
        assert len(tops) == len(ch["token_ids"])
        for row in tops:
            # dict keyed by token STRING (OpenAI format): distinct ids
            # may collide on their text (byte-fallback tokens)
            assert 1 <= len(row) <= 2
            assert max(row.values()) <= 0.0 + 1e-6

        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hey"}],
            "max_tokens": 3, "logprobs": True, "top_logprobs": 3})
        assert r.status == 200
        content = (await r.json())["choices"][0]["logprobs"]["content"]
        assert all(len(e["top_logprobs"]) == 3 for e in content)

        # exceeding engine capacity is a client error
        r = await client.post("/v1/completions", json={
            "prompt": "hi", "max_tokens": 2, "logprobs": 9})
        assert r.status == 400

    async def runner():
        async with TestClient(TestServer(app)) as client:
            return await go(client)
    asyncio.run(runner())
