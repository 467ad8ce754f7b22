"""Stop-string tests: matcher unit tests + engine/server end-to-end.

The reference has NO stop handling — decode runs unconditionally to
max_length (`/root/reference/source/model/model.cpp:157`). This suite
covers the successor's OpenAI-style stop strings: exact char-level
truncation even when the stop string straddles token boundaries, and
streaming holdback (no token whose text could be part of a stop match
is streamed before it is provably safe).
"""

import asyncio
import json

import jax
import pytest

pytestmark = pytest.mark.slow  # server + engine stop-string e2e

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.engine.stop import StopStringMatcher
from simplellminference_tpu.models import llama
from simplellminference_tpu.tokenizer import ByteTokenizer


class PairTokenizer:
    """Toy tokenizer: each id decodes to a fixed 2-char string."""

    VOCAB = ["ab", "cd", "ef", "gh"]

    def decode(self, ids):
        return "".join(self.VOCAB[i] for i in ids)

    def encode(self, text, add_bos=True):  # pragma: no cover
        raise NotImplementedError

    vocab_size = 4
    bos_id = -1
    eos_id = -1


# ---------------- matcher unit tests ----------------


def test_matcher_straddling_match_truncates_mid_token():
    m = StopStringMatcher(PairTokenizer(), ("bc",))
    # token 0 -> "ab": 'b' could start "bc", so it must be HELD
    assert not m.push(0)
    assert m.release(finished=False) == []
    # token 1 -> "cd": text "abcd" contains "bc" at index 1
    assert m.push(1)
    assert m.final_text == "a"
    assert m.release(finished=True) == []     # held tokens swallowed
    assert m.tail_text() == "a"               # exact remaining text


def test_matcher_releases_safe_tokens_and_flushes_at_finish():
    m = StopStringMatcher(PairTokenizer(), ("XY",))
    assert not m.push(0)
    assert m.release(finished=False) == [0]   # "ab" cannot match "XY"
    assert not m.push(1)
    assert not m.push(2)
    assert m.release(finished=True) == [1, 2]
    assert m.tail_text() == ""


def test_matcher_holdback_on_partial_prefix():
    # stop "cdef": after "abcd" the suffix "cd" is a live prefix -> token
    # 1 held; after "ef" completes the match mid-stream
    m = StopStringMatcher(PairTokenizer(), ("cdef",))
    assert not m.push(0)
    assert m.release(finished=False) == [0]
    assert not m.push(1)
    assert m.release(finished=False) == []    # "cd" held back
    assert m.push(2)                          # "abcdef" matches at 2
    assert m.final_text == "ab"
    assert m.release(finished=False) == []
    assert m.tail_text() == ""                # "ab" already released


def test_matcher_earliest_of_multiple_stops_wins():
    m = StopStringMatcher(PairTokenizer(), ("ef", "cd"))
    m.push(0)
    assert m.push(1)                          # "cd" at index 2
    assert m.final_text == "ab"


# ---------------- engine end-to-end ----------------


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny_test(vocab_size=258)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, **kw):
    ecfg = EngineConfig(
        max_batch_size=2,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    return Engine(cfg, params, ecfg, tokenizer=ByteTokenizer(),
                  decode_burst=4, **kw)


def _greedy_text(cfg, params, prompt_ids, max_new=24):
    eng = make_engine(cfg, params)
    req = eng.add_request(prompt_ids=prompt_ids,
                          sampling=SamplingParams(max_new_tokens=max_new))
    eng.run()
    return ByteTokenizer().decode(req.output_ids), req.output_ids


def test_engine_stop_string_truncates_exactly(model):
    cfg, params = model
    prompt = [1, 2, 3, 4, 5]
    full, _ = _greedy_text(cfg, params, prompt)
    assert len(full) >= 4, "tiny model produced too little text to test"
    # choose a stop string that starts mid-output
    stop = full[2:4]
    cut = full.find(stop)
    eng = make_engine(cfg, params)
    emitted = []

    def on_tokens(req, ids, finished):
        emitted.extend(ids)

    req = eng.add_request(
        prompt_ids=prompt,
        sampling=SamplingParams(max_new_tokens=24, stop_strings=(stop,)),
        on_tokens=on_tokens)
    eng.run()
    assert req.final_text == full[:cut]
    assert stop not in req.final_text
    # streamed ids must decode (via the same streaming detokenizer the
    # server uses — raw decode() would render held-back partial UTF-8
    # immediately) to a prefix of the truncated text
    from simplellminference_tpu.tokenizer.base import StreamingDetokenizer
    d = StreamingDetokenizer(ByteTokenizer())
    streamed = "".join(d.push(t) for t in emitted)
    assert req.final_text.startswith(streamed)
    # generation actually stopped early
    assert req.num_generated < 24 or len(req.final_text) < len(full)


def test_engine_stop_string_absent_releases_everything(model):
    cfg, params = model
    prompt = [7, 8, 9]
    full, ids = _greedy_text(cfg, params, prompt)
    eng = make_engine(cfg, params)
    emitted = []
    req = eng.add_request(
        prompt_ids=prompt,
        sampling=SamplingParams(max_new_tokens=24,
                                stop_strings=("\x00NEVER\x00",)),
        on_tokens=lambda r, i, f: emitted.extend(i))
    eng.run()
    assert req.final_text is None
    assert req.output_ids == ids
    assert emitted == ids  # holdback fully flushed at finish


def test_engine_stop_strings_require_tokenizer(model):
    cfg, params = model
    ecfg = EngineConfig(
        max_batch_size=2,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)  # no tokenizer
    req = eng.add_request(prompt_ids=[1, 2],
                          sampling=SamplingParams(stop_strings=("x",)))
    assert req.error is not None and "tokenizer" in req.error


# ---------------- server end-to-end ----------------


aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from simplellminference_tpu.server import build_app  # noqa: E402


def make_app(cfg, params):
    return build_app(make_engine(cfg, params), tokenizer=ByteTokenizer())


def run_with_client(app, coro_fn):
    async def runner():
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)
    return asyncio.run(runner())


def test_server_stop_param(model):
    cfg, params = model
    full, _ = _greedy_text(cfg, params, [1, 2, 3, 4, 5])
    stop = full[2:4]
    cut = full.find(stop)

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3, 4, 5], "max_tokens": 24, "stop": stop})
        assert r.status == 200
        body = await r.json()
        choice = body["choices"][0]
        assert choice["text"] == full[:cut]
        assert choice["finish_reason"] == "stop"

    run_with_client(make_app(cfg, params), go)


def test_server_stop_streaming_deltas_reassemble(model):
    cfg, params = model
    full, _ = _greedy_text(cfg, params, [1, 2, 3, 4, 5])
    stop = full[2:4]
    cut = full.find(stop)

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3, 4, 5], "max_tokens": 24,
            "stop": [stop], "stream": True})
        assert r.status == 200
        text = ""
        async for line in r.content:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            payload = json.loads(line[len("data: "):])
            text += payload["text"]
        assert text == full[:cut]

    run_with_client(make_app(cfg, params), go)


# ---------------- round-3 advisor findings ----------------


def test_matcher_holds_tokens_behind_partial_utf8(model):
    """A stop string beginning with a multi-byte char that straddles
    tokens: the token carrying the first byte must NOT be released —
    a later match would otherwise exclude content that already streamed
    (and released token ids would contain stop-string bytes)."""
    tok = ByteTokenizer()                 # token id == raw byte value
    b1, b2 = "é".encode("utf-8")          # 0xc3, 0xa9
    m = StopStringMatcher(tok, ("é",))
    a_id = ord("a")
    assert not m.push(a_id)
    assert m.release(finished=False) == [a_id]
    # first byte of é: detokenizer holds it back as a partial sequence
    assert not m.push(b1)
    assert m.release(finished=False) == []   # byte token must be held
    assert m.push(b2)                        # é completes -> match
    assert m.final_text == "a"
    assert m.released_count() == 1           # only the 'a' token
    assert m.release(finished=True) == []


def test_server_nonstream_token_ids_truncated_at_stop(model):
    """Non-stream responses must not leak stop-string content through
    token_ids/logprobs (they are truncated to the released prefix)."""
    cfg, params = model
    full, _ = _greedy_text(cfg, params, [1, 2, 3, 4, 5])
    stop = full[2:4]
    cut = full.find(stop)

    async def go(client):
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3, 4, 5], "max_tokens": 24, "stop": stop,
            "logprobs": True})
        assert r.status == 200
        body = await r.json()
        choice = body["choices"][0]
        assert choice["text"] == full[:cut]
        ids = choice["token_ids"]
        # the returned ids decode to a prefix of the truncated text
        from simplellminference_tpu.tokenizer.base import (
            StreamingDetokenizer)
        d = StreamingDetokenizer(ByteTokenizer())
        decoded = "".join(d.push(t) for t in ids)
        assert choice["text"].startswith(decoded)
        assert stop not in decoded
        assert len(choice["logprobs"]["token_logprobs"]) == len(ids)

    run_with_client(make_app(cfg, params), go)


def test_server_bad_stop_type_is_400(model):
    cfg, params = model

    async def go(client):
        for bad in (5, {"x": 1}, [1, 2], ["ok", 3]):
            r = await client.post("/v1/completions", json={
                "prompt": [1, 2, 3], "max_tokens": 4, "stop": bad})
            assert r.status == 400, f"stop={bad!r} -> {r.status}"
            body = await r.json()
            assert "stop" in body["error"]

    run_with_client(make_app(cfg, params), go)
