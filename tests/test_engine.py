"""Continuous-batching engine tests (CPU, tiny model — SURVEY.md §4.5).

Greedy parity vs the dense-cache Generator is the core invariant: the
engine's paged, bursted, slot-scheduled decode must produce exactly the
tokens the simple path produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine, RequestState
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime.generator import Generator


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, max_batch=4, num_pages=64, page_size=8,
                burst=4, max_pages_per_seq=16):
    ecfg = EngineConfig(
        max_batch_size=max_batch,
        kv=KVCacheConfig(page_size=page_size, num_pages=num_pages,
                         max_pages_per_seq=max_pages_per_seq,
                         kv_dtype="f32"))
    return Engine(cfg, params, ecfg, decode_burst=burst)


def dense_reference(cfg, params, prompts, max_new):
    gen = Generator(cfg, params, max_batch=len(prompts), max_seq=128,
                    kv_dtype=jnp.float32)
    return gen.generate(prompts,
                        SamplingParams(max_new_tokens=max_new)).token_ids


def test_engine_greedy_matches_dense(model):
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [42, 43, 44, 45, 46, 47, 48]]
    want = dense_reference(cfg, params, prompts, 10)
    eng = make_engine(cfg, params)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=10))
    assert got == want
    m = eng.metrics.summary()
    assert m["requests_finished"] == 3
    assert m["tokens_generated"] == 30
    assert m["ttft_p50_s"] is not None


def test_engine_more_requests_than_slots(model):
    cfg, params = model
    prompts = [[i + 1, i + 2, i + 3] for i in range(7)]
    want = dense_reference(cfg, params, prompts, 6)
    eng = make_engine(cfg, params, max_batch=2)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=6))
    assert got == want
    assert eng.metrics.requests_finished == 7


def test_engine_stop_tokens(model):
    cfg, params = model
    prompts = [[1, 2, 3]]
    ref = dense_reference(cfg, params, prompts, 12)[0]
    stop = ref[4]  # stop at the 5th generated token
    eng = make_engine(cfg, params)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=12,
                                               stop_token_ids=(stop,)))
    assert got[0] == ref[:4]


def test_engine_preemption_under_page_pressure(model):
    cfg, params = model
    # tiny pool: 9 pages x 8 tokens; 3 requests growing to 28 tokens each
    # (peak demand 4 pages each = 12 > 9) force preemption, but everything
    # must still complete correctly.
    prompts = [[1, 2, 3, 4], [9, 8, 7, 6], [20, 21, 22, 23]]
    want = dense_reference(cfg, params, prompts, 24)
    eng = make_engine(cfg, params, max_batch=3, num_pages=9, page_size=8,
                      burst=4)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=24))
    assert got == want
    assert eng.metrics.preemptions > 0
    assert eng.metrics.requests_finished == 3


def test_engine_request_too_large_fails_cleanly(model):
    cfg, params = model
    eng = make_engine(cfg, params, num_pages=8, page_size=8,
                      max_pages_per_seq=4)  # capacity 32 tokens
    req = eng.add_request(prompt_ids=list(range(1, 30)),
                          sampling=SamplingParams(max_new_tokens=10))
    assert req.state == RequestState.FAILED
    assert "exceeds capacity" in req.error
    # engine still serves normal requests afterwards
    got = eng.generate([[1, 2, 3]], SamplingParams(max_new_tokens=4))
    assert len(got[0]) == 4


def test_engine_streaming_callback(model):
    cfg, params = model
    eng = make_engine(cfg, params)
    chunks = []
    req = eng.add_request(
        prompt_ids=[1, 2, 3],
        sampling=SamplingParams(max_new_tokens=7),
        on_tokens=lambda r, ids, fin: chunks.append((list(ids), fin)))
    eng.run()
    toks = [t for ids, _ in chunks for t in ids]
    assert toks == req.output_ids
    assert chunks[-1][1] is True  # finished flag on last emit
    assert req.ttft is not None


def test_engine_mixed_sampling_params(model):
    cfg, params = model
    eng = make_engine(cfg, params)
    r_greedy = eng.add_request(prompt_ids=[1, 2, 3],
                               sampling=SamplingParams(max_new_tokens=8))
    r_sampled = eng.add_request(
        prompt_ids=[1, 2, 3],
        sampling=SamplingParams(max_new_tokens=8, temperature=1.5,
                                top_k=20))
    eng.run()
    want = dense_reference(cfg, params, [[1, 2, 3]], 8)[0]
    assert r_greedy.output_ids == want       # greedy row unaffected
    assert len(r_sampled.output_ids) == 8


def test_engine_chunked_prefill_matches_whole(model):
    """Chunked prefill (chunk < prompt) produces the same greedy tokens as
    whole-prompt prefill — the chunk path writes page-aligned chunks and
    attends through the gathered cache."""
    cfg, params = model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, cfg.vocab_size, 70).tolist(),
               rng.integers(1, cfg.vocab_size, 33).tolist()]
    whole = make_engine(cfg, params).generate(
        prompts, SamplingParams(max_new_tokens=8))

    ecfg = EngineConfig(
        max_batch_size=4, prefill_chunk=32,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    chunked = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    assert chunked == whole


def test_engine_prefix_cache_matches_uncached(model):
    """Identical prompt prefixes share pages: a request admitted while a
    same-prompt request runs prefills only the suffix, and greedy outputs
    match the uncached run exactly (f32)."""
    cfg, params = model
    rng = np.random.default_rng(3)
    base = rng.integers(1, cfg.vocab_size, 40).tolist()
    prompts = [base, list(base), base[:24] + [7, 8, 9]]

    # uncached reference: one request at a time (nothing running to share)
    want = []
    for p in prompts:
        eng = make_engine(cfg, params)
        want.append(eng.generate([p], SamplingParams(max_new_tokens=8))[0])

    eng = make_engine(cfg, params)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    assert got == want
    m = eng.metrics
    # req 1 shares base's full-page prefix (40 -> 5 pages of 8 = 40, capped
    # at 39 -> 32 tokens); req 2 shares 24 tokens
    assert m.prefix_cache_hits == 2
    assert m.prompt_tokens_cached == 32 + 24


def test_engine_prefix_cache_survives_source_finish(model):
    """Shared pages stay valid (refcounted) after the source finishes."""
    cfg, params = model
    rng = np.random.default_rng(4)
    base = rng.integers(1, cfg.vocab_size, 32).tolist()

    solo = make_engine(cfg, params).generate(
        [base], SamplingParams(max_new_tokens=12))[0]

    eng = make_engine(cfg, params, max_batch=2)
    r1 = eng.add_request(prompt_ids=base,
                         sampling=SamplingParams(max_new_tokens=2))
    r2 = eng.add_request(prompt_ids=list(base),
                         sampling=SamplingParams(max_new_tokens=12))
    eng.run()
    assert r1.output_ids == solo[:2]
    assert r2.output_ids == solo
    assert eng.metrics.prefix_cache_hits == 1


def test_engine_repetition_penalty_consistent_across_bursts(model):
    """Penalty state (token counts) carries correctly through the burst
    pipeline and admit overrides: different burst sizes must produce
    IDENTICAL greedy-with-penalty outputs, and the penalty must change
    the output vs the neutral run."""
    cfg, params = model
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, cfg.vocab_size, n).tolist()
               for n in (9, 21, 5)]
    sp = SamplingParams(max_new_tokens=12, repetition_penalty=1.8,
                        frequency_penalty=0.2)
    outs = {}
    for burst in (1, 4, 7):
        eng = make_engine(cfg, params, burst=burst)
        outs[burst] = eng.generate(prompts, sp)
    assert outs[1] == outs[4] == outs[7]

    neutral = make_engine(cfg, params).generate(
        prompts, SamplingParams(max_new_tokens=12))
    assert outs[4] != neutral


def test_engine_speculative_matches_greedy(model):
    """Prompt-lookup speculative decoding: greedy outputs EQUAL the
    non-speculative engine exactly (f32), and drafts get accepted on
    repetitive prompts."""
    cfg, params = model
    rng = np.random.default_rng(5)
    prompts = [([5, 6, 7, 8] * 6)[:20],
               rng.integers(1, cfg.vocab_size, 13).tolist(),
               [9, 1, 2, 3, 9, 1, 2, 3, 9, 1, 2, 3]]

    def mk(spec):
        ecfg = EngineConfig(
            max_batch_size=4, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=64,
                             max_pages_per_seq=24, kv_dtype="f32"))
        return Engine(cfg, params, ecfg, decode_burst=3)

    base = mk(0).generate(prompts, SamplingParams(max_new_tokens=24))
    eng = mk(3)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=24))
    assert got == base
    m = eng.metrics
    assert m.spec_steps > 0 and m.spec_accepted > 0


def test_engine_speculative_with_sampling_and_stops(model):
    """Stochastic rows inside a speculative batch emit correct-length
    outputs via rejection sampling; stop tokens truncate mid-span."""
    cfg, params = model
    prompts = [[5, 6, 7, 8] * 5, [1, 2, 3]]

    def mk(spec):
        ecfg = EngineConfig(
            max_batch_size=4, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=64,
                             max_pages_per_seq=24, kv_dtype="f32"))
        return Engine(cfg, params, ecfg, decode_burst=3)

    base = mk(0).generate([prompts[0]], SamplingParams(max_new_tokens=16))
    stop = base[0][7]
    eng = mk(3)
    r1 = eng.add_request(prompt_ids=prompts[0], sampling=SamplingParams(
        max_new_tokens=16, stop_token_ids=(stop,)))
    r2 = eng.add_request(prompt_ids=prompts[1], sampling=SamplingParams(
        max_new_tokens=10, temperature=0.9, top_k=20))
    eng.run()
    assert r1.output_ids == base[0][:7]
    assert len(r2.output_ids) == 10


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
@pytest.mark.slow  # shard_map TP engine compile
def test_engine_tensor_parallel_matches_single(model):
    """TP-sharded paged engine (shard_map, pools sharded on kv heads)
    produces the same greedy tokens as the single-device engine."""
    cfg, params = model
    # model fixture heads must divide the mesh; build a TP-friendly cfg
    tcfg = ModelConfig(vocab_size=cfg.vocab_size, hidden_size=64,
                       intermediate_size=128, num_layers=2, num_heads=8,
                       num_kv_heads=4, head_dim=8, max_seq_len=256,
                       dtype="float32")
    tparams = llama.init_params(tcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, tcfg.vocab_size, n).tolist()
               for n in (5, 23, 40)]

    def mk(mesh_shape, spec=0):
        ecfg = EngineConfig(
            max_batch_size=4, mesh_shape=mesh_shape, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=64,
                             max_pages_per_seq=16, kv_dtype="f32"))
        return Engine(tcfg, tparams, ecfg, decode_burst=3)

    base = mk(None).generate(prompts, SamplingParams(max_new_tokens=12))
    tp = mk({"model": 4}).generate(prompts, SamplingParams(max_new_tokens=12))
    assert tp == base
    # TP + speculative decoding compose
    tps = mk({"model": 4}, spec=3)
    got = tps.generate(prompts, SamplingParams(max_new_tokens=12))
    assert got == base
    assert tps.metrics.spec_steps > 0


def test_engine_cancel_and_backpressure(model):
    cfg, params = model
    eng = make_engine(cfg, params, max_batch=2)
    rng = np.random.default_rng(2)
    p = lambda n: rng.integers(1, cfg.vocab_size, n).tolist()

    # cancel a WAITING request (queue position beyond the slots)
    reqs = [eng.add_request(prompt_ids=p(10),
                            sampling=SamplingParams(max_new_tokens=30))
            for _ in range(4)]
    eng.step()  # admits 2, leaves 2 waiting
    waiting = [r for r in reqs if r.state == RequestState.WAITING]
    running = [r for r in reqs if r.state == RequestState.RUNNING]
    assert waiting and running
    assert eng.cancel(waiting[0])
    assert waiting[0].state == RequestState.CANCELLED

    # cancel a RUNNING request: slot + pages free immediately
    free_before = eng.allocator.num_free
    assert eng.cancel(running[0])
    assert running[0].state == RequestState.CANCELLED
    assert eng.allocator.num_free > free_before
    eng.run()
    done = [r for r in reqs if r.state == RequestState.FINISHED]
    assert len(done) == 2 and all(len(r.output_ids) == 30 for r in done)
    assert eng.metrics.requests_cancelled == 2

    # backpressure: queue rejections beyond max_queue
    ecfg2 = EngineConfig(
        max_batch_size=4, max_queue=3,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng2 = Engine(cfg, params, ecfg2, decode_burst=4)
    outcomes = [eng2.add_request(prompt_ids=p(5),
                                 sampling=SamplingParams(max_new_tokens=2))
                for _ in range(6)]
    rejected = [r for r in outcomes if r.error == "queue full"]
    assert len(rejected) == 3
    eng2.run()
    ok = [r for r in outcomes if r.state == RequestState.FINISHED]
    assert len(ok) == 3


def test_engine_logprobs(model):
    """Every emitted token carries log P(token); greedy tokens carry the
    distribution's max logprob (cross-checked against a dense forward)."""
    cfg, params = model
    rng = np.random.default_rng(8)
    p = rng.integers(1, cfg.vocab_size, 11).tolist()
    eng = make_engine(cfg, params)
    r = eng.add_request(prompt_ids=p,
                        sampling=SamplingParams(max_new_tokens=9))
    eng.run()
    assert len(r.output_logprobs) == len(r.output_ids) == 9
    assert all(lp <= 0.0 and np.isfinite(lp) for lp in r.output_logprobs)

    # cross-check the first token's logprob against a dense forward
    tokens = np.asarray([p], np.int32)
    positions = np.broadcast_to(
        np.arange(len(p), dtype=np.int32)[None], tokens.shape)
    logits, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                              jnp.asarray(positions))
    lsm = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
    want = float(lsm[r.output_ids[0]])
    assert abs(r.output_logprobs[0] - want) < 1e-4


def test_engine_speculative_respects_penalties(model):
    """Rows with active penalties inside a speculative batch produce the
    SAME tokens as the non-speculative engine (they fall back to one
    penalized sample per verify step)."""
    cfg, params = model
    prompts = [[5, 6, 7, 8] * 5, [1, 2, 3, 1, 2, 3]]
    sp = SamplingParams(max_new_tokens=14, repetition_penalty=1.6)

    def mk(spec):
        ecfg = EngineConfig(
            max_batch_size=4, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=64,
                             max_pages_per_seq=24, kv_dtype="f32"))
        return Engine(cfg, params, ecfg, decode_burst=3)

    base = mk(0).generate(prompts, sp)
    got = mk(3).generate(prompts, sp)
    assert got == base


def test_engine_seed_reproducible_across_batches(model):
    """A stochastic request with an explicit seed produces the SAME
    tokens whether served alone or alongside other requests (per-row
    keys derive from (seed, position), not batch composition)."""
    cfg, params = model
    rng = np.random.default_rng(9)
    p = rng.integers(1, cfg.vocab_size, 10).tolist()
    sp = SamplingParams(max_new_tokens=12, temperature=0.9, top_k=50,
                        seed=1234)

    eng1 = make_engine(cfg, params)
    solo = eng1.generate([p], sp)[0]

    eng2 = make_engine(cfg, params)
    other = rng.integers(1, cfg.vocab_size, 17).tolist()
    outs = eng2.generate([other, p, other], [
        SamplingParams(max_new_tokens=12, temperature=0.7),
        sp,
        SamplingParams(max_new_tokens=12)])
    assert outs[1] == solo

    # without a seed, two identical stochastic requests still diverge
    # (engine derives unique per-request seeds)
    eng3 = make_engine(cfg, params)
    sp_ns = SamplingParams(max_new_tokens=12, temperature=0.9, top_k=50)
    a, b_ = eng3.generate([p, list(p)], sp_ns)
    assert a != b_

def test_engine_persistent_prefix_cache_sequential(model):
    """A finished request's prompt pages are RETAINED: a later request
    with the same prompt admits with cached_len > 0 even though nothing
    is running (VERDICT r1 item 5), and its greedy output is exact."""
    cfg, params = model
    rng = np.random.default_rng(11)
    base = rng.integers(1, cfg.vocab_size, 40).tolist()

    solo = make_engine(cfg, params).generate(
        [base], SamplingParams(max_new_tokens=8))[0]

    eng = make_engine(cfg, params)
    r1 = eng.add_request(prompt_ids=base,
                         sampling=SamplingParams(max_new_tokens=8))
    eng.run()                    # r1 finishes; store retains its pages
    assert not eng.has_work
    r2 = eng.add_request(prompt_ids=list(base),
                         sampling=SamplingParams(max_new_tokens=8))
    eng.run()
    assert r1.output_ids == solo
    assert r2.output_ids == solo
    assert r2.cached_len > 0     # admitted from the persistent store
    assert eng.metrics.prefix_cache_persistent_hits == 1
    # 40 tokens -> 5 full pages of 8 retained; cap 40+0-1 -> 32 usable
    assert r2.cached_len == 32


def test_engine_persistent_prefix_partial_and_exact_match(model):
    """A retained LONG prompt serves shorter prompts sharing its leading
    pages; an exactly-page-aligned same prompt reuses all but one page."""
    cfg, params = model
    rng = np.random.default_rng(12)
    base = rng.integers(1, cfg.vocab_size, 32).tolist()  # page-aligned

    want_full = make_engine(cfg, params).generate(
        [base], SamplingParams(max_new_tokens=6))[0]
    short = base[:16] + [3, 1]
    want_short = make_engine(cfg, params).generate(
        [short], SamplingParams(max_new_tokens=6))[0]

    eng = make_engine(cfg, params)
    eng.generate([base], SamplingParams(max_new_tokens=6))
    r_exact = eng.add_request(prompt_ids=list(base),
                              sampling=SamplingParams(max_new_tokens=6))
    eng.run()
    r_short = eng.add_request(prompt_ids=short,
                              sampling=SamplingParams(max_new_tokens=6))
    eng.run()
    assert r_exact.output_ids == want_full
    # 32-token aligned prompt: 24 tokens attach (one page must prefill)
    assert r_exact.cached_len == 24
    assert r_short.output_ids == want_short
    assert r_short.cached_len == 16  # two leading pages of the long entry


def test_engine_persistent_prefix_evicts_under_pressure(model):
    """Retained pages are evicted (never preempt live work) when the pool
    runs dry; everything still completes exactly."""
    cfg, params = model
    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, cfg.vocab_size, 24).tolist()
               for _ in range(3)]
    want = dense_reference(cfg, params, prompts, 16)

    # pool of 10 pages x 8: each request peaks at 5 pages; retention after
    # each finish would hold 3 pages — the next admit must evict.
    eng = make_engine(cfg, params, max_batch=1, num_pages=10, page_size=8)
    got = [eng.generate([p], SamplingParams(max_new_tokens=16))[0]
           for p in prompts]
    assert got == want
    assert eng.metrics.prefix_cache_evictions > 0
    assert eng.metrics.preemptions == 0


def test_engine_persistent_prefix_store_lru_cap(model):
    """The store never exceeds prefix_cache_entries (LRU evictions)."""
    cfg, params = model
    ecfg = EngineConfig(
        max_batch_size=2, prefix_cache_entries=2,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    rng = np.random.default_rng(14)
    for _ in range(5):
        p = rng.integers(1, cfg.vocab_size, 16).tolist()
        eng.generate([p], SamplingParams(max_new_tokens=4))
    assert len(eng._prefix_store) <= 2
    assert eng.metrics.prefix_cache_evictions >= 3

def test_engine_speculative_stochastic_rows_accept(model):
    """Stochastic penalty-neutral rows now get speculation benefit
    (VERDICT r1 item 6): near-greedy temperature on a repetitive prompt
    accepts draft tokens instead of degrading to one token per step."""
    cfg, params = model
    prompts = [([5, 6, 7, 8] * 6)[:20]]

    def mk(spec):
        ecfg = EngineConfig(
            max_batch_size=2, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=64,
                             max_pages_per_seq=24, kv_dtype="f32"))
        return Engine(cfg, params, ecfg, decode_burst=3)

    base = mk(0).generate(prompts, SamplingParams(max_new_tokens=24))

    # temperature>0 with top_k=1: the shaped distribution is a point
    # mass on the argmax, so rejection sampling must accept exactly the
    # drafts greedy acceptance would — deterministic, seed-independent.
    eng = mk(3)
    r = eng.add_request(
        prompt_ids=prompts[0],
        sampling=SamplingParams(max_new_tokens=24, temperature=1.0,
                                top_k=1, seed=3))
    eng.run()
    assert r.output_ids == base[0]
    m = eng.metrics
    assert m.spec_accepted > 0, \
        "stochastic row accepted zero drafts (rejection sampling dead)"


@pytest.mark.slow  # statistical sampling loop
def test_engine_speculative_sampling_marginals(model):
    """Distribution preservation: the joint law of the first two sampled
    tokens under speculative decoding matches the non-speculative engine
    (top_k=2 makes the outcome space small enough to compare empirically
    across independent per-request seeds)."""
    cfg, params = model
    prompt = ([5, 6, 7, 8] * 5)[:20]  # repetitive: drafts actually fire
    n = 192

    def run_mode(spec):
        ecfg = EngineConfig(
            max_batch_size=8, spec_tokens=spec,
            kv=KVCacheConfig(page_size=8, num_pages=256,
                             max_pages_per_seq=8, kv_dtype="f32"))
        eng = Engine(cfg, params, ecfg, decode_burst=2)
        reqs = [eng.add_request(
            prompt_ids=list(prompt),
            sampling=SamplingParams(max_new_tokens=2, temperature=1.5,
                                    top_k=2, seed=1000 + i))
            for i in range(n)]
        eng.run()
        from collections import Counter
        return Counter(tuple(r.output_ids) for r in reqs)

    base = run_mode(0)
    spec = run_mode(3)
    keys = set(base) | set(spec)
    tv = 0.5 * sum(abs(base.get(k, 0) - spec.get(k, 0)) for k in keys) / n
    # ~4 effective outcomes, n=192 per mode: sampling noise ~0.08;
    # a greedy-collapse or draft-biased sampler shows tv >~ 0.4
    assert tv < 0.2, (tv, base, spec)

def test_engine_persistent_prefix_divergent_suffix(model):
    """A retained entry whose TRAILING pages differ still shares its
    matching leading pages — the recurring-system-prompt case (system
    prefix + different user text per request)."""
    cfg, params = model
    rng = np.random.default_rng(15)
    system = rng.integers(1, cfg.vocab_size, 24).tolist()  # 3 pages of 8
    user_a = rng.integers(1, cfg.vocab_size, 10).tolist()
    user_b = rng.integers(1, cfg.vocab_size, 13).tolist()

    want_b = make_engine(cfg, params).generate(
        [system + user_b], SamplingParams(max_new_tokens=6))[0]

    eng = make_engine(cfg, params)
    eng.generate([system + user_a], SamplingParams(max_new_tokens=6))
    r = eng.add_request(prompt_ids=system + user_b,
                        sampling=SamplingParams(max_new_tokens=6))
    eng.run()
    assert r.output_ids == want_b
    # the retained entry covers (24+10)//8*8 = 32 tokens but diverges
    # after the 24 system tokens -> exactly the 3 system pages share
    assert r.cached_len == 24
    assert eng.metrics.prefix_cache_persistent_hits == 1


def test_engine_logit_bias_bans_and_forces_tokens(model):
    """logit_bias must actually reach the device sampler (advisor r2:
    it was validated at admit but never threaded into sample())."""
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5]]
    ref = dense_reference(cfg, params, prompts, 6)[0]
    banned = ref[0]
    eng = make_engine(cfg, params)
    got = eng.generate(prompts, SamplingParams(
        max_new_tokens=6, logit_bias=((banned, -1e9),)))
    assert banned not in got[0], "banned token still sampled"
    # a huge positive bias forces the token every step (greedy rows
    # honor the bias too)
    forced = (ref[0] + 7) % cfg.vocab_size
    eng2 = make_engine(cfg, params)
    got2 = eng2.generate(prompts, SamplingParams(
        max_new_tokens=4, logit_bias=((forced, 1e9),)))
    assert got2[0] == [forced] * 4


def test_engine_logit_bias_is_per_request(model):
    """Bias rows are slot-scoped: a biased and an unbiased request in
    the same batch must not contaminate each other."""
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = dense_reference(cfg, params, prompts, 6)
    forced = 11
    eng = make_engine(cfg, params)
    r0 = eng.add_request(prompt_ids=prompts[0], sampling=SamplingParams(
        max_new_tokens=6, logit_bias=((forced, 1e9),)))
    r1 = eng.add_request(prompt_ids=prompts[1],
                         sampling=SamplingParams(max_new_tokens=6))
    eng.run()
    assert r0.output_ids == [forced] * 6
    assert r1.output_ids == want[1]


def test_engine_min_tokens_and_ignore_eos(model):
    """min_tokens suppresses stop_token_ids until the floor is reached;
    ignore_eos disables them entirely (vLLM semantics)."""
    cfg, params = model
    prompts = [[1, 2, 3]]
    ref = dense_reference(cfg, params, prompts, 12)[0]
    stop = ref[4]  # would stop at the 5th generated token
    eng = make_engine(cfg, params)
    got = eng.generate(prompts, SamplingParams(
        max_new_tokens=12, stop_token_ids=(stop,), min_tokens=8))
    # the 5th-token stop is suppressed; the next occurrence (if any)
    # past min_tokens may stop it, otherwise it runs to max
    assert len(got[0]) >= 8
    assert got[0][:8] == ref[:8]
    got2 = eng.generate(prompts, SamplingParams(
        max_new_tokens=12, stop_token_ids=(stop,), ignore_eos=True))
    assert got2[0] == ref


def test_engine_top_logprobs(model):
    """EngineConfig.top_logprobs: every emitted token carries the K
    most probable alternatives under the RAW distribution — checked
    against a teacher-forced dense forward's log-softmax."""
    cfg, params = model
    ecfg = EngineConfig(
        max_batch_size=2, top_logprobs=3,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=3)
    prompt = [1, 2, 3, 4, 5]
    req = eng.add_request(prompt_ids=prompt,
                          sampling=SamplingParams(max_new_tokens=6))
    eng.run()
    assert len(req.output_top_logprobs) == len(req.output_ids) == 6

    # teacher-forced reference logits over prompt + outputs
    ids = prompt + req.output_ids
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    from simplellminference_tpu.models import llama as llama_mod
    logits, _ = llama_mod.forward(cfg, params, toks, pos)
    lsm = jax.nn.log_softmax(np.asarray(logits, np.float64)[0], axis=-1)
    for i, (tok, alts) in enumerate(zip(req.output_ids,
                                        req.output_top_logprobs)):
        step_lp = lsm[len(prompt) - 1 + i]
        want_ids = np.argsort(step_lp)[::-1][:3]
        got_ids = [t for t, _ in alts]
        assert got_ids[0] == tok == want_ids[0]   # greedy == top-1
        assert set(got_ids) == set(want_ids.tolist())
        for t, lp in alts:
            np.testing.assert_allclose(lp, step_lp[t], rtol=2e-3,
                                       atol=2e-3)
        # chosen-token logprob field agrees with the top list
        np.testing.assert_allclose(req.output_logprobs[i],
                                   dict(alts)[tok], rtol=2e-3, atol=2e-3)


def test_engine_top_logprobs_rejects_spec():
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, top_logprobs=2, spec_tokens=2,
                        kv=KVCacheConfig(page_size=8, num_pages=32,
                                         max_pages_per_seq=8,
                                         kv_dtype="f32"))
    with pytest.raises(ValueError, match="top_logprobs"):
        Engine(cfg, params, ecfg)


def test_engine_fp8_kv_warns_on_selection(model):
    """fp8 KV is a measured perf trap on v5e (456 vs 744 tok/s): picking
    it at runtime must emit a loud warning naming int8 (VERDICT r4 #9)."""
    cfg, params = model
    ecfg = EngineConfig(
        max_batch_size=2,
        kv=KVCacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                         kv_dtype="fp8"))
    with pytest.warns(RuntimeWarning, match="int8"):
        Engine(cfg, params, ecfg)


def test_prometheus_text_exposition():
    """Scrape-format contract: HELP/TYPE headers, counter/gauge/histogram
    families, cumulative le buckets, sum/count."""
    from simplellminference_tpu.engine.metrics import (EngineMetrics,
                                                      prometheus_text)

    m = EngineMetrics()
    m.tokens_generated = 123
    m.requests_finished = 4
    m.ttfts = [0.02, 0.03, 0.3, 1.2]
    m.observe_step(busy_slots=3, total_slots=4, used_pages=10,
                   total_pages=64)
    text = prometheus_text(m, extra_gauges={
        "kv_pages_free": ("KV pages currently free", 54)})
    lines = text.splitlines()
    assert "slli_tokens_generated_total 123" in lines
    assert "slli_requests_finished_total 4" in lines
    assert "# TYPE slli_tokens_generated_total counter" in lines
    assert "# TYPE slli_batch_occupancy gauge" in lines
    assert "slli_batch_occupancy 0.75" in lines
    assert "slli_kv_pages_free 54" in lines
    # histogram: buckets are CUMULATIVE and ordered
    assert 'slli_ttft_seconds_bucket{le="0.025"} 1' in lines
    assert 'slli_ttft_seconds_bucket{le="0.05"} 2' in lines
    assert 'slli_ttft_seconds_bucket{le="0.5"} 3' in lines
    assert 'slli_ttft_seconds_bucket{le="2.5"} 4' in lines
    assert 'slli_ttft_seconds_bucket{le="+Inf"} 4' in lines
    assert "slli_ttft_seconds_count 4" in lines
    [s] = [l for l in lines if l.startswith("slli_ttft_seconds_sum")]
    assert abs(float(s.split()[1]) - 1.55) < 1e-9
    # every sample line's family has exactly one TYPE header
    for fam in ("slli_tokens_per_sec", "slli_page_utilization"):
        assert sum(1 for l in lines
                   if l.startswith(f"# TYPE {fam} ")) == 1
