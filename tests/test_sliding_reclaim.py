"""Sliding-window KV page reclamation (grouped ring pools).

Successor obligation of the reference's caching allocator — the component
whose whole job was reclaiming memory (alloc.cpp:73-201) under its
1024-token cap (config.h:11): with `KVCacheConfig.sliding_reclaim` (the
default), sliding layers keep their KV in a per-slot RING of
ceil(window/page)+1 pages, so sliding-layer memory is O(window) per
sequence while full-attention layers keep the allocator-paged pools.

The invariant throughout: grouped-engine tokens == dense-cache Generator
tokens, exactly, across ring wraparounds, mixed stacks, int8 KV,
speculative verify spans, and chunked prefill.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime.generator import Generator


def _cfg(**ov):
    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=96,
              num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
              max_seq_len=1024, dtype="float32", sliding_window=6)
    kw.update(ov)
    return ModelConfig.tiny_test(**kw)


ALTERNATING = ("sliding_attention", "full_attention")


def _want(cfg, params, prompts, max_new, max_seq=256):
    gen = Generator(cfg, params, max_batch=len(prompts), max_seq=max_seq,
                    kv_dtype=jnp.float32)
    return gen.generate(prompts,
                        SamplingParams(max_new_tokens=max_new)).token_ids


def _engine(cfg, params, *, page_size=8, num_pages=96,
            max_pages_per_seq=32, reclaim=True, kv_dtype="f32",
            spec=0, chunk=0, max_batch=4, burst=4):
    ecfg = EngineConfig(
        max_batch_size=max_batch, spec_tokens=spec, prefill_chunk=chunk,
        kv=KVCacheConfig(page_size=page_size, num_pages=num_pages,
                         max_pages_per_seq=max_pages_per_seq,
                         kv_dtype=kv_dtype, sliding_reclaim=reclaim))
    return Engine(cfg, params, ecfg, decode_burst=burst)


def test_all_sliding_engine_grouped_matches_dense():
    """Mistral-shape (every layer sliding): the WHOLE cache is the ring
    pool — O(window) pages per slot regardless of context."""
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [list(range(1, 20)), [9, 8, 7], list(range(40, 71))]
    want = _want(cfg, params, prompts, 24)
    eng = _engine(cfg, params)
    assert eng._grouped and eng._window == 6
    # ring size: ceil((window + page)/page) pages per slot
    assert eng._ring == 2 == -(-(6 + 8) // 8)
    # the ring pool is [Lw, B*R + trash, ...]; the full group is EMPTY
    assert eng.cache.k_w.shape[:2] == (4, 4 * 2 + 1)
    assert eng.cache.k.shape[0] == 0
    got = eng.generate(prompts, SamplingParams(max_new_tokens=24))
    assert got == want


def test_alternating_stack_grouped_matches_dense():
    """GPT-OSS/Gemma-2 shape: alternating sliding/full layers — sliding
    layers ride the ring pools at group-local indices, full layers the
    allocator-paged pools, interleaved within one scan period."""
    cfg = _cfg(layer_types=ALTERNATING * 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    prompts = [list(range(1, 26)), [5, 6, 7, 8], list(range(60, 75))]
    want = _want(cfg, params, prompts, 20)
    eng = _engine(cfg, params)
    assert eng._grouped
    assert eng.cache.k_w.shape[0] == 2      # 2 sliding layers
    assert eng.cache.k.shape[0] == 2        # 2 full layers
    got = eng.generate(prompts, SamplingParams(max_new_tokens=20))
    assert got == want


@pytest.mark.slow
def test_long_decode_ring_wraps_many_times():
    """Ring wraparound proof: decode far past window/R*page so every ring
    page is overwritten many times; tokens stay exactly equal to the
    dense reference, and sliding-layer memory never grows (the pool
    SHAPE is the bound: B*R+1 pages total, vs max_pages_per_seq=64
    pages/seq the full group could take)."""
    cfg = _cfg(num_layers=2, layer_types=ALTERNATING,
               sliding_window=16)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    prompts = [list(range(1, 30))]
    want = _want(cfg, params, prompts, 400, max_seq=512)
    eng = _engine(cfg, params, page_size=8, num_pages=128,
                  max_pages_per_seq=64, max_batch=2, burst=8)
    assert eng._ring == 3 == -(-(16 + 8) // 8)   # <= ceil((w+ps)/ps)
    assert eng.cache.k_w.shape[1] == 2 * 3 + 1   # O(window), not O(ctx)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=400))
    assert got == want


def test_grouped_int8_kv_matches_ungrouped_int8():
    """int8-KV grouped pools: the quantize/late-dequant math is
    IDENTICAL to the ungrouped int8 pools — only the pool layout and
    tables differ — so tokens must match exactly (ring aliasing would
    break this immediately)."""
    cfg = _cfg(layer_types=ALTERNATING * 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    prompts = [list(range(1, 22)), list(range(30, 45))]
    ref = _engine(cfg, params, kv_dtype="int8", reclaim=False)
    assert not ref._grouped
    want = ref.generate(prompts, SamplingParams(max_new_tokens=16))
    q = _engine(cfg, params, kv_dtype="int8")
    assert q._grouped and q.cache.k_w_scale is not None
    got = q.generate(prompts, SamplingParams(max_new_tokens=16))
    assert got == want


def test_grouped_speculative_matches_greedy():
    """Speculative verify spans (T-token ring writes) across sliding and
    full groups: emitted tokens == plain greedy."""
    cfg = _cfg(layer_types=ALTERNATING * 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    # repetitive prompts give the prompt-lookup drafter acceptances
    prompts = [[1, 2, 3, 4] * 5, [7, 8, 9] * 6]
    want = _want(cfg, params, prompts, 18)
    eng = _engine(cfg, params, spec=3)
    assert eng._grouped
    # spec span widens the ring: ceil((w + G)/ps) + 1 minimum
    assert eng._ring >= 2
    got = eng.generate(prompts, SamplingParams(max_new_tokens=18))
    assert got == want
    assert eng.metrics.spec_steps > 0   # verify spans really ran grouped


def test_grouped_chunked_prefill_matches_dense():
    """Chunked prefill reads back through the ring (paged prefill
    attention): the ring is sized for window + chunk span, so a long
    prompt prefilled in chunks never aliases a live column."""
    cfg = _cfg(layer_types=ALTERNATING * 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    prompts = [list(np.random.default_rng(0).integers(1, 250, 70)),
               list(range(2, 12))]
    want = _want(cfg, params, prompts, 12)
    eng = _engine(cfg, params, chunk=16, max_pages_per_seq=32)
    assert eng._grouped
    # ring covers window + chunk-dispatch span (the 128 TPU floor
    # applies even off-TPU: one sizing, one behavior)
    assert eng._ring == -(-(6 + 128 - 1) // 8) + 1
    got = eng.generate(prompts, SamplingParams(max_new_tokens=12))
    assert got == want


def test_reclaim_off_restores_allocator_pools():
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(6))
    eng = _engine(cfg, params, reclaim=False)
    assert not eng._grouped and eng.cache.k_w is None
    assert eng.cache.k.shape[0] == cfg.num_layers
    prompts = [list(range(1, 20)), [9, 8, 7]]
    want = _want(cfg, params, prompts, 10)
    assert eng.generate(prompts, SamplingParams(max_new_tokens=10)) == want


def test_grouped_disables_prefix_cache_and_adopt():
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(7))
    eng = _engine(cfg, params)
    shared = [1, 2, 3, 4, 5, 6, 7, 8] * 2
    want = _want(cfg, params, [shared, shared], 8)
    got = eng.generate([shared, shared], SamplingParams(max_new_tokens=8))
    assert got == want
    m = eng.metrics.summary()
    assert m["prefix_cache_hits"] == 0 and m["prompt_tokens_cached"] == 0
    with pytest.raises(RuntimeError, match="sliding_reclaim"):
        eng.adopt_prefill([1, 2, 3], 4, lambda c, t: c)


def test_full_model_unaffected_by_reclaim_flag():
    """No sliding layers -> grouped machinery never engages."""
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(8))
    eng = _engine(cfg, params)
    assert not eng._grouped and eng.cache.k_w is None
