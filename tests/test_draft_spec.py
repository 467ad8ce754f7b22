"""Draft-MODEL speculative decoding (engine.py `draft=` mode).

The prompt-lookup drafter only fires on repetitive text; a small draft
model drafts everywhere. These tests pin the correctness invariants:
greedy outputs are token-exact vs the non-speculative engine regardless
of draft quality, a self-draft (draft == target) accepts every window,
slot reuse re-prefills the draft's dense arena, and stochastic rows keep
emitting through the rejection-sampling acceptance.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # speculative engine e2e

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine.engine import Engine
from simplellminference_tpu.models import llama


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def draft_model(model):
    """A smaller model in the same token space (1 layer, same vocab)."""
    cfg, _ = model
    dcfg = ModelConfig.tiny_test(num_layers=1, hidden_size=64,
                                 intermediate_size=128, num_heads=2,
                                 num_kv_heads=1)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(42))
    return dcfg, dparams


def mk_engine(cfg, params, spec=0, draft=None, burst=3, max_batch=4):
    ecfg = EngineConfig(
        max_batch_size=max_batch, spec_tokens=spec,
        kv=KVCacheConfig(page_size=8, num_pages=64,
                         max_pages_per_seq=24, kv_dtype="f32"))
    return Engine(cfg, params, ecfg, decode_burst=burst, draft=draft)


def test_draft_spec_greedy_token_exact(model, draft_model):
    """An arbitrary (here: random tiny) draft model never changes greedy
    outputs — acceptance only keeps drafts equal to the target's own
    argmax."""
    cfg, params = model
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, cfg.vocab_size, n).tolist()
               for n in (20, 13, 5)]
    base = mk_engine(cfg, params).generate(
        prompts, SamplingParams(max_new_tokens=24))
    eng = mk_engine(cfg, params, spec=3, draft=draft_model)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=24))
    assert got == base
    assert eng.metrics.spec_steps > 0


def test_self_draft_accepts_everything(model):
    """draft == target: every greedy draft equals the target argmax, so
    each verify step emits the full G+1 window."""
    cfg, params = model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, cfg.vocab_size, 9).tolist()]
    base = mk_engine(cfg, params).generate(
        prompts, SamplingParams(max_new_tokens=20))
    eng = mk_engine(cfg, params, spec=3, draft=(cfg, params))
    got = eng.generate(prompts, SamplingParams(max_new_tokens=20))
    assert got == base
    m = eng.metrics
    # 20 tokens in >= ceil(20/4) verify steps; full acceptance means
    # accepted ≈ 3 per step
    assert m.spec_accepted >= m.spec_steps * 2, (m.spec_accepted,
                                                 m.spec_steps)


def test_draft_spec_slot_reuse_two_waves(model, draft_model):
    """Finished slots re-admit new requests: the draft arena rows are
    rebuilt by the admit-time draft prefill (stale KV must not leak)."""
    cfg, params = model
    rng = np.random.default_rng(11)
    wave1 = [rng.integers(1, cfg.vocab_size, n).tolist() for n in (8, 15)]
    wave2 = [rng.integers(1, cfg.vocab_size, n).tolist() for n in (12, 6)]
    sp = SamplingParams(max_new_tokens=12)

    eng = mk_engine(cfg, params, spec=2, draft=draft_model, max_batch=2)
    got1 = eng.generate(wave1, sp)
    got2 = eng.generate(wave2, sp)

    base = mk_engine(cfg, params, max_batch=2)
    assert got1 == base.generate(wave1, sp)
    base2 = mk_engine(cfg, params, max_batch=2)
    assert got2 == base2.generate(wave2, sp)


def test_draft_spec_stochastic_and_stops(model, draft_model):
    """Stochastic rows keep their rejection-sampling acceptance under a
    model draft; stop tokens truncate mid-window."""
    cfg, params = model
    prompts = [[5, 6, 7, 8] * 5, [1, 2, 3]]
    base = mk_engine(cfg, params).generate(
        [prompts[0]], SamplingParams(max_new_tokens=16))
    stop = base[0][7]
    eng = mk_engine(cfg, params, spec=3, draft=draft_model)
    r1 = eng.add_request(prompt_ids=prompts[0], sampling=SamplingParams(
        max_new_tokens=16, stop_token_ids=(stop,)))
    r2 = eng.add_request(prompt_ids=prompts[1], sampling=SamplingParams(
        max_new_tokens=10, temperature=0.9, top_k=20))
    eng.run()
    assert r1.output_ids == base[0][:7]
    assert len(r2.output_ids) == 10


def test_draft_spec_mixed_lengths_batch(model, draft_model):
    """Different prompt lengths + different max_new in one batch."""
    cfg, params = model
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg.vocab_size, n).tolist()
               for n in (4, 19, 11, 7)]
    eng = mk_engine(cfg, params, spec=3, draft=draft_model)
    reqs = [eng.add_request(prompt_ids=p,
                            sampling=SamplingParams(max_new_tokens=mn))
            for p, mn in zip(prompts, (5, 17, 1, 9))]
    eng.run()
    base = mk_engine(cfg, params)
    breqs = [base.add_request(prompt_ids=p,
                              sampling=SamplingParams(max_new_tokens=mn))
             for p, mn in zip(prompts, (5, 17, 1, 9))]
    base.run()
    for r, b_ in zip(reqs, breqs):
        assert r.output_ids == b_.output_ids


def test_draft_requires_spec_tokens(model, draft_model):
    cfg, params = model
    with pytest.raises(AssertionError, match="spec_tokens"):
        mk_engine(cfg, params, spec=0, draft=draft_model)


def test_draft_vocab_mismatch_rejected(model):
    cfg, params = model
    dcfg = ModelConfig.tiny_test(vocab_size=128)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(1))
    with pytest.raises(AssertionError, match="token space"):
        mk_engine(cfg, params, spec=2, draft=(dcfg, dparams))
