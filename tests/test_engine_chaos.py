"""Randomized engine soak: admits, cancels, preemptions, prefix sharing,
speculation and mixed sampling in one run — asserting liveness and
resource invariants (every page returns to the pool; every request
reaches a terminal state with a bounded output).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # randomized scheduler chaos loops

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine, RequestState
from simplellminference_tpu.models import llama

TERMINAL = {RequestState.FINISHED, RequestState.FAILED,
            RequestState.CANCELLED}


@pytest.mark.parametrize("spec", [0, 3])
def test_engine_chaos_invariants(spec):
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=3, spec_tokens=spec, max_queue=64,
        kv=KVCacheConfig(page_size=8, num_pages=40,  # tight: preemptions
                         max_pages_per_seq=12, kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=3)
    rng = np.random.default_rng(42 + spec)

    base = rng.integers(1, cfg.vocab_size, 24).tolist()
    reqs = []

    def submit():
        if rng.random() < 0.4:  # shared prefix candidates
            ids = base[:16] + rng.integers(1, cfg.vocab_size,
                                           rng.integers(1, 20)).tolist()
        else:
            ids = rng.integers(1, cfg.vocab_size,
                               rng.integers(1, 40)).tolist()
        sp = SamplingParams(
            max_new_tokens=int(rng.integers(1, 20)),
            temperature=float(rng.choice([0.0, 0.0, 0.9])),
            top_k=int(rng.choice([0, 20])),
            repetition_penalty=float(rng.choice([1.0, 1.0, 1.4])))
        reqs.append(eng.add_request(prompt_ids=ids, sampling=sp))

    steps = 0
    for _ in range(8):
        submit()
    while eng.has_work or len(reqs) < 40:
        if len(reqs) < 40 and rng.random() < 0.5:
            submit()
        if reqs and rng.random() < 0.15:
            victim = reqs[int(rng.integers(0, len(reqs)))]
            eng.cancel(victim)  # no-op if already terminal
        eng.step()
        steps += 1
        assert steps < 2000, "engine livelocked"

    # invariants
    for r in reqs:
        assert r.state in TERMINAL, (r.req_id, r.state)
        assert len(r.output_ids) <= r.sampling.max_new_tokens
    # only the persistent prefix cache may hold pages once idle; after
    # flushing it every page must be back in the pool
    eng.flush_prefix_cache()
    assert eng.allocator.num_free == ecfg.kv.num_pages, "page leak"
    m = eng.metrics
    assert (m.requests_finished + m.requests_failed
            + m.requests_cancelled) == len(reqs)
