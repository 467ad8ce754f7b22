"""Structural perf guard for the vanilla-Llama decode hot path.

VERDICT r3 item 1: round 3 silently added per-step device work to the
7B engine burst (an unconditional logit_bias scatter) and the headline
slid 2.2% with nothing to catch it. This test pins the OP-COUNT shape
of the compiled steady-state burst graph (StableHLO, platform-neutral)
so new per-step work in the default serving configuration fails CI
instead of surfacing as a silent tok/s regression:

  * zero scatters outside the penalty cond (logit_bias must stay
    structurally absent when no request uses it),
  * zero vocab sorts (default sampling is greedy/gumbel tiered),
  * exactly one engine dispatch per scheduler step in steady state
    (the pipelined-burst contract).

The wall-clock complement is benchmarks/regress.py (pinned
vs_baseline floor on the real chip).
"""

import jax
import numpy as np
import pytest

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, QuantConfig,
                                                SamplingParams)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime.weights import quantize_params


@pytest.fixture(scope="module")
def burst_lowering():
    """Drive a default-config engine to steady state, capture the burst
    graph's args, and return (stablehlo text, dispatches, steps).

    FORCE_FUSED_INTERPRET pins the TPU-shaped graph (pallas KV writes,
    no XLA scatter fallbacks) so the op counts below are stable."""
    llama.FORCE_FUSED_INTERPRET, saved = True, llama.FORCE_FUSED_INTERPRET
    cfg = ModelConfig.tiny_test()
    params = quantize_params(llama.init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(mode="int8", group_size=0))
    ecfg = EngineConfig(
        max_batch_size=4,
        kv=KVCacheConfig(page_size=16, num_pages=32, max_pages_per_seq=4,
                         kv_dtype="bf16"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)

    captured = {}
    dispatches = [0]
    orig = eng._burst_fn

    def spy(*a, **k):
        dispatches[0] += 1
        captured.setdefault("ak", (a, k))
        return orig(*a, **k)

    eng._burst_fn = spy
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, 8).tolist()
               for _ in range(4)]
    eng.generate(prompts, SamplingParams(max_new_tokens=24))
    llama.FORCE_FUSED_INTERPRET = saved
    a, k = captured["ak"]
    text = orig.lower(*a, **k).as_text()
    return text, dispatches[0], 24 // 4


# Pinned op counts of the DEFAULT (bias-free, penalty-free request mix)
# burst graph. These are tripwires, not goals: if a change legitimately
# alters the graph, re-pin — but only after confirming bench.py did not
# regress (the r3 slide was exactly one extra unconditional scatter).
# Current census: 1 penalty-counts scatter + 1 shaped-tier scatter-back
# (both inside lax.cond branches) + 2 from the interpret-mode pallas
# append emulation; 1 vocab sort (inside the shaped-sampling cond).
PINNED_SCATTERS = 4
PINNED_SORTS = 1


def test_burst_scatter_census(burst_lowering):
    """An UNCONDITIONAL scatter joining the hot graph (the r3 logit_bias
    regression) bumps this count — fail instead of silently costing
    ~1% of 7B decode."""
    text, _, _ = burst_lowering
    n = text.count("stablehlo.scatter")
    assert n == PINNED_SCATTERS, (
        f"burst graph scatter count changed: {n} != {PINNED_SCATTERS} — "
        "per-step cost may have leaked into the hot path; re-pin only "
        "after bench.py confirms no regression")


def test_burst_sort_census(burst_lowering):
    """Default sampling (greedy / gumbel tiers) compiles exactly one
    [B, V] sort, inside the shaped-sampling lax.cond branch. More means
    vocab sorting stopped being conditional."""
    text, _, _ = burst_lowering
    n = text.count('"stablehlo.sort"')
    assert n == PINNED_SORTS, n


def test_one_dispatch_per_steady_step(burst_lowering):
    """Pipelined bursts: 24 tokens at burst 4 is 6 bursts; the engine
    may add at most one drain/tail dispatch. More means the scheduler
    started syncing mid-pipeline."""
    _, dispatches, min_bursts = burst_lowering
    assert min_bursts <= dispatches <= min_bursts + 1, dispatches


def test_burst_arg_upload_is_cached():
    """Steady-state bursts upload NO sampler/table args (device-cached;
    each host->device transfer is its own ~0.2 ms relay RPC)."""
    cfg = ModelConfig.tiny_test()
    params = quantize_params(llama.init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(mode="int8", group_size=0))
    # page_size 64 keeps the whole run inside one table column width
    # (the tables snapshot legitimately re-uploads when the power-of-2
    # page-column width grows)
    ecfg = EngineConfig(
        max_batch_size=2,
        kv=KVCacheConfig(page_size=64, num_pages=8, max_pages_per_seq=2,
                         kv_dtype="bf16"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    rng = np.random.default_rng(0)
    for p in range(2):
        eng.add_request(prompt_ids=rng.integers(1, cfg.vocab_size,
                                                8).tolist(),
                        sampling=SamplingParams(max_new_tokens=32))
    # reach steady state (first bursts pay admit uploads)
    for _ in range(3):
        eng.step()
    samp_before = eng._samp_dev
    tables_before = eng._tables_dev
    active_before = eng._active_dev
    eng.step()
    assert eng._samp_dev is samp_before
    assert eng._tables_dev is tables_before
    assert eng._active_dev is active_before
    eng.run()
