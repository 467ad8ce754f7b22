"""Fine-grained timing of the Engine's steady-state decode loop on TPU.

Answers ONE question: where do the milliseconds of each decode burst go —
device compute, host->device argument uploads, dispatch, the one-burst-late
result sync, or host bookkeeping?  (VERDICT r1: the Engine path sits at
~62% of roofline vs the fused loop's 84.65%; this finds the gap.)

    JAX_PLATFORMS=axon python benchmarks/profile_engine.py --bursts 24

Methodology notes (memory: axon relay quirks):
  * every np.asarray/device_get is its own ~25 ms relay round trip;
  * identical (executable, inputs) pairs return cached results — steady
    state here always has fresh carried state, so timings are honest;
  * wall-clock of an async dispatch call measures host-side serialization
    only; device compute is measured by differencing K vs K/2 chained
    bursts with a single final sync.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b",
                    choices=["llama2-7b", "tinyllama"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--burst", type=int, default=4)
    ap.add_argument("--bursts", type=int, default=24,
                    help="steady-state bursts to profile")
    ap.add_argument("--pages", type=int, default=128)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "f32", "int8", "fp8"])
    args = ap.parse_args()

    import bench as bench_mod
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.runtime.weights import canonicalize_layouts

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "tinyllama": ModelConfig.tinyllama_1_1b}[args.model]
    cfg = mk(dtype="bfloat16")
    params = canonicalize_layouts(bench_mod._bench_params(cfg, "int8", None))
    jax.block_until_ready(params)

    max_new = args.burst * (args.bursts + 8)
    ecfg = EngineConfig(
        max_batch_size=args.batch,
        kv=KVCacheConfig(
            kv_dtype=args.kv_dtype,
            page_size=args.page_size, num_pages=args.pages,
            # TIGHT table width: every extra column is a clamped (dead)
            # grid step in the paged attention kernel (~3 us each)
            max_pages_per_seq=(args.prompt_len + max_new)
            // args.page_size + 2))
    eng = Engine(cfg, params, ecfg, decode_burst=args.burst)

    rng = np.random.default_rng(0)
    sampling = SamplingParams(max_new_tokens=max_new)

    def admit_all():
        for _ in range(args.batch):
            eng.add_request(
                prompt_ids=rng.integers(1, cfg.vocab_size,
                                        args.prompt_len).tolist(),
                sampling=sampling)

    # ---- instrument: wrap the burst fn + bookkeep with timers ----
    t = defaultdict(list)
    orig_burst = eng._burst_fn
    orig_book = eng._bookkeep

    def timed_burst(*a, **kw):
        t0 = time.perf_counter()
        out = orig_burst(*a, **kw)
        t["dispatch"].append(time.perf_counter() - t0)
        return out

    def timed_book(payload, snapshot):
        t0 = time.perf_counter()
        arr = np.asarray(payload[1])     # the sync, timed separately
        t["sync"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        orig_book((payload[0], arr, payload[2]), snapshot)
        t["bookkeep"].append(time.perf_counter() - t0)

    # warm up compile: one full run (all graphs), then reset
    admit_all()
    eng.run()

    eng._burst_fn = timed_burst
    eng._bookkeep = timed_book

    admit_all()
    # prefill + first bursts outside the timed window
    for _ in range(4):
        eng.step()
    steps = []
    for _ in range(args.bursts):
        t0 = time.perf_counter()
        eng.step()
        steps.append(time.perf_counter() - t0)
    # drain
    while eng.has_work:
        eng.step()
    eng._burst_fn = orig_burst
    eng._bookkeep = orig_book

    # ---- device-only burst compute: chain K bursts, one final sync ----
    # fresh state each call (carried tokens/pos change), so no relay-cache
    # hits. Differencing K vs K/2 cancels the dispatch+sync constants.
    def chained(k):
        admit_all()
        for _ in range(2):
            eng.step()       # prefill + pipeline fill
        t0 = time.perf_counter()
        for _ in range(k):
            eng.step()       # pipelined: one sync per step, one burst deep
        np.asarray(eng._dev_tok)  # final barrier
        dt = time.perf_counter() - t0
        while eng.has_work:
            eng.step()
        return dt

    k = max(args.bursts // 2, 8)
    t_full = min(chained(k) for _ in range(2))
    t_half = min(chained(k // 2) for _ in range(2))
    per_burst_pipelined = (t_full - t_half) / (k - k // 2)

    def avg(key):
        v = t[key][2:] or t[key]
        return sum(v) / max(len(v), 1)

    step_avg = sum(steps[2:]) / max(len(steps[2:]), 1)
    toks_per_burst = args.batch * args.burst
    out = {
        "burst": args.burst,
        "batch": args.batch,
        "step_wall_ms": round(step_avg * 1e3, 2),
        "dispatch_ms": round(avg("dispatch") * 1e3, 2),
        "sync_ms": round(avg("sync") * 1e3, 2),
        "bookkeep_ms": round(avg("bookkeep") * 1e3, 2),
        "pipelined_burst_ms": round(per_burst_pipelined * 1e3, 2),
        "steady_toks_per_s": round(toks_per_burst / step_avg, 1),
        "pipelined_toks_per_s": round(
            toks_per_burst / per_burst_pipelined, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
