"""Serving benchmark: continuous-batching Engine on the real chip.

BASELINE config #3 measured the honest way — through the Engine (paged KV,
admit/preempt scheduling, multi-step decode bursts), not the fused
Generator loop. Emits tokens/s and TTFT p50/p99 (the BASELINE metrics).

    python benchmarks/bench_serve.py --model llama2-7b --requests 16

Request arrival: all-at-once by default (offered load > capacity, so the
scheduler's admit/queue path is exercised); --stagger N adds N new
requests per engine step instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b",
                    choices=["llama2-7b", "tinyllama", "qwen2-7b",
                             "llama3-3b"])
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pages", type=int, default=64)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "fp8", "int8", "f32"])
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--stagger", type=int, default=0)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature for all requests "
                         "(0 = greedy; >0 exercises the stochastic "
                         "Gumbel-max tier)")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative decoding: prompt-lookup draft "
                         "tokens per verify step (0 = off)")
    ap.add_argument("--repetitive", action="store_true",
                    help="repeating-pattern prompts (speculation-friendly "
                         "workload)")
    ap.add_argument("--act-quant", action="store_true",
                    help="W8A8 prefill (ModelConfig.act_quant)")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="first N prompt tokens identical across requests "
                         "(system-prompt workload; exercises the prefix "
                         "cache)")
    args = ap.parse_args()

    import bench as bench_mod
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.runtime.weights import canonicalize_layouts

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "tinyllama": ModelConfig.tinyllama_1_1b,
          "qwen2-7b": ModelConfig.qwen2_7b,
          "llama3-3b": ModelConfig.llama3_2_3b}[args.model]
    cfg = mk(dtype="bfloat16")
    if args.act_quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, act_quant="int8")
    params = canonicalize_layouts(
        bench_mod._bench_params(cfg, "int8", None))
    jax.block_until_ready(params)

    ecfg = EngineConfig(
        max_batch_size=args.batch,
        kv=KVCacheConfig(page_size=args.page_size, num_pages=args.pages,
                         max_pages_per_seq=max(
                             (args.prompt_len + args.max_new)
                             // args.page_size + 2, 16),
                         kv_dtype=args.kv_dtype),
        spec_tokens=args.spec)
    eng = Engine(cfg, params, ecfg, decode_burst=args.burst)

    rng = np.random.default_rng(0)
    sampling = SamplingParams(max_new_tokens=args.max_new,
                              temperature=args.temperature)

    shared = rng.integers(1, cfg.vocab_size, args.shared_prefix).tolist() \
        if args.shared_prefix > 0 else []

    def make_req():
        n = max(args.prompt_len - len(shared), 0)
        if args.repetitive:
            pat = rng.integers(1, cfg.vocab_size, 8).tolist()
            ids = shared + (pat * (n // 8 + 1))[:n]
        else:
            ids = shared + rng.integers(1, cfg.vocab_size, n).tolist()
        return eng.add_request(prompt_ids=ids, sampling=sampling)

    # Warm-up: compile prefill + burst graphs on throwaway requests —
    # a full admit batch (warms the batched-prefill variant) plus a
    # single request (warms the row-count=1 variant).
    warm = [make_req() for _ in range(args.batch)]
    eng.run()
    warm.append(make_req())
    eng.run()
    assert all(w.output_ids for w in warm), "warmup produced no tokens"

    eng.metrics = type(eng.metrics)()  # reset counters after warmup
    t0 = time.perf_counter()
    pending = args.requests
    if args.stagger <= 0:
        for _ in range(args.requests):
            make_req()
        pending = 0
    while eng.has_work or pending > 0:
        for _ in range(min(args.stagger, pending)):
            make_req()
            pending -= 1
        eng.step()
    wall = time.perf_counter() - t0

    m = eng.metrics
    detail = m.summary()
    detail.update(platform=jax.devices()[0].platform, wall_s=round(wall, 3),
                  kv_dtype=args.kv_dtype, burst=args.burst, spec=args.spec)
    print(json.dumps({"detail": detail}), file=sys.stderr)
    print(json.dumps({
        "metric": f"serve_tokens_per_sec_{args.model}_int8_kv-"
                  f"{args.kv_dtype}_b{args.batch}",
        "value": round(m.tokens_generated / wall, 2),
        "unit": "tokens/s",
        "ttft_p50_s": round(m.ttft_percentile(0.5) or -1, 4),
    }))


if __name__ == "__main__":
    main()
