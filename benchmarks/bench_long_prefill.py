"""8k-prompt chunked-prefill TTFT: paged flash prefill vs dense gather.

VERDICT r1 item 3's measurement: the chunked-prefill path used to gather
the whole cached prefix into a dense [B, Smax] buffer per layer
(gather_dense); the paged flash prefill kernel reads the prefix straight
through the page tables. This times TTFT for an 8k prompt both ways on
the real chip.

    JAX_PLATFORMS=axon python -u benchmarks/bench_long_prefill.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b",
                    choices=["llama2-7b", "tinyllama"])
    ap.add_argument("--prompt-len", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=1024)
    # 256-token pages measured best for long prefill (kv block = 4 big
    # DMAs instead of 8 small ones: TTFT 0.723 -> 0.661 s at 8k) and
    # decode-neutral (bench_serve 646 tok/s at both 128 and 256).
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--max-new", type=int, default=16)
    ap.add_argument("--dense-fallback", action="store_true",
                    help="route chunked attention through gather_dense "
                         "(the r1 path) for comparison")
    ap.add_argument("--act-quant", action="store_true",
                    help="W8A8 prefill: per-token int8 activations on "
                         "the double-rate int8 MXU path")
    args = ap.parse_args()

    import bench as bench_mod
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.ops.attention import dispatch
    from simplellminference_tpu.runtime.weights import canonicalize_layouts

    if args.dense_fallback:
        # force ONLY the chunked-prefill attention onto the r1 dense
        # gather path (decode/prefill kernels stay Pallas)
        orig = dispatch.attention_paged_prefill
        use_flash = dispatch._use_flash

        def dense_paged_prefill(*a, **kw):
            dispatch._use_flash = lambda: False
            try:
                return orig(*a, **kw)
            finally:
                dispatch._use_flash = use_flash

        dispatch.attention_paged_prefill = dense_paged_prefill

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "tinyllama": ModelConfig.tinyllama_1_1b}[args.model]
    cfg = mk(max_seq_len=args.prompt_len + args.max_new + 256,
             dtype="bfloat16")
    if args.act_quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, act_quant="int8")
    params = canonicalize_layouts(bench_mod._bench_params(cfg, "int8", None))
    jax.block_until_ready(params)

    ps = args.page_size
    cap = args.prompt_len + args.max_new + 2 * ps
    ecfg = EngineConfig(
        max_batch_size=1, prefill_chunk=args.chunk,
        kv=KVCacheConfig(page_size=ps, num_pages=cap // ps + 4,
                         max_pages_per_seq=cap // ps + 2))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    rng = np.random.default_rng(0)
    sampling = SamplingParams(max_new_tokens=args.max_new)

    def run_one():
        req = eng.add_request(
            prompt_ids=rng.integers(1, cfg.vocab_size,
                                    args.prompt_len).tolist(),
            sampling=sampling)
        t0 = time.perf_counter()
        while req.state.value in ("waiting", "running", "preempted"):
            eng.step()
        return req, time.perf_counter() - t0

    run_one()                     # compile
    best_ttft, best_wall = None, None
    for _ in range(2):
        req, wall = run_one()
        assert req.output_ids, req.error
        ttft = req.ttft
        best_ttft = ttft if best_ttft is None else min(best_ttft, ttft)
        best_wall = wall if best_wall is None else min(best_wall, wall)

    print(json.dumps({
        "metric": "ttft_8k_chunked_prefill",
        "act_quant": bool(args.act_quant),
        "mode": "dense_gather" if args.dense_fallback else "paged_flash",
        "prompt_len": args.prompt_len, "chunk": args.chunk,
        "ttft_s": round(best_ttft, 3), "wall_s": round(best_wall, 3),
    }))


if __name__ == "__main__":
    main()
