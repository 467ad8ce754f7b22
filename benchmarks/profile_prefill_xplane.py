"""XLA trace of an 8k chunked prefill: top device ops + gap analysis.

Decomposes TTFT (1.53 s at 8k/1024-chunks on v5e) into matmul vs
attention vs overhead, to size the W8A8 (int8 MXU) prefill opportunity.

    JAX_PLATFORMS=axon python -u benchmarks/profile_prefill_xplane.py
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    import argparse

    import bench as bench_mod
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.runtime.weights import canonicalize_layouts

    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--act-quant", action="store_true")
    args = ap.parse_args()

    cfg = ModelConfig.llama2_7b(
        max_seq_len=args.prompt_len + 256, dtype="bfloat16")
    if args.act_quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, act_quant="int8")
    params = canonicalize_layouts(bench_mod._bench_params(cfg, "int8", None))
    jax.block_until_ready(params)

    ps = args.page_size
    cap = args.prompt_len + 2 * ps + 16
    ecfg = EngineConfig(
        max_batch_size=1, prefill_chunk=args.chunk,
        kv=KVCacheConfig(page_size=ps, num_pages=cap // ps + 4,
                         max_pages_per_seq=cap // ps + 2))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    rng = np.random.default_rng(0)

    def run_one():
        req = eng.add_request(
            prompt_ids=rng.integers(1, cfg.vocab_size,
                                    args.prompt_len).tolist(),
            sampling=SamplingParams(max_new_tokens=4))
        while req.state.value in ("waiting", "running", "preempted"):
            eng.step()
        assert req.output_ids, req.error

    run_one()       # compile

    tdir = "/tmp/jax-trace-prefill"
    os.system(f"rm -rf {tdir}")
    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        run_one()
    wall = time.perf_counter() - t0
    print(f"wall including trace overhead: {wall:.3f} s")

    files = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane captured")
        return
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane {plane.name}")
        for line in plane.lines:
            agg = collections.Counter()
            cnt = collections.Counter()
            total = 0
            span_lo, span_hi = None, 0
            for ev in line.events:
                key = ev.name[:110]
                agg[key] += ev.duration_ns
                cnt[key] += 1
                total += ev.duration_ns
                if span_lo is None or ev.start_ns < span_lo:
                    span_lo = ev.start_ns
                span_hi = max(span_hi, ev.start_ns + ev.duration_ns)
            if total < 5e6:
                continue
            span = (span_hi - span_lo) / 1e6 if span_lo is not None else 0
            print(f"-- line {line.name}: busy {total/1e6:.1f} ms, "
                  f"span {span:.1f} ms, gaps {span - total/1e6:.1f} ms")
            for k, v in agg.most_common(20):
                print(f"  {v/1e6:9.3f} ms x{cnt[k]:<5d} {k}")


if __name__ == "__main__":
    main()
