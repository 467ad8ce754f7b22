"""XLA trace of the Engine's steady-state decode burst: top device ops.

Finds where the paged burst's device time goes vs the fused dense loop
(722 tok/s) — e.g. a hidden per-burst relayout copy of the donated KV
pools would show as a giant fusion/copy op here.

    JAX_PLATFORMS=axon python -u benchmarks/profile_engine_xplane.py
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
    ap.add_argument("--burst", type=int, default=4)
    ap.add_argument("--pages", type=int, default=128)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "f32", "int8", "fp8"])
    args = ap.parse_args()

    cfg = ModelConfig.llama2_7b(dtype="bfloat16")
    params = canonicalize_layouts(bench_mod._bench_params(cfg, "int8", None))
    jax.block_until_ready(params)

    max_new = args.burst * 16
    ecfg = EngineConfig(
        max_batch_size=8,
        kv=KVCacheConfig(page_size=args.page_size, num_pages=args.pages,
                         kv_dtype=args.kv_dtype,
                         max_pages_per_seq=max(
                             (128 + max_new) // args.page_size + 2, 8)))
    eng = Engine(cfg, params, ecfg, decode_burst=args.burst)
    rng = np.random.default_rng(0)

    def admit_all():
        for _ in range(8):
            eng.add_request(
                prompt_ids=rng.integers(1, cfg.vocab_size, 128).tolist(),
                sampling=SamplingParams(max_new_tokens=max_new))

    admit_all()
    eng.run()      # warm/compile

    admit_all()
    for _ in range(4):
        eng.step()     # prefill + settle into steady state

    tdir = "/tmp/jax-trace-engine"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            eng.step()
        np.asarray(eng._dev_tok)
    while eng.has_work:
        eng.step()

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
            for ev in line.events:
                key = ev.name[:110]
                agg[key] += ev.duration_ns
                cnt[key] += 1
                total += ev.duration_ns
            if total < 1e6:
                continue
            print(f"-- line {line.name}: total {total/1e6:.1f} ms")
            for k, v in agg.most_common(16):
                print(f"  {v/1e6:9.3f} ms x{cnt[k]:<5d} {k}")


if __name__ == "__main__":
    main()
