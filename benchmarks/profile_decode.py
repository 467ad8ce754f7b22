"""Capture an XLA trace of the 7B INT8 decode loop and print top ops.

Uses jax.profiler + ProfileData (xplane parser) — no TensorBoard needed.
Prints per-op total durations for the device plane, aggregated by op name
prefix, so the decode-step time budget is visible from the terminal.
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
    import bench as bench_mod
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.runtime.generator import Generator

    cfg = ModelConfig.llama2_7b(max_seq_len=1024, dtype="bfloat16")
    params = bench_mod._bench_params(cfg, "int8", None)
    jax.block_until_ready(params)
    gen = Generator(cfg, params, max_batch=8, max_seq=1024,
                    kv_dtype=__import__("jax.numpy", fromlist=["x"]).bfloat16)
    rng = np.random.default_rng(0)

    def prompts():
        return [rng.integers(1, cfg.vocab_size, 128).tolist()
                for _ in range(8)]

    # warm / compile
    np.asarray(gen.generate_fused(prompts(), max_new_tokens=32))

    tdir = "/tmp/jax-trace-decode"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        np.asarray(gen.generate_fused(prompts(), max_new_tokens=32))

    files = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane captured", glob.glob(tdir + "/**", recursive=True))
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
            for k, v in agg.most_common(12):
                print(f"  {v/1e6:9.3f} ms x{cnt[k]:<5d} {k}")


if __name__ == "__main__":
    main()
