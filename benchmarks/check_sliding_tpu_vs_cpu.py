"""Grouped sliding-window (ring-pool) engine on the REAL TPU path.

Drives the alternating sliding/full stack through the Pallas serving
kernels — fused QKV append with the DECOUPLED cache-layer index, ring
block tables, windowed paged flash decode — and checks greedy tokens
against the dense-cache Generator on the same backend (loop==fused-class
invariant), for bf16-KV and int8-KV. `--cpu` re-runs the jnp path for a
cross-backend diff.

Usage: python benchmarks/check_sliding_tpu_vs_cpu.py [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    QuantConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.runtime.weights import quantize_params

    cfg = ModelConfig.tinyllama_1_1b(
        num_layers=4, max_seq_len=1024, num_heads=16, num_kv_heads=16,
        head_dim=128, hidden_size=2048, dtype="bfloat16",
        sliding_window=192,
        layer_types=("sliding_attention", "full_attention") * 2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, QuantConfig(mode="int8",
                                                  group_size=0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, ln).tolist()
               for ln in (250, 30, 7, 400, 130, 64)]

    gen = Generator(cfg, qparams, max_batch=len(prompts), max_seq=1024)
    want = [list(map(int, row)) for row in gen.generate(
        prompts, SamplingParams(max_new_tokens=24)).token_ids]

    def run(kv_dtype, reclaim):
        ecfg = EngineConfig(
            max_batch_size=8,
            kv=KVCacheConfig(page_size=64, num_pages=128,
                             max_pages_per_seq=16, kv_dtype=kv_dtype,
                             sliding_reclaim=reclaim))
        eng = Engine(cfg, qparams, ecfg, decode_burst=4)
        assert eng._grouped == reclaim
        if reclaim:
            # ring: ceil((192+64)/64) = 4 pages per slot, 8 slots + trash
            assert eng.cache.k_w.shape[:2] == (2, 8 * eng._ring + 1), \
                eng.cache.k_w.shape
        return eng.generate(prompts, SamplingParams(max_new_tokens=24))

    # The EXACT invariant is grouped == ungrouped (identical math,
    # different pool layout — any ring aliasing breaks this
    # immediately). Generator parity is checked as a long common
    # greedy prefix: random-weight bf16 logits sit close enough that
    # batched-prefill summation-order ties can flip one argmax
    # (measured: identical flip with reclaim on AND off).
    for kv_dtype in ("bf16", "int8"):
        g = run(kv_dtype, True)
        u = run(kv_dtype, False)
        assert g == u, (f"SLIDING-{kv_dtype}", g, u)
        print(f"SLIDING-{kv_dtype} {jax.default_backend()} OK "
              f"(grouped ring pools == ungrouped paged pools)")
        if kv_dtype == "bf16":
            for gi, wi in zip(g, want):
                n = 0
                for a, b in zip(gi, wi):
                    if a != b:
                        break
                    n += 1
                assert n >= 5, ("generator prefix", gi, wi)
            print(f"SLIDING-bf16 {jax.default_backend()} OK "
                  f"(>=5-token greedy prefix vs dense generator per row)")
    print("SLIDINGTOKENS", jax.default_backend(), g)


if __name__ == "__main__":
    main()
