"""Headline benchmark: Llama-2-7B INT8 decode tokens/sec/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the fraction of the per-chip HBM-bandwidth roofline
achieved (the reference publishes no numbers — BASELINE.md; the BASELINE.json
target is >=85% of roofline). Roofline model: decode is bandwidth-bound, so
step_time >= (weight_bytes + batch * kv_bytes_read) / HBM_BW and
tokens/s <= batch / step_time.

Run on the real chip (JAX_PLATFORMS=axon). Use --model/--batch/--steps to
vary; defaults match BASELINE config #3 (7B INT8, batch 8).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = {  # bytes/s, per chip
    "v5e": 819e9,   # TPU v5e (lite): ~819 GB/s
    "v5p": 2765e9,
    "cpu": 50e9,    # irrelevant; CPU runs are smoke tests only
}


def _bench_params(cfg, quantize: bool, key):
    """Random weights straight in their storage dtype (no fp32 staging —
    benchmark numerics don't matter, HBM traffic does)."""
    from simplellminference_tpu.ops.linear import QuantizedWeight

    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n, kvn, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    gs = 128
    dtype = jnp.dtype(cfg.dtype)

    def w(shape):
        nonlocal key
        key, sub = jax.random.split(key)
        if not quantize:
            return (jax.random.normal(sub, shape, jnp.bfloat16) *
                    (shape[-2] ** -0.5)).astype(dtype)
        k_dim = shape[-2]
        g = max(k_dim // gs, 1)
        q = jax.random.randint(sub, shape, -127, 128, jnp.int8)
        scales = jnp.full((*shape[:-2], g, shape[-1]), 1e-3, jnp.float32)
        return QuantizedWeight(q=q, scales=scales)

    key, k_emb = jax.random.split(key)
    params = {
        "embed": (jax.random.normal(k_emb, (v, h), jnp.bfloat16) * 0.02
                  ).astype(dtype),
        "layers": {
            "input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype),
            "wq": w((L, h, n * d)), "wk": w((L, h, kvn * d)),
            "wv": w((L, h, kvn * d)), "wo": w((L, n * d, h)),
            "w_gate": w((L, h, i)), "w_up": w((L, h, i)),
            "w_down": w((L, i, h)),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    key, k_head = jax.random.split(key)
    params["lm_head"] = (jax.random.normal(k_head, (h, v), jnp.bfloat16) * 0.02
                         ).astype(dtype)
    return params


def weight_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b",
                    choices=["llama2-7b", "tinyllama", "llama2-13b"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024, help="KV capacity")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--fp", action="store_true", help="bf16 weights, no quant")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.runtime.generator import Generator

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "llama2-13b": ModelConfig.llama2_13b,
          "tinyllama": ModelConfig.tinyllama_1_1b}[args.model]
    cfg = mk(max_seq_len=args.ctx, dtype="bfloat16")

    quantize = not args.fp
    params = _bench_params(cfg, quantize, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    wbytes = weight_bytes(params)

    gen = Generator(cfg, params, max_batch=args.batch, max_seq=args.ctx,
                    kv_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, args.prompt_len).tolist()
               for _ in range(args.batch)]

    # Warmup (compiles prefill + fused decode).
    toks = gen.generate_fused(prompts, max_new_tokens=8)
    jax.block_until_ready(toks)

    t0 = time.perf_counter()
    toks = gen.generate_fused(prompts, max_new_tokens=args.steps)
    jax.block_until_ready(toks)
    el = time.perf_counter() - t0

    # Decode-only timing: subtract the (re-run) prefill cost.
    cache = gen.new_cache(args.batch)
    t1 = time.perf_counter()
    last, cache, _ = gen.prefill(cache, prompts)
    jax.block_until_ready(last)
    prefill_s = time.perf_counter() - t1
    del cache

    decode_s = max(el - prefill_s, 1e-9)
    total_new = args.batch * args.steps
    toks_per_s = total_new / decode_s

    # Roofline: per decode step read all weights once + the live KV prefix.
    platform = jax.devices()[0].platform
    bw = HBM_BW.get("v5e" if platform == "tpu" else "cpu")
    kv_elem_bytes = 2
    mean_len = args.prompt_len + args.steps / 2
    kv_bytes = (2 * cfg.num_layers * mean_len * cfg.num_kv_heads *
                cfg.head_dim * kv_elem_bytes)
    step_floor = (wbytes + args.batch * kv_bytes) / bw
    roofline = args.batch / step_floor
    frac = toks_per_s / roofline

    result = {
        "metric": f"decode_tokens_per_sec_per_chip_{args.model}"
                  f"_{'int8' if quantize else 'bf16'}_b{args.batch}",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(frac, 4),
    }
    if not args.quiet:
        print(json.dumps({
            "detail": {
                "platform": platform, "weight_gb": round(wbytes / 1e9, 2),
                "prefill_s": round(prefill_s, 3),
                "decode_s": round(decode_s, 3),
                "roofline_toks_s": round(roofline, 1),
                "steps": args.steps, "batch": args.batch,
            }}), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
