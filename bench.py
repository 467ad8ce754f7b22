"""Headline benchmark: Llama-2-7B INT8 decode tokens/sec/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline measures BASELINE config #3 the honest way: decode
throughput THROUGH the continuous-batching Engine (paged KV cache,
admit/burst scheduling, on-device sampling) — not a stripped fused loop.
Decode-only isolation by differencing: the same engine workload runs at
``steps`` and ``steps/2`` new tokens and the difference cancels prefill
and fixed dispatch costs exactly. The stripped fused-loop number is
reported alongside in the stderr detail as the kernel-path ceiling.

``vs_baseline`` is the fraction of the per-chip HBM-bandwidth roofline
achieved (the reference publishes no numbers — BASELINE.md; the
BASELINE.json target is >=85% of roofline). Roofline model: decode is
bandwidth-bound, so step_time >= (weight_bytes + batch * kv_bytes_read)
/ HBM_BW and tokens/s <= batch / step_time.

Run on the real chip (JAX_PLATFORMS=axon). Use --model/--batch/--steps to
vary; defaults match BASELINE config #3 (7B INT8, batch 8).
"""

from __future__ import annotations

import argparse
import functools
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


def _bench_params(cfg, quant: str, key):
    """Fake weights straight in their storage dtype — benchmark numerics
    don't matter, HBM traffic does. Deterministic iota hashing instead of
    threefry RNG: generating real random 7B tensors on-device costs ~5 min
    through the dispatch tunnel; this is milliseconds."""
    del key
    from simplellminference_tpu.ops.linear import QuantizedWeight

    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n, kvn, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    dtype = jnp.dtype(cfg.dtype)

    @functools.partial(jax.jit, static_argnames=("shape",))
    def _fake_int8(shape):
        a = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        btt = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
        return (((a * 37 + btt * 101 + 13) % 255) - 127).astype(jnp.int8)

    def w(shape):
        if quant == "none":
            scale = shape[-2] ** -0.5 / 127.0
            return (_fake_int8(shape).astype(jnp.float32) * scale
                    ).astype(dtype)
        if quant == "int4":
            # split-half packed storage (ops/matmul.py int4 path):
            # half the rows, two nibbles per byte
            pshape = (*shape[:-2], shape[-2] // 2, shape[-1])
            scales = jnp.full((*shape[:-2], 1, shape[-1]),
                              shape[-2] ** -0.5 / 7.0, jnp.float32)
            return QuantizedWeight(q=_fake_int8(pshape), scales=scales,
                                   bits=4)
        q = _fake_int8(shape)
        # Per-output-channel scales (QuantConfig.group_size=0): the
        # standard near-lossless weight-only INT8 scheme, and the fastest —
        # groupwise scale arrays are large enough that XLA's loop optimizer
        # re-stages them every layer step (measured ~2 GB/step of hidden
        # traffic at group 128).
        scales = jnp.full((*shape[:-2], 1, shape[-1]),
                          shape[-2] ** -0.5 / 127.0, jnp.float32)
        return QuantizedWeight(q=q, scales=scales)

    params = {
        "embed": _fake_int8((v, h)).astype(dtype) * 0.002,
        "layers": {
            "input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype),
            "wqkv": w((L, h, (n + 2 * kvn) * d)),
            "wo": w((L, n * d, h)),
            "w_gate_up": w((L, h, 2 * i)),
            "w_down": w((L, i, h)),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    # INT8 LM head (QuantConfig.quantize_lm_head): halves the largest
    # single weight read of the decode step (h x vocab).
    params["lm_head"] = (w((h, v)) if quant != "none"
                         else _fake_int8((h, v)).astype(dtype) * 0.002)
    return params


def weight_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params))


def _engine_decode_time(cfg, params, args, steps: int) -> float:
    """Wall time of a full Engine run (admit + prefill + decode to
    ``steps`` new tokens per request). Differencing two calls isolates
    the decode segment. Fresh engine per call: the paged pools and all
    compiled graphs are rebuilt identically, and fresh prompt tokens
    defeat the relay's result cache."""
    import time as _time

    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine

    rng = np.random.default_rng(_time.monotonic_ns() % (1 << 31))
    ps = args.page_size
    cap = args.prompt_len + args.steps + 2 * args.burst + ps
    ecfg = EngineConfig(
        max_batch_size=args.batch,
        kv=KVCacheConfig(page_size=ps,
                         num_pages=args.batch * (cap // ps + 1) + 8,
                         max_pages_per_seq=cap // ps + 1,
                         kv_dtype=args.kv_dtype),
        prefix_cache_entries=0)   # bench prompts are random — no reuse
    eng = Engine(cfg, params, ecfg, decode_burst=args.burst)
    sampling = SamplingParams(max_new_tokens=steps)

    def submit():
        for _ in range(args.batch):
            eng.add_request(
                prompt_ids=rng.integers(
                    1, cfg.vocab_size, args.prompt_len).tolist(),
                sampling=sampling)

    submit()
    eng.run()           # compile all graphs (prefill batch + burst)
    best = None
    for _ in range(5):
        # min-of-5: the differenced value 512/(te_full - te_half)
        # amplifies wobble in either operand ~4x, and the noise is
        # one-sided (runs are only ever slower than physics), so the
        # min converges with reps — ~15 s of extra bench time
        submit()
        t0 = time.perf_counter()
        eng.run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama2-7b",
                    choices=["llama2-7b", "tinyllama", "llama2-13b"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024, help="KV capacity")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--steps", type=int, default=128,
                    help="decode steps (128 = the cross-round "
                         "comparable config; the differenced engine "
                         "number has ~±1.3%% run-to-run spread at this "
                         "length — longer runs average more KV context "
                         "and page-granularity waste, which lowers the "
                         "live-bytes roofline fraction, so do not "
                         "compare across different --steps)")
    ap.add_argument("--burst", type=int, default=16,
                    help="engine decode-burst depth (16 is the measured "
                         "knee: 719 tok/s vs 715 at 8, flat at 32; "
                         "16 steps = ~0.22 s between scheduler syncs)")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--kv-dtype", default="bf16",
                    choices=["bf16", "f32", "int8", "fp8"],
                    help="engine KV-cache storage dtype (int8: per-token-"
                         "head scales, token-exact on TinyLlama greedy, "
                         "decode-PPL delta -0.08%% — tests/test_kv_quality"
                         ".py; halves the KV stream)")
    ap.add_argument("--fused-only", action="store_true",
                    help="report the stripped fused loop as the headline "
                         "(r1 behavior)")
    ap.add_argument("--fp", action="store_true", help="bf16 weights, no quant")
    ap.add_argument("--quant", default=None, choices=["none", "int8", "int4"],
                    help="weight storage (default int8; int4 = capacity "
                         "mode, see core/config.py QuantConfig)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.runtime.generator import Generator

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "llama2-13b": ModelConfig.llama2_13b,
          "tinyllama": ModelConfig.tinyllama_1_1b}[args.model]
    cfg = mk(max_seq_len=args.ctx, dtype="bfloat16")

    quant = args.quant or ("none" if args.fp else "int8")
    quantize = quant != "none"
    params = _bench_params(cfg, quant, jax.random.PRNGKey(0))
    from simplellminference_tpu.runtime.weights import canonicalize_layouts
    params = canonicalize_layouts(params)
    jax.block_until_ready(params)
    wbytes = weight_bytes(params)

    gen = Generator(cfg, params, max_batch=args.batch, max_seq=args.ctx,
                    kv_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def fresh_prompts():
        # The axon relay caches results for identical (executable, inputs) —
        # every timed run must use fresh prompt tokens.
        return [rng.integers(1, cfg.vocab_size, args.prompt_len).tolist()
                for _ in range(args.batch)]

    # Decode-only timing via differencing: run the fused prefill+decode jit
    # at `steps` and `steps//2` and subtract — prefill cost and the ~25 ms
    # host dispatch latency cancel exactly.
    # NOTE: sync via device->host copy of the result — block_until_ready is
    # unreliable through the axon relay (returns before compute finishes).
    half = args.steps // 2
    for s in (half, args.steps):       # compile both
        np.asarray(gen.generate_fused(fresh_prompts(), max_new_tokens=s))

    def timed(s):
        p = fresh_prompts()
        t0 = time.perf_counter()
        np.asarray(gen.generate_fused(p, max_new_tokens=s))
        return time.perf_counter() - t0

    t_full = min(timed(args.steps) for _ in range(3))
    t_half = min(timed(half) for _ in range(3))
    prefill_s = max(2 * t_half - t_full, 0.0)  # derived, for reporting

    decode_s = max(t_full - t_half, 1e-9)
    total_new = args.batch * (args.steps - half)
    fused_toks_per_s = total_new / decode_s

    # --- the honest config-#3 path: Engine + paged KV + batch 8 ---
    if args.fused_only:
        eng_toks_per_s = None
    else:
        te_full = _engine_decode_time(cfg, params, args, args.steps)
        te_half = _engine_decode_time(cfg, params, args, half)
        eng_decode_s = max(te_full - te_half, 1e-9)
        eng_toks_per_s = total_new / eng_decode_s

    toks_per_s = (fused_toks_per_s if args.fused_only
                  else eng_toks_per_s)

    # Roofline: per decode step read all weights once + the live KV
    # prefix. The differenced segment is steps/2..steps, so its mean
    # live context is prompt + 3/4 steps.
    platform = jax.devices()[0].platform
    bw = HBM_BW.get("v5e" if platform == "tpu" else "cpu")
    # Actual mandatory KV traffic for the configured storage dtype —
    # the roofline is a lower bound on the bytes THIS workload must
    # stream (int8 adds 4B/token/head of per-token scales).
    kv_elem_bytes = {"f32": 4.0, "bf16": 2.0, "fp8": 1.0,
                     "int8": 1.0 + 4.0 / cfg.head_dim}[
        args.kv_dtype if not args.fused_only else "bf16"]
    mean_len = args.prompt_len + args.steps * 3 / 4
    kv_bytes = (2 * cfg.num_layers * mean_len * cfg.num_kv_heads *
                cfg.head_dim * kv_elem_bytes)
    step_floor = (wbytes + args.batch * kv_bytes) / bw
    roofline = args.batch / step_floor
    frac = toks_per_s / roofline

    result = {
        "metric": f"serve_decode_tokens_per_sec_per_chip_{args.model}"
                  f"_{quant if quantize else 'bf16'}_b{args.batch}"
                  + ("_fusedloop" if args.fused_only else "_engine"),
        "value": round(toks_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(frac, 4),
    }
    if not args.quiet:
        # Context for vs_baseline: the 819 GB/s nominal HBM roofline is
        # not reachable by any pipelined DMA stream on this part — a
        # pure-stream Pallas kernel (no compute) measures ~740 GB/s
        # (benchmarks/micro.py stream test), so ~90% of nominal is the
        # achievable ceiling for ANY implementation of this workload.
        practical = roofline * (740.0 / 819.0)
        print(json.dumps({
            "detail": {
                "platform": platform, "weight_gb": round(wbytes / 1e9, 2),
                "prefill_s": round(prefill_s, 3),
                "fused_decode_toks_s": round(fused_toks_per_s, 1),
                "engine_decode_toks_s": (round(eng_toks_per_s, 1)
                                         if eng_toks_per_s else None),
                "roofline_toks_s": round(roofline, 1),
                "practical_stream_ceiling_toks_s": round(practical, 1),
                "frac_of_practical": round(toks_per_s / practical, 4),
                "steps": args.steps, "batch": args.batch,
                "burst": args.burst,
            }}), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
