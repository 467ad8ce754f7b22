"""7B-shape quantization quality ladder, on-chip (VERDICT r3 item 5).

Teacher-forced decode perplexity at Llama-2-7B shape with FIXED-SEED
pseudo-random weights, through the real paged decode path on the TPU:

    bf16 (baseline) -> int8 -> int4 -> int8-KV -> fp8-KV

(W8A8 activation quantization is absent from this ladder by design:
``ModelConfig.act_quant`` applies only to compute-bound >=256-row
prefill chunks, never decode steps — its quality evidence is the
bit-exact integer-reference test in tests/test_w8a8.py.)

No real 7B safetensors exist in this environment (BASELINE config #2's
WikiText-2 gate needs real weights), so absolute PPL is meaningless —
but RELATIVE deltas at the real 7B shape measure numeric fidelity of
each storage tier through the exact serving kernels (fused dequant
matmuls, paged attention, quantizing KV appends) with 32 layers of
error compounding. Weights are hash-generated with 16-bit value
richness (quantization genuinely loses information, unlike weights
born int8) and identical across configs by construction.

    python benchmarks/quality_ladder.py [--ctx 384] [--json-out PATH]

Prints one JSON line {"ladder": {cfg: {"ppl":..., "delta_pct":...}}}
and (default) writes QUALITY_LADDER.json at the repo root.

Ref scope: the correct-math obligation of SURVEY §2.7 vs the broken
reference SwiGLU (swiglu_kernel.cpp:12-13) — quality is measured, not
assumed.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("shape", "salt"))
def _hash_floats(shape, salt: int):
    """Deterministic pseudo-random floats in [-1, 1) with 16-bit value
    richness — cheap enough to regenerate per config (threefry at 7B
    costs minutes through the dispatch tunnel)."""
    a = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    b = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)
    h = a * jnp.uint32(2654435761) + b * jnp.uint32(40503) + jnp.uint32(salt)
    h = (h ^ (h >> 15)) * jnp.uint32(2246822519)
    h = h ^ (h >> 13)
    return ((h & jnp.uint32(0xFFFF)).astype(jnp.float32)
            / 32768.0 - 1.0)


def _make_params(cfg, quant_mode: str, seed: int = 0):
    """Leaf-wise generate-then-quantize (peak memory stays ~one config,
    not fp + quantized simultaneously). ``seed`` offsets every hash salt
    so each seed draws an independent weight sample (identical across
    quant configs within a seed, by construction)."""
    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.runtime.weights import _maybe_quantize

    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n, kvn, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, \
        cfg.num_layers
    dtype = jnp.dtype(cfg.dtype)
    qc = (QuantConfig(mode=quant_mode, group_size=0)
          if quant_mode != "none" else None)

    soff = seed * 104729          # distinct prime stride per seed

    def w(path, shape, salt, sigma):
        salt = salt + soff
        # ALWAYS generate layer by layer with a per-layer salt: the
        # iota hash only sees the last two dims, so a stacked generate
        # would repeat one layer L times (degenerate compounding); the
        # per-layer loop also keeps quantization temps at 1/L of the
        # leaf (a whole-leaf f32 temp OOMs next to the built leaves).
        # Every config regenerates the IDENTICAL pre-quant values.
        path = path.replace("L/", "layers/")
        if len(shape) == 2:
            x = (_hash_floats(shape, salt) * sigma).astype(dtype)
            return x if qc is None else _maybe_quantize(path, x, qc)
        parts = []
        for li in range(shape[0]):
            x = (_hash_floats((1, *shape[1:]), salt + 7919 * li)
                 * sigma).astype(dtype)
            parts.append(x if qc is None else _maybe_quantize(path, x, qc))
            del x
        if qc is None:
            out = jnp.concatenate(parts, axis=0)
        else:
            from simplellminference_tpu.ops.linear import QuantizedWeight
            out = QuantizedWeight(
                q=jnp.concatenate([p.q for p in parts], axis=0),
                scales=jnp.concatenate([p.scales for p in parts], axis=0),
                bits=parts[0].bits)
        jax.block_until_ready(out)
        return out

    params = {
        "embed": (_hash_floats((v, h), 1 + soff) * 0.02).astype(dtype),
        "layers": {
            "input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype),
            "wqkv": w("L/wqkv", (L, h, (n + 2 * kvn) * d), 2, h ** -0.5),
            "wo": w("L/wo", (L, n * d, h), 3, (n * d) ** -0.5),
            "w_gate_up": w("L/w_gate_up", (L, h, 2 * i), 4, h ** -0.5),
            "w_down": w("L/w_down", (L, i, h), 5, i ** -0.5),
        },
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": w("lm_head", (h, v), 6, h ** -0.5),
    }
    jax.block_until_ready(params)
    return params


def decode_ppl(cfg, params, ids, kv_dtype: str, prefill_len: int) -> float:
    """Prefill ``prefill_len`` tokens, teacher-force the rest one decode
    step at a time through the paged path (the serving decode kernels,
    including quantized KV append + in-kernel dequant attention)."""
    from simplellminference_tpu.core.config import next_power_of_2
    from simplellminference_tpu.memory.allocator import PageAllocator
    from simplellminference_tpu.memory.paged_kv import (PagedKVCache,
                                                        kv_storage_dtype)
    from simplellminference_tpu.models import llama

    ps = 128
    n = len(ids)
    npages = n // ps + 2
    alloc = PageAllocator(npages, ps, 1, npages)
    assert alloc.alloc_seq(0, n)
    tables = jnp.asarray(alloc.row(0)[None])
    cache = PagedKVCache.create(cfg.num_layers, npages, cfg.num_kv_heads,
                                ps, cfg.head_dim,
                                kv_storage_dtype(kv_dtype))

    bucket = next_power_of_2(prefill_len)
    tokens = np.zeros((1, bucket), np.int32)
    tokens[0, :prefill_len] = ids[:prefill_len]
    positions = np.arange(bucket, dtype=np.int32)[None]
    logits, cache = llama.forward_paged(
        cfg, params, jnp.asarray(tokens), jnp.asarray(positions), cache,
        tables, jnp.asarray([prefill_len], np.int32), prefill=True,
        last_token_only=True)
    nll = [-float(jax.nn.log_softmax(
        logits[0, -1].astype(jnp.float32))[ids[prefill_len]])]

    @jax.jit
    def step(params, cache, tok, pos, kv_len):
        lg, cache = llama.forward_paged(
            cfg, params, tok, pos, cache, tables, kv_len, prefill=False)
        return jax.nn.log_softmax(lg[0, 0].astype(jnp.float32)), cache

    for t in range(prefill_len, n - 1):
        lsm, cache = step(params, cache,
                          jnp.asarray([[ids[t]]], jnp.int32),
                          jnp.asarray([[t]], jnp.int32),
                          jnp.asarray([t + 1], np.int32))
        nll.append(-float(lsm[ids[t + 1]]))
    return float(np.exp(np.mean(nll)))


LADDER = [
    # (name, weight quant, kv dtype)
    ("bf16", "none", "bf16"),
    ("int8", "int8", "bf16"),
    ("int4", "int4", "bf16"),
    ("int8-kv", "int8", "int8"),
    ("fp8-kv", "int8", "fp8"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=384,
                    help="total tokens (prefill 128 + teacher-forced rest)")
    ap.add_argument("--prefill", type=int, default=128)
    ap.add_argument("--json-out", default="QUALITY_LADDER.json")
    ap.add_argument("--layers", type=int, default=16,
                    help="layer count (full 7B dims; 32 layers of bf16 "
                         "= 13.5 GB weights OOMs next to pools on one "
                         "16 GB chip, so the ladder defaults to the "
                         "half stack — same per-layer geometry, 16 "
                         "layers of error compounding)")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of ladder names")
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent (weights, tokens) samples per tier; "
                         ">1 reports mean±std per tier (VERDICT r4 #8: "
                         "one seed cannot order deltas of 0.005-0.03%%)")
    args = ap.parse_args()

    from simplellminference_tpu.core.config import ModelConfig

    import dataclasses as _dc
    cfg = _dc.replace(
        ModelConfig.llama2_7b(max_seq_len=1024, dtype="bfloat16"),
        num_layers=args.layers)

    want = set(args.only.split(",")) if args.only else None
    # per-tier lists of (ppl, delta_pct-vs-that-seed's-bf16): the delta
    # is paired WITHIN a seed (same weights, same tokens), so its spread
    # across seeds is the quantization effect's sampling noise, not the
    # (huge) seed-to-seed absolute-PPL variation.
    samples: dict[str, list[tuple[float, float]]] = {}
    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        ids = rng.integers(1, cfg.vocab_size, args.ctx).tolist()
        base = None
        for name, mode, kvd in LADDER:
            if want and name not in want:
                continue
            t0 = time.time()
            params = _make_params(cfg, mode, seed=seed)
            ppl = decode_ppl(cfg, params, ids, kvd, args.prefill)
            del params
            if base is None:
                base = ppl
            d = (ppl - base) / base * 100
            samples.setdefault(name, []).append((ppl, d))
            print(f"[seed {seed} {name}: ppl={ppl:.4f} delta={d:+.4f}%"
                  f" ({time.time() - t0:.0f}s)]", file=sys.stderr,
                  flush=True)
    out = {}
    for name, vals in samples.items():
        ppls = np.array([v[0] for v in vals])
        ds = np.array([v[1] for v in vals])
        out[name] = {"ppl": round(float(ppls.mean()), 4),
                     "delta_pct": round(float(ds.mean()), 4)}
        if args.seeds > 1:
            out[name].update(
                ppl_std=round(float(ppls.std(ddof=1)), 4),
                delta_pct_std=round(float(ds.std(ddof=1)), 4))
    rec = {"metric": "decode_ppl_ladder_llama2_7b_shape",
           "ctx": args.ctx, "prefill": args.prefill, "seeds": args.seeds,
           "layers": args.layers, "ladder": out}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
