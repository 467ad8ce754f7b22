"""Microbenchmarks for the hot decode-path ops on the real chip.

Isolates each component of the decode step (quantized matmul, flash decode
attention, the layer scan) and reports achieved HBM GB/s vs the v5e roofline
(~819 GB/s), so kernel regressions show up as numbers, not vibes.

Axon-relay constraints (same as bench.py): dispatch latency ~25 ms and
result caching for identical (executable, input) pairs — so every op is
timed as a lax.scan of T steps inside ONE jit with step-dependent inputs,
and cost is computed by differencing T and T/2 runs.
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

V5E_BW = 819e9


def timed_scan(step_fn, carry_init, t_steps: int, consts=()) -> float:
    """Run step_fn(carry, i, *consts) in a scan of length t; return seconds.

    Big arrays MUST go through ``consts`` (jit arguments) — closure-captured
    arrays are embedded in the HLO and blow the remote-compile request size
    limit (HTTP 413) through the axon tunnel.
    """

    @functools.partial(jax.jit, static_argnames=("t",))
    def run(carry, t, salt, *consts):
        # `salt` varies per call: the axon relay caches results for
        # identical (executable, inputs) pairs, so every timed run must
        # differ in at least one input bit.
        carry = jax.tree.map(
            lambda x: (x + salt.astype(x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x),
            carry)

        def body(c, i):
            c = step_fn(c, i, *consts)
            return c, None
        c, _ = jax.lax.scan(body, carry, jnp.arange(t))
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), c)

    salt_ctr = iter(range(1, 1 << 20))

    def _go(t):
        salt = jnp.float32(next(salt_ctr) * 1e-8)
        return np.asarray(jax.tree.leaves(run(carry_init, t, salt,
                                              *consts))[0])

    _go(t_steps)   # compile + warm
    _go(t_steps // 2)

    def t_of(t):
        t0 = time.perf_counter()
        _go(t)
        return time.perf_counter() - t0

    full = min(t_of(t_steps) for _ in range(3))
    half = min(t_of(t_steps // 2) for _ in range(3))
    return max(full - half, 1e-9) / (t_steps - t_steps // 2)


def bench_qmm(m=8, k=4096, n=12288, gs=128, t=256, stacked_layers=0):
    """Fused dequant+matmul. stacked_layers>0 = index a [L,K,N] weight in
    the loop (the scan-over-layers pattern the model actually runs)."""
    from simplellminference_tpu.ops.matmul import quantized_matmul

    key = jax.random.PRNGKey(0)
    if stacked_layers:
        q = jax.random.randint(key, (stacked_layers, k, n), -127, 127, jnp.int8)
        s = jnp.ones((stacked_layers, k // gs, n), jnp.float32) * 1e-3
    else:
        q = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        s = jnp.ones((k // gs, n), jnp.float32) * 1e-3
    x = jnp.ones((m, k), jnp.bfloat16)

    def step(c, i, q, s):
        x = c
        if stacked_layers:
            li = i % stacked_layers
            qi = jax.lax.dynamic_index_in_dim(q, li, keepdims=False)
            si = jax.lax.dynamic_index_in_dim(s, li, keepdims=False)
        else:
            qi, si = q, s
        y = quantized_matmul(x + i.astype(jnp.bfloat16) * 0, qi, si)
        return y[:, :k] * 0 + x  # keep shape, force dependency

    sec = timed_scan(step, x, t, consts=(q, s))
    bytes_ = k * n + (k // gs) * n * 4
    return {"op": f"qmm m{m} k{k} n{n}" + (f" L{stacked_layers}" if stacked_layers else ""),
            "us": round(sec * 1e6, 1),
            "gb_s": round(bytes_ / sec / 1e9, 1),
            "roofline_frac": round(bytes_ / sec / V5E_BW, 3)}


def bench_qmm_cfg(m=8, k=4096, n=12288, gs=128, t=64, bn=512, bk=512,
                  bm=None):
    from simplellminference_tpu.ops.matmul import quantized_matmul

    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    s = jnp.ones((k // gs, n), jnp.float32) * 1e-3
    x = jnp.ones((m, k), jnp.bfloat16)

    def step(c, i, q, s):
        y = quantized_matmul(c + i.astype(jnp.bfloat16) * 0, q, s,
                             bn=bn, bk=bk, bm=bm)
        return y[:, :k] * 0 + c

    sec = timed_scan(step, x, t, consts=(q, s))
    bytes_ = k * n + (k // gs) * n * 4
    return {"op": f"qmm k{k} n{n} bn{bn} bk{bk}", "us": round(sec * 1e6, 1),
            "gb_s": round(bytes_ / sec / 1e9, 1),
            "roofline_frac": round(bytes_ / sec / V5E_BW, 3)}


def bench_qmm_sweep(a):
    for bn, bk in ((512, 512), (1024, 512), (512, 1024), (1024, 1024),
                   (2048, 512), (1024, 2048), (2048, 1024), (4096, 1024),
                   (1536, 1024), (3072, 512), (12288, 512), (12288, 1024)):
        try:
            print(json.dumps(bench_qmm_cfg(bn=bn, bk=bk, t=256)), flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(json.dumps({"op": f"qmm bn{bn} bk{bk}",
                              "error": str(e)[:120]}), flush=True)
    return {"op": "qmm_sweep", "done": True}


def bench_flash_sweep(a):
    for kv_len in (144, 512, 1024):
        for bk, rows in ((256, 16), (256, 32), (512, 16), (512, 32),
                         (1024, 16), (128, 32)):
            try:
                r = bench_flash_decode_cfg(bk=bk, rows_target=rows,
                                           kv_len=kv_len, t=256)
                print(json.dumps(r), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"op": f"flash bk{bk} rt{rows} l{kv_len}",
                                  "error": str(e)[:120]}), flush=True)
    return {"op": "flash_sweep", "done": True}


def bench_flash_decode_cfg(b=8, n=32, kvn=32, d=128, smax=1024, kv_len=256,
                           t=32, bk=256, rows_target=16):
    from simplellminference_tpu.ops.attention.flash_decode import flash_decode

    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (b, kvn, smax, d), jnp.bfloat16)
    vc = jax.random.normal(key, (b, kvn, smax, d), jnp.bfloat16)
    lens = jnp.full((b,), kv_len, jnp.int32)
    q = jnp.ones((b, n, d), jnp.bfloat16)

    def step(c, i, kc, vc):
        o = flash_decode(c + i.astype(jnp.bfloat16) * 0, kc, vc, lens,
                         bk=bk, rows_target=rows_target)
        return o * 0 + c

    sec = timed_scan(step, q, t, consts=(kc, vc))
    bytes_ = 2 * b * kvn * kv_len * d * 2
    return {"op": f"flash_decode bk{bk} rt{rows_target} len{kv_len}/{smax}",
            "us": round(sec * 1e6, 1),
            "gb_s": round(bytes_ / sec / 1e9, 1),
            "roofline_frac": round(bytes_ / sec / V5E_BW, 3)}


def bench_bf16_matmul(m=8, k=4096, n=12288, t=256):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    x = jnp.ones((m, k), jnp.bfloat16)

    def step(c, i, w):
        y = jnp.dot(c + i.astype(jnp.bfloat16) * 0, w,
                    preferred_element_type=jnp.float32)
        return y[:, :k].astype(jnp.bfloat16) * 0 + c

    sec = timed_scan(step, x, t, consts=(w,))
    bytes_ = k * n * 2
    return {"op": f"bf16mm m{m} k{k} n{n}", "us": round(sec * 1e6, 1),
            "gb_s": round(bytes_ / sec / 1e9, 1),
            "roofline_frac": round(bytes_ / sec / V5E_BW, 3)}


def bench_flash_decode(b=8, n=32, kvn=32, d=128, smax=1024, kv_len=256, t=256):
    from simplellminference_tpu.ops.attention.flash_decode import flash_decode

    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (b, kvn, smax, d), jnp.bfloat16)
    vc = jax.random.normal(key, (b, kvn, smax, d), jnp.bfloat16)
    lens = jnp.full((b,), kv_len, jnp.int32)
    q = jnp.ones((b, n, d), jnp.bfloat16)

    def step(c, i, kc, vc):
        o = flash_decode(c + i.astype(jnp.bfloat16) * 0, kc, vc, lens)
        return o * 0 + c

    sec = timed_scan(step, q, t, consts=(kc, vc))
    bytes_ = 2 * b * kvn * kv_len * d * 2  # live prefix only
    return {"op": f"flash_decode b{b} kvn{kvn} len{kv_len}/{smax}",
            "us": round(sec * 1e6, 1),
            "gb_s": round(bytes_ / sec / 1e9, 1),
            "roofline_frac": round(bytes_ / sec / V5E_BW, 3)}


def bench_decode_step(model="llama2-7b", batch=8, ctx=1024, t=32,
                      quantize=True):
    """Full model decode step via forward() — the end-to-end per-step cost."""
    import bench as bench_mod
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.kv_cache import DenseKVCache

    mk = {"llama2-7b": ModelConfig.llama2_7b,
          "tinyllama": ModelConfig.tinyllama_1_1b}[model]
    cfg = mk(max_seq_len=ctx, dtype="bfloat16")
    params = bench_mod._bench_params(
        cfg, quantize if isinstance(quantize, str)
        else ("int8" if quantize else "none"), None)
    wbytes = bench_mod.weight_bytes(params)
    cache = DenseKVCache.create(cfg.num_layers, batch, ctx,
                                cfg.num_kv_heads, cfg.head_dim, jnp.bfloat16)

    tok = jnp.ones((batch,), jnp.int32)
    pos = jnp.full((batch,), 128, jnp.int32)

    def sfn(c, i, params):
        (cache, tok, pos) = c
        logits, cache = llama.forward(cfg, params, tok[:, None], pos[:, None],
                                      cache, pos, pos + 1)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (cache, nxt, pos + 1)

    sec = timed_scan(sfn, (cache, tok, pos), t, consts=(params,))
    return {"op": f"decode_step {model} b{batch}", "us": round(sec * 1e6, 1),
            "ms": round(sec * 1e3, 2),
            "weights_gb_s": round(wbytes / sec / 1e9, 1),
            "roofline_frac": round(wbytes / sec / V5E_BW, 3)}


BENCHES = {
    "qmm": lambda a: bench_qmm(),
    "qmm_stacked": lambda a: bench_qmm(stacked_layers=8, t=32),
    "qmm_wide": lambda a: bench_qmm(k=11008, n=4096),
    "qmm_sweep": bench_qmm_sweep,
    "bf16mm": lambda a: bench_bf16_matmul(),
    "lm_head": lambda a: bench_bf16_matmul(k=4096, n=32000, t=32),
    "lm_head_int8": lambda a: bench_qmm(k=4096, n=32000, t=32),
    "flash_decode": lambda a: bench_flash_decode(),
    "flash_sweep": bench_flash_sweep,
    "decode_step": lambda a: bench_decode_step(t=a.t or 32),
    "decode_step_tiny": lambda a: bench_decode_step("tinyllama", t=a.t or 64),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*", default=["qmm"],
                    choices=list(BENCHES) + [[]],
                    help="benchmarks to run")
    ap.add_argument("--t", type=int, default=0)
    args = ap.parse_args()
    for name in args.which or ["qmm"]:
        res = BENCHES[name](args)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
