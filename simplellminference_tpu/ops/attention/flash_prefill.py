"""Pallas flash prefill attention: causal, GQA, blockwise online softmax.

Successor of the reference's dense MHA (3 CUDA kernels materializing a
[heads, seq] score buffer per query — mha_kernel.cu:63-130), redesigned so
the [Sq, Sk] score matrix never exists in HBM (SURVEY.md §5 long-context):
per (batch, q-head, q-block), iterate kv blocks up to the causal frontier
with a running (max, sum, acc) in VMEM scratch.

Causal-block skipping uses index-map clamping: kv grid steps past the
causal frontier re-map to the frontier block, so Pallas skips the re-DMA
and @pl.when skips the compute — out-of-range blocks cost nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(*refs, scale: float, bq: int, bk: int, causal: bool,
                  window: int | None, logit_cap: float | None,
                  has_sinks: bool = False):
    if has_sinks:
        sinks_ref, *refs = refs
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        if has_sinks:
            # GPT-OSS sink: online softmax initialized at (m=sink, l=1)
            m_ref[:] = jnp.full_like(m_ref, sinks_ref[hi])
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Causal frontier: kv block strictly above the diagonal -> skip.
    run = (not causal) or (ki * bk <= qi * bq + bq - 1)
    if window is not None:
        # kv block entirely below every query row's window start -> skip
        # (newest query in the tile attends keys > qi*bq + bq-1 - window).
        run = run & (ki * bk + bk - 1 >= qi * bq - (window - 1))

    @pl.when(run)
    def _():
        # MXU wants narrow operands: keep q/k/v in their storage dtype
        # (bf16) and accumulate in f32 (preferred_element_type). An f32
        # upcast before the dot forces the MXU onto its multi-pass f32
        # path (~8x slower) — measured 859 ms -> ~160 ms attention time
        # for an 8k prefill after this change.
        q = q_ref[0, 0]                             # [bq, D]
        k = k_ref[0, 0]                             # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, bk]
        if logit_cap:  # Gemma-2 attention soft cap (before masking)
            s = logit_cap * jnp.tanh(s * (1.0 / logit_cap))

        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            k_pos = ki * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            keep = k_pos <= q_pos
            if window is not None:
                keep = keep & (k_pos > q_pos - window)
            s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]                        # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                       # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)              # [bq, 1]
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        v = v_ref[0, 0]                              # [bk, D]
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:, :1] = m_new

    @pl.when(ki == nk - 1)
    def _():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "bq", "bk",
                                             "kv_layout", "interpret",
                                             "window", "sm_scale",
                                             "logit_cap"))
def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  causal: bool = True, bq: int = 512, bk: int = 1024,
                  kv_layout: str = "bsnd",
                  interpret: bool = False,
                  window: int | None = None,
                  sm_scale: float | None = None,
                  logit_cap: float | None = None,
                  sinks: jax.Array | None = None) -> jax.Array:
    """q: [B, Sq, N, D]; k/v: [B, Sk, kvN, D] (kv_layout="bsnd") or
    [B, kvN, Sk, D] (kv_layout="bnsd", the KV-cache layout — no transpose
    of the cache needed) -> [B, Sq, N, D].

    Sq/Sk must be padded to bq/bk multiples by the caller (the runtime
    buckets prompt lengths, generator.py). GQA by head-index mapping.

    ``window``: sliding-window attention — query i attends keys with
    q_pos - k_pos < window (requires causal). kv blocks fully outside
    the window band are skipped (index-map clamping, like the causal
    frontier), so cost is O(Sq · window) instead of O(Sq²)/2.
    """
    assert window is None or causal, "sliding window requires causal"
    b, sq, n, d = q.shape
    if kv_layout == "bsnd":
        _, sk, kvn, _ = k.shape
        kT = k.transpose(0, 2, 1, 3)
        vT = v.transpose(0, 2, 1, 3)
    else:
        _, kvn, sk, _ = k.shape
        kT, vT = k, v
    group = n // kvn
    scale = d ** -0.5 if sm_scale is None else sm_scale

    # Big kv blocks are the MXU-efficiency knob (the QK output tile and
    # PV contraction): measured 37 TFLOPs at bk=256 vs 136 at bk=1024 on
    # v5e. Snap down to divisors for awkward (non-power-of-two) lengths.
    bq = min(bq, sq)
    bk = min(bk, sk)
    while sq % bq:
        bq -= 128
    while sk % bk:
        bk -= 128
    assert sq % bq == 0 and sk % bk == 0, (sq, bq, sk, bk)
    nq, nk = sq // bq, sk // bk

    # [B, S, N, D] -> [B, N, S, D] so the last two dims are (seq, head_dim).
    qT = q.transpose(0, 2, 1, 3)

    def clamp_k(i_b, i_h, i_q, i_k):
        if causal:
            # last kv block the causal frontier allows for this q block
            frontier = jax.lax.div(i_q * bq + bq - 1, bk)
            i_k = jnp.minimum(i_k, frontier)
        if window is not None:
            # first kv block the oldest query row's window reaches:
            # steps below it re-map there (no DMA; @pl.when skips compute)
            lo = jnp.maximum(i_q * bq - (window - 1), 0) // bk
            i_k = jnp.maximum(i_k, lo)
        return i_k

    has_sinks = sinks is not None
    in_specs = [
        pl.BlockSpec((1, 1, bq, d),
                     lambda i_b, i_h, i_q, i_k: (i_b, i_h, i_q, 0)),
        pl.BlockSpec((1, 1, bk, d),
                     lambda i_b, i_h, i_q, i_k:
                     (i_b, jax.lax.div(i_h, group),
                      clamp_k(i_b, i_h, i_q, i_k), 0)),
        pl.BlockSpec((1, 1, bk, d),
                     lambda i_b, i_h, i_q, i_k:
                     (i_b, jax.lax.div(i_h, group),
                      clamp_k(i_b, i_h, i_q, i_k), 0)),
    ]
    operands = [qT, kT, vT]
    if has_sinks:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = [sinks.astype(jnp.float32)] + operands
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, bq=bq, bk=bk,
                          causal=causal, window=window,
                          logit_cap=logit_cap, has_sinks=has_sinks),
        grid=(b, n, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i_b, i_h, i_q, i_k: (i_b, i_h, i_q, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane 0 used)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum (lane 0 used)
            pltpu.VMEM((bq, d), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * n * sq * sk * d * (0.5 if causal else 1.0)),
            bytes_accessed=(b * n * sq * d + 2 * b * kvn * sk * d) * 2,
            transcendentals=b * n * sq * sk,
        ),
        interpret=interpret,
    )(*operands)
    return out.transpose(0, 2, 1, 3)
