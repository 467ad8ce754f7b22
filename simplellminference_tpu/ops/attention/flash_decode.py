"""Pallas flash decode attention over the dense KV cache.

Successor of the reference's per-token 3-kernel MHA pipeline
(mha_kernel.cu:133-169) — one fused kernel per decode step over all batch ×
kv-head tiles, with:

  * online softmax (no [heads, seq] score buffer in HBM — reference Q4
    allocates one per step, model.cpp:279);
  * **early termination by sequence length**: `kv_lens` is scalar-prefetched
    and the kv-block index map clamps past-the-end grid steps to the last
    valid block — Pallas skips the duplicate DMA and @pl.when skips the
    compute, so each sequence only pays for its own live prefix (the dense
    XLA fallback reads all max_seq slots);
  * GQA: all `G = heads / kv_heads` query heads of one kv head processed
    per tile as a [G, bk] score matrix (reference maps head->kv-head
    serially, mha_kernel.cu:72);
  * **head packing**: when G is small (MHA: G == 1), HB = 8 // G kv heads
    are processed per grid step — one [HB, bk, D] DMA instead of HB tiny
    ones, and the [HB·G, bk] score block fills the VPU sublanes. Without
    this, one-head tiles run the kernel at ~12% of HBM bandwidth;
  * stacked-arena mode: cache may be [L, B, kvN, Smax, D] with a traced
    ``layer`` index consumed by the BlockSpec index maps (zero-copy reads
    from inside a scan over layers — see ops/matmul.py).

Cache layout: [B, kvN, Smax, D] (seq × head_dim in the tiled last-two dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(lens_ref, layer_ref, *refs, scale: float, bk: int,
                   group: int, hb: int, window: int | None,
                   logit_cap: float | None, has_sinks: bool = False):
    if has_sinks:
        sinks_ref, *refs = refs
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    del layer_ref  # consumed by the BlockSpec index maps
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    kv_len = lens_ref[bi]
    rows = hb * group  # query rows per tile

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            # GPT-OSS sink: online softmax initialized at (m=sink, l=1);
            # packed row r serves q head hi*rows + r
            col = jnp.stack([sinks_ref[hi * rows + r]
                             for r in range(rows)])
            m_ref[:rows, :1] = col[:, None]
            l_ref[:rows, :1] = jnp.ones((rows, 1), jnp.float32)

    run = ki * bk < kv_len
    if window is not None:
        # kv block entirely before the window start (kv_len - window)
        run = run & (ki * bk + bk > kv_len - window)

    @pl.when(run)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)              # [HB, G, D]
        k = k_ref[0, 0].astype(jnp.float32)              # [HB, bk, D]
        # Batched over packed heads: [HB, G, bk]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if logit_cap:  # Gemma-2 attention soft cap
            s = logit_cap * jnp.tanh(s * (1.0 / logit_cap))
        s = s.reshape(rows, bk)
        k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        keep = k_pos < kv_len
        if window is not None:
            keep = keep & (k_pos >= kv_len - window)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:rows, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:rows, :1] = l_ref[:rows, :1] * alpha + jnp.sum(
            p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)              # [HB, bk, D]
        pv = jax.lax.dot_general(
            p.reshape(hb, group, bk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [HB, G, D]
        acc_ref[:] = (acc_ref[:] * alpha.reshape(hb, group, 1)
                      + pv)
        m_ref[:rows, :1] = m_new

    @pl.when(ki == nk - 1)
    def _():
        l = jnp.maximum(l_ref[:rows, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:]
                       / l.reshape(hb, group, 1)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "interpret",
                                             "rows_target", "max_kv",
                                             "window", "sm_scale",
                                             "logit_cap"))
def flash_decode(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                 kv_lens: jax.Array, bk: int | None = None,
                 interpret: bool = False,
                 layer: jax.Array | None = None,
                 rows_target: int = 16,
                 max_kv: int | None = None,
                 window: int | None = None,
                 sm_scale: float | None = None,
                 logit_cap: float | None = None,
                 sinks: jax.Array | None = None) -> jax.Array:
    """q: [B, N, D]; k/v_cache: [B, kvN, Smax, D] — or the full stacked
    arena [L, B, kvN, Smax, D] with a traced ``layer`` index. kv_lens: [B]
    -> out [B, N, D]; attends to cache slots [0, kv_len) per sequence.

    ``max_kv``: static upper bound on kv_lens when the caller knows one
    tighter than the arena capacity (generate() knows prompt + max_new) —
    the seq-block grid dim shrinks to ceil(max_kv / bk), so per-step cost
    scales with the workload's real window, not the arena allocation.

    ``window``: sliding-window attention — attend only cache slots
    [max(0, kv_len - window), kv_len). Blocks before the window start
    clamp to it (no DMA, no compute): per-step cost is O(window)."""
    if k_cache.ndim == 4:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None, "stacked cache needs a layer index"
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    b, n, d = q.shape
    _, _, kvn, smax, _ = k_cache.shape
    group = n // kvn
    scale = d ** -0.5 if sm_scale is None else sm_scale
    if bk is None:
        # Cost = ceil(len/bk)*bk slots transferred + ~per-grid-step
        # overhead: small bk wastes less transfer on the partial last
        # block (dominant at short windows), large bk keeps the grid
        # small at long windows (sweep in benchmarks/micro.py).
        bk = 128 if smax <= 1024 else 256
        if smax % bk != 0:
            # the dispatcher only guarantees smax % 128 == 0 — a 1152- or
            # 1408-slot arena must not trip the divisibility assert below
            bk = 128
    bound = smax if max_kv is None else min(smax, max(bk, max_kv))
    bk = min(bk, smax)
    assert smax % bk == 0, (smax, bk)
    nk = -(-bound // bk)

    # Pack kv heads so each tile carries >= rows_target query rows (full
    # sublanes; more rows amortize per-grid-step overhead at the cost of
    # bigger KV DMA blocks).
    hb = 1
    while (hb * group < rows_target and hb * 2 <= kvn
           and kvn % (hb * 2) == 0):
        hb *= 2

    qg = q.reshape(b, kvn // hb, hb, group, d)

    def kv_index(i_b, i_h, i_k, lens_ref, layer_ref):
        # clamp past-the-end blocks to the last valid block: same index ->
        # Pallas skips the DMA; @pl.when skips the compute.
        frontier = jnp.maximum(lens_ref[i_b] - 1, 0) // bk
        i_k = jnp.minimum(i_k, frontier)
        if window is not None:
            # blocks before the window start clamp to its first block
            lo = jnp.maximum(lens_ref[i_b] - window, 0) // bk
            i_k = jnp.maximum(i_k, lo)
        return (layer_ref[0], i_b, i_h, i_k, 0)

    in_specs = [
        pl.BlockSpec((1, 1, hb, group, d),
                     lambda i_b, i_h, i_k, lens, li:
                     (i_b, i_h, 0, 0, 0)),
        pl.BlockSpec((1, 1, hb, bk, d), kv_index),
        pl.BlockSpec((1, 1, hb, bk, d), kv_index),
    ]
    operands = [qg, k_cache, v_cache]
    has_sinks = sinks is not None
    if has_sinks:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = [sinks.astype(jnp.float32)] + operands
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvn // hb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hb, group, d),
                               lambda i_b, i_h, i_k, lens, li:
                               (i_b, i_h, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((max(hb * group, 8), 128), jnp.float32),
            pltpu.VMEM((max(hb * group, 8), 128), jnp.float32),
            pltpu.VMEM((hb, group, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, bk=bk,
                          group=group, hb=hb, window=window,
                          logit_cap=logit_cap, has_sinks=has_sinks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvn // hb, hb, group, d),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * smax * d,
            bytes_accessed=2 * b * kvn * smax * d * 2,
            transcendentals=b * n * smax,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), layer, *operands)
    return out.reshape(b, n, d)