"""Dynamic-length flash decode: in-kernel KV loop, manual double buffering.

The grid-based flash_decode pays a fixed cost for every (batch, head, k
block) grid step of the FULL cache capacity — early termination skips the
DMA and compute of dead blocks, but not the grid machinery, q/out block
revisits, or the scratch init. At short live prefixes that overhead
dominates (measured ~215 GB/s effective at len 144/1024 vs ~800 GB/s at
full length).

This kernel moves the KV loop INSIDE the kernel: grid is only
(batch, head-block); the trip count is ``ceil(kv_len / bk)`` — a traced
per-sequence value — and the HBM→VMEM page DMAs are issued manually with
two-slot double buffering (pattern per the Pallas TPU guide). Dead blocks
simply never exist.

MEASURED (v5e, 7B shapes, benchmarks/micro.py style): the 2-deep manual
pipeline loses to the auto-pipelined grid kernel at long prefixes (627 vs
~800 GB/s at len 1024) and only ties at short ones (len-128 floor is the
per-program fixed cost either way; the grid kernel with rows_target=16
reaches 74 us there). Kept as the reference manual-DMA implementation —
NOT dispatched by default (ops/attention/dispatch.py uses flash_decode).

Constraints: head_dim must be 128-aligned (Mosaic cannot slice sub-128
lane dims on the manual-DMA path; d=64 models use the grid kernel), and
the cache token capacity must be a multiple of bk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _dyn_kernel(lens_ref, layer_ref, q_ref, k_hbm, v_hbm, o_ref,
                kbuf, vbuf, sems, *, scale: float, bk: int, group: int,
                hb: int):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    li = layer_ref[0]
    kv_len = lens_ref[bi]
    nblk = pl.cdiv(kv_len, bk)
    rows = hb * group
    h0 = pl.multiple_of(hi * hb, hb)

    def dma(slot, blk, buf, hbm, sem_idx):
        start = pl.multiple_of(blk * bk, bk)
        return pltpu.make_async_copy(
            hbm.at[li, bi, pl.ds(h0, hb), pl.ds(start, bk), :],
            buf.at[slot],
            sems.at[slot, sem_idx])

    dma(0, 0, kbuf, k_hbm, 0).start()
    dma(0, 0, vbuf, v_hbm, 1).start()

    q = q_ref[0, 0].astype(jnp.float32)                  # [HB, G, D]

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nblk)
        def _():
            dma(nxt, i + 1, kbuf, k_hbm, 0).start()
            dma(nxt, i + 1, vbuf, v_hbm, 1).start()

        dma(slot, i, kbuf, k_hbm, 0).wait()
        dma(slot, i, vbuf, v_hbm, 1).wait()

        k = kbuf[slot].astype(jnp.float32)               # [HB, bk, D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [HB, G, bk]
        s = s.reshape(rows, bk)
        k_pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = vbuf[slot].astype(jnp.float32)               # [HB, bk, D]
        pv = jax.lax.dot_general(
            p.reshape(hb, group, bk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [HB, G, D]
        acc = acc * alpha.reshape(hb, group, 1) + pv
        return m_new, l_new, acc

    d = q.shape[-1]
    init = (jnp.full((rows, 1), NEG_INF, jnp.float32),
            jnp.zeros((rows, 1), jnp.float32),
            jnp.zeros((hb, group, d), jnp.float32))
    _, l, acc = jax.lax.fori_loop(0, nblk, body, init)
    l = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l.reshape(hb, group, 1)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def flash_decode_dyn(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     kv_lens: jax.Array, bk: int = 256,
                     interpret: bool = False,
                     layer: jax.Array | None = None) -> jax.Array:
    """q: [B, N, D]; k/v_cache: [L, B, kvN, Smax, D] stacked arena (or 4D
    single layer); kv_lens: [B] -> out [B, N, D]."""
    if k_cache.ndim == 4:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    b, n, d = q.shape
    _, _, kvn, smax, _ = k_cache.shape
    group = n // kvn
    scale = d ** -0.5
    bk = min(bk, smax)
    assert smax % bk == 0 and d % 128 == 0, (smax, bk, d)

    hb = 1
    while (hb * group < 8 and hb * 2 <= kvn and kvn % (hb * 2) == 0):
        hb *= 2
    qg = q.reshape(b, kvn // hb, hb, group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, kvn // hb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, group, d),
                         lambda i_b, i_h, lens, li: (i_b, i_h, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # k arena (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v arena (HBM)
        ],
        out_specs=pl.BlockSpec((1, 1, hb, group, d),
                               lambda i_b, i_h, lens, li:
                               (i_b, i_h, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hb, bk, d), k_cache.dtype),
            pltpu.VMEM((2, hb, bk, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_dyn_kernel, scale=scale, bk=bk, group=group,
                          hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvn // hb, hb, group, d),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * smax * d,
            bytes_accessed=2 * b * kvn * smax * d * 2,
            transcendentals=b * n * smax,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), layer, qg, k_cache, v_cache)
    return out.reshape(b, n, d)
