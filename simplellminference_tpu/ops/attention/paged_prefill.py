"""Pallas paged flash PREFILL attention: chunked prompts attend to the
whole cached prefix straight through the page tables.

Closes the one remaining dense-materialization hole (VERDICT r1 item 3):
the chunked-prefill path used to gather the ENTIRE cached prefix into a
dense [B, Smax] buffer per layer (memory/paged_kv.py gather_dense) and run
masked dense attention — O(B·Smax) HBM traffic and memory per layer at 8k
context. Here the page gather IS the BlockSpec index map (same trick as
paged_decode.py): per (batch, q-head, q-block) the kernel walks logical
pages up to the causal frontier with an online-softmax accumulator; pages
past the frontier clamp to it (no DMA, no compute).

**Multi-page kv blocks**: prefill is MXU-bound, and MXU efficiency is set
by the kv-block width (the QK output tile and the PV contraction depth) —
measured on v5e: 37 TFLOPs at kv block 128 vs 136 at 1024 (4x). One page
per grid step caps the kv block at the page size (128), so the kernel
gathers G pages per step: the pool rides in G times with page-shifted
index maps (G independent DMAs — the pages are physically scattered),
the kernel concatenates them in VMEM and runs ONE [bq, G*ps] score tile.
Logical key positions stay contiguous across the concatenated block, so
causal/window masking is unchanged.

Queries sit at ABSOLUTE positions chunk_offset[b] + 0..Sq-1 (per-row,
page-aligned — batched suffix prefills start at different offsets); key
position of logical page p's slot j is p*ps + j. Causality and the
kv_len bound are enforced in-kernel per element.

Successor (long-context capability) of the reference's dense O(pos)
attention loop, mha_kernel.cu:63-130.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_prefill_kernel(lens_ref, tables_ref, offs_ref, layer_ref,
                          *refs, scale: float,
                          bq: int, ps: int, pages_per_block: int,
                          quant_kv: bool, window: int | None = None,
                          logit_cap: float | None = None,
                          shared_kv: bool = False,
                          has_sinks: bool = False):
    if has_sinks:
        sinks_ref, *refs = refs
    q_ref, *refs = refs
    g = pages_per_block
    nkv = 1 if shared_kv else 2   # shared_kv (absorbed MLA): K == V,
    # one pool operand set, one page DMA per logical page
    kp_refs = refs[:g]
    vp_refs = kp_refs if shared_kv else refs[g:2 * g]
    if quant_kv:
        ks_refs = refs[nkv * g:(nkv + 1) * g]
        vs_refs = ks_refs if shared_kv else refs[3 * g:4 * g]
        o_ref, m_ref, l_ref, acc_ref = refs[2 * nkv * g:]
    else:
        ks_refs = vs_refs = ()
        o_ref, m_ref, l_ref, acc_ref = refs[nkv * g:]
    del layer_ref, tables_ref  # consumed by the BlockSpec index maps
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    pi = pl.program_id(3)
    np_ = pl.num_programs(3)
    kv_len = lens_ref[bi]
    off = offs_ref[bi]
    bk = g * ps

    @pl.when(pi == 0)
    def _():
        if has_sinks:
            # GPT-OSS sink = online softmax initialized at (m=sink, l=1)
            m_ref[:] = jnp.full_like(m_ref, sinks_ref[hi])
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # run while the g-page block overlaps [0, min(kv_len, q_pos_max + 1))
    q_hi = off + qi * bq + bq - 1           # newest query this tile
    run = (pi * bk <= q_hi) & (pi * bk < kv_len)
    if window is not None:
        # block entirely before the oldest query row's window start
        run = run & (pi * bk + bk - 1 >= off + qi * bq - (window - 1))

    @pl.when(run)
    def _():
        # bf16 (or int8-dequantized-to-bf16) operands + f32 accumulation:
        # an f32 upcast before the dot forces the MXU's multi-pass f32
        # path (see flash_prefill.py). INT8-KV pages dequantize per page
        # slab BEFORE the sublane-axis concat (f32 multiply, bf16 cast) —
        # Mosaic cannot concatenate the 1-D scale vectors themselves
        # ("input offsets outside the first tile"), and per-slab dequant
        # keeps the scales in f32.
        q = q_ref[0, 0]                              # [bq, D]

        def page_slab(data_refs, scale_refs, j):
            slab = data_refs[j][0, 0, 0]             # [ps, D]
            if quant_kv:
                slab = (slab.astype(jnp.float32)
                        * scale_refs[j][0, 0, 0, 0][:, None])
            return slab.astype(q.dtype)

        if g == 1:
            k = page_slab(kp_refs, ks_refs, 0)       # [bk, D]
            v = k if shared_kv else page_slab(vp_refs, vs_refs, 0)
        else:
            k = jnp.concatenate(
                [page_slab(kp_refs, ks_refs, j) for j in range(g)], axis=0)
            v = k if shared_kv else jnp.concatenate(
                [page_slab(vp_refs, vs_refs, j) for j in range(g)], axis=0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, bk]
        if logit_cap:  # Gemma-2 attention soft cap
            s = logit_cap * jnp.tanh(s * (1.0 / logit_cap))

        q_pos = off + qi * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, bk), 0)
        k_pos = pi * bk + jax.lax.broadcasted_iota(
            jnp.int32, (bq, bk), 1)
        keep = (k_pos <= q_pos) & (k_pos < kv_len)
        if window is not None:
            keep = keep & (k_pos > q_pos - window)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(q.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:, :1] = m_new

    @pl.when(pi == np_ - 1)
    def _():
        # padded query rows (q_pos >= kv_len) still see k_pos == 0, so l
        # is never exactly zero; the guard is numerical only.
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "interpret", "window",
                                             "pages_per_block", "sm_scale",
                                             "logit_cap"))
def paged_flash_prefill(q: jax.Array, k_pool: jax.Array,
                        v_pool: jax.Array, tables: jax.Array,
                        kv_lens: jax.Array, chunk_offset: jax.Array,
                        bq: int = 512, interpret: bool = False,
                        layer: jax.Array | None = None,
                        k_scale: jax.Array | None = None,
                        v_scale: jax.Array | None = None,
                        window: int | None = None,
                        pages_per_block: int | None = None,
                        sm_scale: float | None = None,
                        logit_cap: float | None = None,
                        sinks: jax.Array | None = None) -> jax.Array:
    """q: [B, Sq, N, D] — row b's queries sit at absolute positions
    chunk_offset[b] + 0..Sq-1 (the current prefill chunk, already written
    to its pages). k/v_pool: [P, kvN, ps, D] or stacked [L, P, kvN, ps, D]
    with a traced ``layer``; tables: [B, MP] (-1 = unmapped); kv_lens: [B]
    valid tokens AFTER the chunk write. Returns [B, Sq, N, D].

    INT8 KV: per-token-per-head scale pools k/v_scale ([L, P, kvN, ps])
    ride along and dequantize in-kernel (same contract as paged_decode).

    Sq must be a multiple of bq (callers pad; padded rows produce garbage
    that downstream last-token selection discards).

    ``pages_per_block``: logical pages gathered per grid step (the kv
    block is pages_per_block * ps wide — MXU efficiency knob; default
    targets a 1024-wide block, the measured v5e knee).

    ``window``: sliding-window attention — each query attends only keys
    with q_pos - k_pos < window; page blocks entirely outside a tile's
    window band are skipped via index-map clamping (cost
    O(Sq · window))."""
    shared_kv = v_pool is None    # absorbed MLA: one latent pool
    if k_pool.ndim == 4:
        k_pool = k_pool[None]
        if not shared_kv:
            v_pool = v_pool[None]
        if k_scale is not None:
            k_scale = k_scale[None]
            if not shared_kv:
                v_scale = v_scale[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None, "stacked pools need a layer index"
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    quant_kv = k_scale is not None

    b, sq, n, d = q.shape
    _, p, kvn, ps, _ = k_pool.shape
    _, mp = tables.shape
    group = n // kvn
    scale = d ** -0.5 if sm_scale is None else sm_scale

    bq = min(bq, sq)
    assert sq % bq == 0, (sq, bq)
    nq = sq // bq
    if pages_per_block is None:
        pages_per_block = max(1, min(1024 // ps, mp))
    g = min(pages_per_block, mp)
    n_pblocks = -(-mp // g)
    qT = q.transpose(0, 2, 1, 3)   # [B, N, Sq, D]

    def page_index(j):
        def index(i_b, i_h, i_q, i_p, lens_ref, tables_ref, offs_ref,
                  layer_ref):
            # clamp past-the-frontier/past-the-end pages to the last one
            # this tile touches: same physical index -> Pallas skips the
            # DMA and the in-kernel mask kills the columns.
            frontier = (offs_ref[i_b] + i_q * bq + bq - 1) // ps
            last = jnp.maximum(lens_ref[i_b] - 1, 0) // ps
            hi = jnp.minimum(frontier, last)
            i_pg = jnp.minimum(i_p * g + j, hi)
            if window is not None:
                # pages before the oldest query row's window start clamp
                # forward to the window's first page
                lo = jnp.maximum(offs_ref[i_b] + i_q * bq - (window - 1),
                                 0) // ps
                i_pg = jnp.maximum(i_pg, jnp.minimum(lo, hi))
            pid = tables_ref[i_b, jnp.minimum(i_pg, mp - 1)]
            return (layer_ref[0], jnp.maximum(pid, 0),
                    jax.lax.div(i_h, group), 0, 0)
        return index

    def scale_index(j):
        pidx = page_index(j)

        def index(*args):
            li, pid, hk, _, _ = pidx(*args)
            return (li, pid, hk, 0, 0)
        return index

    q_spec = pl.BlockSpec((1, 1, bq, d),
                          lambda i_b, i_h, i_q, i_p, *pref:
                          (i_b, i_h, i_q, 0))
    # pools blocked per (page, kv head): the (ps, d) block tail equals
    # the array's last two dims, so Mosaic accepts it directly. The pool
    # rides in g times with page-shifted index maps — one DMA per
    # (physically scattered) page of the kv block.
    kv_spec = [pl.BlockSpec((1, 1, 1, ps, d), page_index(j))
               for j in range(g)]
    nkv = 1 if shared_kv else 2
    in_specs = [q_spec] + kv_spec * nkv
    operands = ([qT] + [k_pool] * g
                + ([] if shared_kv else [v_pool] * g))
    has_sinks = sinks is not None
    if has_sinks:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = [sinks.astype(jnp.float32)] + operands
    if quant_kv:
        # scales [L, P, kvN, ps]: dim-split a unit axis so the block tail
        # (1, ps) equals the array's last two dims (free view reshape)
        sshape = (k_scale.shape[0], k_scale.shape[1], kvn, 1, ps)
        s_spec = [pl.BlockSpec((1, 1, 1, 1, ps), scale_index(j))
                  for j in range(g)]
        in_specs += s_spec * nkv
        operands += [k_scale.astype(jnp.float32).reshape(sshape)] * g
        if not shared_kv:
            operands += [v_scale.astype(jnp.float32).reshape(sshape)] * g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n, nq, n_pblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i_b, i_h, i_q, i_p, *pref:
                               (i_b, i_h, i_q, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_paged_prefill_kernel, scale=scale, bq=bq,
                          ps=ps, pages_per_block=g, quant_kv=quant_kv,
                          window=window, logit_cap=logit_cap,
                          shared_kv=shared_kv, has_sinks=has_sinks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * b * n * sq * mp * ps * d // 2,
            bytes_accessed=(b * n * sq * d + 2 * b * kvn * mp * ps * d) * 2,
            transcendentals=b * n * sq * mp * ps,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), tables.astype(jnp.int32),
      chunk_offset.astype(jnp.int32), layer, *operands)
    return out.transpose(0, 2, 1, 3)
