"""Pallas paged flash-decode attention: block-table gather + online softmax.

The production decode kernel (SURVEY.md §7.4 hard part #1): KV pages live
in a global pool [P, kvN, ps, D]; each sequence's pages are named by a
block table. The table and sequence lengths are scalar-prefetched so the
page DMA addresses are computed *before* each grid step — the gather IS the
BlockSpec index map, there is no separate gather pass. Past-the-end pages
clamp to the last valid page (no DMA, no compute), so cost scales with the
live prefix like flash_decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_kernel(lens_ref, tables_ref, layer_ref, *refs, scale: float,
                  ps: int, group: int, hb: int,
                  logit_cap: float | None,
                  quant_kv: bool, wins: int = 1,
                  window: int | None = None, shared_kv: bool = False,
                  has_sinks: bool = False):
    # GPT-OSS attention sinks: a learned per-head logit in the softmax
    # denominator with no value contribution — exactly an online-softmax
    # accumulator initialized to (m = sink, l = 1, acc = 0).
    if has_sinks:
        sinks_ref, *refs = refs
    q_ref, kp_ref, *refs = refs
    # shared_kv (absorbed MLA): K and V are the SAME latent row — one
    # pool operand, one page DMA per block, halving decode KV traffic.
    if shared_kv:
        vp_ref = kp_ref
    else:
        vp_ref, *refs = refs
    if quant_kv:
        # INT8 KV: per-token-per-head scale pages ride along; dequant on
        # the VPU right after the page DMA.
        if shared_kv:
            ks_ref, o_ref, m_ref, l_ref, acc_ref = refs
            vs_ref = ks_ref
        else:
            ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    del layer_ref  # consumed by the BlockSpec index maps
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    pi = pl.program_id(2)
    np_ = pl.num_programs(2)
    kv_len = lens_ref[bi]
    rows = hb * group * wins

    @pl.when(pi == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            # packed row r serves q head (hi*rows + r) // wins
            col = jnp.stack([sinks_ref[(hi * rows + r) // wins]
                             for r in range(rows)])
            m_ref[:rows, :1] = col[:, None]
            l_ref[:rows, :1] = jnp.ones((rows, 1), jnp.float32)

    run = pi * ps < kv_len
    if window is not None:
        # page entirely before the OLDEST verify row's window start
        run = run & (pi * ps + ps > kv_len - wins - window + 1)

    @pl.when(run)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)          # [HB, G*W, D]
        k = kp_ref[0, 0].astype(jnp.float32)         # [HB, ps, D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [HB, G*W, ps]
        if quant_kv:
            # LATE dequant: the scale is per (token, head), so it factors
            # out of the D-contraction exactly — ps multiplies per score
            # row instead of ps*D on the raw K page (the VPU cost that
            # made int8-KV serving slower than its bandwidth win)
            s = s * ks_ref[0, 0, 0][:, None, :]      # [HB, 1, ps]
        if logit_cap:  # Gemma-2 attention soft cap
            s = logit_cap * jnp.tanh(s * (1.0 / logit_cap))
        s = s.reshape(rows, ps)
        k_pos = pi * ps + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # multi-row verify windows (speculative decoding): query row with
        # window index w sits at position kv_len - wins + w, so it may
        # attend keys k_pos <= that position. wins == 1 => k_pos < kv_len.
        w = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % wins
        keep = k_pos < kv_len - wins + 1 + w
        if window is not None:
            # sliding window per row: k_pos > row_pos - window
            keep = keep & (k_pos > kv_len - wins + w - window)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:rows, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:rows, :1] = l_ref[:rows, :1] * alpha + jnp.sum(
            p, axis=1, keepdims=True)
        if shared_kv:
            v = k                                    # same latent row
        else:
            v = vp_ref[0, 0].astype(jnp.float32)     # [HB, ps, D]
        gw = group * wins
        pmat = p.reshape(hb, gw, ps)
        if quant_kv:
            # fold the per-token V scale into p (ps multiplies) instead
            # of descaling the raw V page (ps*D) — exact: the scale is
            # constant along the contracted token's D lanes
            pmat = pmat * vs_ref[0, 0, 0][:, None, :]
        pv = jax.lax.dot_general(
            pmat, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [HB, G*W, D]
        acc_ref[:] = acc_ref[:] * alpha.reshape(hb, gw, 1) + pv
        m_ref[:rows, :1] = m_new

    @pl.when(pi == np_ - 1)
    def _():
        l = jnp.maximum(l_ref[:rows, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l.reshape(
            hb, group * wins, 1)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "window",
                                             "sm_scale", "logit_cap"))
def paged_flash_verify(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                       tables: jax.Array, kv_lens: jax.Array,
                       interpret: bool = False,
                       layer: jax.Array | None = None,
                       k_scale: jax.Array | None = None,
                       v_scale: jax.Array | None = None,
                       window: int | None = None,
                       sm_scale: float | None = None,
                       logit_cap: float | None = None,
                       sinks: jax.Array | None = None) -> jax.Array:
    """Multi-row decode windows (speculative verify): q [B, S, N, D]
    where row s sits at position kv_len - S + s (in-window causal).
    Same page-table flash kernel as :func:`paged_flash_decode` with the
    window rows packed into the query tile — KV page traffic is identical
    to a single-token decode step. Returns [B, S, N, D]."""
    b, s, n, d = q.shape
    # pack (group, window) into the tile's row dim: row = g * S + s
    qp = q.transpose(0, 2, 1, 3).reshape(b, n * s, d)
    out = paged_flash_decode(qp, k_pool, v_pool, tables, kv_lens,
                             interpret=interpret, layer=layer,
                             k_scale=k_scale, v_scale=v_scale,
                             wins=s, window=window, sm_scale=sm_scale,
                             logit_cap=logit_cap, sinks=sinks)
    return out.reshape(b, n, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("interpret", "wins",
                                             "window", "sm_scale",
                                             "logit_cap"))
def paged_flash_decode(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                       tables: jax.Array, kv_lens: jax.Array,
                       interpret: bool = False,
                       layer: jax.Array | None = None,
                       k_scale: jax.Array | None = None,
                       v_scale: jax.Array | None = None,
                       wins: int = 1,
                       window: int | None = None,
                       sm_scale: float | None = None,
                       logit_cap: float | None = None,
                       sinks: jax.Array | None = None) -> jax.Array:
    """q: [B, N, D]; k/v_pool: [P, kvN, ps, D] — or the stacked pools
    [L, P, kvN, ps, D] with a traced ``layer`` index (scalar-prefetched,
    zero-copy reads from inside a scan over layers); tables: [B, MP] int32
    (-1 = unmapped); kv_lens: [B] -> out [B, N, D].

    INT8 KV: pass per-token-per-head scale pools k/v_scale
    ([L, P, kvN, ps]); scale pages are DMA'd with their data pages and
    dequantized on the VPU in-kernel.

    ``wins`` > 1 (via :func:`paged_flash_verify`): q carries
    ``wins``-token verify windows packed into its row dim; per-row causal
    limits apply in-kernel.

    ``window``: sliding-window attention — each query row attends only
    keys with row_pos - k_pos < window; pages before the window start
    clamp to its first page (no DMA, no compute): O(window) per step."""
    shared_kv = v_pool is None    # absorbed MLA: one latent pool is
    # both K and V — single operand, single page DMA per block
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

    b, n, d = q.shape
    _, p, kvn, ps, _ = k_pool.shape
    _, mp = tables.shape
    group = n // kvn
    scale = d ** -0.5 if sm_scale is None else sm_scale

    # Pack kv heads per grid step (a page holds all heads): fills the VPU
    # sublanes at group=1 and turns 4 KB page DMAs into 32 KB ones.
    # Verify windows (wins > 1) multiply the row count but NOT the KV
    # blocks — keep the same head packing as single-token decode, else
    # the grid explodes into tiny DMAs.
    hb = 1
    while (hb * group < 16 * wins and hb * 2 <= kvn
           and kvn % (hb * 2) == 0):
        hb *= 2
    qg = q.reshape(b, kvn // hb, hb, group, d)

    def page_index(i_b, i_h, i_p, lens_ref, tables_ref, layer_ref):
        last = jnp.maximum(lens_ref[i_b] - 1, 0) // ps
        i_p = jnp.minimum(i_p, last)
        if window is not None:
            # pages before the oldest row's window start clamp forward
            lo = jnp.maximum(lens_ref[i_b] - wins - window + 1, 0) // ps
            i_p = jnp.maximum(i_p, jnp.minimum(lo, last))
        pid = tables_ref[i_b, i_p]
        return (layer_ref[0], jnp.maximum(pid, 0), i_h, 0, 0)

    def scale_index(i_b, i_h, i_p, lens_ref, tables_ref, layer_ref):
        li, pid, _, _, _ = page_index(i_b, i_h, i_p, lens_ref, tables_ref,
                                      layer_ref)
        return (li, pid, i_h, 0, 0)

    q_spec = pl.BlockSpec((1, 1, hb, group, d),
                          lambda i_b, i_h, i_p, lens, tbl, li:
                          (i_b, i_h, 0, 0, 0))
    n_kv = 1 if shared_kv else 2
    in_specs = [q_spec] + [pl.BlockSpec((1, 1, hb, ps, d),
                                        page_index)] * n_kv
    operands = [qg, k_pool] + ([] if shared_kv else [v_pool])
    has_sinks = sinks is not None
    if has_sinks:
        # per-head sink logits, whole [N] vector in SMEM (scalar reads
        # at accumulator init only)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = [sinks.astype(jnp.float32)] + operands
    if quant_kv:
        # Head-block as its own dim so the block's last-two dims (hb, ps)
        # EQUAL the array dims — Mosaic rejects (hb, ps) blocks carved out
        # of a [..., kvN, ps] array when hb < kvN (not 8/128-divisible).
        # Dim-split reshape of a row-major pool is a free view.
        sshape = (k_scale.shape[0], k_scale.shape[1], kvn // hb, hb, ps)
        in_specs += [pl.BlockSpec((1, 1, 1, hb, ps), scale_index)] * n_kv
        operands += [k_scale.astype(jnp.float32).reshape(sshape)]
        if not shared_kv:
            operands += [v_scale.astype(jnp.float32).reshape(sshape)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, kvn // hb, mp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, hb, group, d),
                               lambda i_b, i_h, i_p, lens, tbl, li:
                               (i_b, i_h, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((max(hb * group, 8), 128), jnp.float32),
            pltpu.VMEM((max(hb * group, 8), 128), jnp.float32),
            pltpu.VMEM((hb, group, d), jnp.float32),
        ],
    )

    # The page gather IS the BlockSpec index map: tables are prefetched and
    # each grid step's DMA source is the mapped page block.
    assert group % wins == 0, (group, wins)
    out = pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, ps=ps,
                          group=group // wins, hb=hb, quant_kv=quant_kv,
                          wins=wins, window=window, logit_cap=logit_cap,
                          shared_kv=shared_kv, has_sinks=has_sinks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvn // hb, hb, group, d),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * mp * ps * d,
            bytes_accessed=n_kv * b * kvn * mp * ps * d * 2,
            transcendentals=b * n * mp * ps,
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), tables.astype(jnp.int32), layer,
      *operands)
    return out.reshape(b, n, d)
