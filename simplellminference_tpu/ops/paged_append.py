"""In-place paged KV writes (Pallas): decode row RMW + prefill page copy.

The jnp scatter versions (memory/paged_kv.py write_*_stacked) are correct
everywhere, but on TPU the scatter drives XLA's layout assignment to a
scatter-friendly pool layout inside the decode loop, while the Pallas
paged-attention kernel constrains its operand to row-major — XLA then
relocates the ENTIRE pool (GBs) twice per layer per step (measured 3.3 s
of copies in a 3.7 s 7B burst). These kernels write through aliased
outputs with BlockSpec index maps instead, so no scatter exists and the
pool keeps one layout.

Unmapped (-1) table entries redirect to the pool's TRASH PAGE — the last
page row, reserved by :meth:`PagedKVCache.create` and never handed out by
the allocator — because a blocked out-spec always writes its block back
(there is no way to skip a store), so "dropped" writes need a harmless
destination.

Constraints: page_size multiple of 8 (tiling), decode slot written as an
8-row read-modify-write window (same trick as ops/kv_append.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def _decode_kernel(layer_ref, pages_ref, slots_ref, *refs, dual: bool):
    # dual=False (shared-KV absorbed-MLA pools): only the K pool exists
    if dual:
        newk_ref, newv_ref, pk_in, pv_in, pk_out, pv_out = refs
    else:
        newk_ref, pk_in, pk_out = refs
    b = pl.program_id(0)
    kvn = pk_in.shape[2]
    rel = slots_ref[b] % _ROWS
    rows = jax.lax.broadcasted_iota(jnp.int32, (kvn, _ROWS, 1), 1)
    mask = rows == rel
    pk_out[0, 0] = jnp.where(mask, newk_ref[0, :, 0:1, :].astype(pk_out.dtype),
                             pk_in[0, 0])
    if dual:
        pv_out[0, 0] = jnp.where(mask,
                                 newv_ref[0, :, 0:1, :].astype(pv_out.dtype),
                                 pv_in[0, 0])


@jax.jit
def paged_append_decode(pool_k: jax.Array, pool_v: jax.Array | None,
                        new_k: jax.Array, new_v: jax.Array | None,
                        tables: jax.Array, positions: jax.Array,
                        layer: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Write one token per sequence into the stacked pools in place.

    pool_k/v: [L, P, kvN, ps, D] (aliased; last page = trash);
    new_k/v: [B, kvN, D]; tables: [B, MP]; positions: [B]; layer scalar.
    pool_v None (shared-KV absorbed-MLA cache): K-pool-only write,
    returns (pool_k, None).
    """
    l_, p, kvn, ps, d = pool_k.shape
    b = new_k.shape[0]
    dual = pool_v is not None
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]
    page_idx = jnp.where(page_idx < 0, p - 1, page_idx).astype(jnp.int32)
    slots = (positions % ps).astype(jnp.int32)

    nk = jnp.pad(new_k[:, :, None, :].astype(pool_k.dtype),
                 ((0, 0), (0, 0), (0, _ROWS - 1), (0, 0)))

    def new_index(i_b, li, pg, sl):
        return (i_b, 0, 0, 0)

    def pool_index(i_b, li, pg, sl):
        return (li[0], pg[i_b], 0, sl[i_b] // _ROWS, 0)

    new_spec = pl.BlockSpec((1, kvn, _ROWS, d), new_index)
    pool_spec = pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index)
    n = 2 if dual else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[new_spec] * n + [pool_spec] * n,
        out_specs=[pool_spec] * n,
    )
    # Flat operands: layer(0), pages(1), slots(2), new_k(3), [new_v(4)],
    # pool_k, [pool_v].
    if dual:
        nv = jnp.pad(new_v[:, :, None, :].astype(pool_v.dtype),
                     ((0, 0), (0, 0), (0, _ROWS - 1), (0, 0)))
        pk, pv = pl.pallas_call(
            functools.partial(_decode_kernel, dual=True),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            ],
            input_output_aliases={5: 0, 6: 1},
        )(layer, page_idx, slots, nk, nv, pool_k, pool_v)
        return pk, pv
    pk, = pl.pallas_call(
        functools.partial(_decode_kernel, dual=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype)],
        input_output_aliases={4: 0},
    )(layer, page_idx, slots, nk, pool_k)
    return pk, None


def _prefill_kernel(layer_ref, pages_ref, *refs, dual: bool):
    if dual:
        newk_ref, newv_ref, pk_in, pv_in, pk_out, pv_out = refs
    else:
        newk_ref, pk_in, pk_out = refs
    del layer_ref, pages_ref, pk_in
    pk_out[0, 0] = newk_ref[0, 0].astype(pk_out.dtype)
    if dual:
        del pv_in
        pv_out[0, 0] = newv_ref[0, 0].astype(pv_out.dtype)


@jax.jit
def paged_append_prefill(pool_k: jax.Array, pool_v: jax.Array | None,
                         new_k: jax.Array, new_v: jax.Array | None,
                         tables: jax.Array, layer: jax.Array
                         ) -> tuple[jax.Array, jax.Array]:
    """Write a right-padded prompt (or prompt chunk) into pages in place.

    new_k/v: [B, S, kvN, D]; ``tables[:, :ceil(S/ps)]`` names the target
    pages (the caller pre-gathers offset columns for chunked/suffix
    prefill — memory/paged_kv.write_prefill_stacked); -1 entries land in
    the trash page. pool_v None (shared-KV absorbed-MLA cache): K-pool-
    only write, returns (pool_k, None).
    """
    l_, p, kvn, ps, d = pool_k.shape
    b, s, _, _ = new_k.shape
    dual = pool_v is not None
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    npg = -(-s // ps)
    pad = npg * ps - s

    def chunks(x, dtype):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
        return (x.reshape(b, npg, ps, kvn, d)
                .transpose(0, 1, 3, 2, 4).astype(dtype))  # [B, npg, kvN, ps, D]

    tbl = tables[:, :npg]
    pages = jnp.where(tbl < 0, p - 1, tbl).astype(jnp.int32)

    def new_index(i_b, i_p, li, pg):
        return (i_b, i_p, 0, 0, 0)

    def pool_index(i_b, i_p, li, pg):
        return (li[0], pg[i_b, i_p], 0, 0, 0)

    new_spec = pl.BlockSpec((1, 1, kvn, ps, d), new_index)
    pool_spec = pl.BlockSpec((1, 1, kvn, ps, d), pool_index)
    n = 2 if dual else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, npg),
        in_specs=[new_spec] * n + [pool_spec] * n,
        out_specs=[pool_spec] * n,
    )
    if dual:
        pk, pv = pl.pallas_call(
            functools.partial(_prefill_kernel, dual=True),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            ],
            input_output_aliases={4: 0, 5: 1},
        )(layer, pages, chunks(new_k, pool_k.dtype),
          chunks(new_v, pool_v.dtype), pool_k, pool_v)
        return pk, pv
    pk, = pl.pallas_call(
        functools.partial(_prefill_kernel, dual=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype)],
        input_output_aliases={3: 0},
    )(layer, pages, chunks(new_k, pool_k.dtype), pool_k)
    return pk, None


def _decode_quant_kernel(layer_ref, pages_ref, slots_ref, newk_ref, newv_ref,
                         newks_ref, newvs_ref, pk_in, pv_in, pks_in, pvs_in,
                         pk_out, pv_out, pks_out, pvs_out):
    b = pl.program_id(0)
    kvn = pk_in.shape[2]
    ps = pk_in.shape[3]
    rel = slots_ref[b]
    rows = jax.lax.broadcasted_iota(jnp.int32, (kvn, ps, 1), 1)
    mask = rows == rel
    pk_out[0, 0] = jnp.where(mask, newk_ref[0, :, 0:1, :], pk_in[0, 0])
    pv_out[0, 0] = jnp.where(mask, newv_ref[0, :, 0:1, :], pv_in[0, 0])
    lane = jax.lax.broadcasted_iota(jnp.int32, (kvn, ps), 1)
    smask = lane == rel
    pks_out[0, 0] = jnp.where(smask, newks_ref[0], pks_in[0, 0])
    pvs_out[0, 0] = jnp.where(smask, newvs_ref[0], pvs_in[0, 0])


@jax.jit
def paged_append_decode_quant(pool_k, pool_v, pool_ks, pool_vs,
                              new_k, new_v, tables, positions, layer):
    """INT8-KV decode write: quantize rows host-graph-side, write int8 data
    + per-token-head scales into the pools in place (full-page RMW).

    pool_k/v: [L, P, kvN, ps, D] int8; pool_k/v_s: [L, P, kvN, ps] f32;
    new_k/v: [B, kvN, D] float.
    """
    from simplellminference_tpu.memory.paged_kv import quantize_kv

    l_, p, kvn, ps, d = pool_k.shape
    b = new_k.shape[0]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]
    page_idx = jnp.where(page_idx < 0, p - 1, page_idx).astype(jnp.int32)
    slots = (positions % ps).astype(jnp.int32)

    qk, sk = quantize_kv(new_k)
    qv, sv = quantize_kv(new_v)
    nk = qk[:, :, None, :]                                  # [B, kvN, 1, D]
    nv = qv[:, :, None, :]
    # broadcast scale over the lane dim so the kernel block is [kvN, ps]
    nks = jnp.broadcast_to(sk[:, :, None], (b, kvn, ps)).astype(jnp.float32)
    nvs = jnp.broadcast_to(sv[:, :, None], (b, kvn, ps)).astype(jnp.float32)

    def new_index(i_b, li, pg, sl):
        return (i_b, 0, 0, 0)

    def new_s_index(i_b, li, pg, sl):
        return (i_b, 0, 0)

    def pool_index(i_b, li, pg, sl):
        return (li[0], pg[i_b], 0, 0, 0)

    def pool_s_index(i_b, li, pg, sl):
        return (li[0], pg[i_b], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvn, 1, d), new_index),
            pl.BlockSpec((1, kvn, 1, d), new_index),
            pl.BlockSpec((1, kvn, ps), new_s_index),
            pl.BlockSpec((1, kvn, ps), new_s_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
        ],
    )
    # Flat operands: layer(0), pages(1), slots(2), new_k(3), new_v(4),
    # new_ks(5), new_vs(6), pools(7..10) -> aliased outputs 0..3.
    return pl.pallas_call(
        _decode_quant_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct(pool_ks.shape, pool_ks.dtype),
            jax.ShapeDtypeStruct(pool_vs.shape, pool_vs.dtype),
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
    )(layer, page_idx, slots, nk, nv, nks, nvs,
      pool_k, pool_v, pool_ks, pool_vs)


def _prefill_quant_kernel(layer_ref, pages_ref, newk_ref, newv_ref,
                          newks_ref, newvs_ref, pk_in, pv_in, pks_in,
                          pvs_in, pk_out, pv_out, pks_out, pvs_out):
    del layer_ref, pages_ref, pk_in, pv_in, pks_in, pvs_in
    pk_out[0, 0] = newk_ref[0, 0]
    pv_out[0, 0] = newv_ref[0, 0]
    pks_out[0, 0] = newks_ref[0, 0]
    pvs_out[0, 0] = newvs_ref[0, 0]


@jax.jit
def paged_append_prefill_quant(pool_k, pool_v, pool_ks, pool_vs,
                               new_k, new_v, tables, layer):
    """INT8-KV prefill write: whole pages of int8 data + scale pages."""
    from simplellminference_tpu.memory.paged_kv import quantize_kv

    l_, p, kvn, ps, d = pool_k.shape
    b, s, _, _ = new_k.shape
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    npg = -(-s // ps)
    pad = npg * ps - s

    qk, sk = quantize_kv(new_k)   # [B, S, kvN, D], [B, S, kvN]
    qv, sv = quantize_kv(new_v)

    def chunks(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
        return (x.reshape(b, npg, ps, kvn, d)
                .transpose(0, 1, 3, 2, 4))                # [B,npg,kvN,ps,D]

    def schunks(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        return (x.reshape(b, npg, ps, kvn)
                .transpose(0, 1, 3, 2).astype(jnp.float32))  # [B,npg,kvN,ps]

    tbl = tables[:, :npg]
    pages = jnp.where(tbl < 0, p - 1, tbl).astype(jnp.int32)

    def new_index(i_b, i_p, li, pg):
        return (i_b, i_p, 0, 0, 0)

    def new_s_index(i_b, i_p, li, pg):
        return (i_b, i_p, 0, 0)

    def pool_index(i_b, i_p, li, pg):
        return (li[0], pg[i_b, i_p], 0, 0, 0)

    def pool_s_index(i_b, i_p, li, pg):
        return (li[0], pg[i_b, i_p], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, npg),
        in_specs=[
            pl.BlockSpec((1, 1, kvn, ps, d), new_index),
            pl.BlockSpec((1, 1, kvn, ps, d), new_index),
            pl.BlockSpec((1, 1, kvn, ps), new_s_index),
            pl.BlockSpec((1, 1, kvn, ps), new_s_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
            pl.BlockSpec((1, 1, kvn, ps), pool_s_index),
        ],
    )
    return pl.pallas_call(
        _prefill_quant_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct(pool_ks.shape, pool_ks.dtype),
            jax.ShapeDtypeStruct(pool_vs.shape, pool_vs.dtype),
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
    )(layer, pages, chunks(qk), chunks(qv), schunks(sk), schunks(sv),
      pool_k, pool_v, pool_ks, pool_vs)


def _span_kernel(layer_ref, pages_ref, blks_ref, rels_ref, *refs,
                 t_len: int, dual: bool):
    if dual:
        newk_ref, newv_ref, pk_in, pv_in, pk_out, pv_out = refs
    else:
        newk_ref, pk_in, pk_out = refs
    b = pl.program_id(0)
    s = pl.program_id(1)
    kvn = pk_in.shape[2]
    rel = rels_ref[b, s]  # window row of the span's first token (may be <0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (kvn, _ROWS, 1), 1)
    k = pk_in[0, 0]
    v = pv_in[0, 0] if dual else None
    for t in range(t_len):  # static unroll: T is small (<= _ROWS)
        m = rows == rel + t
        k = jnp.where(m, newk_ref[0, :, t:t + 1, :].astype(k.dtype), k)
        if dual:
            v = jnp.where(m, newv_ref[0, :, t:t + 1, :].astype(v.dtype), v)
    pk_out[0, 0] = k
    if dual:
        pv_out[0, 0] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_append_span(pool_k: jax.Array, pool_v: jax.Array,
                      new_k: jax.Array, new_v: jax.Array,
                      tables: jax.Array, positions: jax.Array,
                      layer: jax.Array,
                      interpret: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
    """Write T consecutive tokens per sequence starting at ``positions``
    (speculative-decoding verify step: T = draft + 1 <= 8).

    pool_k/v: [L, P, kvN, ps, D] (aliased; last page = trash);
    new_k/v: [B, T, kvN, D]; tables: [B, MP]; positions: [B].

    A span of T <= 8 tokens touches at most TWO 8-row-aligned windows
    (page_size % 8 == 0, so global 8-alignment survives the page split);
    grid (B, 2) RMWs both — when the span fits one window the second
    grid step revisits the same block (no DMA, idempotent re-write).
    """
    l_, p, kvn, ps, d = pool_k.shape
    b, t_len, _, _ = new_k.shape
    assert t_len <= _ROWS, t_len
    mp = tables.shape[1]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def seg(gstart):
        pg_col = gstart // ps
        valid = pg_col < mp
        page = jnp.take_along_axis(
            tables, jnp.minimum(pg_col, mp - 1)[:, None], axis=1)[:, 0]
        page = jnp.where(valid & (page >= 0), page, p - 1)
        blk = (gstart % ps) // _ROWS
        rel = positions - gstart
        return page.astype(jnp.int32), blk.astype(jnp.int32), \
            rel.astype(jnp.int32)

    g0 = (positions // _ROWS) * _ROWS
    g1 = ((positions + t_len - 1) // _ROWS) * _ROWS
    p0, b0, r0 = seg(g0)
    p1, b1, r1 = seg(g1)
    pages = jnp.stack([p0, p1], axis=1)    # [B, 2]
    blks = jnp.stack([b0, b1], axis=1)
    rels = jnp.stack([r0, r1], axis=1)

    dual = pool_v is not None
    nk = new_k.transpose(0, 2, 1, 3).astype(pool_k.dtype)  # [B, kvN, T, D]
    if t_len < _ROWS:
        padt = ((0, 0), (0, 0), (0, _ROWS - t_len), (0, 0))
        nk = jnp.pad(nk, padt)

    def new_index(i_b, i_s, li, pg, bl, rl):
        return (i_b, 0, 0, 0)

    def pool_index(i_b, i_s, li, pg, bl, rl):
        return (li[0], pg[i_b, i_s], 0, bl[i_b, i_s], 0)

    new_spec = pl.BlockSpec((1, kvn, _ROWS, d), new_index)
    pool_spec = pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index)
    n = 2 if dual else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, 2),
        in_specs=[new_spec] * n + [pool_spec] * n,
        out_specs=[pool_spec] * n,
    )
    # Flat operands: layer(0), pages(1), blks(2), rels(3), new_k(4),
    # [new_v(5)], pool_k, [pool_v].
    if dual:
        nv = new_v.transpose(0, 2, 1, 3).astype(pool_v.dtype)
        if t_len < _ROWS:
            nv = jnp.pad(nv, padt)
        pk, pv = pl.pallas_call(
            functools.partial(_span_kernel, t_len=t_len, dual=True),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
                jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            ],
            input_output_aliases={6: 0, 7: 1},
            interpret=interpret,
        )(layer, pages, blks, rels, nk, nv, pool_k, pool_v)
        return pk, pv
    pk, = pl.pallas_call(
        functools.partial(_span_kernel, t_len=t_len, dual=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype)],
        input_output_aliases={5: 0},
        interpret=interpret,
    )(layer, pages, blks, rels, nk, pool_k)
    return pk, None
