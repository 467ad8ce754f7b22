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


def _decode_kernel(layer_ref, pages_ref, slots_ref, newk_ref, newv_ref,
                   pk_in, pv_in, pk_out, pv_out):
    b = pl.program_id(0)
    kvn = pk_in.shape[2]
    rel = slots_ref[b] % _ROWS
    rows = jax.lax.broadcasted_iota(jnp.int32, (kvn, _ROWS, 1), 1)
    mask = rows == rel
    pk_out[0, 0] = jnp.where(mask, newk_ref[0, :, 0:1, :].astype(pk_out.dtype),
                             pk_in[0, 0])
    pv_out[0, 0] = jnp.where(mask, newv_ref[0, :, 0:1, :].astype(pv_out.dtype),
                             pv_in[0, 0])


@jax.jit
def paged_append_decode(pool_k: jax.Array, pool_v: jax.Array,
                        new_k: jax.Array, new_v: jax.Array,
                        tables: jax.Array, positions: jax.Array,
                        layer: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Write one token per sequence into the stacked pools in place.

    pool_k/v: [L, P, kvN, ps, D] (aliased; last page = trash);
    new_k/v: [B, kvN, D]; tables: [B, MP]; positions: [B]; layer scalar.
    """
    l_, p, kvn, ps, d = pool_k.shape
    b = new_k.shape[0]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]
    page_idx = jnp.where(page_idx < 0, p - 1, page_idx).astype(jnp.int32)
    slots = (positions % ps).astype(jnp.int32)

    nk = jnp.pad(new_k[:, :, None, :].astype(pool_k.dtype),
                 ((0, 0), (0, 0), (0, _ROWS - 1), (0, 0)))
    nv = jnp.pad(new_v[:, :, None, :].astype(pool_v.dtype),
                 ((0, 0), (0, 0), (0, _ROWS - 1), (0, 0)))

    def new_index(i_b, li, pg, sl):
        return (i_b, 0, 0, 0)

    def pool_index(i_b, li, pg, sl):
        return (li[0], pg[i_b], 0, sl[i_b] // _ROWS, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvn, _ROWS, d), new_index),
            pl.BlockSpec((1, kvn, _ROWS, d), new_index),
            pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index),
            pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index),
            pl.BlockSpec((1, 1, kvn, _ROWS, d), pool_index),
        ],
    )
    # Flat operands: layer(0), pages(1), slots(2), new_k(3), new_v(4),
    # pool_k(5), pool_v(6).
    return pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},
    )(layer, page_idx, slots, nk, nv, pool_k, pool_v)


def _prefill_kernel(layer_ref, pages_ref, newk_ref, newv_ref,
                    pk_in, pv_in, pk_out, pv_out):
    del layer_ref, pages_ref, pk_in, pv_in
    pk_out[0, 0] = newk_ref[0, 0].astype(pk_out.dtype)
    pv_out[0, 0] = newv_ref[0, 0].astype(pv_out.dtype)


@jax.jit
def paged_append_prefill(pool_k: jax.Array, pool_v: jax.Array,
                         new_k: jax.Array, new_v: jax.Array,
                         tables: jax.Array, layer: jax.Array,
                         page_offset: jax.Array | None = None
                         ) -> tuple[jax.Array, jax.Array]:
    """Write a right-padded prompt (or prompt chunk) into pages in place.

    new_k/v: [B, S, kvN, D] from absolute position ``page_offset * ps``
    (0 by default — whole-prompt prefill); pages for the padded tail map
    to -1 in ``tables`` and land in the trash page.
    """
    l_, p, kvn, ps, d = pool_k.shape
    b, s, _, _ = new_k.shape
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    npg = -(-s // ps)
    pad = npg * ps - s

    def chunks(x, dtype):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
        return (x.reshape(b, npg, ps, kvn, d)
                .transpose(0, 1, 3, 2, 4).astype(dtype))  # [B, npg, kvN, ps, D]

    if page_offset is None:
        tbl = tables[:, :npg]
    else:
        tbl = jax.lax.dynamic_slice_in_dim(
            tables, jnp.asarray(page_offset, jnp.int32), npg, axis=1)
    pages = jnp.where(tbl < 0, p - 1, tbl).astype(jnp.int32)

    def new_index(i_b, i_p, li, pg):
        return (i_b, i_p, 0, 0, 0)

    def pool_index(i_b, i_p, li, pg):
        return (li[0], pg[i_b, i_p], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, npg),
        in_specs=[
            pl.BlockSpec((1, 1, kvn, ps, d), new_index),
            pl.BlockSpec((1, 1, kvn, ps, d), new_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
            pl.BlockSpec((1, 1, kvn, ps, d), pool_index),
        ],
    )
    return pl.pallas_call(
        _prefill_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
    )(layer, pages, chunks(new_k, pool_k.dtype), chunks(new_v, pool_v.dtype),
      pool_k, pool_v)
