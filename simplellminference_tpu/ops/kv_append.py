"""In-place KV-cache append for the stacked dense arena.

TPU-native successor of the reference's aliased slice-view writes
(slice_KV_cache, tensor.cpp:199-212: wk/wv GEMVs write straight into the
cache arena). Under jit the cache is a functional value, so a naive
"slice layer → dynamic_update_slice → write back" on the [L, B, kvN, Smax,
D] arena materializes two full-layer copies per decoder layer per step
(~128 MB for 7B) — XLA cannot fuse dynamic slices into custom calls.

Here the arena is aliased in/out (zero-copy) and the kernel's BlockSpec
index maps position an 8-row token window at
``cache[layer, b, :, align8(offset_b) + 8·i : +8, :]`` — the layer id and
per-sequence offsets are scalar-prefetched into the index maps. Pallas's
sublane tiling requires 8-row blocks, so the write is a read-modify-write
of the window: rows covered by new tokens are replaced, the rest keep the
cache's bytes. HBM traffic per call is ~2× the new rows (read + write of
the touched windows) — for a 7B decode step that is ~64 KB, vs ~128 MB for
the slice-copy pattern this replaces.

Constraints (hold for all callers): S == 1 (decode, any offset), or S > 1
with offsets multiples of 8 (batched prefill starts at 0; chunked prefill
advances in bucket-sized chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # sublane tile granularity of the token axis


def _append_kernel(layer_ref, offs_ref, newk_ref, newv_ref,
                   ck_in, cv_in, ck_out, cv_out, *, s: int):
    b = pl.program_id(0)
    i_s = pl.program_id(1)
    kvn = ck_in.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (kvn, _ROWS, 1), 1)
    if s == 1:
        # Decode: the single new row lands at offset % 8 inside the window.
        rel = offs_ref[b] % _ROWS
        newk = newk_ref[0, :, 0:1, :]                    # [kvN, 1, D]
        newv = newv_ref[0, :, 0:1, :]
        mask = rows == rel
        ck_out[0, 0] = jnp.where(mask, newk.astype(ck_out.dtype),
                                 ck_in[0, 0])
        cv_out[0, 0] = jnp.where(mask, newv.astype(cv_out.dtype),
                                 cv_in[0, 0])
    else:
        # Aligned prefill: window rows past the (padded) prompt keep cache.
        valid = (i_s * _ROWS + rows) < s
        ck_out[0, 0] = jnp.where(valid, newk_ref[0].astype(ck_out.dtype),
                                 ck_in[0, 0])
        cv_out[0, 0] = jnp.where(valid, newv_ref[0].astype(cv_out.dtype),
                                 cv_in[0, 0])


@jax.jit
def kv_append(cache_k: jax.Array, cache_v: jax.Array, new_k: jax.Array,
              new_v: jax.Array, layer: jax.Array, offsets: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
    """Write new K/V into the stacked arena in place (TPU Pallas path).

    cache_k/v: [L, B, kvN, Smax, D] (aliased in/out — donated upstream);
    new_k/v:   [B, S, kvN, D] (projection layout);
    layer: scalar int32; offsets: [B] first target slot per sequence
    (multiple of 8 when S > 1). Returns the updated (cache_k, cache_v).
    """
    l_, b, kvn, smax, d = cache_k.shape
    _, s, _, _ = new_k.shape
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    offsets = jnp.asarray(offsets, jnp.int32)

    nk = new_k.transpose(0, 2, 1, 3).astype(cache_k.dtype)  # [B, kvN, S, D]
    nv = new_v.transpose(0, 2, 1, 3).astype(cache_v.dtype)
    s_pad = (-s) % _ROWS
    if s_pad:
        nk = jnp.pad(nk, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
        nv = jnp.pad(nv, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    nblk = (s + s_pad) // _ROWS

    def new_index(i_b, i_s, li, offs):
        return (i_b, 0, i_s, 0)

    def cache_index(i_b, i_s, li, offs):
        return (li[0], i_b, 0, offs[i_b] // _ROWS + i_s, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, kvn, _ROWS, d), new_index),      # new_k
            pl.BlockSpec((1, kvn, _ROWS, d), new_index),      # new_v
            pl.BlockSpec((1, 1, kvn, _ROWS, d), cache_index),  # cache_k
            pl.BlockSpec((1, 1, kvn, _ROWS, d), cache_index),  # cache_v
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kvn, _ROWS, d), cache_index),
            pl.BlockSpec((1, 1, kvn, _ROWS, d), cache_index),
        ],
    )
    # Flat operand order: layer(0), offsets(1), new_k(2), new_v(3),
    # cache_k(4), cache_v(5) — alias the caches onto outputs 0/1.
    return pl.pallas_call(
        functools.partial(_append_kernel, s=s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
    )(layer, offsets, nk, nv, cache_k, cache_v)


def kv_append_ref(cache_k: jax.Array, cache_v: jax.Array, new_k: jax.Array,
                  new_v: jax.Array, layer: jax.Array, offsets: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """jnp fallback (CPU tests / sharded GSPMD paths): slice, update, write
    back. XLA materializes layer copies here — acceptable off the single-
    chip TPU hot path."""
    ck = jax.lax.dynamic_index_in_dim(cache_k, layer, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(cache_v, layer, 0, keepdims=False)

    def write_one(cache, new, off):
        return jax.lax.dynamic_update_slice(
            cache, new.transpose(1, 0, 2).astype(cache.dtype), (0, off, 0))

    ck = jax.vmap(write_one)(ck, new_k, offsets)
    cv = jax.vmap(write_one)(cv, new_v, offsets)
    cache_k = jax.lax.dynamic_update_index_in_dim(
        cache_k, ck.astype(cache_k.dtype), layer, 0)
    cache_v = jax.lax.dynamic_update_index_in_dim(
        cache_v, cv.astype(cache_v.dtype), layer, 0)
    return cache_k, cache_v
