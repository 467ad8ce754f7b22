"""Device-side paged KV cache: page pools + block-table indexed access.

Successor of the reference's dense KV arena + aliased slice views
(model.cpp:264-268; slice_KV_cache tensor.cpp:199-212): capacity is a pool
of fixed-size pages bounded by HBM, sequences map pages via block tables
(host-side C++ allocator, memory/allocator.py), and attention reads pages
through the tables (Pallas paged flash-decode on TPU; gather + dense
reference elsewhere).

Pool layout: k/v [L, num_pages, kvN, page_size, D] — (token-in-page,
head_dim) are the tiled last-two dims, so a page is a directly DMA-able
block for the kernels.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """k/v: [L, num_pages, kv_heads, page_size, head_dim]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, num_layers: int, num_pages: int, num_kv_heads: int,
               page_size: int, head_dim: int, dtype=jnp.bfloat16):
        shape = (num_layers, num_pages, num_kv_heads, page_size, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def dtype(self):
        return self.k.dtype


def write_prefill(pool_k: jax.Array, pool_v: jax.Array, new_k: jax.Array,
                  new_v: jax.Array, tables: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """Write a whole prompt into pages (one layer).

    pool_k/v: [P, kvN, ps, D]; new_k/v: [B, S, kvN, D] (S from position 0,
    padded — pages for padding rows map to -1 and are dropped);
    tables: [B, MP] int32 page ids (-1 = unmapped).
    """
    p, kvn, ps, d = pool_k.shape
    b, s, _, _ = new_k.shape
    npg = s // ps if s % ps == 0 else s // ps + 1
    pad = npg * ps - s

    def chunks(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
        # [B, npg, ps, kvN, D] -> [B*npg, kvN, ps, D]
        return (x.reshape(b, npg, ps, kvn, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b * npg, kvn, ps, d))

    idx = tables[:, :npg].reshape(-1)
    pool_k = pool_k.at[idx].set(chunks(new_k).astype(pool_k.dtype),
                                mode="drop")
    pool_v = pool_v.at[idx].set(chunks(new_v).astype(pool_v.dtype),
                                mode="drop")
    return pool_k, pool_v


def write_decode(pool_k: jax.Array, pool_v: jax.Array, new_k: jax.Array,
                 new_v: jax.Array, tables: jax.Array, positions: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """Write one token per sequence (one layer).

    new_k/v: [B, kvN, D]; positions: [B] absolute token positions;
    tables: [B, MP]. Inactive slots should pass position 0 with a -1 page.
    """
    ps = pool_k.shape[2]
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]       # [B]
    slot = positions % ps                                       # [B]
    b = new_k.shape[0]
    bi = jnp.arange(b)
    pool_k = pool_k.at[page_idx, :, slot, :].set(
        new_k.astype(pool_k.dtype), mode="drop")
    pool_v = pool_v.at[page_idx, :, slot, :].set(
        new_v.astype(pool_v.dtype), mode="drop")
    return pool_k, pool_v


def gather_dense(pool_k: jax.Array, pool_v: jax.Array, tables: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """Reference path: gather pages into a dense [B, kvN, MP*ps, D] view.

    Unmapped (-1) pages come back as zeros (mode='fill'); callers mask by
    kv_lens anyway.
    """
    p, kvn, ps, d = pool_k.shape
    b, mp = tables.shape

    def g(pool):
        x = pool.at[tables.reshape(-1)].get(mode="fill", fill_value=0)
        # [B*MP, kvN, ps, D] -> [B, kvN, MP*ps, D]
        return (x.reshape(b, mp, kvn, ps, d)
                .transpose(0, 2, 1, 3, 4)
                .reshape(b, kvn, mp * ps, d))

    return g(pool_k), g(pool_v)
