"""KV caches: dense per-sequence arena and paged pool.

The reference keeps a dense static arena ``[L, max_len, kv_hidden]`` and
writes projections through aliased slice views (model.cpp:264-268,
slice_KV_cache tensor.cpp:199-212). The TPU-native equivalents:

  * :class:`DenseKVCache` — the direct successor: a batched dense arena
    functionally updated inside jit (XLA keeps it as in-place loop state).
    Layout ``[L, B, kvN, Smax, D]``: (seq, head_dim) are the tiled last-two
    dims, which is what the Pallas flash-decode/prefill kernels read
    without any transpose of the multi-GB cache.
  * :class:`PagedKVCache` (memory/paged_kv.py) — the production path:
    a global page pool + block tables, capacity bounded by HBM not by
    ``batch × max_seq``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseKVCache:
    """Dense KV arena: k/v of shape [L, B, kv_heads, max_seq, head_dim]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, num_layers: int, batch: int, max_seq: int,
               num_kv_heads: int, head_dim: int, dtype=jnp.bfloat16):
        from simplellminference_tpu.memory.paged_kv import _row_major_zeros
        shape = (num_layers, batch, num_kv_heads, max_seq, head_dim)
        return cls(k=_row_major_zeros(shape, dtype),
                   v=_row_major_zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def dtype(self):
        return self.k.dtype


def update_layer(cache_k_layer: jax.Array, cache_v_layer: jax.Array,
                 new_k: jax.Array, new_v: jax.Array,
                 offsets: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Write [B, S, kvN, D] projections into the [B, kvN, Smax, D] arena.

    ``offsets[b]`` is the absolute cache slot of the first new token of
    sequence b (per-sequence offsets — the reference supports only a single
    scalar pos, model.cpp:54).
    """
    def write_one(cache, new, off):
        # cache: [kvN, Smax, D]; new: [S, kvN, D] -> [kvN, S, D]
        return jax.lax.dynamic_update_slice(
            cache, new.transpose(1, 0, 2).astype(cache.dtype), (0, off, 0))

    k = jax.vmap(write_one)(cache_k_layer, new_k, offsets)
    v = jax.vmap(write_one)(cache_v_layer, new_v, offsets)
    return k, v
