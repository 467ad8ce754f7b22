"""Pallas flash attention (TPU). Placeholder dispatcher for M0.

Returns None when no kernel covers the given shapes, in which case the
caller falls back to the dense jnp reference (which XLA still fuses well).
The real kernels land with M2:

  * ``flash_prefill``: blockwise online-softmax over [Sq, Sk] tiles.
  * ``flash_decode``: Sq == 1, grid over KV blocks with running max/sum.
  * ``paged_decode``: block-table gather variant.
"""

from __future__ import annotations

import jax


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array):
    return None  # M0: always fall back to the reference path.
