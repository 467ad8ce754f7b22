"""Collective matmuls: ring-decomposed TP with compute/comm overlap.

The BASELINE north star requires "per-layer all-reduce overlapped with the
next layer's dequant-matmul". Two mechanisms:

  1. **GSPMD default** (parallel/sharding.py): jit sees row-sharded wo /
     w_down inputs and inserts all-reduces; XLA's latency-hiding scheduler
     overlaps them with independent compute where it can.
  2. **Manual ring decomposition** (this module, under ``shard_map``): the
     all-reduce after a row-sharded matmul is decomposed into per-chunk
     ``lax.ppermute`` steps interleaved with the chunked matmul — each
     chunk's partial sum rides the ICI ring while the MXU computes the
     next chunk (the "collective matmul" of the scaling-book recipe;
     async collective permutes make the overlap explicit instead of
     hoping the scheduler finds it).

All functions run inside ``shard_map`` with a named mesh axis; they are
pure JAX (ppermute/psum), so they work on the virtual CPU mesh for tests
and lower to ICI collectives on a pod.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from simplellminference_tpu.parallel.mesh import MODEL_AXIS


def matmul_allreduce_ring(x: jax.Array, w_shard: jax.Array,
                          axis: str = MODEL_AXIS) -> jax.Array:
    """y = psum_over_axis(x_shard @ w_shard) with ring overlap.

    Inside shard_map: x [..., K/tp] (contraction-sharded), w_shard
    [K/tp, N] (row-sharded) -> y [..., N] fully reduced on every shard.

    Decomposition: accumulate partial products around the ring — at step t
    each device computes its local partial for the chunk that is "passing
    through" and forwards the running sum. The ppermute of step t overlaps
    with the matmul of step t+1 (they are data-independent, XLA schedules
    the collective-permute async).
    """
    tp = lax.axis_size(axis)
    if tp == 1:
        return jnp.dot(x, w_shard, preferred_element_type=jnp.float32
                       ).astype(x.dtype)
    # Chunk the OUTPUT dim into tp chunks; chunk c is reduced around the
    # ring and lands fully-summed on every device via a final all-gather
    # of owned chunks (bandwidth-optimal: reduce-scatter + all-gather).
    n = w_shard.shape[-1]
    assert n % tp == 0, (n, tp)
    nc = n // tp
    me = lax.axis_index(axis)
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    def chunk(c):
        # Ring recurrence: at step c device d works on chunk (d-1-c) mod
        # tp, so the partial it receives from d-1 (which worked on
        # (d-2-(c-1)) = (d-1-c)) matches — and at the final step c = tp-1
        # device d holds the FULL sum of chunk d.
        start = ((me - 1 - c) % tp) * nc
        return lax.dynamic_slice_in_dim(w_shard, start, nc, axis=-1)

    acc = jnp.dot(x, chunk(0), preferred_element_type=jnp.float32)
    for c in range(1, tp):
        acc = lax.ppermute(acc, axis, perm)          # overlaps next dot
        acc = acc + jnp.dot(x, chunk(c), preferred_element_type=jnp.float32)
    # acc = full sum of chunk `me`; all-gather and stitch in chunk order.
    gathered = lax.all_gather(acc.astype(x.dtype), axis, axis=0,
                              tiled=False)            # [tp, ..., nc]
    parts = [gathered[i] for i in range(tp)]
    return jnp.concatenate(parts, axis=-1)


def matmul_reduce_scatter(x: jax.Array, w_shard: jax.Array,
                          axis: str = MODEL_AXIS) -> jax.Array:
    """y_shard = reduce_scatter(x @ w_shard) with ring overlap.

    Inside shard_map: x [..., K/tp], w_shard [K/tp, N] -> y [..., N/tp]
    (device d keeps output chunk d, fully reduced). Use when the consumer
    is itself sharded on N (e.g. sequence-parallel norms).
    """
    tp = lax.axis_size(axis)
    if tp == 1:
        return jnp.dot(x, w_shard, preferred_element_type=jnp.float32
                       ).astype(x.dtype)
    n = w_shard.shape[-1]
    assert n % tp == 0
    nc = n // tp
    me = lax.axis_index(axis)
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    def chunk(c):
        start = ((me - 1 - c) % tp) * nc
        return lax.dynamic_slice_in_dim(w_shard, start, nc, axis=-1)

    acc = jnp.dot(x, chunk(0), preferred_element_type=jnp.float32)
    for c in range(1, tp):
        acc = lax.ppermute(acc, axis, perm)
        acc = acc + jnp.dot(x, chunk(c), preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def allgather_matmul(x_shard: jax.Array, w_shard: jax.Array,
                     axis: str = MODEL_AXIS) -> jax.Array:
    """y = all_gather(x_shard) @ w_shard, gathering overlapped chunkwise.

    Inside shard_map: x_shard [..., S/tp, K] (sequence/batch-sharded),
    w_shard [K, N/tp] (column-sharded) -> y [..., S, N/tp]. At ring step t
    the matmul consumes the chunk received at step t-1 while the next
    chunk is in flight.
    """
    tp = lax.axis_size(axis)
    if tp == 1:
        return jnp.dot(x_shard, w_shard, preferred_element_type=jnp.float32
                       ).astype(x_shard.dtype)
    perm = [(i, (i + 1) % tp) for i in range(tp)]
    me = lax.axis_index(axis)

    cur = x_shard
    outs = []
    for c in range(tp):
        y = jnp.dot(cur, w_shard, preferred_element_type=jnp.float32
                    ).astype(x_shard.dtype)
        outs.append(y)
        if c != tp - 1:
            cur = lax.ppermute(cur, axis, perm)      # overlaps this dot
    # The chunk consumed at step c came from device (me - c) % tp; stitch
    # the S axis back in source order. Every device disagrees on which
    # local step held which source, so roll by the device index.
    me_i = me  # traced
    stacked = jnp.stack(outs)                        # [tp, ..., S/tp, nc]
    src = (me_i - jnp.arange(tp)) % tp               # src[c]
    # invert: order[s] = step that held source s  ->  (me - s) % tp
    order = (me_i - jnp.arange(tp)) % tp
    stacked = jnp.take(stacked, order, axis=0)
    parts = [stacked[i] for i in range(tp)]
    del src
    return jnp.concatenate(parts, axis=-2)


def psum_baseline(x: jax.Array, w_shard: jax.Array,
                  axis: str = MODEL_AXIS) -> jax.Array:
    """Reference: local matmul + monolithic psum (what GSPMD emits)."""
    y = jnp.dot(x, w_shard, preferred_element_type=jnp.float32)
    return lax.psum(y, axis).astype(x.dtype)


def matmul_allreduce_ring_quant(x: jax.Array, w, axis: str = MODEL_AXIS,
                                layer: jax.Array | None = None) -> jax.Array:
    """Ring all-reduce fused with the INT8 dequant+matmul — the BASELINE
    north-star "per-layer all-reduce overlapped with the next layer's
    dequant-matmul", realized as: each ring step runs the Pallas
    dequant+matmul on ONE output-column window (scalar-prefetched
    ``n_start``) while the previous window's partial sum rides the ICI via
    ``ppermute``.

    Inside shard_map: x [..., K/tp]; w: QuantizedWeight with local q
    [K/tp, N] (or stacked [L, K/tp, N] + ``layer``). Returns [..., N]
    fully reduced. Non-TPU backends fall back to sliced reference matmuls
    (same ring, jnp compute) so the CPU mesh tests the schedule.
    """
    from simplellminference_tpu.ops import ref_ops
    from simplellminference_tpu.ops.linear import QuantizedWeight

    assert isinstance(w, QuantizedWeight)
    tp = lax.axis_size(axis)
    n = w.q.shape[-1]
    me = lax.axis_index(axis)
    stacked = w.q.ndim == 3

    def window(start, size):
        if jax.default_backend() == "tpu":
            from simplellminference_tpu.ops.matmul import quantized_matmul
            return quantized_matmul(
                x, w.q, w.scales, out_dtype=jnp.float32,
                layer=layer if stacked else None,
                n_start=start, n_size=size)
        q, s = w.q, w.scales
        if stacked:
            q = lax.dynamic_index_in_dim(q, layer, 0, keepdims=False)
            s = lax.dynamic_index_in_dim(s, layer, 0, keepdims=False)
        qw = lax.dynamic_slice_in_dim(q, start, size, axis=-1)
        sw = lax.dynamic_slice_in_dim(s, start, size, axis=-1)
        return ref_ops.quantized_matmul_ref(x, qw, sw,
                                            out_dtype=jnp.float32)

    if tp == 1:
        return window(jnp.zeros((), jnp.int32), n).astype(x.dtype)

    assert n % tp == 0, (n, tp)
    nc = n // tp
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    # Ring recurrence (see matmul_allreduce_ring): device d works on chunk
    # (d - 1 - c) mod tp at step c and ends holding the full sum of chunk d.
    acc = window(((me - 1) % tp) * nc, nc)
    for c in range(1, tp):
        acc = lax.ppermute(acc, axis, perm)          # overlaps next window
        acc = acc + window(((me - 1 - c) % tp) * nc, nc)
    gathered = lax.all_gather(acc.astype(x.dtype), axis, axis=0,
                              tiled=False)
    parts = [gathered[i] for i in range(tp)]
    return jnp.concatenate(parts, axis=-1)
