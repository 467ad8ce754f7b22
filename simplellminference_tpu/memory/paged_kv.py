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


import typing


def _row_major_zeros(shape, dtype):
    """zeros with an explicit row-major device layout.

    Eagerly-created pools can come back in an XLA-chosen layout; the Pallas
    paged kernels constrain operands to row-major, and a mismatched pool
    layout makes XLA relocate the ENTIRE pool (GBs) per layer per decode
    step. Pinning the layout here makes those relocations impossible.
    """
    z = jnp.zeros(shape, dtype)
    if (jax.default_backend() != "tpu" or jax.device_count() != 1
            or isinstance(z, jax.core.Tracer)):  # in-jit: XLA temp, no pin
        return z
    try:
        from jax.experimental.layout import Format, Layout
        fmt = Format(Layout(major_to_minor=tuple(range(len(shape)))),
                     z.sharding)
        return jax.device_put(z, fmt)
    except ImportError:
        return z


def kv_storage_dtype(name: str):
    """KV storage dtypes: bf16, f32, fp8 (e4m3 direct cast — the TPU-native
    compressed format, v5e+ has native fp8 loads), int8 (per-token-head
    scales in side pools)."""
    return {"bf16": jnp.bfloat16, "f32": jnp.float32,
            "fp8": jnp.float8_e4m3fn, "int8": jnp.int8}[name]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """k/v: [L, num_pages, kv_heads, page_size, head_dim].

    For int8 storage, k/v_scale: [L, num_pages, kv_heads, page_size] hold
    the per-token-per-head symmetric scales (absmax/127 at write time).
    """

    k: jax.Array
    # None = shared-KV cache (absorbed MLA): the K pool's latent row IS
    # the value — half the memory, and the attention kernels DMA each
    # page once for both the score and the value contraction.
    v: typing.Optional[jax.Array] = None
    k_scale: typing.Optional[jax.Array] = None
    v_scale: typing.Optional[jax.Array] = None
    # Windowed layer group (sliding-window KV page reclamation,
    # VERDICT r4 #2): models with sliding layers keep those layers' KV
    # in these SEPARATE pools ([Lw, Pw, kvN, ps, D]) addressed by static
    # per-slot ring tables — Pw = max_batch * ring pages, O(window) per
    # sequence, vs the reference allocator's O(context) dense arena
    # (/root/reference/source/memory/alloc.cpp:73-201 +
    # include/model/config.h:11). None = no windowed group.
    k_w: typing.Optional[jax.Array] = None
    v_w: typing.Optional[jax.Array] = None
    k_w_scale: typing.Optional[jax.Array] = None
    v_w_scale: typing.Optional[jax.Array] = None

    @classmethod
    def create(cls, num_layers: int, num_pages: int, num_kv_heads: int,
               page_size: int, head_dim: int, dtype=jnp.bfloat16,
               shared_kv: bool = False):
        """Allocates ``num_pages`` usable pages + one TRASH page (the last
        row): the Pallas write kernels redirect unmapped (-1) table entries
        there, since a blocked out-spec cannot skip its write-back
        (ops/paged_append.py). The allocator never hands out the trash
        page. ``shared_kv``: one pool serves as both K and V (absorbed-MLA
        latent rows) — v stays None."""
        dtype = jnp.dtype(dtype)
        shape = (num_layers, num_pages + 1, num_kv_heads, page_size,
                 head_dim)
        k = _row_major_zeros(shape, dtype)
        v = None if shared_kv else _row_major_zeros(shape, dtype)
        if dtype == jnp.int8:
            return cls(k=k, v=v,
                       k_scale=_row_major_zeros(shape[:-1], jnp.float32),
                       v_scale=(None if shared_kv else _row_major_zeros(
                           shape[:-1], jnp.float32)))
        return cls(k=k, v=v)

    def with_windowed(self, num_layers_w: int, num_pages_w: int):
        """Attach a windowed-group pool set ([Lw, Pw+1, kvN, ps, D] with
        the usual trash page) matching this cache's geometry/dtype."""
        _, _, kvn, ps, d = self.k.shape
        shape = (num_layers_w, num_pages_w + 1, kvn, ps, d)
        kw = _row_major_zeros(shape, self.k.dtype)
        vw = None if self.v is None else _row_major_zeros(shape,
                                                          self.k.dtype)
        if self.k_scale is not None:
            return dataclasses.replace(
                self, k_w=kw, v_w=vw,
                k_w_scale=_row_major_zeros(shape[:-1], jnp.float32),
                v_w_scale=(None if self.v is None else _row_major_zeros(
                    shape[:-1], jnp.float32)))
        return dataclasses.replace(self, k_w=kw, v_w=vw)

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def dtype(self):
        return self.k.dtype


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token-per-head symmetric INT8: x [..., D] -> (q, scale [...])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def write_prefill(pool_k: jax.Array, pool_v: jax.Array, new_k: jax.Array,
                  new_v: jax.Array, tables: jax.Array,
                  pool_ks: jax.Array | None = None,
                  pool_vs: jax.Array | None = None):
    """Write a whole prompt into pages (one layer).

    pool_k/v: [P, kvN, ps, D]; new_k/v: [B, S, kvN, D] (S from position 0,
    padded — pages for padding rows map to -1 and are dropped);
    tables: [B, MP] int32 page ids (-1 = unmapped). For int8 pools, pass
    the scale pools [P, kvN, ps]. Returns the updated pools (+ scales).
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
    if pool_ks is not None:
        qk, sk = quantize_kv(new_k)
        qv, sv = quantize_kv(new_v)
        pool_k = pool_k.at[idx].set(chunks(qk), mode="drop")
        pool_v = pool_v.at[idx].set(chunks(qv), mode="drop")
        schunk = lambda sc: (jnp.pad(sc, ((0, 0), (0, pad), (0, 0)))
                             if pad else sc).reshape(
            b, npg, ps, kvn).transpose(0, 1, 3, 2).reshape(b * npg, kvn, ps)
        pool_ks = pool_ks.at[idx].set(schunk(sk), mode="drop")
        pool_vs = pool_vs.at[idx].set(schunk(sv), mode="drop")
        return pool_k, pool_v, pool_ks, pool_vs
    pool_k = pool_k.at[idx].set(chunks(new_k).astype(pool_k.dtype),
                                mode="drop")
    pool_v = pool_v.at[idx].set(chunks(new_v).astype(pool_v.dtype),
                                mode="drop")
    return pool_k, pool_v, None, None


def write_decode(pool_k: jax.Array, pool_v: jax.Array, new_k: jax.Array,
                 new_v: jax.Array, tables: jax.Array, positions: jax.Array,
                 pool_ks: jax.Array | None = None,
                 pool_vs: jax.Array | None = None):
    """Write one token per sequence (one layer).

    new_k/v: [B, kvN, D]; positions: [B] absolute token positions;
    tables: [B, MP]. Inactive slots should pass position 0 with a -1 page.
    """
    ps = pool_k.shape[2]
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]       # [B]
    slot = positions % ps                                       # [B]
    if pool_ks is not None:
        qk, sk = quantize_kv(new_k)
        qv, sv = quantize_kv(new_v)
        pool_k = pool_k.at[page_idx, :, slot, :].set(qk, mode="drop")
        pool_v = pool_v.at[page_idx, :, slot, :].set(qv, mode="drop")
        pool_ks = pool_ks.at[page_idx, :, slot].set(sk, mode="drop")
        pool_vs = pool_vs.at[page_idx, :, slot].set(sv, mode="drop")
        return pool_k, pool_v, pool_ks, pool_vs
    pool_k = pool_k.at[page_idx, :, slot, :].set(
        new_k.astype(pool_k.dtype), mode="drop")
    pool_v = pool_v.at[page_idx, :, slot, :].set(
        new_v.astype(pool_v.dtype), mode="drop")
    return pool_k, pool_v, None, None


def _use_pallas_writes() -> bool:
    from simplellminference_tpu.ops.attention import dispatch
    return jax.default_backend() == "tpu" and (
        jax.device_count() == 1 or dispatch.SHARD_MAP_LOCAL)


def write_prefill_stacked(pool_k: jax.Array, pool_v: jax.Array,
                          new_k: jax.Array, new_v: jax.Array,
                          tables: jax.Array, layer: jax.Array,
                          pool_ks: jax.Array | None = None,
                          pool_vs: jax.Array | None = None,
                          page_offset: jax.Array | None = None):
    """Stacked-pool prefill write: pools [L, P, kvN, ps, D] + layer index.

    ``page_offset``: first table column to write — a scalar, or a [B]
    vector for batched chunked/suffix prefill where each row starts at
    its own page-aligned offset (prefix-cache suffixes). Columns past the
    table width map to -1 (trash page).

    On single-chip TPU (bf16/fp8 pools) this is an in-place Pallas write
    (ops/paged_append.py) — the jnp scatter fallback is correct but drags
    XLA's layout assignment into relocating the whole pool per layer step
    inside the decode loop. int8 pools (side scale scatters) and CPU/GSPMD
    paths keep the scatter.
    """
    if page_offset is not None:
        ps = pool_k.shape[3]
        npg = -(-new_k.shape[1] // ps)
        po = jnp.asarray(page_offset, jnp.int32)
        if po.ndim == 0:
            po = jnp.full((tables.shape[0],), po, jnp.int32)
        cols = po[:, None] + jnp.arange(npg, dtype=jnp.int32)[None]
        safe = jnp.minimum(cols, tables.shape[1] - 1)
        tables = jnp.where(cols < tables.shape[1],
                           jnp.take_along_axis(tables, safe, axis=1), -1)
    shared = pool_v is None   # shared-KV (absorbed MLA): K-pool only
    if _use_pallas_writes():
        if pool_ks is None:
            from simplellminference_tpu.ops.paged_append import (
                paged_append_prefill)
            pk, pv = paged_append_prefill(pool_k, pool_v, new_k,
                                          None if shared else new_v,
                                          tables, layer)
            return pk, pv, None, None
        if not shared:
            from simplellminference_tpu.ops.paged_append import (
                paged_append_prefill_quant)
            return paged_append_prefill_quant(pool_k, pool_v, pool_ks,
                                              pool_vs, new_k, new_v,
                                              tables, layer)
    _, p, kvn, ps, d = pool_k.shape
    b, s, _, _ = new_k.shape
    npg = s // ps if s % ps == 0 else s // ps + 1
    pad = npg * ps - s

    def chunks(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x
        return (x.reshape(b, npg, ps, kvn, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b * npg, kvn, ps, d))

    idx = tables[:, :npg].reshape(-1)
    if pool_ks is not None:
        qk, sk = quantize_kv(new_k)
        pool_k = pool_k.at[layer, idx].set(chunks(qk), mode="drop")
        schunk = lambda sc: (jnp.pad(sc, ((0, 0), (0, pad), (0, 0)))
                             if pad else sc).reshape(
            b, npg, ps, kvn).transpose(0, 1, 3, 2).reshape(b * npg, kvn, ps)
        pool_ks = pool_ks.at[layer, idx].set(schunk(sk), mode="drop")
        if shared:
            return pool_k, None, pool_ks, None
        qv, sv = quantize_kv(new_v)
        pool_v = pool_v.at[layer, idx].set(chunks(qv), mode="drop")
        pool_vs = pool_vs.at[layer, idx].set(schunk(sv), mode="drop")
        return pool_k, pool_v, pool_ks, pool_vs
    pool_k = pool_k.at[layer, idx].set(chunks(new_k).astype(pool_k.dtype),
                                       mode="drop")
    if shared:
        return pool_k, None, None, None
    pool_v = pool_v.at[layer, idx].set(chunks(new_v).astype(pool_v.dtype),
                                       mode="drop")
    return pool_k, pool_v, None, None


def write_decode_stacked(pool_k: jax.Array, pool_v: jax.Array,
                         new_k: jax.Array, new_v: jax.Array,
                         tables: jax.Array, positions: jax.Array,
                         layer: jax.Array,
                         pool_ks: jax.Array | None = None,
                         pool_vs: jax.Array | None = None):
    """Stacked-pool decode write: one token per sequence at ``layer``."""
    shared = pool_v is None   # shared-KV (absorbed MLA): K-pool only
    if _use_pallas_writes():
        if pool_ks is None:
            from simplellminference_tpu.ops.paged_append import (
                paged_append_decode)
            pk, pv = paged_append_decode(pool_k, pool_v, new_k,
                                         None if shared else new_v,
                                         tables, positions, layer)
            return pk, pv, None, None
        if not shared:
            from simplellminference_tpu.ops.paged_append import (
                paged_append_decode_quant)
            return paged_append_decode_quant(pool_k, pool_v, pool_ks,
                                             pool_vs, new_k, new_v,
                                             tables, positions, layer)
    ps = pool_k.shape[3]
    page_idx = jnp.take_along_axis(
        tables, (positions // ps)[:, None], axis=1)[:, 0]       # [B]
    slot = positions % ps                                       # [B]
    if pool_ks is not None:
        qk, sk = quantize_kv(new_k)
        pool_k = pool_k.at[layer, page_idx, :, slot, :].set(qk, mode="drop")
        pool_ks = pool_ks.at[layer, page_idx, :, slot].set(sk, mode="drop")
        if shared:
            return pool_k, None, pool_ks, None
        qv, sv = quantize_kv(new_v)
        pool_v = pool_v.at[layer, page_idx, :, slot, :].set(qv, mode="drop")
        pool_vs = pool_vs.at[layer, page_idx, :, slot].set(sv, mode="drop")
        return pool_k, pool_v, pool_ks, pool_vs
    pool_k = pool_k.at[layer, page_idx, :, slot, :].set(
        new_k.astype(pool_k.dtype), mode="drop")
    if shared:
        return pool_k, None, None, None
    pool_v = pool_v.at[layer, page_idx, :, slot, :].set(
        new_v.astype(pool_v.dtype), mode="drop")
    return pool_k, pool_v, None, None


def write_span_stacked(pool_k: jax.Array, pool_v: jax.Array,
                       new_k: jax.Array, new_v: jax.Array,
                       tables: jax.Array, positions: jax.Array,
                       layer: jax.Array,
                       pool_ks: jax.Array | None = None,
                       pool_vs: jax.Array | None = None):
    """Write T consecutive tokens per sequence at ``positions`` (the
    speculative-decoding verify step). new_k/v: [B, T, kvN, D]; T <= 8."""
    shared = pool_v is None   # shared-KV (absorbed MLA): K-pool only
    if pool_ks is None and _use_pallas_writes():
        from simplellminference_tpu.ops.paged_append import (
            paged_append_span)
        pk, pv = paged_append_span(pool_k, pool_v, new_k,
                                   None if shared else new_v, tables,
                                   positions, layer)
        return pk, pv, None, None
    b, t_len, kvn, d = new_k.shape
    ps = pool_k.shape[3]
    pos = positions[:, None] + jnp.arange(t_len, dtype=jnp.int32)[None]
    page_idx = jnp.take_along_axis(tables, pos // ps, axis=1)  # [B, T]
    slot = pos % ps
    if pool_ks is not None:
        qk, sk = quantize_kv(new_k)   # [B, T, kvN, D], [B, T, kvN]
        pool_k = pool_k.at[layer, page_idx, :, slot, :].set(qk,
                                                            mode="drop")
        pool_ks = pool_ks.at[layer, page_idx, :, slot].set(sk, mode="drop")
        if shared:
            return pool_k, None, pool_ks, None
        qv, sv = quantize_kv(new_v)
        pool_v = pool_v.at[layer, page_idx, :, slot, :].set(qv,
                                                            mode="drop")
        pool_vs = pool_vs.at[layer, page_idx, :, slot].set(sv, mode="drop")
        return pool_k, pool_v, pool_ks, pool_vs
    pool_k = pool_k.at[layer, page_idx, :, slot, :].set(
        new_k.astype(pool_k.dtype), mode="drop")
    if shared:
        return pool_k, None, None, None
    pool_v = pool_v.at[layer, page_idx, :, slot, :].set(
        new_v.astype(pool_v.dtype), mode="drop")
    return pool_k, pool_v, None, None


def gather_dense(pool_k: jax.Array, pool_v: jax.Array, tables: jax.Array,
                 pool_ks: jax.Array | None = None,
                 pool_vs: jax.Array | None = None
                 ) -> tuple[jax.Array, jax.Array]:
    """Reference path: gather pages into a dense [B, kvN, MP*ps, D] view,
    dequantizing int8 storage through the scale pools.

    Unmapped (-1) pages come back as zeros (mode='fill'); callers mask by
    kv_lens anyway. pool_v None (shared-KV absorbed-MLA cache): the K
    gather is returned for both.
    """
    p, kvn, ps, d = pool_k.shape
    b, mp = tables.shape

    def g(pool, scales):
        x = pool.at[tables.reshape(-1)].get(mode="fill", fill_value=0)
        # [B*MP, kvN, ps, D] -> [B, kvN, MP*ps, D]
        x = (x.reshape(b, mp, kvn, ps, d)
             .transpose(0, 2, 1, 3, 4)
             .reshape(b, kvn, mp * ps, d))
        if scales is not None:
            s = scales.at[tables.reshape(-1)].get(mode="fill", fill_value=0)
            s = (s.reshape(b, mp, kvn, ps)
                 .transpose(0, 2, 1, 3)
                 .reshape(b, kvn, mp * ps))
            x = x.astype(jnp.float32) * s[..., None]
        return x

    ck = g(pool_k, pool_ks)
    if pool_v is None:
        return ck, ck
    return ck, g(pool_v, pool_vs)
