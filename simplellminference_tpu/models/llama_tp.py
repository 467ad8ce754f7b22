"""Tensor-parallel Llama forward under shard_map (megatron-style).

Why shard_map and not plain GSPMD jit: ``pallas_call`` has no SPMD
partitioning rule, so under GSPMD the multi-device path falls back to jnp
reference ops (ops/attention/dispatch.py). Inside a shard_map body every
kernel call is single-device, so the production Pallas kernels (fused
dequant+matmul, flash decode, KV append) run per shard, with explicit
``lax.psum`` all-reduces after the row-sharded wo / w_down matmuls —
exactly the BASELINE north-star execution shape (TP over ICI; XLA
schedules the psums to overlap with independent compute, and
parallel/collective.py provides ring-decomposed variants).

Layout contract: the fused wqkv [H, (N+2kvN)·D] and w_gate_up [H, 2I]
columns are laid out per-matrix (all q | all k | all v); a contiguous
column shard would mix them, so :func:`permute_params_for_tp` reorders the
columns ONCE at setup into per-shard blocks [q_d|k_d|v_d]·d — after which
each shard's local slice has the standard single-device layout with
n/tp heads (and the single-device slicing code works unchanged).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention import dispatch
from simplellminference_tpu.ops.linear import QuantizedWeight, linear
from simplellminference_tpu.parallel import sharding
from simplellminference_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from simplellminference_tpu.runtime.kv_cache import DenseKVCache

Params = dict[str, Any]


def _qkv_perm(cfg: ModelConfig, tp: int) -> np.ndarray:
    """Column permutation for wqkv: per-shard [q_d | k_d | v_d] blocks."""
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q_off, k_off, v_off = 0, n * d, (n + kvn) * d
    nl, kvl = n // tp, kvn // tp
    cols = []
    for dev in range(tp):
        cols.append(np.arange(q_off + dev * nl * d,
                              q_off + (dev + 1) * nl * d))
        cols.append(np.arange(k_off + dev * kvl * d,
                              k_off + (dev + 1) * kvl * d))
        cols.append(np.arange(v_off + dev * kvl * d,
                              v_off + (dev + 1) * kvl * d))
    return np.concatenate(cols)


def _interleave_gate_up_perm(i: int, tp: int) -> np.ndarray:
    """Column permutation for a [gate | up] matrix of width 2*i:
    per-shard [gate_d | up_d] blocks."""
    il = i // tp
    cols = []
    for dev in range(tp):
        cols.append(np.arange(dev * il, (dev + 1) * il))
        cols.append(np.arange(i + dev * il, i + (dev + 1) * il))
    return np.concatenate(cols)


def _gate_up_perm(cfg: ModelConfig, tp: int) -> np.ndarray:
    """Column permutation for w_gate_up: per-shard [gate_d | up_d]."""
    return _interleave_gate_up_perm(cfg.intermediate_size, tp)


def _permute_cols(w, perm: np.ndarray):
    if isinstance(w, QuantizedWeight):
        return QuantizedWeight(q=w.q[..., perm], scales=w.scales[..., perm],
                               bits=w.bits,
                               zs=None if w.zs is None else w.zs[..., perm])
    return w[..., perm]


def _check_tp_supported(cfg: ModelConfig, paged: bool = False):
    """MLA shards cleanly (per-head q/kv_b expansions are whole-head
    column chunks; the absorbed latent row replicates as ONE kv head).
    The DeepSeek dense-prefix stack is handled by forward_paged's group
    scan — supported on the PAGED (serving) path; the dense
    make_tp_forward body has no dense-prefix pre-scan yet."""
    if cfg.first_k_dense and not paged:
        raise ValueError(
            "make_tp_forward does not support DeepSeek dense-prefix "
            "stacks (first_k_dense); use the paged engine TP path "
            "(make_tp_forward_paged / Engine(mesh_shape=...))")


def permute_params_for_tp(cfg: ModelConfig, params: Params,
                          tp: int) -> Params:
    """One-time column reorder of the fused projections (identity at tp=1)."""
    if tp == 1:
        return params
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.mla or cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0
    out = dict(params)
    layers = dict(params["layers"])
    if "wqkv" in layers:
        layers["wqkv"] = _permute_cols(layers["wqkv"], _qkv_perm(cfg, tp))
    # MLA projections (q_proj/q_b [*, N*qk], kv_b [dc, N*(nope+vd)]) lay
    # whole heads contiguously — a contiguous column shard is already
    # whole heads, no permutation needed.
    if "wqkv_bias" in layers:
        layers["wqkv_bias"] = layers["wqkv_bias"][..., _qkv_perm(cfg, tp)]
    if cfg.num_experts:
        # MoE w_gate_up is per-expert [gate_e | up_e] blocks: a contiguous
        # column shard is already whole experts (E % tp == 0 asserted in
        # ops/moe.py) — no permutation needed. The Qwen2-MoE shared
        # expert is a plain dense FFN and gets the megatron interleave.
        assert cfg.num_experts % tp == 0, (cfg.num_experts, tp)
        if cfg.shared_expert_intermediate_size:
            layers["shared_gate_up"] = _permute_cols(
                layers["shared_gate_up"],
                _interleave_gate_up_perm(
                    cfg.shared_expert_intermediate_size, tp))
    else:
        layers["w_gate_up"] = _permute_cols(layers["w_gate_up"],
                                            _gate_up_perm(cfg, tp))
    out["layers"] = layers
    if "dense_layers" in params:
        # DeepSeek dense-prefix group: plain dense FFN -> megatron
        # gate/up interleave (attention weights shard like the main
        # group: whole-head column chunks, no permutation for MLA)
        dl = dict(params["dense_layers"])
        dl["w_gate_up"] = _permute_cols(dl["w_gate_up"],
                                        _gate_up_perm(cfg, tp))
        out["dense_layers"] = dl
    return out


def _forward_local(cfg: ModelConfig, params: Params, tokens: jax.Array,
                   positions: jax.Array, cache_k, cache_v,
                   offsets, kv_lens, prefill_from_zero: bool,
                   vocab_shard: int, last_token_only: bool = False,
                   ring_collectives: bool = False):
    """Per-shard body: local heads/intermediate, explicit collectives."""
    b, s = tokens.shape
    dtype = jnp.dtype(cfg.dtype)

    # Vocab-parallel embedding: local rows + psum (SNIPPETS-style).
    me = jax.lax.axis_index(MODEL_AXIS)
    v0 = me * vocab_shard
    local_ids = jnp.clip(tokens - v0, 0, vocab_shard - 1)
    hit = (tokens >= v0) & (tokens < v0 + vocab_shard)
    x = jnp.where(hit[..., None], params["embed"][local_ids], 0)
    x = jax.lax.psum(x.astype(jnp.float32), MODEL_AXIS).astype(dtype)
    if cfg.embed_scale != 1.0:  # Gemma: sqrt(hidden_size) multiplier
        x = x * jnp.asarray(cfg.embed_scale, dtype)

    lw = params["layers"]

    # Alternating sliding/full stacks (Gemma-2): same period-scan as
    # llama.forward — p sub-bodies with static windows per scan step.
    period, wins, nope = cfg.scan_pattern()
    # per-sublayer rope tables (Gemma-3 sliding layers use a local
    # theta; SmolLM3 NoPE sublayers get identity tables)
    ropes_j = ref_ops.rope_tables_by_sublayer(cfg, positions, wins, nope)
    steps = jnp.arange(cfg.num_layers // period, dtype=jnp.int32) * period

    if cache_k is not None:
        if s > 1 and prefill_from_zero:
            masks = {w: ref_ops.causal_mask(s, s, window=w)[None, None]
                     for w in set(wins)}
        else:
            sk = cache_k.shape[3]
            key_pos = jnp.arange(sk)[None, None, None, :]
            q_pos = positions[:, None, :, None]
            base = ((key_pos <= q_pos)
                    & (key_pos < kv_lens[:, None, None, None]))
            masks = {w: base if w is None
                     else base & (key_pos > q_pos - w) for w in set(wins)}

        def body(carry, base_li):
            x, ck, cv = carry
            for j, w in enumerate(wins):
                sj, cj = ropes_j[j]
                x, ck, cv = llama.decoder_layer(
                    cfg, lw, base_li + j, x, sj, cj, ck, cv, offsets,
                    masks[w], kv_lens, prefill_from_zero,
                    tp_axis=MODEL_AXIS, ring_collectives=ring_collectives,
                    window=w)
            return (x, ck, cv), None

        (x, cache_k, cache_v), _ = jax.lax.scan(
            body, (x, cache_k, cache_v), steps)
    else:
        masks = {w: ref_ops.causal_mask(s, s, window=w)[None, None]
                 for w in set(wins)}

        def body(x, base_li):
            for j, w in enumerate(wins):
                sj, cj = ropes_j[j]
                x, _, _ = llama.decoder_layer(
                    cfg, lw, base_li + j, x, sj, cj, None, None, None,
                    masks[w], None, False, tp_axis=MODEL_AXIS,
                    ring_collectives=ring_collectives, window=w)
            return x, None

        x, _ = jax.lax.scan(body, x, steps)

    if last_token_only and s > 1:
        last = (kv_lens - 1 - offsets if kv_lens is not None
                else jnp.full((b,), s - 1, jnp.int32))
        x = jnp.take_along_axis(x, last[:, None, None], axis=1)

    x = ref_ops.rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        # Tied: vocab-sharded embedding IS the head -> local logit columns.
        logits = jnp.dot(x, params["embed"].astype(x.dtype).T,
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head, out_dtype=jnp.float32)
    if cfg.final_logit_softcap:  # Gemma-2 final-logit soft cap
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    return logits.astype(jnp.float32), cache_k, cache_v


def make_tp_forward(cfg: ModelConfig, mesh: Mesh, params: Params,
                    ring_collectives: bool = False):
    """Returns (tp_params, forward_fn); forward_fn takes
    (params, tokens, positions, cache, offsets, kv_lens, ...) — i.e.
    :func:`llama.forward` WITHOUT the leading cfg (bound in the closure)
    — and runs the shard_map TP body. Wrap with
    ``lambda cfg, *a, **k: fn(*a, **k)`` for cfg-leading callers.

    ``tp_params`` are the column-permuted params — pass them to
    ``sharding.shard_params`` / ``device_put`` and then to forward_fn.
    """
    _check_tp_supported(cfg)
    tp = mesh.shape[MODEL_AXIS]
    assert cfg.vocab_size % tp == 0, (cfg.vocab_size, tp)
    vocab_shard = cfg.vocab_size // tp
    tp_params = permute_params_for_tp(cfg, params, tp)
    pspecs = sharding.spec_tree(cfg, tp_params)
    kv_spec = sharding.kv_cache_spec(
        shard_kv_heads=(cfg.num_kv_heads % tp == 0))

    def forward_fn(params, tokens, positions, cache: Optional[DenseKVCache],
                   offsets=None, kv_lens=None, prefill_from_zero=True,
                   last_token_only=False):
        b, s = tokens.shape
        if cache is not None:
            if offsets is None:
                offsets = positions[:, 0]
            if kv_lens is None:
                kv_lens = offsets + s

        tok_spec = P(DATA_AXIS, None)
        vec_spec = P(DATA_AXIS)
        cache_in = (cache.k, cache.v) if cache is not None else (None, None)
        cache_specs = (kv_spec, kv_spec) if cache is not None else (None, None)

        def body(params, tokens, positions, ck, cv, offsets, kv_lens):
            old = dispatch.SHARD_MAP_LOCAL
            dispatch.SHARD_MAP_LOCAL = True
            try:
                return _forward_local(cfg, params, tokens, positions, ck,
                                      cv, offsets, kv_lens,
                                      prefill_from_zero, vocab_shard,
                                      last_token_only, ring_collectives)
            finally:
                dispatch.SHARD_MAP_LOCAL = old

        f = shard_map(
            body, mesh=mesh,
            in_specs=(pspecs, tok_spec, tok_spec, *cache_specs,
                      vec_spec if cache is not None else None,
                      vec_spec if cache is not None else None),
            out_specs=(P(DATA_AXIS, None, MODEL_AXIS), *cache_specs),
            check_vma=False)
        logits, new_k, new_v = f(params, tokens, positions, *cache_in,
                                 offsets, kv_lens)
        new_cache = (DenseKVCache(k=new_k, v=new_v)
                     if cache is not None else None)
        return logits, new_cache

    return tp_params, forward_fn

def make_tp_forward_paged(cfg: ModelConfig, mesh: Mesh, params: Params):
    """TP forward over the PAGED cache (the serving-engine path).

    Returns (tp_params, forward_fn) where forward_fn matches
    :func:`llama.forward_paged`'s signature (with a leading ``cfg`` the
    Engine passes positionally). KV page pools shard on the kv-head dim
    (``P(None, None, model, None, None)``); block tables and per-request
    state stay replicated, so the engine's host scheduler is unchanged.
    Inside the shard_map body every Pallas kernel (paged append/span,
    flash decode/verify, dequant+matmul) runs on its local shard.
    """
    _check_tp_supported(cfg, paged=True)
    from simplellminference_tpu.memory.paged_kv import PagedKVCache

    tp = mesh.shape[MODEL_AXIS]
    assert cfg.vocab_size % tp == 0, (cfg.vocab_size, tp)
    assert cfg.num_kv_heads % tp == 0 or cfg.num_kv_heads == 1, (
        cfg.num_kv_heads, tp)
    vocab_shard = cfg.vocab_size // tp
    tp_params = permute_params_for_tp(cfg, params, tp)
    pspecs = sharding.spec_tree(cfg, tp_params)
    # absorbed-MLA pools have ONE kv head: replicate over the model axis
    # (every shard computes and writes the identical latent row)
    kv_ax = MODEL_AXIS if cfg.num_kv_heads % tp == 0 else None
    pool_spec = P(None, None, kv_ax, None, None)
    scale_spec = P(None, None, kv_ax, None)
    rep2 = P(None, None)
    rep1 = P(None)

    def forward_fn(cfg_, params, tokens, positions, cache, tables,
                   kv_lens, prefill, last_token_only=False,
                   chunk_offset=None):
        del cfg_  # closure cfg is authoritative (engine passes it through)
        quant_kv = cache.k_scale is not None

        def body(params, tokens, positions, pk, pv, pks, pvs, tables,
                 kv_lens, co):
            old = dispatch.SHARD_MAP_LOCAL
            dispatch.SHARD_MAP_LOCAL = True
            try:
                c = PagedKVCache(k=pk, v=pv, k_scale=pks, v_scale=pvs)
                logits, c2 = llama.forward_paged(
                    cfg, params, tokens, positions, c, tables, kv_lens,
                    prefill=prefill, last_token_only=last_token_only,
                    chunk_offset=co, tp_axis=MODEL_AXIS,
                    vocab_shard=vocab_shard)
            finally:
                dispatch.SHARD_MAP_LOCAL = old
            return (logits, c2.k, c2.v, c2.k_scale, c2.v_scale)

        co = chunk_offset
        # The shard_map signature carries only the cache leaves that
        # EXIST: shared-KV (absorbed-MLA) caches have v=None, int8 adds
        # scale pools; chunk_offset None is likewise a static variant.
        shared = cache.v is None
        cache_args = [cache.k]
        cache_specs = [pool_spec]
        if not shared:
            cache_args += [cache.v]
            cache_specs += [pool_spec]
        if quant_kv:
            cache_args += [cache.k_scale]
            cache_specs += [scale_spec]
            if not shared:
                cache_args += [cache.v_scale]
                cache_specs += [scale_spec]
        nc = len(cache_args)
        if co is None:
            extra_args, extra_specs = (), ()
        else:
            extra_args = (jnp.asarray(co, jnp.int32),)
            extra_specs = (rep1 if jnp.ndim(co) else P(),)

        def bodyg(params, tokens, positions, *rest):
            it = iter(rest[:nc])
            pk = next(it)
            pv = None if shared else next(it)
            pks = next(it) if quant_kv else None
            pvs = next(it) if quant_kv and not shared else None
            tables_, kv_lens_ = rest[nc], rest[nc + 1]
            co_ = rest[nc + 2] if co is not None else None
            logits, k2, v2, ks2, vs2 = body(params, tokens, positions,
                                            pk, pv, pks, pvs, tables_,
                                            kv_lens_, co_)
            outs = [logits, k2]
            if not shared:
                outs.append(v2)
            if quant_kv:
                outs.append(ks2)
                if not shared:
                    outs.append(vs2)
            return tuple(outs)

        in_specs = (pspecs, rep2, rep2, *cache_specs, rep2, rep1,
                    *extra_specs)
        out_specs = (P(None, None, MODEL_AXIS), *cache_specs)
        f = shard_map(bodyg, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        outs = f(params, tokens, positions, *cache_args, tables, kv_lens,
                 *extra_args)
        logits = outs[0]
        rest = list(outs[1:])
        nk = rest.pop(0)
        nv = None if shared else rest.pop(0)
        nks = rest.pop(0) if quant_kv else None
        nvs = (rest.pop(0) if quant_kv and not shared else None)
        return logits, PagedKVCache(k=nk, v=nv, k_scale=nks, v_scale=nvs)

    return tp_params, forward_fn
