"""Pipeline-parallel Llama forward (GPipe-style microbatching) under shard_map.

The reference runs its 28 decoder layers as a sequential per-layer loop on
ONE device (/root/reference/source/model/model.cpp:50-129); nothing in it
scales the LAYER dimension across chips. This module adds that axis the
TPU way (SURVEY.md §2.8 row "Pipeline parallel"): the stacked layer params
([L, ...] leaves) shard on their leading dim over a ``pipe`` mesh axis, and
a shard_map body runs the classic GPipe schedule — T = M + pp - 1 ticks of
a ``lax.scan``, where at tick t stage s processes microbatch m = t - s
through its L/pp local layers and hands the activation to stage s+1 via a
ring ``lax.ppermute``. Activations are the only inter-stage traffic
(one [mb, S, H] tensor per tick), so the pipe axis can ride DCN while the
optional inner ``model`` (tensor-parallel) axis rides ICI: the mesh is laid
out (pipe, model) with model innermost, and inside each tick the stage body
is exactly the megatron shard_map body (models/llama_tp.py) — local heads,
psum after wo/w_down, vocab-parallel embedding and LM head.

Bubble ticks (t - s outside [0, M)) still execute the stage body SPMD-style
on clamped microbatch indices; their garbage KV writes are redirected to a
per-stage TRASH LAYER — each stage's local KV cache has L/pp + 1 layer rows
and invalid ticks pass ``kv_layer = L/pp`` (see ``decoder_layer``'s
``kv_layer`` override) — so no select/copy of the cache is ever needed to
keep bubble output from corrupting real state. Weight reads always index a
valid layer; bubble outputs are masked out of the collected hidden states.

Scope: correctness + scheduling shape (validated on the virtual CPU mesh
and in ``__graft_entry__.dryrun_multichip``). The decode hot loop keeps the
unfused per-layer kernels (the fused QKV megakernel couples weight and
cache layer indices in-kernel, which the trash-layer redirect forbids);
a production PP serving deployment would drive this through the paged
engine with persistent in-flight microbatches to hide the pp-1 bubble.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama, llama_tp
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention import dispatch
from simplellminference_tpu.ops.linear import linear
from simplellminference_tpu.parallel import sharding
from simplellminference_tpu.parallel.mesh import MODEL_AXIS

Params = dict[str, Any]

PIPE_AXIS = "pipe"


def pp_mesh(pp: int, tp: int = 1,
            devices: Optional[Sequence] = None) -> Mesh:
    """(pipe, model) mesh — model innermost so TP collectives ride ICI."""
    devices = list(devices if devices is not None else jax.devices())
    need = pp * tp
    if len(devices) < need:
        raise ValueError(f"pp={pp} x tp={tp} needs {need} devices, "
                         f"have {len(devices)}")
    devices = devices[:need]
    if need == 1:
        arr = np.asarray(devices).reshape(1, 1)
    else:
        arr = mesh_utils.create_device_mesh((pp, tp), devices=devices)
    return Mesh(arr, (PIPE_AXIS, MODEL_AXIS))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PPKVCache:
    """Dense KV arena for the PP schedule.

    k/v: [pp*(L/pp + 1), M, mb, kvN, Smax, D] — layer rows are grouped per
    stage as [stage's L/pp real layers, 1 trash layer]; microbatches are a
    leading dim so a tick touches one [Lloc+1, mb, ...] slice.
    """

    k: jax.Array
    v: jax.Array


def _pp_spec_tree(cfg: ModelConfig, params: Params) -> Any:
    """Param PartitionSpecs: layer stacks shard on pipe (dim 0) and keep
    the megatron model-axis column/row sharding; embed/head vocab-shard on
    model (size-1 axes make those a no-op at tp=1)."""
    lspecs = {name: P(PIPE_AXIS, *spec[1:])
              for name, spec in sharding._layer_specs().items()}
    specs: dict[str, Any] = {
        "embed": P(MODEL_AXIS, None),
        "final_norm": P(None),
        "layers": lspecs,
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, MODEL_AXIS)
    return sharding._match_tree(params, specs)


def make_pp_forward(cfg: ModelConfig, mesh: Mesh, params: Params,
                    microbatches: Optional[int] = None):
    """Returns (pp_params, forward_fn, alloc_cache).

    ``forward_fn(params, tokens, positions, cache=None, offsets=None,
    kv_lens=None, prefill_from_zero=True, last_token_only=False)`` mirrors
    :func:`llama.forward` (cfg bound in the closure); ``cache`` must come
    from ``alloc_cache(batch, max_seq, dtype)``. ``pp_params`` are the
    TP-column-permuted params — ``device_put`` them with
    :func:`shard_pp_params` before the first call.
    """
    pp = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if cfg.layer_types is not None:
        # the per-stage scan applies ONE static window to every local
        # layer; alternating sliding/full stacks (Gemma-2) would silently
        # mis-mask — use TP (llama_tp) for those models.
        raise ValueError("pipeline parallelism does not support "
                         "alternating layer_types (Gemma-2-style); "
                         "use tensor parallelism")
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    l_loc = cfg.num_layers // pp
    assert cfg.vocab_size % tp == 0, (cfg.vocab_size, tp)
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0
    vocab_shard = cfg.vocab_size // tp
    m_default = microbatches or pp

    pp_params = llama_tp.permute_params_for_tp(cfg, params, tp)
    pspecs = _pp_spec_tree(cfg, pp_params)
    cache_spec = P(PIPE_AXIS, None, None,
                   MODEL_AXIS if cfg.num_kv_heads % tp == 0 else None,
                   None, None)
    rep2, rep1 = P(None, None), P(None)

    def alloc_cache(batch: int, max_seq: int, dtype=None,
                    microbatches: int = m_default) -> PPKVCache:
        assert batch % microbatches == 0, (batch, microbatches)
        mb = batch // microbatches
        kvn = cfg.num_kv_heads
        shape = (pp * (l_loc + 1), microbatches, mb, kvn, max_seq,
                 cfg.head_dim)
        sh = NamedSharding(mesh, cache_spec)
        z = jax.device_put(jnp.zeros(shape, dtype or cfg.dtype), sh)
        return PPKVCache(k=z, v=z + 0)

    def forward_fn(params, tokens, positions, cache: Optional[PPKVCache] = None,
                   offsets=None, kv_lens=None, prefill_from_zero=True,
                   last_token_only=False, microbatches: int = m_default):
        b, s = tokens.shape
        m = microbatches
        assert b % m == 0, (b, m)
        if cache is not None:
            assert cache.k.shape[1] == m and cache.k.shape[2] == b // m, (
                f"cache laid out for {cache.k.shape[1]}x{cache.k.shape[2]} "
                f"microbatches, called with {m}x{b // m}")
            if offsets is None:
                offsets = positions[:, 0]
            if kv_lens is None:
                kv_lens = offsets + s

        def body(params, tokens, positions, ck, cv, offsets, kv_lens):
            old = dispatch.SHARD_MAP_LOCAL
            dispatch.SHARD_MAP_LOCAL = True
            try:
                return _pp_body(cfg, params, tokens, positions, ck, cv,
                                offsets, kv_lens, pp=pp, l_loc=l_loc, m=m,
                                vocab_shard=vocab_shard,
                                prefill_from_zero=prefill_from_zero,
                                last_token_only=last_token_only)
            finally:
                dispatch.SHARD_MAP_LOCAL = old

        logits_spec = P(None, None, MODEL_AXIS)
        if cache is None:
            f = shard_map(
                lambda p, t, po: body(p, t, po, None, None, None, None)[0],
                mesh=mesh, in_specs=(pspecs, rep2, rep2),
                out_specs=logits_spec, check_vma=False)
            return f(params, tokens, positions), None
        f = shard_map(
            body, mesh=mesh,
            in_specs=(pspecs, rep2, rep2, cache_spec, cache_spec, rep1,
                      rep1),
            out_specs=(logits_spec, cache_spec, cache_spec),
            check_vma=False)
        logits, nk, nv = f(params, tokens, positions, cache.k, cache.v,
                           offsets, kv_lens)
        return logits, PPKVCache(k=nk, v=nv)

    return pp_params, forward_fn, alloc_cache


def shard_pp_params(cfg: ModelConfig, pp_params: Params, mesh: Mesh):
    specs = _pp_spec_tree(cfg, pp_params)
    return jax.tree.map(
        lambda p, sp: jax.device_put(p, NamedSharding(mesh, sp)),
        pp_params, specs)


def _pp_body(cfg: ModelConfig, params: Params, tokens, positions, ck, cv,
             offsets, kv_lens, *, pp: int, l_loc: int, m: int,
             vocab_shard: int, prefill_from_zero: bool,
             last_token_only: bool):
    """Per-shard GPipe schedule. Sees [l_loc, ...] layer params and (with a
    cache) [l_loc+1, M, mb, kvN_loc, Smax, D] local KV arenas."""
    stage = jax.lax.axis_index(PIPE_AXIS)
    b, s = tokens.shape
    mb = b // m
    dtype = jnp.dtype(cfg.dtype)
    h = cfg.hidden_size
    tokens_m = tokens.reshape(m, mb, s)
    pos_m = positions.reshape(m, mb, s)
    has_cache = ck is not None
    if has_cache:
        offs_m = offsets.reshape(m, mb)
        lens_m = kv_lens.reshape(m, mb)
        smax = ck.shape[4]

    lw = dict(params["layers"])
    lw["_input_norm3"] = lw["input_norm"][:, None, :]
    lw["_post_norm3"] = lw["post_norm"][:, None, :]

    def embed_mb(tok):
        # Vocab-parallel gather + psum over model (no-op at tp=1).
        me = jax.lax.axis_index(MODEL_AXIS)
        v0 = me * vocab_shard
        local_ids = jnp.clip(tok - v0, 0, vocab_shard - 1)
        hit = (tok >= v0) & (tok < v0 + vocab_shard)
        x = jnp.where(hit[..., None], params["embed"][local_ids], 0)
        x = jax.lax.psum(x.astype(jnp.float32), MODEL_AXIS).astype(dtype)
        if cfg.embed_scale != 1.0:
            x = x * jnp.asarray(cfg.embed_scale, dtype)
        return x

    def stage_layers(x, m_idx, valid, ck_m, cv_m):
        pos = pos_m[m_idx]
        sin, cos = ref_ops.rope_tables_for(cfg, pos)
        if has_cache:
            offs, lens = offs_m[m_idx], lens_m[m_idx]
            if s > 1 and prefill_from_zero:
                mask = ref_ops.causal_mask(
                    s, s, window=cfg.sliding_window)[None, None]
            else:
                key_pos = jnp.arange(smax)[None, None, None, :]
                q_pos = pos[:, None, :, None]
                mask = ((key_pos <= q_pos)
                        & (key_pos < lens[:, None, None, None]))
                if cfg.sliding_window is not None:
                    mask = mask & (key_pos > q_pos - cfg.sliding_window)
        else:
            offs = lens = None
            mask = ref_ops.causal_mask(
                s, s, window=cfg.sliding_window)[None, None]

        def lbody(carry, li):
            x, ckm, cvm = carry
            # Bubble ticks write/read KV at the trash layer l_loc; weights
            # always index the real layer li.
            kv_li = jnp.where(valid, li, jnp.int32(l_loc))
            x, ckm, cvm = llama.decoder_layer(
                cfg, lw, li, x, sin, cos, ckm, cvm, offs, mask, lens,
                prefill_from_zero, tp_axis=MODEL_AXIS, kv_layer=kv_li)
            return (x, ckm, cvm), None

        (x, ck_m, cv_m), _ = jax.lax.scan(
            lbody, (x, ck_m, cv_m), jnp.arange(l_loc, dtype=jnp.int32))
        return x, ck_m, cv_m

    perm = [(i, (i + 1) % pp) for i in range(pp)]
    ticks = m + pp - 1
    buf0 = jnp.zeros((mb, s, h), dtype)
    outs0 = jnp.zeros((m, mb, s, h), dtype)

    def tick(carry, t):
        buf, outs, ck, cv = carry
        m_in = jnp.clip(t - stage, 0, m - 1)
        valid = (t >= stage) & (t - stage < m)
        x = jnp.where(stage == 0, embed_mb(tokens_m[m_in]), buf)
        if has_cache:
            ck_m = jax.lax.dynamic_index_in_dim(ck, m_in, 1, keepdims=False)
            cv_m = jax.lax.dynamic_index_in_dim(cv, m_in, 1, keepdims=False)
        else:
            ck_m = cv_m = None
        y, ck_m, cv_m = stage_layers(x, m_in, valid, ck_m, cv_m)
        if has_cache:
            ck = jax.lax.dynamic_update_index_in_dim(ck, ck_m, m_in, 1)
            cv = jax.lax.dynamic_update_index_in_dim(cv, cv_m, m_in, 1)
        # Last stage collects finished microbatches; everyone else writes
        # back the current value (no-op) to keep the schedule SPMD.
        out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
        is_out = (stage == pp - 1) & (t >= pp - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, out_idx, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(is_out, y, cur), out_idx, 0)
        buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
        return (buf, outs, ck, cv), None

    (_, outs, ck, cv), _ = jax.lax.scan(
        tick, (buf0, outs0, ck, cv), jnp.arange(ticks, dtype=jnp.int32))
    # Only the last stage wrote outs; psum over pipe replicates it (the
    # per-token hidden is tiny next to the logits we avoid shipping).
    outs = jax.lax.psum(outs, PIPE_AXIS)

    x = outs.reshape(b, s, h).astype(dtype)
    if last_token_only and s > 1:
        last = (kv_lens - 1 - offsets if has_cache
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
    return logits.astype(jnp.float32), ck, cv
