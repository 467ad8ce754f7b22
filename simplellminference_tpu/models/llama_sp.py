"""Sequence-parallel (context-parallel) Llama prefill under shard_map.

The long-context scaling axis the reference structurally lacks (SURVEY
§2.8: max_length hard-coded 1024, attention a dense O(pos) loop on one
device, config.h:11 / mha_kernel.cu:76): here the SEQUENCE dim of a long
prompt shards across the mesh, every shard computes projections/FFN on
its local chunk (weights replicated), and attention runs as a
``lax.ppermute`` ring with online-softmax merging
(parallel/ring_attention.py) — per-device activation and score memory is
O(S / n_devices), so max prompt length scales with the ring size.

Scope: prefill/scoring (returns logits for every local position — e.g.
long-document PPL, prefix scoring, or TTFT-critical first-pass compute).
Decode continues on the TP/paged path; a future step could scatter the
ring shards' K/V into the paged pools to hand off.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.linear import linear
from simplellminference_tpu.parallel.ring_attention import ring_attention

Params = dict[str, Any]

SEQ_AXIS = "seq"


def seq_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devs).reshape(len(devs)), (SEQ_AXIS,))


def _local_forward(cfg: ModelConfig, params: Params, tokens: jax.Array):
    """Per-shard body: tokens [B, S_local] (global S = Sl * ring)."""
    b, sl = tokens.shape
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = jnp.dtype(cfg.dtype)
    me = jax.lax.axis_index(SEQ_AXIS)

    x = params["embed"][tokens].astype(dtype)
    if cfg.embed_scale != 1.0:
        x = x * jnp.asarray(cfg.embed_scale, dtype)
    positions = me * sl + jnp.arange(sl, dtype=jnp.int32)[None]  # global
    positions = jnp.broadcast_to(positions, (b, sl))
    sin, cos = ref_ops.rope_tables_for(cfg, positions)
    lw = params["layers"]

    def body(x, li):
        def norm_w(w):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)

        attn_in = ref_ops.rmsnorm(x, norm_w(lw["input_norm"]),
                                  cfg.rms_norm_eps)
        qkv = linear(attn_in, lw["wqkv"], layer=li)
        if "wqkv_bias" in lw:
            qkv = qkv + norm_w(lw["wqkv_bias"]).astype(qkv.dtype)
        q = qkv[..., :n * d].reshape(b, sl, n, d)
        k = qkv[..., n * d:(n + kvn) * d].reshape(b, sl, kvn, d)
        v = qkv[..., (n + kvn) * d:].reshape(b, sl, kvn, d)
        q = ref_ops.apply_rope(q, sin, cos)
        k = ref_ops.apply_rope(k, sin, cos)

        attn = ring_attention(q, k, v, SEQ_AXIS, causal=True)

        attn = linear(attn.reshape(b, sl, n * d), lw["wo"], layer=li)
        x2 = x + attn
        ffn_in = ref_ops.rmsnorm(x2, norm_w(lw["post_norm"]),
                                 cfg.rms_norm_eps)
        gate_up = linear(ffn_in, lw["w_gate_up"], layer=li)
        i = cfg.intermediate_size
        act = ref_ops.glu_act(gate_up[..., :i], gate_up[..., i:],
                              cfg.hidden_act)
        return x2 + linear(act, lw["w_down"], layer=li), None

    x, _ = jax.lax.scan(body, x,
                        jnp.arange(cfg.num_layers, dtype=jnp.int32))
    x = ref_ops.rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].astype(x.dtype).T,
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head, out_dtype=jnp.float32)
    return logits.astype(jnp.float32)


def make_sp_prefill(cfg: ModelConfig, mesh: Mesh):
    """Returns forward_fn(params, tokens [B, S]) -> logits [B, S, V]
    with the sequence dim sharded over ``mesh``'s seq axis. S must be a
    multiple of the ring size; weights are replicated (combine with TP
    on a 2-D mesh as a follow-up)."""
    ring = mesh.shape[SEQ_AXIS]
    if cfg.sliding_window is not None:
        # The ring schedule's online-softmax merge assumes full causal
        # attention over every rotated KV chunk; windowed masking across
        # rotated chunks is not wired up. (A window shorter than the
        # per-device shard would also make the ring pointless.)
        raise NotImplementedError(
            "sliding-window attention is not supported by the "
            "sequence-parallel ring prefill")

    def forward_fn(params, tokens):
        b, s = tokens.shape
        assert s % ring == 0, (s, ring)
        f = shard_map(
            lambda p, t: _local_forward(cfg, p, t),
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), params),
                      P(None, SEQ_AXIS)),
            out_specs=P(None, SEQ_AXIS, None), check_vma=False)
        return f(params, tokens)

    return forward_fn


def init_for_tests(cfg: ModelConfig, key):
    return llama.init_params(cfg, key)
