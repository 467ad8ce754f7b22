"""Ring attention: causal self-attention over a SEQUENCE-sharded batch.

Sequence/context parallelism (SURVEY §2.8's "ring/CP stretch" row — the
reference caps context at a hard-coded 1024, config.h:11, and attends on
ONE device): the sequence dim is sharded across a mesh axis, each shard
holds its local q/k/v chunk, and the KV chunks rotate around the ring via
``lax.ppermute`` while a running online-softmax accumulator merges each
incoming block — the [S, S] score matrix never exists, per-device memory
is O(S_local), and the rotation rides the ICI ring concurrently with the
block compute (XLA overlaps the ppermute with the next block's matmuls).

Designed for shard_map bodies (like models/llama_tp.py): call inside a
``shard_map`` whose in_specs shard the sequence dim on ``axis_name``.
Works identically on the virtual CPU mesh (tests) and real ICI.

Causality across the ring uses GLOBAL positions: shard ``r`` holds
positions [r*Sl, (r+1)*Sl); an incoming KV block from source shard ``s``
is fully visible when s < r, causally masked when s == r, and fully
masked when s > r (its contribution underflows to zero through the
finite NEG_INF — no NaNs, no control flow divergence across devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, causal: bool = True,
                   window: int | None = None,
                   sm_scale: float | None = None,
                   logit_cap: float | None = None,
                   sinks: jax.Array | None = None) -> jax.Array:
    """q/k/v: [B, Sl, N, D] / [B, Sl, kvN, D] — the LOCAL sequence chunk
    of each shard along ``axis_name`` (global S = Sl * axis_size).
    Returns the local [B, Sl, N, D] attention output. GQA via head
    grouping (N a multiple of kvN).

    ``window``: sliding-window attention (Mistral/Gemma/GPT-OSS class)
    — query at global position p attends keys in (p - window, p]. The
    windowed mask composes with the global-position causal mask per
    rotated block; blocks entirely outside a query's window contribute
    exp(NEG_INF - m) = 0 through the online-softmax merge (every query
    always sees at least itself, so the normalizer never vanishes).
    The rotation still visits every block (a ppermute must execute on
    all shards) — the win is memory, not skipped compute."""
    b, sl, n, d = q.shape
    kvn = k.shape[2]
    group = n // kvn
    ring = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    scale = d ** -0.5 if sm_scale is None else sm_scale

    qf = q.astype(jnp.float32) * scale
    # local positions once; block offsets added per ring step
    q_pos = me * sl + jnp.arange(sl, dtype=jnp.int32)          # [Sl]
    k_loc = jnp.arange(sl, dtype=jnp.int32)

    def block(qf, kb, vb, src):
        """Online-softmax contribution of KV block ``src`` (shard id)."""
        kf = kb.astype(jnp.float32)
        vf = vb.astype(jnp.float32)
        # scores [B, kvN, G, Sq, Sk]
        qg = qf.reshape(b, sl, kvn, group, d)
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kf)
        if logit_cap:   # Gemma-2 attention soft cap
            s = logit_cap * jnp.tanh(s * (1.0 / logit_cap))
        if causal or window is not None:
            k_pos = src * sl + k_loc
            mask = k_pos[None, :] <= q_pos[:, None]            # [Sq, Sk]
            if window is not None:
                mask &= q_pos[:, None] - k_pos[None, :] < window
            s = jnp.where(mask[None, None, None], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)                 # [...,Sq,1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhgqk,bkhd->bhgqd", p, vf)
        return m[..., 0], l[..., 0], o                         # [...,Sq]

    def merge(acc, new):
        m0, l0, o0 = acc
        m1, l1, o1 = new
        m = jnp.maximum(m0, m1)
        a0 = jnp.exp(m0 - m)
        a1 = jnp.exp(m1 - m)
        return (m, l0 * a0 + l1 * a1,
                o0 * a0[..., None] + o1 * a1[..., None])

    perm = [(j, (j + 1) % ring) for j in range(ring)]

    def step(carry, i):
        kb, vb, acc = carry
        src = (me - i) % ring          # shard that produced this block
        acc = merge(acc, block(qf, kb, vb, src))
        # rotate AFTER consuming: receive the next-older block
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (kb, vb, acc), None

    m0 = jnp.full((b, kvn, group, sl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, kvn, group, sl), jnp.float32)
    o0 = jnp.zeros((b, kvn, group, sl, d), jnp.float32)
    (_, _, (m, l, o)), _ = jax.lax.scan(
        step, (k, v, (m0, l0, o0)), jnp.arange(ring, dtype=jnp.int32))

    if sinks is not None:
        # GPT-OSS attention sinks: a learned per-head logit in the
        # softmax denominator with no value contribution — fold into
        # the final normalizer (exactly the online-softmax identity the
        # paged decode kernel uses, ops/attention/paged_decode.py)
        sk = sinks.astype(jnp.float32).reshape(kvn, group)
        l = l + jnp.exp(sk[None, :, :, None] - m)
    out = o / jnp.maximum(l, 1e-30)[..., None]                 # normalize
    # [B, kvN, G, Sq, D] -> [B, Sq, N, D]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, sl, n, d)
    return out.astype(q.dtype)
