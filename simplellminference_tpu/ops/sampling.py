"""On-device token sampling: greedy, temperature, top-k, top-p.

Successor of the reference's argmax layer — which is CPU-only and forces a
per-token logits D2H copy on the GPU path (argmax.cpp:7-17,
model.cpp:175-179). Here everything runs on-device inside the jitted decode
step; only the sampled token ids ever cross to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """argmax over the last axis. logits: [..., V] -> [...] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _sample_sorted(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, top_k: jax.Array,
                   top_p: jax.Array) -> jax.Array:
    """One-sort top-k/top-p sampling in sorted space.

    A single key-value sort yields both the descending logits and the
    permutation; top-k becomes a rank mask, top-p a prefix mask, and the
    categorical draw happens in sorted space (its result maps back through
    the permutation) — no second argsort, no [B, V] scatter.
    """
    b, v = logits.shape
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / t

    iota = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v))
    sv, si = jax.lax.sort((scaled, iota), num_keys=1)   # ascending
    sv = sv[:, ::-1]
    si = si[:, ::-1]

    rank = jnp.arange(v, dtype=jnp.int32)[None]
    keep_k = rank < jnp.where(top_k > 0, top_k, v)[:, None]
    probs = jax.nn.softmax(sv, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = cum - probs < top_p[:, None]   # always keeps the first
    masked = jnp.where(keep_k & keep_p, sv, -jnp.inf)

    pos = jax.random.categorical(key, masked, axis=-1)   # sorted-space idx
    return jnp.take_along_axis(si, pos[:, None], axis=-1)[:, 0]


def sample(logits: jax.Array, key: jax.Array, temperature: jax.Array,
           top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Batched sampling with per-sequence params, jit-safe (static shapes).

    logits: [B, V] fp32; temperature/top_k/top_p: [B] (temperature <= 0
    means greedy for that row; top_k == 0 disables top-k; top_p >= 1
    disables top-p). When every row is greedy (the common serving case) a
    lax.cond skips the vocab sort entirely — this runs inside every decode
    step, and a [B, 32k] sort per step is pure overhead for greedy
    requests.
    """
    gr = greedy(logits)

    def stochastic(_):
        s = _sample_sorted(logits, key, temperature, top_k, top_p)
        return jnp.where(temperature <= 0.0, gr, s.astype(jnp.int32))

    return jax.lax.cond(jnp.all(temperature <= 0.0),
                        lambda _: gr, stochastic, operand=None)
