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


def sample(logits: jax.Array, key: jax.Array, temperature: jax.Array,
           top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Batched sampling with per-sequence params, jit-safe (static shapes).

    logits: [B, V] fp32; temperature/top_k/top_p: [B] (temperature <= 0
    means greedy for that row; top_k == 0 disables top-k; top_p >= 1
    disables top-p).
    """
    v = logits.shape[-1]
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t

    # top-k: mask logits below the k-th largest. Data-dependent k per row is
    # handled by ranking (static shapes; no dynamic slicing).
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]            # [B, V]
    k_idx = jnp.clip(jnp.where(top_k > 0, top_k, v) - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)

    # top-p (nucleus): keep the smallest prefix of the sorted distribution
    # with cumulative prob >= top_p.
    sort_idx = jnp.argsort(scaled, axis=-1)[:, ::-1]
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < top_p[:, None]   # always keeps the first
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(probs.shape[0])[:, None], sort_idx].set(keep_sorted)
    scaled = jnp.where(keep, scaled, -jnp.inf)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy(logits), sampled)
