"""On-device token sampling: greedy, temperature, top-k, top-p, min-p,
repetition / frequency / presence penalties.

Successor of the reference's argmax layer — which is CPU-only and forces a
per-token logits D2H copy on the GPU path (argmax.cpp:7-17,
model.cpp:175-179). Here everything runs on-device inside the jitted decode
step; only the sampled token ids ever cross to the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """argmax over the last axis. logits: [..., V] -> [...] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    repetition_penalty: jax.Array,
                    frequency_penalty: jax.Array,
                    presence_penalty: jax.Array) -> jax.Array:
    """HF/OpenAI-style penalties from per-row token counts.

    logits/counts: [B, V]; penalties: [B]. ``counts[b, t]`` = occurrences
    of token t in row b's context (prompt + generated so far).
    Repetition (HF): seen tokens' positive logits divide by rp, negative
    multiply. Frequency/presence (OpenAI): logits -= fp*count + pp*seen.
    """
    lf = logits.astype(jnp.float32)
    seen = counts > 0
    rp = repetition_penalty[:, None]
    penalized = jnp.where(lf > 0, lf / rp, lf * rp)
    lf = jnp.where(seen, penalized, lf)
    lf = lf - (frequency_penalty[:, None] * counts.astype(jnp.float32)
               + presence_penalty[:, None] * seen.astype(jnp.float32))
    return lf


def _row_keys(key, seeds, seed_pos):
    """Per-row PRNG keys: fold (seed, position) into a FIXED base so a
    request's draws depend only on its own (seed, token index) — batch
    composition and engine scheduling cannot perturb them."""
    base = jax.random.PRNGKey(0)
    return jax.vmap(
        lambda s, p: jax.random.fold_in(jax.random.fold_in(base, s), p)
    )(seeds.astype(jnp.uint32), seed_pos.astype(jnp.uint32))


def _sample_sorted(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, top_k: jax.Array,
                   top_p: jax.Array, min_p: jax.Array,
                   seeds=None, seed_pos=None) -> jax.Array:
    """One-sort top-k/top-p/min-p sampling in sorted space.

    A single key-value sort yields both the descending logits and the
    permutation; top-k becomes a rank mask, top-p a prefix mask, min-p a
    threshold against the max prob, and the categorical draw happens in
    sorted space (its result maps back through the permutation) — no
    second argsort, no [B, V] scatter.
    """
    b, v = logits.shape
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / t

    iota = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v))
    sv, si = jax.lax.sort((scaled, iota), num_keys=1)   # ascending
    sv = sv[:, ::-1]
    si = si[:, ::-1]

    rank = jnp.arange(v, dtype=jnp.int32)[None]
    keep = rank < jnp.where(top_k > 0, top_k, v)[:, None]
    probs = jax.nn.softmax(sv, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= cum - probs < top_p[:, None]   # always keeps the first
    keep &= probs >= min_p[:, None] * probs[:, :1]
    masked = jnp.where(keep, sv, -jnp.inf)

    if seeds is not None:
        keys = _row_keys(key, seeds, seed_pos)
        pos = jax.vmap(jax.random.categorical)(keys, masked)
    else:
        pos = jax.random.categorical(key, masked, axis=-1)  # sorted idx
    return jnp.take_along_axis(si, pos[:, None], axis=-1)[:, 0]


def sample(logits: jax.Array, key: jax.Array, temperature: jax.Array,
           top_k: jax.Array, top_p: jax.Array,
           min_p: Optional[jax.Array] = None,
           counts: Optional[jax.Array] = None,
           repetition_penalty: Optional[jax.Array] = None,
           frequency_penalty: Optional[jax.Array] = None,
           presence_penalty: Optional[jax.Array] = None,
           seeds: Optional[jax.Array] = None,
           seed_pos: Optional[jax.Array] = None) -> jax.Array:
    """Batched sampling with per-sequence params, jit-safe (static shapes).

    logits: [B, V] fp32; temperature/top_k/top_p/min_p: [B] (temperature
    <= 0 means greedy for that row; top_k == 0, top_p >= 1, min_p <= 0
    disable their filters). ``counts`` [B, V] + the penalty vectors enable
    repetition/frequency/presence penalties (applied to the raw logits,
    greedy rows included — matching HF/vLLM semantics).

    ``seeds``/``seed_pos`` [B]: per-row deterministic keys derived from
    (seed, token position) — a request's draws then depend only on its
    own seed and position, never on batch composition (the OpenAI `seed`
    contract; without them all rows share ``key`` with per-element
    noise).

    When every row is greedy with neutral penalties (the common serving
    case) a lax.cond skips the vocab sort entirely — this runs inside
    every decode step, and a [B, 32k] sort per step is pure overhead for
    greedy requests.
    """
    b, v = logits.shape
    if min_p is None:
        min_p = jnp.zeros((b,), jnp.float32)
    neutral = jnp.all(temperature <= 0.0)
    if counts is not None:
        rp = repetition_penalty
        fp = frequency_penalty
        pp = presence_penalty
        neutral &= (jnp.all(rp == 1.0) & jnp.all(fp == 0.0)
                    & jnp.all(pp == 0.0))

        def with_pen(_):
            lf = apply_penalties(logits, counts, rp, fp, pp)
            gr = greedy(lf)
            s = _sample_sorted(lf, key, temperature, top_k, top_p, min_p,
                               seeds, seed_pos)
            return jnp.where(temperature <= 0.0, gr, s.astype(jnp.int32))

        return jax.lax.cond(neutral, lambda _: greedy(logits), with_pen,
                            operand=None)

    gr = greedy(logits)

    def stochastic(_):
        s = _sample_sorted(logits, key, temperature, top_k, top_p, min_p,
                           seeds, seed_pos)
        return jnp.where(temperature <= 0.0, gr, s.astype(jnp.int32))

    return jax.lax.cond(neutral, lambda _: gr, stochastic, operand=None)


def token_logprob(logits: jax.Array, tok: jax.Array) -> jax.Array:
    """log P(tok) under the model's raw distribution.

    logits: [B, V]; tok: [B] -> [B] float32. Computed on the RAW logits
    (before temperature/penalty shaping): the model's own distribution is
    what evals and the OpenAI `logprobs` field want.
    """
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    picked = jnp.take_along_axis(lf, tok[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return picked - lse
