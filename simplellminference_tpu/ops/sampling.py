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


def apply_logit_bias(logits: jax.Array, bias_ids: jax.Array,
                     bias_vals: jax.Array) -> jax.Array:
    """OpenAI-style logit_bias: sparse per-row (token id, bias) pairs,
    id -1 = unused slot. logits [B, V] or [B, S, V]; bias_ids/bias_vals
    [B, K]. Added to the raw logits before any shaping, so greedy rows
    honor it too (bias -100 bans a token outright)."""
    v = logits.shape[-1]
    b = bias_ids.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    safe = jnp.clip(bias_ids, 0, v - 1)
    vals = jnp.where(bias_ids >= 0, bias_vals, 0.0).astype(jnp.float32)
    lf = logits.astype(jnp.float32)
    if lf.ndim == 2:
        return lf.at[rows, safe].add(vals)
    # [B, S, V]: the same per-row bias applies at every window position
    return lf.at[rows[..., None], jnp.arange(lf.shape[1])[None, :, None],
                 safe[:, None, :]].add(vals[:, None, :])


def _row_keys(key, seeds, seed_pos):
    """Per-row PRNG keys: fold (seed, position) into a FIXED base so a
    request's draws depend only on its own (seed, token index) — batch
    composition and engine scheduling cannot perturb them."""
    base = jax.random.PRNGKey(0)
    return jax.vmap(
        lambda s, p: jax.random.fold_in(jax.random.fold_in(base, s), p)
    )(seeds.astype(jnp.uint32), seed_pos.astype(jnp.uint32))


def _shaped_sorted(logits: jax.Array, temperature: jax.Array,
                   top_k: jax.Array, top_p: jax.Array,
                   min_p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(masked descending shaped logits, permutation).

    A single key-value sort yields both the descending logits and the
    permutation; top-k becomes a rank mask, top-p a prefix mask, min-p a
    threshold against the max prob — filtered entries are -inf. The
    categorical draw (and the speculative accept/residual math) happens
    in sorted space; results map back through the permutation — no
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
    # HF/vLLM processor order: top-k filters FIRST, then top-p evaluates
    # on the RENORMALIZED survivor distribution — so the nucleus test
    # must run on the softmax of the top-k-masked logits. (min-p compares
    # a probability RATIO, which renormalization leaves unchanged.)
    probs = jax.nn.softmax(jnp.where(keep, sv, -jnp.inf), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= cum - probs < top_p[:, None]   # always keeps the first
    keep &= probs >= min_p[:, None] * probs[:, :1]
    return jnp.where(keep, sv, -jnp.inf), si


def _sample_sorted(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, top_k: jax.Array,
                   top_p: jax.Array, min_p: jax.Array,
                   seeds=None, seed_pos=None) -> jax.Array:
    """One-sort top-k/top-p/min-p sampling (see :func:`_shaped_sorted`)."""
    masked, si = _shaped_sorted(logits, temperature, top_k, top_p, min_p)
    if seeds is not None:
        # Scatter the shaped logits back to TOKEN order and draw by
        # Gumbel-max there: the per-row noise is then keyed by token id,
        # so a row's draw depends only on its (seed, position) and its
        # own shaped distribution — identical to the sort-free
        # `_sample_gumbel` fast path when shaping is neutral, and never
        # on batch composition or which path the batch compiled.
        b, v = logits.shape
        masked_tok = jnp.full_like(masked, -jnp.inf).at[
            jnp.arange(b)[:, None], si].set(masked)
        keys = _row_keys(key, seeds, seed_pos)
        g = jax.vmap(lambda k, s: jax.random.gumbel(k, s.shape))(
            keys, masked_tok)
        return jnp.argmax(masked_tok + g, axis=-1).astype(jnp.int32)
    pos = jax.random.categorical(key, masked, axis=-1)  # sorted idx
    return jnp.take_along_axis(si, pos[:, None], axis=-1)[:, 0]


def shaped_token_prob(logits: jax.Array, tok: jax.Array,
                      temperature: jax.Array, top_k: jax.Array,
                      top_p: jax.Array, min_p: jax.Array) -> jax.Array:
    """P(tok) under the SHAPED sampling distribution (temperature +
    top-k/top-p/min-p filtering, renormalized) — the acceptance
    probability of a deterministically drafted token in speculative
    rejection sampling (point-mass proposal: accept w.p. p_target(tok)).
    logits [B, V], tok [B] -> [B] float32 (0 for filtered-out tokens)."""
    masked, si = _shaped_sorted(logits, temperature, top_k, top_p, min_p)
    probs = jax.nn.softmax(masked, axis=-1)
    return jnp.sum(jnp.where(si == tok[:, None], probs, 0.0), axis=-1)


def sample_excluding(logits: jax.Array, temperature: jax.Array,
                     top_k: jax.Array, top_p: jax.Array, min_p: jax.Array,
                     exclude: jax.Array, keys: jax.Array) -> jax.Array:
    """Draw from the shaped distribution with ``exclude`` zeroed out and
    renormalized — the RESIDUAL draw after a speculative rejection (for a
    point-mass proposal at token d the residual max(0, p - q)/Z is
    exactly p conditioned on != d). ``exclude`` [B] (-1 = exclude
    nothing); ``keys`` [B] per-row PRNG keys. Falls back to the full
    shaped distribution if exclusion empties a row's support (can only be
    approached when p(d) -> 1, where rejection probability -> 0)."""
    masked, si = _shaped_sorted(logits, temperature, top_k, top_p, min_p)
    excluded = jnp.where(si == exclude[:, None], -jnp.inf, masked)
    ok = jnp.any(excluded > -jnp.inf, axis=-1, keepdims=True)
    masked = jnp.where(ok, excluded, masked)
    pos = jax.vmap(jax.random.categorical)(keys, masked)
    return jnp.take_along_axis(si, pos[:, None], axis=-1)[:, 0]


def spec_row_keys(seeds: jax.Array, seed_pos: jax.Array,
                  tag: int) -> jax.Array:
    """Per-row keys for the speculative accept/residual draws: the
    deterministic (seed, position) key of :func:`_row_keys` folded with a
    stream ``tag`` so the uniform acceptance draw and the residual
    categorical never share bits with each other or with the
    non-speculative path's draw at the same position."""
    base = _row_keys(None, seeds, seed_pos)
    return jax.vmap(lambda k: jax.random.fold_in(k, tag))(base)


def _sample_gumbel(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, seeds=None,
                   seed_pos=None) -> jax.Array:
    """Sort-free categorical draw (Gumbel-max) for rows with NO
    top-k/top-p/min-p shaping — the common `temperature`-only case. A
    full [B, V] sort costs ~V log V per step (0.5+ ms at a 128k vocab);
    argmax over gumbel-perturbed logits is one linear pass."""
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / t
    if seeds is not None:
        keys = _row_keys(key, seeds, seed_pos)
        g = jax.vmap(lambda k, s: jax.random.gumbel(k, s.shape))(
            keys, scaled)
    else:
        g = jax.random.gumbel(key, scaled.shape)
    return jnp.argmax(scaled + g, axis=-1).astype(jnp.int32)


def sample(logits: jax.Array, key: jax.Array, temperature: jax.Array,
           top_k: jax.Array, top_p: jax.Array,
           min_p: Optional[jax.Array] = None,
           counts: Optional[jax.Array] = None,
           repetition_penalty: Optional[jax.Array] = None,
           frequency_penalty: Optional[jax.Array] = None,
           presence_penalty: Optional[jax.Array] = None,
           seeds: Optional[jax.Array] = None,
           seed_pos: Optional[jax.Array] = None,
           bias_ids: Optional[jax.Array] = None,
           bias_vals: Optional[jax.Array] = None,
           allowed: Optional[jax.Array] = None) -> jax.Array:
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

    ``bias_ids``/``bias_vals`` [B, K]: OpenAI-style logit_bias as sparse
    per-row (token id, bias) pairs, id -1 = unused slot. Added to the raw
    logits before any shaping, so greedy rows honor it too.

    Cost tiers (lax.cond, chosen in-graph per batch): all-greedy batches
    pay one argmax; batches that sample but use NO top-k/top-p/min-p pay
    a sort-free Gumbel-max; only batches with shaping filters pay the
    [B, V] sort. Seeded draws are tier-invariant: the sorted path
    scatters the shaped logits back to token order and uses the same
    per-(seed, position) Gumbel noise as the fast path.

    ``allowed`` [B, V] bool: guided-decoding vocabulary mask — banned
    tokens' logits drop to -1e30 before shaping (greedy included). A
    row constrained to one token samples it at any temperature.
    """
    b, v = logits.shape
    if allowed is not None:
        logits = jnp.where(allowed, logits, -1e30)
    if bias_ids is not None:
        logits = apply_logit_bias(logits, bias_ids, bias_vals)
    if min_p is None:
        min_p = jnp.zeros((b,), jnp.float32)
    neutral = jnp.all(temperature <= 0.0)
    # no row uses top-k/top-p/min-p => the draw needs no vocab sort
    shaping_off = (jnp.all(top_k <= 0) & jnp.all(top_p >= 1.0)
                   & jnp.all(min_p <= 0.0))

    def draw(lf):
        gr = greedy(lf)

        def gumbel_path(_):
            return _sample_gumbel(lf, key, temperature, seeds, seed_pos)

        def sorted_path(_):
            return _sample_sorted(lf, key, temperature, top_k, top_p,
                                  min_p, seeds, seed_pos)

        s = jax.lax.cond(shaping_off, gumbel_path, sorted_path,
                         operand=None)
        return jnp.where(temperature <= 0.0, gr, s.astype(jnp.int32))

    if counts is not None:
        rp = repetition_penalty
        fp = frequency_penalty
        pp = presence_penalty
        neutral &= (jnp.all(rp == 1.0) & jnp.all(fp == 0.0)
                    & jnp.all(pp == 0.0))

        def with_pen(_):
            return draw(apply_penalties(logits, counts, rp, fp, pp))

        return jax.lax.cond(neutral, lambda _: greedy(logits), with_pen,
                            operand=None)

    return jax.lax.cond(neutral, lambda _: greedy(logits),
                        lambda _: draw(logits), operand=None)


def top_logprobs(logits: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """(ids [B, k] int32, logprobs [B, k] f32) of the k most probable
    tokens under the model's RAW distribution (OpenAI
    logprobs/top_logprobs). One lax.top_k linear scan per step."""
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1, keepdims=True)
    vals, ids = jax.lax.top_k(lf, k)
    return ids.astype(jnp.int32), vals - lse


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
