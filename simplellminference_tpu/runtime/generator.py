"""Single-model generation runtime: jitted prefill + decode steps.

Successor of ``LlamaModel::predict`` (model.cpp:142-187), redesigned:

  * prefill is one batched forward over the whole prompt (the reference
    runs one full forward per prompt token, model.cpp:159-165);
  * decode is ONE jitted step per token with the KV cache donated, so XLA
    updates it in place (vs ~480 eager kernel launches, SURVEY.md §3.3);
  * sampling happens on-device (vs per-token logits D2H + CPU argmax,
    model.cpp:175-179);
  * prompt lengths are bucketed to powers of two to bound recompilation.

For peak decode throughput (benches), :meth:`Generator.generate_fused` runs
the whole decode loop as one ``lax.scan`` inside a single jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import (ModelConfig, SamplingParams,
                                                next_power_of_2)
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import sampling as sampling_ops
from simplellminference_tpu.runtime.kv_cache import DenseKVCache


@jax.jit
def _sample_and_count(logits, key, temp, top_k, top_p, min_p, counts, rp,
                      fp, pp):
    """Penalty-aware sample + device-side count update (module-level so
    the jit cache survives across generate() calls)."""
    tok = sampling_ops.sample(logits, key, temp, top_k, top_p,
                              min_p=min_p, counts=counts,
                              repetition_penalty=rp, frequency_penalty=fp,
                              presence_penalty=pp)
    counts = counts.at[jnp.arange(logits.shape[0]), tok].add(1.0)
    return tok, counts


@dataclasses.dataclass
class GenerateResult:
    token_ids: list[list[int]]      # per sequence, generated tokens only
    prompt_lens: list[int]
    steps: int


class Generator:
    """Greedy/sampled generation over a dense KV cache (single model)."""

    def __init__(self, cfg: ModelConfig, params, max_batch: int = 1,
                 max_seq: Optional[int] = None, kv_dtype=None,
                 forward_fn=None):
        self.cfg = cfg
        self.params = params
        self.max_batch = max_batch
        self.max_seq = max_seq or cfg.max_seq_len
        self.kv_dtype = jnp.dtype(kv_dtype or cfg.dtype)
        self._forward = forward_fn or llama.forward

        fwd = self._forward

        @partial(jax.jit, static_argnames=(), donate_argnums=(3,))
        def _prefill(params, tokens, positions, cache, offsets, kv_lens):
            logits, cache = fwd(cfg, params, tokens, positions, cache,
                                offsets, kv_lens, last_token_only=True)
            return logits, cache

        @partial(jax.jit, donate_argnums=(3,))
        def _decode(params, tokens, positions, cache, kv_lens):
            logits, cache = fwd(cfg, params, tokens, positions, cache,
                                positions[:, 0], kv_lens)
            return logits[:, -1], cache

        self._prefill_fn = _prefill
        self._decode_fn = _decode

    def new_cache(self, batch: int,
                  seq_len: Optional[int] = None) -> DenseKVCache:
        """``seq_len``: the workload's true bound (prompt bucket +
        max_new). The arena is sized to it (rounded up to 256 slots) —
        the flash-decode grid iterates ceil(smax/bk) seq blocks per call,
        so an arena sized to max_seq makes every short decode pay grid
        steps for slots that can never be live."""
        c = self.cfg
        s = self.max_seq if seq_len is None else min(
            self.max_seq, -(-seq_len // 256) * 256)
        return DenseKVCache.create(c.num_layers, batch, s,
                                   c.num_kv_heads, c.head_dim, self.kv_dtype)

    def prefill(self, cache: DenseKVCache, prompts: Sequence[Sequence[int]]):
        """Right-pad prompts to a bucket, run one batched forward.

        Returns (last-token logits [B, V], cache, prompt_lens).
        """
        b = len(prompts)
        lens = [len(p) for p in prompts]
        bucket = min(next_power_of_2(max(lens)), self.max_seq)
        assert max(lens) <= self.max_seq
        tokens = np.zeros((b, bucket), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, :len(p)] = np.asarray(p, np.int32)
        positions = np.broadcast_to(np.arange(bucket, dtype=np.int32), (b, bucket))
        offsets = np.zeros((b,), np.int32)
        kv_lens = np.asarray(lens, np.int32)
        logits, cache = self._prefill_fn(
            self.params, jnp.asarray(tokens), jnp.asarray(positions), cache,
            jnp.asarray(offsets), jnp.asarray(kv_lens))
        return logits[:, -1], cache, lens

    def generate(self, prompts: Sequence[Sequence[int]],
                 params: SamplingParams = SamplingParams()) -> GenerateResult:
        """Python-loop generation (engine-style; per-step host control)."""
        b = len(prompts)
        need = max(len(p) for p in prompts) + params.max_new_tokens
        if need > self.max_seq:
            raise ValueError(
                f"prompt+max_new_tokens ({need}) exceeds the KV arena "
                f"capacity ({self.max_seq}); raise max_seq or shorten "
                "the request (writes past the arena would silently "
                "clamp and corrupt the cache)")
        bucket = min(next_power_of_2(max(len(p) for p in prompts)),
                     self.max_seq)
        cache = self.new_cache(b, bucket + params.max_new_tokens)
        last_logits, cache, lens = self.prefill(cache, prompts)
        lens_arr = jnp.asarray(lens, jnp.int32)
        key = jax.random.PRNGKey(params.seed or 0)
        temp = jnp.full((b,), params.temperature, jnp.float32)
        top_k = jnp.full((b,), params.top_k, jnp.int32)
        top_p = jnp.full((b,), params.top_p, jnp.float32)

        out: list[list[int]] = [[] for _ in range(b)]
        done = np.zeros(b, bool)
        stop = set(params.stop_token_ids)

        min_p = jnp.full((b,), params.min_p, jnp.float32)
        use_pen = not params.penalties_neutral
        counts = None
        if use_pen:
            counts = jnp.asarray(np.stack([
                np.bincount(np.asarray(p, np.int64),
                            minlength=self.cfg.vocab_size)[
                    :self.cfg.vocab_size]
                for p in prompts]).astype(np.float32))
            rp = jnp.full((b,), params.repetition_penalty, jnp.float32)
            fp = jnp.full((b,), params.frequency_penalty, jnp.float32)
            pp = jnp.full((b,), params.presence_penalty, jnp.float32)

        def pick(logits, key):
            nonlocal counts
            if use_pen:
                tok, counts = _sample_and_count(
                    logits, key, temp, top_k, top_p, min_p, counts, rp,
                    fp, pp)
                return tok
            if params.greedy:
                return sampling_ops.greedy(logits)
            return sampling_ops.sample(logits, key, temp, top_k, top_p,
                                       min_p=min_p)

        key, sub = jax.random.split(key)
        next_tok = pick(last_logits, sub)
        pos = lens_arr
        steps = 0
        for _ in range(params.max_new_tokens):
            ids = np.asarray(next_tok)
            for i in range(b):
                if not done[i]:
                    out[i].append(int(ids[i]))
                    if int(ids[i]) in stop:
                        done[i] = True
            steps += 1
            if done.all() or steps >= params.max_new_tokens:
                break
            logits, cache = self._decode_fn(
                self.params, next_tok[:, None], pos[:, None], cache, pos + 1)
            key, sub = jax.random.split(key)
            next_tok = pick(logits, sub)
            pos = pos + 1
        return GenerateResult(token_ids=out, prompt_lens=lens, steps=steps)

    def generate_fused(self, prompts: Sequence[Sequence[int]],
                       max_new_tokens: int) -> jax.Array:
        """Whole prefill + greedy decode loop inside ONE jit.

        Returns [B, max_new_tokens] int32 on device. The KV cache is
        created inside the jit, so it lives as XLA temp memory — no 2×cache
        argument copies, no donation needed, zero host round trips inside
        the loop. This is the peak-throughput path used by bench.py.
        """
        b = len(prompts)
        lens = [len(p) for p in prompts]
        if max(lens) + max_new_tokens > self.max_seq:
            raise ValueError(
                f"prompt+max_new_tokens ({max(lens) + max_new_tokens}) "
                f"exceeds the KV arena capacity ({self.max_seq})")
        bucket = min(next_power_of_2(max(lens)), self.max_seq)
        tokens = np.zeros((b, bucket), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, :len(p)] = np.asarray(p, np.int32)
        return self._fused_generate(self.params, jnp.asarray(tokens),
                                    jnp.asarray(lens, jnp.int32),
                                    max_new_tokens)

    @partial(jax.jit, static_argnums=(0, 4))
    def _fused_generate(self, params, tokens, kv_lens, max_new_tokens):
        fwd = self._forward
        cfg = self.cfg
        b, bucket = tokens.shape
        # traced zeros -> XLA temp, in-place loop; sized to the workload
        cache = self.new_cache(b, bucket + max_new_tokens)

        positions = jnp.broadcast_to(jnp.arange(bucket, dtype=jnp.int32),
                                     (b, bucket))
        logits, cache = fwd(cfg, params, tokens, positions, cache,
                            jnp.zeros((b,), jnp.int32), kv_lens,
                            last_token_only=True)
        first_tok = sampling_ops.greedy(logits[:, -1])

        def step(carry, _):
            cache, tok, pos = carry
            logits, cache = fwd(cfg, params, tok[:, None], pos[:, None],
                                cache, pos, pos + 1)
            nxt = sampling_ops.greedy(logits[:, -1])
            return (cache, nxt, pos + 1), tok

        (_, _, _), toks = jax.lax.scan(
            step, (cache, first_tok, kv_lens), None, length=max_new_tokens)
        return toks.T  # [B, T]
