"""Perplexity evaluation (WikiText-2 style sliding windows).

BASELINE.json gate: INT8 PPL delta <= 0.1 vs FP32 on WikiText-2
(BASELINE.md config #2). The reference has no evaluation at all
(SURVEY.md §2.11); its implied method was manual layer diffing. Here:
strided-window next-token cross entropy over a token stream, jitted per
window, computed in fp32.

Usage:
    ppl = perplexity(cfg, params, token_ids, window=2048, stride=2048)

With stride < window, only the last `stride` tokens of each window are
scored (HF's sliding-window convention) for a tighter estimate.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama


@partial(jax.jit, static_argnums=(0, 4))
def _window_nll(cfg: ModelConfig, params, tokens: jax.Array,
                score_mask: jax.Array, forward) -> tuple[jax.Array, jax.Array]:
    """tokens: [1, S]; score_mask: [1, S-1] (True = score this target).
    Returns (sum_nll, num_scored)."""
    positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None]
    logits, _ = forward(cfg, params, tokens, positions)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    nll = -(tok_logp * score_mask).sum()
    return nll, score_mask.sum()


def perplexity(cfg: ModelConfig, params, token_ids: Sequence[int],
               window: int = 2048, stride: Optional[int] = None,
               forward=None, progress: bool = False) -> float:
    """Sliding-window perplexity over a token stream."""
    forward = forward or llama.forward
    stride = stride or window
    ids = np.asarray(token_ids, np.int32)
    n = len(ids)
    if n < 2:
        raise ValueError("need at least 2 tokens")

    total_nll = 0.0
    total_tok = 0
    start = 0
    while start < n - 1:
        end = min(start + window, n)
        chunk = ids[start:end]
        # pad to the full window so one compiled shape serves every step
        pad = window - len(chunk)
        tokens = np.pad(chunk, (0, pad))[None]
        # score only the last `stride` targets (and not padding)
        t = len(chunk) - 1                       # number of real targets
        mask = np.zeros((1, window - 1), bool)
        lo = 0 if start == 0 else max(t - stride, 0)
        mask[0, lo:t] = True
        nll, cnt = _window_nll(cfg, params, jnp.asarray(tokens),
                               jnp.asarray(mask), forward)
        total_nll += float(nll)
        total_tok += int(cnt)
        if progress:
            print(f"  ppl window {start}..{end}: "
                  f"{np.exp(total_nll / max(total_tok, 1)):.4f}",
                  flush=True)
        if end == n:
            break
        start += stride
    return float(np.exp(total_nll / max(total_tok, 1)))
