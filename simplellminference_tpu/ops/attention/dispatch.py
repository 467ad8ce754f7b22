"""Backend dispatch for attention.

On TPU: Pallas flash kernels (prefill) / flash-decode. Elsewhere (CPU tests,
interpret mode): the dense jnp reference. The dispatch is shape-driven —
S == 1 (or small) is decode, larger S is prefill.
"""

from __future__ import annotations

import os

import jax

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops import ref_ops

# Env toggle so tests can force the reference path even on TPU.
_FORCE_REF = os.environ.get("SLI_FORCE_REF_ATTENTION", "0") == "1"


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" and not _FORCE_REF


def attention(cfg: ModelConfig, q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array) -> jax.Array:
    """q: [B, Sq, N, D]; k/v: [B, Sk, kvN, D]; mask: [B|1, 1, Sq, Sk]."""
    if _on_tpu():
        from simplellminference_tpu.ops.attention import flash
        out = flash.attention(q, k, v, mask)
        if out is not None:
            return out
    return ref_ops.attention(q, k, v, mask)
