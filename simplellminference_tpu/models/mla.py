"""Multi-head Latent Attention (DeepSeek-V2/V3) — the QKV block.

MLA derives K and V from a compressed per-token latent: a single
``kv_a`` projection emits [kv_lora_rank | qk_rope_head_dim]; the latent
half is RMSNorm'd and expanded by ``kv_b`` into per-head
[qk_nope_head_dim | v_head_dim], while the rope half becomes ONE shared
rope key (MQA-style) concatenated onto every head. Queries optionally
ride their own low-rank path (q_a -> norm -> q_b). DeepSeek RoPE is
INTERLEAVED (complex pairs), unlike Llama's half-split
(ref_ops.apply_rope_interleaved).

This module produces q/k/v in the PADDED cache layout: the true q/k dim
(qk_nope + qk_rope, e.g. 192) and v dim (e.g. 128) zero-pad to
cfg.head_dim (256) so the existing (8,128)-tiled flash kernels, paged
pools, and append paths apply unchanged — zero-padded key lanes add 0 to
every score and zero-padded value lanes emit 0 columns that
post-attention slicing drops. The true score scale rides in
cfg.query_pre_attn_scalar.

This is the "naive" MLA cache (per-head K/V materialized, like HF's
modeling_deepseek_v2.py). The compressed-latent ("absorbed") decode
path — caching only [kv_lora_rank + rope] = ~576 B/token/layer — is the
headline MLA win and a planned follow-up; the graph boundary here is
already shaped for it (everything downstream consumes q/k/v).

Reference scope: succeeds the same rmsnorm->projections->rope slot of
the reference decode step (model.cpp:52-67) for the DeepSeek family.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.linear import linear

Params = dict[str, Any]


def mla_qkv(cfg: ModelConfig, lw: Params, li: Optional[jax.Array],
            attn_in: jax.Array, sin: jax.Array, cos: jax.Array,
            act_quant=None):
    """attn_in: [B, S, H] (already input-norm'd); sin/cos:
    [B, S, qk_rope_head_dim/2]. Returns (q, k, v) [B, S, N, head_dim]
    zero-padded to the cache lane dim."""
    b, s, _ = attn_in.shape
    n = cfg.num_heads
    nope, rd, vd = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                    cfg.v_head_dim)
    qk = nope + rd
    dpad = cfg.head_dim

    def norm_w(w):
        return w if li is None else jax.lax.dynamic_index_in_dim(
            w, li, 0, keepdims=False)

    # --- queries ---
    if "q_a" in lw:
        qa = linear(attn_in, lw["q_a"], layer=li, act_quant=act_quant)
        qa = ref_ops.rmsnorm(qa, norm_w(lw["q_a_norm"]), cfg.rms_norm_eps)
        q = linear(qa, lw["q_b"], layer=li, act_quant=act_quant)
    else:
        q = linear(attn_in, lw["q_proj"], layer=li, act_quant=act_quant)
    q = q.reshape(b, s, n, qk)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    # --- compressed KV latent + shared rope key ---
    ckv = linear(attn_in, lw["kv_a"], layer=li, act_quant=act_quant)
    c, k_pe = ckv[..., :cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    c = ref_ops.rmsnorm(c, norm_w(lw["kv_a_norm"]), cfg.rms_norm_eps)
    kv = linear(c, lw["kv_b"], layer=li, act_quant=act_quant)
    kv = kv.reshape(b, s, n, nope + vd)
    k_nope, v = kv[..., :nope], kv[..., nope:]

    # DeepSeek rope: interleaved pairs; ONE rope key shared by all heads
    q_pe = ref_ops.apply_rope_interleaved(q_pe, sin, cos)
    k_pe = ref_ops.apply_rope_interleaved(k_pe[:, :, None, :], sin, cos)
    k_pe = jnp.broadcast_to(k_pe, (b, s, n, rd))

    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate([k_nope, k_pe], axis=-1)
    if qk < dpad:  # zero-pad to the cache lane dim (scores unaffected)
        pad = [(0, 0)] * 3 + [(0, dpad - qk)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
    if vd < dpad:
        v = jnp.pad(v, [(0, 0)] * 3 + [(0, dpad - vd)])
    return q, k, v
