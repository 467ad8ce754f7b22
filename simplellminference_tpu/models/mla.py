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

Two cache modes live here:

* "naive" (``mla_qkv``): per-head K/V materialized, like HF's
  modeling_deepseek_v2.py — the correctness baseline.
* "absorbed" (``mla_qkv_absorbed`` + ``mla_unabsorb``): the DEFAULT
  (core/config.py ``mla_absorbed=True``) and the headline MLA win —
  only the compressed [kv_lora_rank | rope] latent row is cached (ONE
  shared pool, K row == V row), with the kv_b expansion absorbed into
  the query/output projections; measured 2426 vs 1340 tok/s decode on
  chip (README "Measured" table).

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


def _dense_kv_b(cfg: ModelConfig, lw: Params, li: Optional[jax.Array],
                dtype, n: int) -> jax.Array:
    """kv_b as a dense [dc, n, nope+vd] tensor (dequantizing INT8).
    ``n``: the head count of THIS shard (lw leaves are local under a
    shard_map TP body — whole heads per shard)."""
    from simplellminference_tpu.ops.moe import _dense_layer_weight
    w = _dense_layer_weight(lw["kv_b"], li, dtype)   # [dc, n*(nope+vd)]
    return w.reshape(cfg.kv_lora_rank, n,
                     cfg.qk_nope_head_dim + cfg.v_head_dim)


def _q_proj(cfg: ModelConfig, lw: Params, li, attn_in, act_quant):
    def norm_w(w):
        return w if li is None else jax.lax.dynamic_index_in_dim(
            w, li, 0, keepdims=False)

    if "q_a" in lw:
        qa = linear(attn_in, lw["q_a"], layer=li, act_quant=act_quant)
        qa = ref_ops.rmsnorm(qa, norm_w(lw["q_a_norm"]), cfg.rms_norm_eps)
        return linear(qa, lw["q_b"], layer=li, act_quant=act_quant)
    return linear(attn_in, lw["q_proj"], layer=li, act_quant=act_quant)


def mla_qkv_absorbed(cfg: ModelConfig, lw: Params,
                     li: Optional[jax.Array], attn_in: jax.Array,
                     sin: jax.Array, cos: jax.Array, act_quant=None,
                     n_heads: Optional[int] = None):
    """Absorbed MLA: ONE cached row per token.

    Returns (q' [B, S, N, Dl], kv_row [B, S, 1, Dl]) with
    Dl = cfg.head_dim (the padded latent lane width) and
    kv_row = [rmsnorm(c_kv) | roped shared key | 0-pad]. The query
    absorbs the per-head key expansion: q' = [q_nope @ W_uk | roped
    q_pe] — scores q'·kv_row equal the naive q·k exactly by
    associativity (W_uk c == k_nope). The SAME row serves as the value
    (out_latent = probs @ c); :func:`mla_unabsorb` applies W_uv after
    attention. Cache cost: 2·Dl bytes/token/layer vs the naive mode's
    2·N·head_dim — ~13x smaller for DeepSeek-V2 shapes.
    """
    b, s, _ = attn_in.shape
    n = n_heads if n_heads is not None else cfg.num_heads
    nope, rd = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dc = cfg.kv_lora_rank
    dl = cfg.head_dim

    def norm_w(w):
        return w if li is None else jax.lax.dynamic_index_in_dim(
            w, li, 0, keepdims=False)

    q = _q_proj(cfg, lw, li, attn_in, act_quant).reshape(b, s, n, nope + rd)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    ckv = linear(attn_in, lw["kv_a"], layer=li, act_quant=act_quant)
    c, k_pe = ckv[..., :dc], ckv[..., dc:]
    c = ref_ops.rmsnorm(c, norm_w(lw["kv_a_norm"]), cfg.rms_norm_eps)

    w_kv = _dense_kv_b(cfg, lw, li, jnp.float32, n)  # [dc, n, nope+vd]
    q_lat = jnp.einsum("bsnp,dnp->bsnd", q_nope.astype(jnp.float32),
                       w_kv[..., :nope]).astype(q.dtype)  # [B,S,n,dc]

    q_pe = ref_ops.apply_rope_interleaved(q_pe, sin, cos)
    k_pe = ref_ops.apply_rope_interleaved(k_pe[:, :, None, :], sin, cos)

    qp = jnp.concatenate([q_lat, q_pe], axis=-1)
    kv_row = jnp.concatenate([c[:, :, None, :], k_pe], axis=-1)
    if dc + rd < dl:
        pad = [(0, 0)] * 3 + [(0, dl - dc - rd)]
        qp = jnp.pad(qp, pad)
        kv_row = jnp.pad(kv_row, pad)
    return qp, kv_row


def mla_unabsorb(cfg: ModelConfig, lw: Params, li: Optional[jax.Array],
                 attn: jax.Array) -> jax.Array:
    """attn [B, S, n, Dl] (probs @ latent rows) -> values [B, S, n, vd]
    through the per-head W_uv half of kv_b (n = shard-local heads)."""
    nope = cfg.qk_nope_head_dim
    w_kv = _dense_kv_b(cfg, lw, li, jnp.float32,
                       attn.shape[2])                # [dc, n, nope+vd]
    out_lat = attn[..., :cfg.kv_lora_rank].astype(jnp.float32)
    return jnp.einsum("bsnd,dnv->bsnv", out_lat,
                      w_kv[..., nope:]).astype(attn.dtype)


def mla_qkv(cfg: ModelConfig, lw: Params, li: Optional[jax.Array],
            attn_in: jax.Array, sin: jax.Array, cos: jax.Array,
            act_quant=None, n_heads: Optional[int] = None):
    """attn_in: [B, S, H] (already input-norm'd); sin/cos:
    [B, S, qk_rope_head_dim/2]. Returns (q, k, v) [B, S, N, head_dim]
    zero-padded to the cache lane dim."""
    b, s, _ = attn_in.shape
    n = n_heads if n_heads is not None else cfg.num_heads
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
