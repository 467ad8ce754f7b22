"""Llama-family decoder as a pure function over a params pytree.

Capability successor of the reference's entire op/model stack
(model.cpp:40-140: per-layer rmsnorm → q/k/v GEMVs → RoPE → MHA → wo →
residual → rmsnorm → up/gate GEMVs → SwiGLU → down → residual; final norm →
tied LM head) — redesigned TPU-first:

  * batch-first [B, S, H] tensors (the reference is structurally batch=1,
    model.cpp:258) so matmuls are GEMMs on the MXU, not GEMVs;
  * **fused projections**: q/k/v as ONE matmul (``wqkv``) and gate/up as
    ONE matmul (``w_gate_up``) — 4 weight matmuls per layer instead of the
    reference's 7 separate GEMVs (model.cpp:58-108); on this hardware
    per-op overhead dominates decode, so op count is a first-order cost;
  * layers stacked on a leading axis and scanned with ``lax.scan`` — one
    trace, one compiled layer body (the reference launches ~480 kernels per
    token on the default stream, SURVEY.md §3.3);
  * KV cache in kernel-native layout [L, B, kvN, Smax, D], updated
    functionally (successor of the aliased slice-view writes,
    tensor.cpp:199-212), consumed by Pallas flash prefill/decode kernels;
  * correct SwiGLU and GQA-aware RoPE (reference bugs Q1/Q2 not replicated,
    SURVEY.md §7.5);
  * weights may be plain bf16/fp32 or INT8 group-quantized
    (:class:`~simplellminference_tpu.ops.linear.QuantizedWeight`).

Params pytree schema (layers stacked on leading L axis):

    {
      "embed":      [V, H],
      "layers": {
        "input_norm":  [L, H],
        "post_norm":   [L, H],
        "wqkv":      [L, H, (N + 2*kvN) * D],
        "wo":        [L, N*D, H],
        "w_gate_up": [L, H, 2*I],
        "w_down":    [L, I, H],
      },
      "final_norm": [H],
      "lm_head":    [H, V]   # absent when tie_word_embeddings
    }
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention import dispatch
from simplellminference_tpu.ops.linear import linear
from simplellminference_tpu.runtime.kv_cache import DenseKVCache, update_layer

Params = dict[str, Any]


def _use_pallas_kv() -> bool:
    return jax.default_backend() == "tpu" and (
        jax.device_count() == 1 or dispatch.SHARD_MAP_LOCAL)


# Test hook: force-select the fused megakernels (run in interpret mode)
# so CPU-mesh tests can pin the TP fused-path selection + numerics.
FORCE_FUSED_INTERPRET = False


def _use_fused_kernels() -> bool:
    """The fused QKV/FFN megakernels apply on single-device TPU AND
    inside a shard_map body (per-shard local shapes — VERDICT r1 item 4:
    a multi-chip pod must not lose the decode-path fusion)."""
    if FORCE_FUSED_INTERPRET:
        return True
    return jax.default_backend() == "tpu" and (
        jax.device_count() == 1 or dispatch.SHARD_MAP_LOCAL)


def decoder_layer(cfg: ModelConfig, lw: Params, li: Optional[jax.Array],
                  x: jax.Array, sin: jax.Array, cos: jax.Array,
                  cache_k: Optional[jax.Array], cache_v: Optional[jax.Array],
                  offsets: Optional[jax.Array], mask: jax.Array,
                  kv_lens: Optional[jax.Array], prefill_from_zero: bool,
                  tp_axis: Optional[str] = None,
                  ring_collectives: bool = False,
                  kv_layer: Optional[jax.Array] = None,
                  window=dispatch._UNSET):
    """One decoder layer. x: [B, S, H]. Returns (x', cache_k', cache_v').

    ``lw`` is the FULL stacked layer-params subtree ([L, ...] leaves) and
    ``li`` the traced layer index: the hot kernels (dequant+matmul, flash
    decode, KV append) consume the stacked HBM buffers directly via
    scalar-prefetched indices — slicing per layer before a pallas_call
    would materialize a full copy of every weight (see ops/matmul.py).
    With ``li=None`` the leaves are single-layer ([K, N] etc.).

    ``tp_axis``: set inside a shard_map TP body (models/llama_tp.py) —
    heads/intermediate dims are local shards and the row-sharded wo /
    w_down products are all-reduced over the axis (megatron pattern).

    ``kv_layer``: cache layer index override (defaults to ``li``). The
    pipeline-parallel schedule (models/llama_pp.py) uses it to redirect
    bubble-tick KV writes/reads to a per-stage trash layer while weights
    keep indexing a valid real layer; setting it bypasses the fused-QKV
    megakernel (which couples the weight and cache indices in-kernel).
    """
    b, s, h = x.shape
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if tp_axis is not None:
        tp = jax.lax.axis_size(tp_axis)
        # absorbed-MLA latent rows are ONE replicated kv head: every
        # shard writes the identical row; only query heads shard
        n, kvn = n // tp, (kvn // tp if kvn % tp == 0 else kvn)

    def norm_w(w):
        return w if li is None else jax.lax.dynamic_index_in_dim(
            w, li, 0, keepdims=False)

    kv_li = li if kv_layer is None else kv_layer

    # --- attention block (reference: model.cpp:52-90) ---
    # (column-parallel under TP: the fused QKV kernel needs no collective
    # — n/kvn are already shard-local and the cache shards on kv heads)
    if (li is not None and kv_layer is None and s == 1
            and cache_k is not None and "q_norm" not in lw
            and cfg.pre_norms and cfg.partial_rotary_factor == 1.0
            and not cfg.rope_interleaved and _use_fused_kernels()):
        from simplellminference_tpu.ops import qkv_fused
        if qkv_fused.fused_qkv_available(lw, cfg, b, s, cache_k,
                                         n_heads=n, kv_heads=kvn):
            # decode hot path: rmsnorm + qkv dequant-matmul + RoPE +
            # in-place KV append as ONE pallas call (ops/qkv_fused.py)
            w = lw["wqkv"]
            q2, cache_k, cache_v = qkv_fused.fused_qkv_append(
                x[:, 0], lw.get("_input_norm3", lw["input_norm"]),
                w.q, w.scales,
                sin[:, 0], cos[:, 0], cache_k, cache_v, li, offsets,
                n_heads=n, kv_heads=kvn, eps=cfg.rms_norm_eps,
                interpret=FORCE_FUSED_INTERPRET)
            attn = dispatch.attention_cached(
                cfg, q2[:, None], cache_k, cache_v, mask, kv_lens,
                prefill_from_zero, layer=li, window=window,
                sinks=norm_w(lw["sinks"]) if "sinks" in lw else None)
            return _post_attention(cfg, lw, li, x, attn, b, s, h, n, d,
                                   tp_axis, ring_collectives,
                                   cache_k, cache_v)
    sinks = norm_w(lw["sinks"]) if "sinks" in lw else None
    # OLMo-2 (pre_norms=False): attention reads the raw residual stream;
    # the only norms are the pre-residual output norms below.
    attn_in = (ref_ops.rmsnorm(x, norm_w(lw["input_norm"]),
                               cfg.rms_norm_eps)
               if cfg.pre_norms else x)
    if cfg.mla:
        # DeepSeek MLA: latent-compressed K/V + shared rope key
        # (models/mla.py) — rope applied inside, padded to head_dim.
        # Absorbed mode caches ONE latent row per token (k == v row);
        # the per-head value expansion happens post-attention.
        from simplellminference_tpu.models import mla as mla_mod
        if cfg.mla_absorbed:
            q, k = mla_mod.mla_qkv_absorbed(cfg, lw, li, attn_in, sin,
                                            cos, act_quant=cfg.act_quant,
                                            n_heads=n)
            v = k
        else:
            q, k, v = mla_mod.mla_qkv(cfg, lw, li, attn_in, sin, cos,
                                      act_quant=cfg.act_quant, n_heads=n)
    else:
        qkv = linear(attn_in, lw["wqkv"], layer=li,
                     act_quant=cfg.act_quant)
        if "wqkv_bias" in lw:  # Qwen2-style QKV bias
            qkv = qkv + norm_w(lw["wqkv_bias"]).astype(qkv.dtype)
        if "q_norm" in lw and cfg.qk_norm_full:
            # OLMo-2: RMSNorm over the FULL projection width (one
            # denominator across heads), applied before the head split.
            q = ref_ops.rmsnorm(qkv[..., :n * d], norm_w(lw["q_norm"]),
                                cfg.rms_norm_eps).reshape(b, s, n, d)
            k = ref_ops.rmsnorm(qkv[..., n * d:(n + kvn) * d],
                                norm_w(lw["k_norm"]),
                                cfg.rms_norm_eps).reshape(b, s, kvn, d)
        else:
            q = qkv[..., :n * d].reshape(b, s, n, d)
            k = qkv[..., n * d:(n + kvn) * d].reshape(b, s, kvn, d)
            if "q_norm" in lw:  # Qwen3: per-head q/k RMSNorm before RoPE
                q = ref_ops.rmsnorm(q, norm_w(lw["q_norm"]),
                                    cfg.rms_norm_eps)
                k = ref_ops.rmsnorm(k, norm_w(lw["k_norm"]),
                                    cfg.rms_norm_eps)
        v = qkv[..., (n + kvn) * d:].reshape(b, s, kvn, d)

        if (cfg.partial_rotary_factor < 1.0
                or cfg.rope_interleaved):  # GLM-4 partial / Helium
            q = ref_ops.apply_rope_partial(q, sin, cos,
                                           cfg.rope_interleaved)
            k = ref_ops.apply_rope_partial(k, sin, cos,
                                           cfg.rope_interleaved)
        else:
            q = ref_ops.apply_rope(q, sin, cos)
            k = ref_ops.apply_rope(k, sin, cos)

    if cache_k is not None:
        if cache_k.ndim == 5:
            from simplellminference_tpu.ops import kv_append as kva
            writer = (kva.kv_append if _use_pallas_kv()
                      else kva.kv_append_ref)
            cache_k, cache_v = writer(cache_k, cache_v, k, v, kv_li, offsets)
        else:
            cache_k, cache_v = update_layer(cache_k, cache_v, k, v, offsets)
        if s > 1 and prefill_from_zero:
            # Batched prefill from slot 0: the fresh k/v ARE the cache
            # prefix — plain causal self-attention, no cache read-back.
            attn = dispatch.attention(cfg, q, k, v, mask, window=window,
                                      sinks=sinks)
        else:
            attn = dispatch.attention_cached(cfg, q, cache_k, cache_v, mask,
                                             kv_lens, prefill_from_zero,
                                             layer=kv_li, window=window,
                                             sinks=sinks)
    else:
        attn = dispatch.attention(cfg, q, k, v, mask, window=window,
                                  sinks=sinks)
    return _post_attention(cfg, lw, li, x, attn, b, s, h, n, d, tp_axis,
                           ring_collectives, cache_k, cache_v)


def _post_attention(cfg, lw, li, x, attn, b, s, h, n, d, tp_axis,
                    ring_collectives, cache_k, cache_v):
    """wo projection + residual + FFN (shared by the fused-qkv and
    reference attention paths of :func:`decoder_layer`)."""
    def norm_w(w):
        return w if li is None else jax.lax.dynamic_index_in_dim(
            w, li, 0, keepdims=False)

    if cfg.mla:
        attn = attn.reshape(b, s, n, d)
        if cfg.mla_absorbed:
            # probs @ latent rows -> expand through W_uv per head
            from simplellminference_tpu.models import mla as mla_mod
            attn = mla_mod.mla_unabsorb(cfg, lw, li, attn)
        elif cfg.v_head_dim < d:
            # naive-MLA pads v to the cache lane dim; drop the zeros
            attn = attn[..., :cfg.v_head_dim]
    attn_in_rows = attn.reshape(b, s, -1)
    if tp_axis is not None and ring_collectives and _is_quant(lw["wo"]):
        # Ring-fused dequant+matmul+all-reduce: each ring step computes one
        # output window while the previous partial rides the ICI.
        from simplellminference_tpu.parallel.collective import (
            matmul_allreduce_ring_quant)
        attn = matmul_allreduce_ring_quant(attn_in_rows, lw["wo"],
                                           tp_axis, layer=li)
    else:
        attn = linear(attn_in_rows, lw["wo"], layer=li,
                      act_quant=cfg.act_quant)
        if tp_axis is not None:
            # Row-sharded wo: partial products all-reduce over ICI. (GSPMD
            # inserts this automatically; in the shard_map body it is ours.)
            attn = jax.lax.psum(attn, tp_axis)
    if "wo_bias" in lw:   # GPT-OSS o_proj bias (added ONCE, post-psum)
        attn = attn + norm_w(lw["wo_bias"]).astype(attn.dtype)
    if "post_attn_norm" in lw:  # Gemma-2: norm the attn output pre-residual
        attn = ref_ops.rmsnorm(attn, norm_w(lw["post_attn_norm"]),
                               cfg.rms_norm_eps)
    if cfg.residual_scale != 1.0:  # Granite residual_multiplier
        attn = cfg.residual_scale * attn
    x = x + attn

    # --- FFN block (reference: model.cpp:93-128) ---
    if cfg.num_experts:
        # Sparse-MoE FFN (folded dense-expert matmuls; psum inside under
        # TP — each shard owns whole experts, ops/moe.py).
        from simplellminference_tpu.ops import moe
        ffn_in = (ref_ops.rmsnorm(x, norm_w(lw["post_norm"]),
                                  cfg.rms_norm_eps)
                  if cfg.pre_norms else x)
        out = moe.moe_ffn(cfg, lw, li, ffn_in, tp_axis=tp_axis)
        if cfg.residual_scale != 1.0:
            out = cfg.residual_scale * out
        x = x + out
        return x, cache_k, cache_v
    if li is not None and cfg.pre_norms and _use_fused_kernels():
        from simplellminference_tpu.ops import ffn_fused
        i_loc = cfg.intermediate_size if tp_axis is None else (
            cfg.intermediate_size // jax.lax.axis_size(tp_axis))
        if (cfg.hidden_act == "silu" and "post_ffn_norm" not in lw
                and "w_gate_up_bias" not in lw
                and ffn_fused.fused_ffn_available(lw, h, i_loc, b * s)):
            # decode hot path: rmsnorm+gate_up+SwiGLU+down+residual as ONE
            # pallas call — no inter-matmul DMA ramp/drain, no XLA fusion
            # boundaries (ops/ffn_fused.py).
            gu, dn = lw["w_gate_up"], lw["w_down"]
            xf = x.reshape(b * s, h)
            out = ffn_fused.fused_ffn(
                xf, lw.get("_post_norm3", lw["post_norm"]),
                gu.q, gu.scales,
                dn.q, dn.scales, li, eps=cfg.rms_norm_eps,
                interpret=FORCE_FUSED_INTERPRET)
            if tp_axis is not None:
                # the kernel's in-tile residual added the REPLICATED x to
                # this shard's PARTIAL down product: all-reduce only the
                # partial (out - x), then re-add the residual.
                out = xf + jax.lax.psum(out - xf, tp_axis)
            if cfg.residual_scale != 1.0:
                # rescale only the branch the kernel residual-added
                out = xf + cfg.residual_scale * (out - xf)
            return out.reshape(b, s, h), cache_k, cache_v
    ffn_in = (ref_ops.rmsnorm(x, norm_w(lw["post_norm"]),
                              cfg.rms_norm_eps)
              if cfg.pre_norms else x)
    i = cfg.intermediate_size if tp_axis is None else (
        cfg.intermediate_size // jax.lax.axis_size(tp_axis))
    gate_up = linear(ffn_in, lw["w_gate_up"], layer=li,
                     act_quant=cfg.act_quant)
    if "w_gate_up_bias" in lw:  # Ernie-4.5 use_bias dense-FFN bias
        gate_up = gate_up + norm_w(lw["w_gate_up_bias"]).astype(
            gate_up.dtype)
    gate, up = gate_up[..., :i], gate_up[..., i:]
    swi = ref_ops.glu_act(gate, up, cfg.hidden_act)
    if tp_axis is not None and ring_collectives and _is_quant(lw["w_down"]):
        from simplellminference_tpu.parallel.collective import (
            matmul_allreduce_ring_quant)
        down = matmul_allreduce_ring_quant(swi, lw["w_down"], tp_axis,
                                           layer=li)
    else:
        down = linear(swi, lw["w_down"], layer=li,
                      act_quant=cfg.act_quant)
        if tp_axis is not None:
            down = jax.lax.psum(down, tp_axis)
    if "w_down_bias" in lw:  # Ernie-4.5 (added ONCE, post-psum)
        down = down + norm_w(lw["w_down_bias"]).astype(down.dtype)
    if "post_ffn_norm" in lw:  # Gemma-2: norm the FFN output pre-residual
        down = ref_ops.rmsnorm(down, norm_w(lw["post_ffn_norm"]),
                               cfg.rms_norm_eps)
    if cfg.residual_scale != 1.0:  # Granite residual_multiplier
        down = cfg.residual_scale * down
    x = x + down
    return x, cache_k, cache_v


def _is_quant(w) -> bool:
    from simplellminference_tpu.ops.linear import QuantizedWeight
    return isinstance(w, QuantizedWeight)


def forward(cfg: ModelConfig, params: Params, tokens: jax.Array,
            positions: jax.Array, cache: Optional[DenseKVCache] = None,
            offsets: Optional[jax.Array] = None,
            kv_lens: Optional[jax.Array] = None,
            prefill_from_zero: bool = True,
            last_token_only: bool = False,
            ) -> tuple[jax.Array, Optional[DenseKVCache]]:
    """Full forward pass.

    tokens/positions: [B, S] int32. ``offsets[b]`` = cache slot of the first
    new token (== positions[:, 0] for contiguous sequences). ``kv_lens[b]``
    = number of valid cache slots after this step. ``prefill_from_zero`` is
    a STATIC flag: multi-token cache writes start at slot 0 (true for the
    Generator's batched prefill; chunked prefill must pass False).
    ``last_token_only`` (static): project only each sequence's last valid
    hidden state (slot kv_lens-1-offsets of this call's S tokens) through
    the LM head — at an 8k prefill the full [B, S, V] fp32 logits cost
    ~1 GB of HBM and a vocab-sized matmul per position that generation
    immediately discards. Returns (logits [B, S or 1, V] fp32, cache).
    """
    b, s = tokens.shape
    dtype = jnp.dtype(cfg.dtype)
    x = params["embed"][tokens].astype(dtype)  # [B, S, H] row gather
    if cfg.embed_scale != 1.0:  # Gemma: sqrt(hidden_size) multiplier
        x = x * jnp.asarray(cfg.embed_scale, dtype)
    lw = dict(params["layers"])
    # hoist the fused kernels' [L,H]->[L,1,H] norm reshapes out of the
    # layer scan (see forward_paged)
    if cfg.pre_norms:
        lw["_input_norm3"] = lw["input_norm"][:, None, :]
        lw["_post_norm3"] = lw["post_norm"][:, None, :]

    # Alternating sliding/full stacks (Gemma-2 layer_types): scan over
    # the pattern's period — p compiled sub-bodies per step, each with
    # its own static window, over the same stacked-layer weights.
    period, wins, nope = cfg.scan_pattern()
    # per-sublayer rope tables (Gemma-3 sliding layers use a local
    # theta; SmolLM3 NoPE sublayers get identity tables)
    ropes_j = ref_ops.rope_tables_by_sublayer(cfg, positions, wins, nope)
    sin, cos = ropes_j[0]
    # DeepSeek first-k-dense layers: their own stacked group, scanned
    # BEFORE the main (sparse) stack; cache layers 0..kd-1 are theirs.
    kd = cfg.first_k_dense
    steps = jnp.arange((cfg.num_layers - kd) // period,
                       dtype=jnp.int32) * period
    if kd:
        import dataclasses as _dc
        cfgd = _dc.replace(cfg, num_experts=0, first_k_dense=0)
        lwd = dict(params["dense_layers"])
        lwd["_input_norm3"] = lwd["input_norm"][:, None, :]
        lwd["_post_norm3"] = lwd["post_norm"][:, None, :]
        dsteps = jnp.arange(kd, dtype=jnp.int32)

    if cache is not None:
        if offsets is None:
            offsets = positions[:, 0]
        if kv_lens is None:
            kv_lens = offsets + s
        if s > 1 and prefill_from_zero:
            # Fresh k/v are the whole prefix: plain causal self-attention.
            masks = {w: ref_ops.causal_mask(s, s, window=w)[None, None]
                     for w in set(wins)}                         # [1,1,S,S]
        else:
            sk = cache.max_seq
            # Keys live at absolute cache slots 0..sk-1; attend where
            # key_pos <= query_pos and key_pos < kv_len (written region).
            key_pos = jnp.arange(sk)[None, None, None, :]        # [1,1,1,Sk]
            q_pos = positions[:, None, :, None]                  # [B,1,S,1]
            base = ((key_pos <= q_pos)
                    & (key_pos < kv_lens[:, None, None, None]))
            masks = {w: base if w is None
                     else base & (key_pos > q_pos - w) for w in set(wins)}

        def body(carry, base_li):
            x, ck, cv = carry
            for j, w in enumerate(wins):
                li = base_li + j
                sj, cj = ropes_j[j]
                x, ck, cv = decoder_layer(cfg, lw, li, x, sj,
                                          cj, ck, cv, offsets, masks[w],
                                          kv_lens, prefill_from_zero,
                                          window=w,
                                          kv_layer=li + kd if kd else None)
            return (x, ck, cv), None

        carry0 = (x, cache.k, cache.v)
        if kd:
            def dense_body(carry, li):
                x, ck, cv = carry
                x, ck, cv = decoder_layer(cfgd, lwd, li, x, sin, cos, ck,
                                          cv, offsets, masks[wins[0]],
                                          kv_lens, prefill_from_zero,
                                          window=wins[0])
                return (x, ck, cv), None

            carry0, _ = jax.lax.scan(dense_body, carry0, dsteps)
        (x, new_k, new_v), _ = jax.lax.scan(body, carry0, steps)
        cache = DenseKVCache(k=new_k, v=new_v)
    else:
        masks = {w: ref_ops.causal_mask(s, s, window=w)[None, None]
                 for w in set(wins)}                             # [1,1,S,S]

        def body(x, base_li):
            for j, w in enumerate(wins):
                sj, cj = ropes_j[j]
                x, _, _ = decoder_layer(cfg, lw, base_li + j, x, sj, cj,
                                        None, None, None, masks[w], None,
                                        False, window=w)
            return x, None

        if kd:
            def dense_body(x, li):
                x, _, _ = decoder_layer(cfgd, lwd, li, x, sin, cos, None,
                                        None, None, masks[wins[0]], None,
                                        False, window=wins[0])
                return x, None

            x, _ = jax.lax.scan(dense_body, x, dsteps)
        x, _ = jax.lax.scan(body, x, steps)

    if last_token_only and s > 1:
        last = (kv_lens - 1 - offsets if kv_lens is not None
                else jnp.full((b,), s - 1, jnp.int32))
        x = jnp.take_along_axis(x, last[:, None, None], axis=1)  # [B,1,H]

    x = ref_ops.rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        # Tied embeddings (reference Q5: emb and cls share the mmap offset,
        # model.cpp:342-358).
        logits = jnp.dot(x, params["embed"].astype(x.dtype).T,
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head, out_dtype=jnp.float32)
    if cfg.logit_scale != 1.0:  # Granite 1/logits_scaling
        logits = cfg.logit_scale * logits
    if cfg.final_logit_softcap:  # Gemma-2 final-logit soft cap
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    return logits.astype(jnp.float32), cache


def forward_paged(cfg: ModelConfig, params: Params, tokens: jax.Array,
                  positions: jax.Array, cache, tables: jax.Array,
                  kv_lens: jax.Array, prefill: bool,
                  last_token_only: bool = False,
                  chunk_offset: Optional[jax.Array] = None,
                  tp_axis: Optional[str] = None,
                  vocab_shard: Optional[int] = None,
                  lora_idx: Optional[jax.Array] = None,
                  ) -> tuple[jax.Array, Any]:
    """Forward pass over the paged KV cache (engine path).

    tokens/positions: [B, S]; cache:
    :class:`~simplellminference_tpu.memory.paged_kv.PagedKVCache`;
    tables: [B, MP] page ids (-1 unmapped); kv_lens: [B] valid tokens
    AFTER this step. ``prefill`` (static): S>1 whole-prompt pass starting
    at position 0 (right-padded) — attention is causal self-attention on
    the fresh k/v; decode (S==1) attends through the page tables.
    ``chunk_offset`` (traced, page-aligned): CHUNKED prefill — this call
    processes prompt tokens [chunk_offset, chunk_offset + S), writing
    their pages and attending to all cached positions < kv_len plus the
    causal part of the fresh chunk (activation memory stays O(S·total)
    per layer instead of the whole prompt).
    ``last_token_only`` (static): see :func:`forward`.
    Returns (logits [B, S or 1, V] fp32, updated cache).
    """
    from simplellminference_tpu.memory import paged_kv as pkv
    from simplellminference_tpu.memory.paged_kv import PagedKVCache

    b, s = tokens.shape
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dtype = jnp.dtype(cfg.dtype)
    # Sliding-window page reclamation (engine grouped mode): ``tables``
    # arrives as a (full_tables, ring_tables) pair and the cache carries
    # the windowed group's ring pools (cache.k_w). Sliding sublayers
    # read/write the ring pools at GROUP-LOCAL layer indices; full
    # sublayers use the main pools likewise.
    if isinstance(tables, (tuple, list)):
        tables, tables_w = tables
    else:
        tables_w = None
    grouped = tables_w is not None and cache.k_w is not None
    assert (cache.k_w is None) == (tables_w is None), \
        "windowed-group cache needs (full, ring) tables, and vice versa"
    if grouped:
        assert cfg.first_k_dense == 0 and not cfg.mla, \
            "grouped sliding pools: dense-prefix/MLA stacks unsupported"
    if tp_axis is not None:
        # per-shard body under shard_map (models/llama_tp.py): local
        # heads/intermediate, vocab-parallel embedding, psum after the
        # row-sharded wo / w_down matmuls. Absorbed-MLA latent rows are
        # ONE replicated kv head (kvn stays 1 per shard).
        tp = jax.lax.axis_size(tp_axis)
        n, kvn = n // tp, (kvn // tp if kvn % tp == 0 else kvn)
        me = jax.lax.axis_index(tp_axis)
        v0 = me * vocab_shard
        local_ids = jnp.clip(tokens - v0, 0, vocab_shard - 1)
        hit = (tokens >= v0) & (tokens < v0 + vocab_shard)
        x = jnp.where(hit[..., None], params["embed"][local_ids], 0)
        x = jax.lax.psum(x.astype(jnp.float32), tp_axis).astype(dtype)
    else:
        x = params["embed"][tokens].astype(dtype)
    if cfg.embed_scale != 1.0:  # Gemma: sqrt(hidden_size) multiplier
        x = x * jnp.asarray(cfg.embed_scale, dtype)
    chunked = prefill and chunk_offset is not None
    spec = (not prefill) and s > 1  # speculative-decoding verify window
    period, wins, nope = cfg.scan_pattern()
    # per-sublayer rope tables (Gemma-3 sliding layers use a local
    # theta; SmolLM3 NoPE sublayers get identity tables)
    ropes_j = ref_ops.rope_tables_by_sublayer(cfg, positions, wins, nope)
    if chunked or spec or not prefill:
        masks = {w: None for w in set(wins)}  # masking happens in-kernel
    else:
        masks = {w: ref_ops.causal_mask(s, s, window=w)[None, None]
                 for w in set(wins)}

    quant_kv = cache.k_scale is not None
    # Multi-LoRA: params["lora"] stacks every live adapter; lora_idx [B]
    # selects each row's (0 = none). Applied additively after each base
    # projection (runtime/lora.py).
    lora_t = params.get("lora") if lora_idx is not None else None
    if lora_t is not None:
        from simplellminference_tpu.runtime import lora as lora_lib
    def make_group(lw_src, experts: int, kv_off: int, n_loc: int):
        """Scan body over ONE stacked layer group. DeepSeek's
        first_k_dense layers live in their own stack
        (params["dense_layers"], experts=0) scanned before the main
        group; ``kv_off`` maps the group-local layer index to the
        global KV-pool layer (weights index locally)."""
        n = n_loc
        lw = dict(lw_src)
        # hoist the fused kernels' [L,H]->[L,1,H] norm reshapes out of the
        # layer scan (inside it, XLA re-lays the arrays out per layer step)
        if cfg.pre_norms:
            lw["_input_norm3"] = lw["input_norm"][:, None, :]
            lw["_post_norm3"] = lw["post_norm"][:, None, :]

        def norm_w(w, li):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)

        use_fqkv = False
        if (not prefill and s == 1 and "q_norm" not in lw
                and not (lora_t and "wqkv" in lora_t) and kv_off == 0
                and cfg.pre_norms and cfg.partial_rotary_factor == 1.0
                and not cfg.rope_interleaved and _use_fused_kernels()):
            # kv_off > 0 would decouple the weight and cache indices the
            # fused kernel couples in-kernel. INT8-KV pools quantize
            # IN-KERNEL (ops/qkv_fused.py quant variant) — capacity mode
            # keeps the megakernel (VERDICT r3 item 3).
            from simplellminference_tpu.ops import qkv_fused
            use_fqkv = qkv_fused.fused_qkv_available(lw, cfg, b, s, cache.k,
                                                     n_heads=n, kv_heads=kvn)

        def sub_body(carry, li, window, mask, rope, tbl, kli):
            """One decoder sublayer over ONE pool set.

            ``carry`` = (x, pk, pv, pks, pvs) — the pools of whichever
            layer GROUP this sublayer belongs to; ``tbl`` its block
            tables; ``kli`` its (group-local) cache layer index. Weights
            always index by the global ``li``."""
            x, pk, pv, pks, pvs = carry
            sin, cos = rope
            if use_fqkv:
                # decode hot path: rmsnorm + qkv dequant-matmul + RoPE +
                # paged KV append as ONE pallas call (ops/qkv_fused.py)
                from simplellminference_tpu.ops import qkv_fused
                w = lw["wqkv"]
                if quant_kv:
                    q2, pk, pv, pks, pvs = qkv_fused.fused_qkv_append(
                        x[:, 0], lw["_input_norm3"], w.q, w.scales,
                        sin[:, 0], cos[:, 0], pk, pv, li,
                        positions[:, 0], n_heads=n, kv_heads=kvn,
                        eps=cfg.rms_norm_eps, tables=tbl,
                        cache_ks=pks, cache_vs=pvs, kv_layer=kli,
                        interpret=FORCE_FUSED_INTERPRET)
                else:
                    q2, pk, pv = qkv_fused.fused_qkv_append(
                        x[:, 0], lw["_input_norm3"], w.q, w.scales,
                        sin[:, 0], cos[:, 0], pk, pv, li,
                        positions[:, 0], n_heads=n, kv_heads=kvn,
                        eps=cfg.rms_norm_eps, tables=tbl,
                        kv_layer=kli,
                        interpret=FORCE_FUSED_INTERPRET)
                attn = dispatch.attention_paged(
                    cfg, q2[:, None], pk, pv, tbl, kv_lens,
                    *((pks, pvs) if quant_kv else (None, None)),
                    layer=kli, window=window,
                    sinks=(norm_w(lw["sinks"], li) if "sinks" in lw
                           else None))
                return _paged_post_attn(x, attn, pk, pv, pks, pvs, li)
            sinks = norm_w(lw["sinks"], li) if "sinks" in lw else None
            attn_in = (ref_ops.rmsnorm(x, norm_w(lw["input_norm"], li),
                                       cfg.rms_norm_eps)
                       if cfg.pre_norms else x)  # OLMo-2: raw input
            if cfg.mla:
                # DeepSeek MLA (models/mla.py): rope applied inside,
                # padded to the pool lane dim; absorbed mode caches one
                # latent row per token
                from simplellminference_tpu.models import mla as mla_mod
                if cfg.mla_absorbed:
                    q, k = mla_mod.mla_qkv_absorbed(
                        cfg, lw, li, attn_in, sin, cos,
                        act_quant=cfg.act_quant, n_heads=n)
                    v = k
                else:
                    q, k, v = mla_mod.mla_qkv(
                        cfg, lw, li, attn_in, sin, cos,
                        act_quant=cfg.act_quant, n_heads=n)
            else:
                qkv = linear(attn_in, lw["wqkv"], layer=li,
                             act_quant=cfg.act_quant)
                if lora_t is not None:
                    qkv = lora_lib.apply_lora(lora_t, lora_idx, "wqkv",
                                              attn_in, li, qkv)
                if "wqkv_bias" in lw:  # Qwen2-style QKV bias
                    qkv = qkv + norm_w(lw["wqkv_bias"], li).astype(qkv.dtype)
                if "q_norm" in lw and cfg.qk_norm_full:
                    # OLMo-2: full-width q/k RMSNorm before the head split
                    q = ref_ops.rmsnorm(
                        qkv[..., :n * d], norm_w(lw["q_norm"], li),
                        cfg.rms_norm_eps).reshape(b, s, n, d)
                    k = ref_ops.rmsnorm(
                        qkv[..., n * d:(n + kvn) * d],
                        norm_w(lw["k_norm"], li),
                        cfg.rms_norm_eps).reshape(b, s, kvn, d)
                else:
                    q = qkv[..., :n * d].reshape(b, s, n, d)
                    k = qkv[..., n * d:(n + kvn) * d].reshape(b, s, kvn, d)
                    if "q_norm" in lw:  # Qwen3: per-head q/k RMSNorm
                        q = ref_ops.rmsnorm(q, norm_w(lw["q_norm"], li),
                                            cfg.rms_norm_eps)
                        k = ref_ops.rmsnorm(k, norm_w(lw["k_norm"], li),
                                            cfg.rms_norm_eps)
                v = qkv[..., (n + kvn) * d:].reshape(b, s, kvn, d)
                if (cfg.partial_rotary_factor < 1.0
                        or cfg.rope_interleaved):  # GLM-4 / Helium
                    q = ref_ops.apply_rope_partial(q, sin, cos,
                                                   cfg.rope_interleaved)
                    k = ref_ops.apply_rope_partial(k, sin, cos,
                                                   cfg.rope_interleaved)
                else:
                    q = ref_ops.apply_rope(q, sin, cos)
                    k = ref_ops.apply_rope(k, sin, cos)

            scale_args = (pks, pvs) if quant_kv else (None, None)
            if spec:
                # speculative verify: write the T-token span at each row's
                # position, attend via the multi-window paged flash kernel
                # (same page traffic as one decode step)
                pk, pv, nks, nvs = pkv.write_span_stacked(
                    pk, pv, k, v, tbl, positions[:, 0], kli,
                    *scale_args)
                attn = dispatch.attention_paged(
                    cfg, q, pk, pv, tbl, kv_lens,
                    *((nks, nvs) if quant_kv else (None, None)),
                    layer=kli, window=window, sinks=sinks)
            elif chunked:
                ps = pk.shape[3]
                pk, pv, nks, nvs = pkv.write_prefill_stacked(
                    pk, pv, k, v, tbl, kli, *scale_args,
                    page_offset=chunk_offset // ps)
                # Attend the window's queries to everything cached so far
                # (including the just-written chunk) THROUGH the page tables
                # — the paged flash prefill kernel on TPU; no dense
                # materialization of the prefix (gather_dense only as the
                # CPU/GSPMD fallback inside the dispatcher).
                attn = dispatch.attention_paged_prefill(
                    cfg, q, pk, pv, tbl, kv_lens, chunk_offset,
                    *((nks, nvs) if quant_kv else (None, None)),
                    layer=kli, window=window, sinks=sinks)
            elif prefill:
                pk, pv, nks, nvs = pkv.write_prefill_stacked(
                    pk, pv, k, v, tbl, kli, *scale_args)
                attn = dispatch.attention(cfg, q, k, v, mask, window=window,
                                          sinks=sinks)
            else:
                pk, pv, nks, nvs = pkv.write_decode_stacked(
                    pk, pv, k[:, 0], v[:, 0], tbl, positions[:, 0],
                    kli, *scale_args)
                attn = dispatch.attention_paged(
                    cfg, q, pk, pv, tbl, kv_lens,
                    *((nks, nvs) if quant_kv else (None, None)),
                    layer=kli, window=window, sinks=sinks)
            if quant_kv:
                pks, pvs = nks, nvs
            return _paged_post_attn(x, attn, pk, pv, pks, pvs, li)

        def _paged_post_attn(x, attn, pk, pv, pks, pvs, li):
            if cfg.mla:
                attn = attn.reshape(b, s, n, d)
                if cfg.mla_absorbed:
                    from simplellminference_tpu.models import (
                        mla as mla_mod)
                    attn = mla_mod.mla_unabsorb(cfg, lw, li, attn)
                elif cfg.v_head_dim < d:
                    attn = attn[..., :cfg.v_head_dim]
            attn_rows = attn.reshape(b, s, -1)
            attn = linear(attn_rows, lw["wo"], layer=li,
                          act_quant=cfg.act_quant)
            if lora_t is not None:
                attn = lora_lib.apply_lora(lora_t, lora_idx, "wo", attn_rows,
                                           li, attn)
            if tp_axis is not None:
                attn = jax.lax.psum(attn, tp_axis)
            if "wo_bias" in lw:   # GPT-OSS o_proj bias (once, post-psum)
                attn = attn + norm_w(lw["wo_bias"], li).astype(attn.dtype)
            if "post_attn_norm" in lw:  # Gemma-2 pre-residual attn norm
                attn = ref_ops.rmsnorm(attn, norm_w(lw["post_attn_norm"], li),
                                       cfg.rms_norm_eps)
            if cfg.residual_scale != 1.0:  # Granite residual_multiplier
                attn = cfg.residual_scale * attn
            x = x + attn

            if experts:
                from simplellminference_tpu.ops import moe
                ffn_in = (ref_ops.rmsnorm(x, norm_w(lw["post_norm"], li),
                                          cfg.rms_norm_eps)
                          if cfg.pre_norms else x)
                out = moe.moe_ffn(cfg, lw, li, ffn_in, tp_axis=tp_axis)
                if cfg.residual_scale != 1.0:
                    out = cfg.residual_scale * out
                x = x + out
                return (x, pk, pv, pks, pvs)
            lora_ffn = lora_t and ("w_gate_up" in lora_t
                                   or "w_down" in lora_t)
            if cfg.pre_norms and _use_fused_kernels() and not lora_ffn:
                from simplellminference_tpu.ops import ffn_fused
                i_loc = cfg.intermediate_size if tp_axis is None else (
                    cfg.intermediate_size // jax.lax.axis_size(tp_axis))
                if (cfg.hidden_act == "silu" and "post_ffn_norm" not in lw
                        and "w_gate_up_bias" not in lw
                        and ffn_fused.fused_ffn_available(
                            lw, cfg.hidden_size, i_loc, b * s)):
                    gu, dn = lw["w_gate_up"], lw["w_down"]
                    xf = x.reshape(b * s, cfg.hidden_size)
                    xo = ffn_fused.fused_ffn(
                        xf, lw["_post_norm3"],
                        gu.q, gu.scales, dn.q, dn.scales, li,
                        eps=cfg.rms_norm_eps,
                        interpret=FORCE_FUSED_INTERPRET)
                    if tp_axis is not None:
                        # all-reduce only the shard-partial down product (the
                        # kernel residual-added the replicated x in-tile)
                        xo = xf + jax.lax.psum(xo - xf, tp_axis)
                    if cfg.residual_scale != 1.0:
                        xo = xf + cfg.residual_scale * (xo - xf)
                    return (xo.reshape(b, s, cfg.hidden_size), pk, pv,
                            pks, pvs)
            ffn_in = (ref_ops.rmsnorm(x, norm_w(lw["post_norm"], li),
                                      cfg.rms_norm_eps)
                      if cfg.pre_norms else x)
            i = cfg.intermediate_size if tp_axis is None else (
                cfg.intermediate_size // jax.lax.axis_size(tp_axis))
            gate_up = linear(ffn_in, lw["w_gate_up"], layer=li,
                             act_quant=cfg.act_quant)
            if lora_t is not None:
                gate_up = lora_lib.apply_lora(lora_t, lora_idx, "w_gate_up",
                                              ffn_in, li, gate_up)
            if "w_gate_up_bias" in lw:  # Ernie-4.5 use_bias FFN bias
                gate_up = gate_up + norm_w(lw["w_gate_up_bias"],
                                           li).astype(gate_up.dtype)
            swi = ref_ops.glu_act(gate_up[..., :i], gate_up[..., i:],
                                  cfg.hidden_act)
            down = linear(swi, lw["w_down"], layer=li,
                          act_quant=cfg.act_quant)
            if lora_t is not None:
                down = lora_lib.apply_lora(lora_t, lora_idx, "w_down", swi,
                                           li, down)
            if tp_axis is not None:
                down = jax.lax.psum(down, tp_axis)
            if "w_down_bias" in lw:  # Ernie-4.5 (once, post-psum)
                down = down + norm_w(lw["w_down_bias"],
                                     li).astype(down.dtype)
            if "post_ffn_norm" in lw:  # Gemma-2 pre-residual FFN norm
                down = ref_ops.rmsnorm(down, norm_w(lw["post_ffn_norm"], li),
                                       cfg.rms_norm_eps)
            if cfg.residual_scale != 1.0:  # Granite residual_multiplier
                down = cfg.residual_scale * down
            x = x + down
            return (x, pk, pv, pks, pvs)

        if grouped:
            # Per-sublayer group metadata: sliding sublayers index the
            # ring pools (group-local layer t*cnt_w + rank), full ones
            # the main pools (t*cnt_f + rank).
            w_flags = [w is not None for w in wins]
            cnt_w = sum(w_flags)
            cnt_f = period - cnt_w
            rank_w, rank_f = [], []
            iw = if_ = 0
            for f in w_flags:
                rank_w.append(iw)
                rank_f.append(if_)
                iw += 1 if f else 0
                if_ += 0 if f else 1

            def body(carry, base_li):
                x, pk, pv, pks, pvs, pkw, pvw, pksw, pvsw = carry
                t = base_li // period
                for j, w in enumerate(wins):
                    li = base_li + j
                    if w_flags[j]:
                        sub = sub_body((x, pkw, pvw, pksw, pvsw), li, w,
                                       masks[w], ropes_j[j], tables_w,
                                       t * cnt_w + rank_w[j])
                        x, pkw, pvw, pksw, pvsw = sub
                    else:
                        sub = sub_body((x, pk, pv, pks, pvs), li, w,
                                       masks[w], ropes_j[j], tables,
                                       t * cnt_f + rank_f[j])
                        x, pk, pv, pks, pvs = sub
                return (x, pk, pv, pks, pvs, pkw, pvw, pksw, pvsw), None
            return body

        def body(carry, base_li):
            for j, w in enumerate(wins):
                li = base_li + j
                kli = li + kv_off if kv_off else li
                carry = sub_body(carry, li, w, masks[w], ropes_j[j],
                                 tables, kli)
            return carry, None
        return body

    kd = cfg.first_k_dense
    body = make_group(params["layers"], cfg.num_experts, kd, n)

    carry0 = (x, cache.k, cache.v,
              cache.k_scale if quant_kv else None,
              cache.v_scale if quant_kv else None)
    if grouped:
        carry0 += (cache.k_w, cache.v_w,
                   cache.k_w_scale if quant_kv else None,
                   cache.v_w_scale if quant_kv else None)
    if kd:
        dense_body = make_group(params["dense_layers"], 0, 0, n)
        carry0, _ = jax.lax.scan(dense_body, carry0,
                                 jnp.arange(kd, dtype=jnp.int32))
    steps = jnp.arange((cfg.num_layers - kd) // period,
                       dtype=jnp.int32) * period
    carry_out, _ = jax.lax.scan(body, carry0, steps)
    (x, new_k, new_v, new_ks, new_vs), rest = carry_out[:5], carry_out[5:]
    cache = PagedKVCache(k=new_k, v=new_v,
                         k_scale=new_ks if quant_kv else None,
                         v_scale=new_vs if quant_kv else None,
                         k_w=rest[0] if grouped else None,
                         v_w=rest[1] if grouped else None,
                         k_w_scale=(rest[2] if grouped and quant_kv
                                    else None),
                         v_w_scale=(rest[3] if grouped and quant_kv
                                    else None))

    if last_token_only and s > 1:
        # Last valid slot = kv_len-1 (absolute) -> chunk-local index.
        idx = kv_lens - 1 - (chunk_offset if chunked else 0)
        x = jnp.take_along_axis(x, idx[:, None, None], axis=1)

    x = ref_ops.rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].astype(x.dtype).T,
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head, out_dtype=jnp.float32)
    if cfg.logit_scale != 1.0:  # Granite 1/logits_scaling
        logits = cfg.logit_scale * logits
    if cfg.final_logit_softcap:  # Gemma-2 final-logit soft cap
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    return logits.astype(jnp.float32), cache


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype: Optional[Any] = None) -> Params:
    """Random-init params (tests/benches; real loads come from safetensors)."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers - cfg.first_k_dense
    keys = jax.random.split(key, 12)

    def w(k, shape, scale=None):
        scale = scale or shape[-2] ** -0.5 if len(shape) > 1 else 0.02
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    if cfg.num_experts:
        e, ie = cfg.num_experts, cfg.expert_intermediate_size
        ffn = {
            "router": w(keys[2], (L, h, e), 0.02),
            "w_gate_up": w(keys[5], (L, h, e * 2 * ie)),
            "w_down": w(keys[7], (L, e * ie, h), ie ** -0.5),
        }
        if cfg.router_score_fn == "sigmoid":  # DeepSeek-V3 noaux_tc
            ffn["router_bias"] = jnp.zeros((L, e), jnp.float32)
        if cfg.moe_bias:  # GPT-OSS: router linear + expert biases
            ffn["router_bias"] = w(keys[8], (L, e), 0.02)
            ffn["w_gate_up_bias"] = w(keys[9], (L, e * 2 * ie), 0.02)
            ffn["w_down_bias"] = w(keys[10], (L, e, h), 0.02)
        if cfg.shared_expert_intermediate_size:
            se = cfg.shared_expert_intermediate_size
            ffn["shared_gate_up"] = w(keys[3], (L, h, 2 * se))
            ffn["shared_down"] = w(keys[6], (L, se, h), se ** -0.5)
            ffn["shared_gate"] = w(keys[10], (L, h, 1), 0.02)
    else:
        ffn = {
            "w_gate_up": w(keys[5], (L, h, 2 * i)),
            "w_down": w(keys[7], (L, i, h)),
        }
    if cfg.mla:  # DeepSeek MLA projections (models/mla.py)
        qk = cfg.qk_head_dim
        attn_w = {
            "kv_a": w(keys[1], (L, h, cfg.kv_lora_rank
                                + cfg.qk_rope_head_dim)),
            "kv_a_norm": jnp.ones((L, cfg.kv_lora_rank), dtype),
            "kv_b": w(keys[11], (L, cfg.kv_lora_rank,
                                 n * (cfg.qk_nope_head_dim
                                      + cfg.v_head_dim))),
            "wo": w(keys[4], (L, n * cfg.v_head_dim, h)),
        }
        if cfg.q_lora_rank:
            attn_w["q_a"] = w(keys[2], (L, h, cfg.q_lora_rank))
            attn_w["q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), dtype)
            attn_w["q_b"] = w(keys[3], (L, cfg.q_lora_rank, n * qk))
        else:
            attn_w["q_proj"] = w(keys[2], (L, h, n * qk))
    else:
        attn_w = {
            "wqkv": w(keys[1], (L, h, (n + 2 * kvn) * d)),
            "wo": w(keys[4], (L, n * d, h)),
        }
    pre = ({"input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype)}
           if cfg.pre_norms else {})  # OLMo-2 has no pre-norms
    params: Params = {
        "embed": w(keys[0], (v, h), 0.02),
        "layers": {
            **pre,
            **attn_w,
            **ffn,
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if cfg.attention_bias:
        params["layers"]["wqkv_bias"] = w(keys[9],
                                          (L, (n + 2 * kvn) * d), 0.02)
    if cfg.qk_norm:  # Qwen3 per-head / OLMo-2 full-width q/k RMSNorm
        qd, kd_ = ((n * d, kvn * d) if cfg.qk_norm_full else (d, d))
        params["layers"]["q_norm"] = jnp.ones((L, qd), dtype)
        params["layers"]["k_norm"] = jnp.ones((L, kd_), dtype)
    if cfg.attn_sinks:  # GPT-OSS attention-sink logits
        params["layers"]["sinks"] = w(keys[11], (L, n), 1.0)
    if cfg.o_bias:
        params["layers"]["wo_bias"] = w(keys[6], (L, h), 0.02)
    if cfg.mlp_bias and not cfg.num_experts:
        params["layers"]["w_gate_up_bias"] = w(keys[10], (L, 2 * i), 0.02)
        params["layers"]["w_down_bias"] = w(keys[11], (L, h), 0.02)
    if cfg.sandwich_norms:  # Gemma-2 pre-residual output norms
        params["layers"]["post_attn_norm"] = jnp.ones((L, h), dtype)
        params["layers"]["post_ffn_norm"] = jnp.ones((L, h), dtype)
    if cfg.first_k_dense:
        # DeepSeek dense-prefix layers: own stacked group, dense FFN
        kd = cfg.first_k_dense
        dg = {k_: v_[:kd] if hasattr(v_, "shape") else v_
              for k_, v_ in params["layers"].items()
              if k_ not in ("router", "router_bias", "w_gate_up",
                            "w_down", "shared_gate_up", "shared_down",
                            "shared_gate")}
        dg["w_gate_up"] = w(keys[6], (kd, h, 2 * i))
        dg["w_down"] = w(keys[10], (kd, i, h))
        params["dense_layers"] = dg
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(keys[8], (h, v), 0.02)
    return params
