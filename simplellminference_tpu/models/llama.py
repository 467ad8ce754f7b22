"""Llama-family decoder as a pure function over a params pytree.

Capability successor of the reference's entire op/model stack
(model.cpp:40-140: per-layer rmsnorm → q/k/v GEMVs → RoPE → MHA → wo →
residual → rmsnorm → up/gate GEMVs → SwiGLU → down → residual; final norm →
tied LM head) — redesigned TPU-first:

  * batch-first [B, S, H] tensors (the reference is structurally batch=1,
    model.cpp:258) so matmuls are GEMMs on the MXU, not GEMVs;
  * layers stacked on a leading axis and scanned with ``lax.scan`` — one
    trace, one compiled layer body (the reference launches ~480 kernels per
    token on the default stream, SURVEY.md §3.3);
  * KV cache updated functionally with donated buffers (successor of the
    aliased slice-view writes, tensor.cpp:199-212);
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
        "wq": [L, H, N*D], "wk": [L, H, kvN*D], "wv": [L, H, kvN*D],
        "wo": [L, N*D, H],
        "w_gate": [L, H, I], "w_up": [L, H, I], "w_down": [L, I, H],
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
from simplellminference_tpu.ops.linear import linear
from simplellminference_tpu.runtime.kv_cache import DenseKVCache, update_layer

Params = dict[str, Any]


def _attention(cfg: ModelConfig, q, k, v, mask):
    """Attention dispatch: flash kernels on TPU, dense reference elsewhere."""
    from simplellminference_tpu.ops.attention import dispatch
    return dispatch.attention(cfg, q, k, v, mask)


def decoder_layer(cfg: ModelConfig, lp: Params, x: jax.Array,
                  sin: jax.Array, cos: jax.Array,
                  cache_k: Optional[jax.Array], cache_v: Optional[jax.Array],
                  offsets: Optional[jax.Array], mask: jax.Array):
    """One decoder layer. x: [B, S, H]. Returns (x', cache_k', cache_v')."""
    b, s, h = x.shape
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # --- attention block (reference: model.cpp:52-90) ---
    attn_in = ref_ops.rmsnorm(x, lp["input_norm"], cfg.rms_norm_eps)
    q = linear(attn_in, lp["wq"]).reshape(b, s, n, d)
    k = linear(attn_in, lp["wk"]).reshape(b, s, kvn, d)
    v = linear(attn_in, lp["wv"]).reshape(b, s, kvn, d)

    q = ref_ops.apply_rope(q, sin, cos)
    k = ref_ops.apply_rope(k, sin, cos)

    if cache_k is not None:
        cache_k, cache_v = update_layer(cache_k, cache_v, k, v, offsets)
        k_all, v_all = cache_k, cache_v
    else:
        k_all, v_all = k, v

    attn = _attention(cfg, q, k_all, v_all, mask)
    attn = linear(attn.reshape(b, s, n * d), lp["wo"])
    x = x + attn

    # --- FFN block (reference: model.cpp:93-128) ---
    ffn_in = ref_ops.rmsnorm(x, lp["post_norm"], cfg.rms_norm_eps)
    gate = linear(ffn_in, lp["w_gate"])
    up = linear(ffn_in, lp["w_up"])
    x = x + linear(ref_ops.swiglu(gate, up), lp["w_down"])
    return x, cache_k, cache_v


def forward(cfg: ModelConfig, params: Params, tokens: jax.Array,
            positions: jax.Array, cache: Optional[DenseKVCache] = None,
            offsets: Optional[jax.Array] = None,
            kv_lens: Optional[jax.Array] = None,
            ) -> tuple[jax.Array, Optional[DenseKVCache]]:
    """Full forward pass.

    tokens/positions: [B, S] int32. ``offsets[b]`` = cache slot of the first
    new token (== positions[:, 0] for contiguous sequences). ``kv_lens[b]``
    = number of valid cache slots after this step (defaults to
    offsets + S). Returns (logits [B, S, V] fp32, updated cache).
    """
    b, s = tokens.shape
    dtype = jnp.dtype(cfg.dtype)
    x = params["embed"][tokens].astype(dtype)  # [B, S, H] row gather
    sin, cos = ref_ops.rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    if cache is not None:
        if offsets is None:
            offsets = positions[:, 0]
        sk = cache.max_seq
        # Keys live at absolute cache slots 0..sk-1; attend where
        # key_pos <= query_pos and key_pos < kv_len (written region).
        key_pos = jnp.arange(sk)[None, None, None, :]            # [1,1,1,Sk]
        q_pos = positions[:, None, :, None]                      # [B,1,S,1]
        mask = key_pos <= q_pos
        if kv_lens is not None:
            mask = mask & (key_pos < kv_lens[:, None, None, None])

        def body(x, layer):
            lp, ck, cv = layer
            x, ck, cv = decoder_layer(cfg, lp, x, sin, cos, ck, cv,
                                      offsets, mask)
            return x, (ck, cv)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v))
        cache = DenseKVCache(k=new_k, v=new_v)
    else:
        mask = ref_ops.causal_mask(s, s)[None, None]             # [1,1,S,S]

        def body(x, lp):
            x, _, _ = decoder_layer(cfg, lp, x, sin, cos, None, None,
                                    None, mask)
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])

    x = ref_ops.rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        # Tied embeddings (reference Q5: emb and cls share the mmap offset,
        # model.cpp:342-358).
        logits = jnp.dot(x, params["embed"].astype(x.dtype).T,
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head, out_dtype=jnp.float32)
    return logits.astype(jnp.float32), cache


def init_params(cfg: ModelConfig, key: jax.Array,
                dtype: Optional[Any] = None) -> Params:
    """Random-init params (tests/benches; real loads come from safetensors)."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    n, kvn, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    keys = jax.random.split(key, 10)

    def w(k, shape, scale=None):
        scale = scale or shape[-2] ** -0.5 if len(shape) > 1 else 0.02
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "embed": w(keys[0], (v, h), 0.02),
        "layers": {
            "input_norm": jnp.ones((L, h), dtype),
            "post_norm": jnp.ones((L, h), dtype),
            "wq": w(keys[1], (L, h, n * d)),
            "wk": w(keys[2], (L, h, kvn * d)),
            "wv": w(keys[3], (L, h, kvn * d)),
            "wo": w(keys[4], (L, n * d, h)),
            "w_gate": w(keys[5], (L, h, i)),
            "w_up": w(keys[6], (L, h, i)),
            "w_down": w(keys[7], (L, i, h)),
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(keys[8], (h, v), 0.02)
    return params
