"""Per-parameter PartitionSpecs for Llama-family params (megatron-style TP).

Sharding layout (pattern per SNIPPETS.md [2]/[3], adapted to our [K, N]
contraction-first weights, layers stacked on a leading L axis):

    wqkv      [L, H, (N+2kvN)D]— column-sharded on "model" (heads split;
                                 the fused q|k|v boundary crossing shards
                                 costs one small activation all-to-all)
    wo        [L, heads*D, H]  — row-sharded on "model"  → psum after
    w_gate_up [L, H, 2I]       — column-sharded on "model"
    w_down    [L, I, H]        — row-sharded on "model"  → psum after
    embed     [V, H]           — vocab-sharded on "model" (tied head =>
                                 vocab-sharded logits, all-gather at sample)
    lm_head   [H, V]           — column(vocab)-sharded on "model"
    norms                      — replicated
    KV cache  [L,B,kvN,Smax,D] — batch on "data", kv heads on "model"

With GSPMD jit, these input shardings are all XLA needs to insert the
per-layer all-reduces over ICI (SURVEY.md §2.9's "TPU-native equivalent").
Quantized weights shard q and scales with the same output-dim spec (scales
are [L, G, N] — G is the grouped contraction dim, sharded like K).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops.linear import QuantizedWeight
from simplellminference_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _layer_specs() -> dict[str, P]:
    m = MODEL_AXIS
    return {
        "input_norm": P(None, None),
        "post_norm": P(None, None),
        # Qwen3 per-head q/k RMSNorm [L, D]: head_dim is never sharded.
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        # Gemma-2 sandwich norms [L, H]: replicated like the other norms.
        "post_attn_norm": P(None, None),
        "post_ffn_norm": P(None, None),
        # DeepSeek MLA: per-head expansions column-shard on heads; the
        # shared latent projections and their norms replicate.
        "q_proj": P(None, None, m),
        "q_a": P(None, None, None),
        "q_a_norm": P(None, None),
        "q_b": P(None, None, m),
        "kv_a": P(None, None, None),
        "kv_a_norm": P(None, None),
        "kv_b": P(None, None, m),
        "wqkv": P(None, None, m),
        "wqkv_bias": P(None, m),       # column-sharded like wqkv's N
        "wo": P(None, m, None),
        "w_gate_up": P(None, None, m),
        "w_down": P(None, m, None),
        # MoE router [L, H, E]: replicated (tiny; every shard routes).
        # The folded expert w_gate_up/w_down reuse the column/row specs
        # above — contiguous chunks are whole experts when E % tp == 0,
        # which makes the model axis double as the EXPERT-parallel axis
        # (ops/moe.py).
        "router": P(None, None, None),
        "router_bias": P(None, None),   # [L, E] V3 selection / OSS bias
        # GPT-OSS: sinks [L, N] shard on heads; o bias [L, H] is added
        # once post-psum (replicated); expert biases shard with their
        # folded expert weights (contiguous chunks = whole experts).
        "sinks": P(None, m),
        "wo_bias": P(None, None),
        "w_gate_up_bias": P(None, m),     # [L, E*2Ie] column blocks
        "w_down_bias": P(None, m, None),  # [L, E, H] expert rows
        # Qwen2-MoE shared expert: plain megatron column/row shards; the
        # scalar sigmoid gate is replicated.
        "shared_gate_up": P(None, None, m),
        "shared_down": P(None, m, None),
        "shared_gate": P(None, None, None),
    }


def param_specs(cfg: ModelConfig) -> dict[str, Any]:
    """PartitionSpec pytree matching the params pytree structure."""
    specs: dict[str, Any] = {
        "embed": P(MODEL_AXIS, None),
        "final_norm": P(None),
        "layers": {},
    }
    lspecs = _layer_specs()
    for name, spec in lspecs.items():
        specs["layers"][name] = spec
    if cfg.first_k_dense:
        # DeepSeek dense-prefix group: same per-name specs
        specs["dense_layers"] = dict(lspecs)
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, MODEL_AXIS)
    return specs


def _scales_spec(spec: P, scales) -> P:
    """Quantized scales [L, G, N] shard like the weight — except dims the
    scales COLLAPSE (per-channel quant has G == 1) must stay replicated:
    a size-1 dim cannot split across the mesh."""
    return P(*[None if scales.shape[i] == 1 else ax
               for i, ax in enumerate(spec)])


def _match_tree(params, specs):
    """Walk params and specs together, expanding QuantizedWeight leaves."""
    out = {}
    for k, v in params.items():
        s = specs[k]
        if isinstance(v, dict):
            out[k] = _match_tree(v, s)
        elif isinstance(v, QuantizedWeight):
            if v.bits == 4 and any(ax is not None for ax in tuple(s)[:-1]):
                # split-half nibble packing: a contiguous shard of packed
                # rows is two non-contiguous logical K windows — row/K
                # sharding would silently mis-pair x columns with nibbles.
                # int4 is the fit-on-one-chip mode; use int8 for TP.
                raise ValueError(
                    f"int4 weights cannot be K/row-sharded (param {k!r}, "
                    f"spec {s}); use int8 for tensor parallelism")
            sc_spec = _scales_spec(s, v.scales)
            out[k] = QuantizedWeight(q=s, scales=sc_spec, bits=v.bits,
                                     zs=None if v.zs is None else sc_spec)
        else:
            out[k] = s
    return out


def spec_tree(cfg: ModelConfig, params) -> Any:
    return _match_tree(params, param_specs(cfg))


def shard_params(cfg: ModelConfig, params, mesh: Mesh):
    """device_put the params tree with its TP shardings."""
    specs = spec_tree(cfg, params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def kv_cache_spec(shard_kv_heads: bool = True) -> P:
    """[L, B, kvN, Smax, D] — batch on data; kv heads on model when divisible."""
    return P(None, DATA_AXIS, MODEL_AXIS if shard_kv_heads else None,
             None, None)


def shard_kv_cache(cache, mesh: Mesh, num_kv_heads: int):
    tp = mesh.shape[MODEL_AXIS]
    spec = kv_cache_spec(shard_kv_heads=(num_kv_heads % tp == 0))
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda a: jax.device_put(a, sh), cache)


def token_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None))
