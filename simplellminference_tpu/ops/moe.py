"""Sparse-MoE FFN (Mixtral-style top-k routing), designed TPU-first.

The reference has no MoE at all — its FFN is the dense up/gate/SwiGLU/down
chain (/root/reference/source/model/model.cpp:99-121; SURVEY.md §2.8 marks
"Expert parallel: absent"). This module adds the capability the TPU way
rather than porting a GPU dispatch kernel:

**Folded dense-expert layout.** Expert weights are stored folded into the
same stacked 3-D shapes the dense FFN uses —

    w_gate_up  [L, H, E * 2*Ie]   (per-expert [gate_e | up_e] column blocks)
    w_down     [L, E * Ie, H]     (per-expert row blocks)
    router     [L, H, E]          (full precision, never quantized)

so the existing INT8 dequant+matmul Pallas kernels (ops/matmul.py) run
UNCHANGED: one big MXU matmul computes every expert's gate/up, the SwiGLU
activations are scaled by the (zero for unselected experts) router
probabilities, and one big matmul folds the weighted expert outputs back
to the hidden dim. For DECODE this is bandwidth-optimal, not a shortcut:
decode is weight-bound, and with batch*top_k draws over E experts the
step must stream essentially all expert weights from HBM anyway — the
zeros only waste MXU FLOPs the bandwidth had already paid for. (At long-
sequence PREFILL the dense fold pays E/k× extra FLOPs; a block-sparse
gather kernel is the known upgrade path and is noted in README.)

**Expert parallelism = the existing TP sharding.** Because experts are
contiguous column/row blocks, the megatron column-shard of w_gate_up and
row-shard of w_down (parallel/sharding.py) split the expert dim exactly
when E % tp == 0: each shard holds E/tp whole experts, computes their
contributions for all tokens, and the existing post-FFN psum IS the
expert combine. No all_to_all, no capacity factors, no token dropping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.linear import linear


def router_probs(x: jax.Array, w_router: jax.Array, top_k: int,
                 norm_topk: bool = True) -> jax.Array:
    """Dense gate matrix [T, E]: softmax router probs for each token's
    top-k experts, zero elsewhere.

    Matches HF Mixtral semantics: softmax over ALL experts in fp32, keep
    top-k, renormalize (``norm_topk``; Qwen2-MoE's norm_topk_prob flag).
    """
    logits = jnp.dot(x.astype(jnp.float32), w_router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                     # [T, E]
    e = probs.shape[-1]
    if top_k < e:
        _, topi = jax.lax.top_k(probs, top_k)                   # [T, k]
        mask = jax.nn.one_hot(topi, e, dtype=probs.dtype).sum(-2)  # [T, E]
        probs = probs * mask
    if norm_topk:
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return probs


def moe_ffn(cfg: ModelConfig, lw: dict, li: Optional[jax.Array],
            x: jax.Array, tp_axis: Optional[str] = None) -> jax.Array:
    """MoE FFN on the (already-normed) input x: [B, S, H] -> [B, S, H].

    Under ``tp_axis`` each shard owns E/tp whole experts (folded column/
    row blocks); the returned value is the psum-combined output.
    """
    b, s, h = x.shape
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    ie = cfg.expert_intermediate_size
    t = b * s
    xf = x.reshape(t, h)

    wr = lw["router"]
    if li is not None:
        wr = jax.lax.dynamic_index_in_dim(wr, li, 0, keepdims=False)
    gates = router_probs(xf, wr, k, cfg.norm_topk_prob)         # [T, E] f32

    e_loc = e
    if tp_axis is not None:
        tp = jax.lax.axis_size(tp_axis)
        assert e % tp == 0, (
            f"num_experts {e} must divide over tp={tp} (whole-expert "
            f"column/row shards)")
        e_loc = e // tp
        me = jax.lax.axis_index(tp_axis)
        gates = jax.lax.dynamic_slice_in_dim(gates, me * e_loc, e_loc, 1)

    gu = linear(xf, lw["w_gate_up"], layer=li)       # [T, E_loc * 2*Ie]
    gu = gu.reshape(t, e_loc, 2 * ie)
    act = ref_ops.glu_act(gu[..., :ie], gu[..., ie:], cfg.hidden_act)
    act = act * gates[..., None].astype(act.dtype)   # zero unselected
    y = linear(act.reshape(t, e_loc * ie), lw["w_down"], layer=li)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.reshape(b, s, h)


def moe_ffn_ref(cfg: ModelConfig, router: jax.Array, w_gate_up: jax.Array,
                w_down: jax.Array, x: jax.Array) -> jax.Array:
    """Per-expert-loop reference (single layer, fp weights) — the oracle
    for tests. x: [T, H]; router [H, E]; w_gate_up [H, E*2Ie];
    w_down [E*Ie, H]."""
    t, h = x.shape
    e, ie = cfg.num_experts, cfg.expert_intermediate_size
    gates = router_probs(x, router, cfg.num_experts_per_tok,
                         cfg.norm_topk_prob)
    out = jnp.zeros((t, h), jnp.float32)
    for ei in range(e):
        wgu = w_gate_up[:, ei * 2 * ie:(ei + 1) * 2 * ie]
        wd = w_down[ei * ie:(ei + 1) * ie, :]
        gu = x @ wgu
        a = ref_ops.glu_act(gu[:, :ie], gu[:, ie:], cfg.hidden_act)
        out = out + gates[:, ei:ei + 1] * (a @ wd).astype(jnp.float32)
    return out.astype(x.dtype)
