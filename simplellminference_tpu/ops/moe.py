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
zeros only waste MXU FLOPs the bandwidth had already paid for. At
long-sequence PREFILL the dense fold would pay E/k× extra FLOPs, so
prefill (S > 1) routes to :func:`moe_ffn_grouped` instead: tokens sort
by assigned expert and two ``jax.lax.ragged_dot`` grouped matmuls (XLA's
native TPU grouped-GEMM) compute only the top-k expert rows per token —
exact same math, k/E of the FLOPs.

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


def router_topk(x: jax.Array, w_router: jax.Array, top_k: int,
                norm_topk: bool = True, scaling: float = 1.0,
                score_fn: str = "softmax",
                bias: Optional[jax.Array] = None,
                n_group: int = 1,
                topk_group: int = 1) -> tuple[jax.Array, jax.Array]:
    """Top-k router assignment: (probs [T, k] f32, expert ids [T, k] i32).

    ``score_fn="softmax"``: HF Mixtral semantics — softmax over ALL
    experts in fp32, keep top-k, renormalize (``norm_topk``;
    Qwen2-MoE's norm_topk_prob flag).

    ``score_fn="sigmoid"``: DeepSeek-V3 noaux_tc routing — sigmoid
    scores; SELECTION uses scores + ``bias`` (e_score_correction_bias)
    restricted to the ``topk_group`` best of ``n_group`` expert groups
    (group score = sum of its top-2 biased scores); WEIGHTS come from
    the unbiased sigmoid scores of the selected experts.

    ``score_fn="softmax"`` with ``n_group > 1``: DeepSeek-V2's
    group_limited_greedy — softmax scores, group score = the group's
    MAX, top-k restricted to the ``topk_group`` best groups.

    ``scaling``: DeepSeek's routed_scaling_factor, applied after the
    optional renormalization.

    With ``score_fn="softmax"``, ``bias`` is a true router LINEAR bias
    (GPT-OSS: logits = x @ W + b, top-k, softmax over the k — identical
    to softmax-all + renorm); with "sigmoid" it is the DeepSeek
    selection-only correction bias.
    """
    logits = jnp.dot(x.astype(jnp.float32), w_router.astype(jnp.float32))
    if bias is not None and score_fn == "softmax":
        logits = logits + bias.astype(jnp.float32)[None]
    t, e = logits.shape
    k = min(top_k, e)
    if score_fn == "sigmoid":
        scores = jax.nn.sigmoid(logits)
        choice = scores if bias is None else scores + bias[None]
        if n_group > 1:
            gsz = e // n_group
            g = choice.reshape(t, n_group, gsz)
            top2 = jax.lax.top_k(g, min(2, gsz))[0].sum(-1)     # [T, G]
            _, gi = jax.lax.top_k(top2, min(topk_group, n_group))
            gmask = jnp.zeros((t, n_group), bool).at[
                jnp.arange(t)[:, None], gi].set(True)
            choice = jnp.where(
                jnp.repeat(gmask, gsz, axis=1), choice, 0.0)
        _, topi = jax.lax.top_k(choice, k)
        topv = jnp.take_along_axis(scores, topi, axis=-1)
        if norm_topk:
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
    else:
        probs = jax.nn.softmax(logits, axis=-1)                 # [T, E]
        if n_group > 1:
            # DeepSeek-V2 group_limited_greedy: restrict the top-k to
            # the topk_group groups with the highest max score
            gsz = e // n_group
            gmax = probs.reshape(t, n_group, gsz).max(-1)       # [T, G]
            _, gi = jax.lax.top_k(gmax, min(topk_group, n_group))
            gmask = jnp.zeros((t, n_group), bool).at[
                jnp.arange(t)[:, None], gi].set(True)
            probs = jnp.where(jnp.repeat(gmask, gsz, axis=1), probs, 0.0)
        topv, topi = jax.lax.top_k(probs, k)
        if norm_topk:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    if scaling != 1.0:
        topv = topv * scaling
    return topv, topi.astype(jnp.int32)


def router_probs(x: jax.Array, w_router: jax.Array, top_k: int,
                 norm_topk: bool = True, scaling: float = 1.0,
                 **kw) -> jax.Array:
    """Dense gate matrix [T, E]: router probs for each token's top-k
    experts, zero elsewhere (the folded-path gating mask)."""
    e = w_router.shape[-1]
    topv, topi = router_topk(x, w_router, top_k, norm_topk, scaling, **kw)
    mask = jax.nn.one_hot(topi, e, dtype=topv.dtype)            # [T, k, E]
    return jnp.einsum("tk,tke->te", topv, mask)


def _router_kw(cfg: ModelConfig, lw: dict,
               li: Optional[jax.Array]) -> dict:
    """Per-call router extras (DeepSeek grouped/sigmoid routing; the
    GPT-OSS router linear bias)."""
    bias = lw.get("router_bias")
    if bias is not None and li is not None:
        bias = jax.lax.dynamic_index_in_dim(bias, li, 0, keepdims=False)
    if cfg.router_score_fn == "softmax" and cfg.router_n_group <= 1:
        return {"bias": bias} if bias is not None else {}
    return dict(score_fn=cfg.router_score_fn, bias=bias,
                n_group=cfg.router_n_group,
                topk_group=cfg.router_topk_group)


def _grouped_enabled() -> bool:
    """Env override for the grouped prefill path (default: on for S>1)."""
    import os
    return os.environ.get("SLI_MOE_GROUPED", "1") != "0"


def _dense_layer_weight(w, li: Optional[jax.Array], dtype) -> jax.Array:
    """Materialize one layer's FFN weight densely (dequantizing INT8).

    The grouped matmuls are FLOPs-bound at prefill; streaming the INT8
    blocks once through a dequant has the same HBM cost the folded
    matmul's weight read already paid."""
    from simplellminference_tpu.ops.linear import QuantizedWeight
    if isinstance(w, QuantizedWeight):
        q, sc = w.q, w.scales
        if q.ndim == 3 and li is not None:
            q = jax.lax.dynamic_index_in_dim(q, li, 0, keepdims=False)
            sc = jax.lax.dynamic_index_in_dim(sc, li, 0, keepdims=False)
        if w.bits == 4:
            zs = w.zs
            if zs is not None and zs.ndim == 3 and li is not None:
                zs = jax.lax.dynamic_index_in_dim(zs, li, 0, keepdims=False)
            return ref_ops.dequantize_int4_groupwise(q, sc, dtype, zs=zs)
        return ref_ops.dequantize_int8_groupwise(q, sc, dtype)
    if w.ndim == 3 and li is not None:
        w = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
    return w.astype(dtype)


def moe_ffn_grouped(cfg: ModelConfig, lw: dict, li: Optional[jax.Array],
                    x: jax.Array,
                    tp_axis: Optional[str] = None) -> jax.Array:
    """Grouped-matmul MoE FFN for prefill: [B, S, H] -> [B, S, H].

    Sorts the T*k (token, expert) assignments by expert and runs the two
    FFN matmuls as ``jax.lax.ragged_dot`` grouped GEMMs over per-expert
    row groups — k/E of the folded path's FLOPs, exact same math.

    Under ``tp_axis`` each shard owns E/tp whole experts: rows routed to
    remote experts keep flowing through the local GEMMs (static shapes)
    but their gate weight is zeroed, so they contribute nothing and the
    existing psum combine stays correct. Per-shard row count is T*k
    regardless of tp, so grouped beats folded when k < E/tp and ties at
    k == E/tp (Mixtral 8x: up to tp=4).
    """
    b, s, h = x.shape
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    ie = cfg.expert_intermediate_size
    t = b * s
    xf = x.reshape(t, h)

    wr = lw["router"]
    if li is not None:
        wr = jax.lax.dynamic_index_in_dim(wr, li, 0, keepdims=False)
    topv, topi = router_topk(xf, wr, k, cfg.norm_topk_prob,
                             cfg.routed_scaling_factor,
                             **_router_kw(cfg, lw, li))         # [T, k]
    k = topi.shape[-1]

    e_loc, base = e, 0
    if tp_axis is not None:
        tp = jax.lax.axis_size(tp_axis)
        assert e % tp == 0, (e, tp)
        e_loc = e // tp
        base = jax.lax.axis_index(tp_axis) * e_loc
    local = topi - base
    hit = (local >= 0) & (local < e_loc)
    # Remote rows park in the LAST local group (sorted to the tail) with
    # zero gate weight — they ride the GEMMs but contribute nothing.
    local = jnp.where(hit, local, e_loc - 1)
    gate = jnp.where(hit, topv, 0.0).reshape(-1)                # [T*k]

    flat_e = local.reshape(-1)                                  # [T*k]
    order = jnp.argsort(flat_e)                                 # stable
    tok = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)[order]
    xg = jnp.take(xf, tok, axis=0)                              # [T*k, H]
    gsz = jnp.bincount(flat_e, length=e_loc).astype(jnp.int32)

    row_e = jnp.take(flat_e, order)                             # [T*k]
    g_row = jnp.take(gate, order)
    wgu = _dense_layer_weight(lw["w_gate_up"], li, xf.dtype)
    wgu = wgu.reshape(h, e_loc, 2 * ie).transpose(1, 0, 2)      # [E,H,2Ie]
    gu = jax.lax.ragged_dot(xg, wgu, gsz,
                            preferred_element_type=jnp.float32)
    if cfg.moe_bias:
        bgu = _layer_row(lw["w_gate_up_bias"], li).reshape(e_loc, 2 * ie)
        gu = gu + bgu[row_e].astype(gu.dtype)
    act = ref_ops.glu_act(gu[..., :ie], gu[..., ie:], cfg.hidden_act)
    act = act * g_row[:, None]

    wd = _dense_layer_weight(lw["w_down"], li, xf.dtype)
    wd = wd.reshape(e_loc, ie, h)                               # [E,Ie,H]
    yg = jax.lax.ragged_dot(act.astype(xf.dtype), wd, gsz,
                            preferred_element_type=jnp.float32)
    if cfg.moe_bias:
        # down bias per selected expert, weighted by its gate (zero for
        # remote/parked rows)
        bd = _layer_row(lw["w_down_bias"], li)                  # [E_loc,H]
        yg = yg + g_row[:, None] * bd[row_e].astype(jnp.float32)
    y = jnp.zeros((t, h), jnp.float32).at[tok].add(yg)
    if cfg.shared_expert_intermediate_size:
        y = y + _shared_expert(cfg, lw, li, xf)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.reshape(b, s, h).astype(x.dtype)


def moe_ffn(cfg: ModelConfig, lw: dict, li: Optional[jax.Array],
            x: jax.Array, tp_axis: Optional[str] = None) -> jax.Array:
    """MoE FFN on the (already-normed) input x: [B, S, H] -> [B, S, H].

    Decode (S == 1) uses the folded dense-expert matmuls (bandwidth-
    optimal); prefill routes to :func:`moe_ffn_grouped` (FLOPs-optimal).
    Under ``tp_axis`` each shard owns E/tp whole experts (folded column/
    row blocks); the returned value is the psum-combined output.
    """
    b, s, h = x.shape
    if s > 1 and _grouped_enabled():
        return moe_ffn_grouped(cfg, lw, li, x, tp_axis=tp_axis)
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    ie = cfg.expert_intermediate_size
    t = b * s
    xf = x.reshape(t, h)

    wr = lw["router"]
    if li is not None:
        wr = jax.lax.dynamic_index_in_dim(wr, li, 0, keepdims=False)
    gates = router_probs(xf, wr, k, cfg.norm_topk_prob,
                         cfg.routed_scaling_factor,
                         **_router_kw(cfg, lw, li))             # [T, E] f32

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
    if cfg.moe_bias:
        gu = gu + _layer_row(lw["w_gate_up_bias"], li)[None].astype(
            gu.dtype)
    gu = gu.reshape(t, e_loc, 2 * ie)
    act = ref_ops.glu_act(gu[..., :ie], gu[..., ie:], cfg.hidden_act)
    act = act * gates[..., None].astype(act.dtype)   # zero unselected
    y = linear(act.reshape(t, e_loc * ie), lw["w_down"], layer=li)
    if cfg.moe_bias:
        # per-expert down bias rides each selected expert: sum_e g_e*bd_e
        bd = _layer_row(lw["w_down_bias"], li)       # [E_loc, H]
        y = y + jnp.dot(gates.astype(jnp.float32),
                        bd.astype(jnp.float32)).astype(y.dtype)
    if cfg.shared_expert_intermediate_size:
        y = y + _shared_expert(cfg, lw, li, xf).astype(y.dtype)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y.reshape(b, s, h)


def _layer_row(w: jax.Array, li: Optional[jax.Array]) -> jax.Array:
    return w if li is None else jax.lax.dynamic_index_in_dim(
        w, li, 0, keepdims=False)


def _shared_expert(cfg: ModelConfig, lw: dict, li: Optional[jax.Array],
                   xf: jax.Array) -> jax.Array:
    """Qwen2-MoE shared expert: an always-on dense FFN weighted by
    sigmoid(x @ shared_gate). Returns the [T, H] pre-psum partial —
    under TP its gate_up/down are megatron column/row shards, so adding
    it before the expert-combine psum costs zero extra collectives
    (sigmoid-gate scaling commutes with the psum)."""
    gu = linear(xf, lw["shared_gate_up"], layer=li)   # [T, 2*Se_loc]
    se_loc = gu.shape[-1] // 2
    act = ref_ops.glu_act(gu[..., :se_loc], gu[..., se_loc:],
                          cfg.hidden_act)
    y = linear(act, lw["shared_down"], layer=li)      # [T, H] partial
    if "shared_gate" not in lw:
        # DeepSeek shared experts: always fully on, unweighted
        return y.astype(jnp.float32)
    wg = lw["shared_gate"]                            # [H, 1] (replicated)
    if li is not None:
        wg = jax.lax.dynamic_index_in_dim(wg, li, 0, keepdims=False)
    gate = jax.nn.sigmoid(
        jnp.dot(xf.astype(jnp.float32), wg.astype(jnp.float32)))
    return y.astype(jnp.float32) * gate


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
