"""Multi-LoRA adapter serving: stacked low-rank deltas selected per slot.

The reference has a single hard-wired weight set (mmap blob,
`/root/reference/source/model/model.cpp:204-245`); production serving
wants many fine-tuned variants of one base model live at once. TPU-first
design: all adapters stack on a leading axis ([A, L, K, R] / [A, L, R, N]
per target) and ride in the params pytree, each decode row gathers ITS
adapter's matrices by a per-slot index — one compiled graph regardless of
which adapters are in the batch (vLLM's gathered-BGMV formulation, not
per-adapter kernel launches).

Conventions:
  * adapter index 0 is the reserved null adapter (zero scaling) — rows
    without a LoRA cost two rank-R einsums of zeros but keep the graph
    static;
  * the fused q/k/v and gate/up projections fold their per-projection
    A/B pairs block-diagonally: A = [A_q | A_k | A_v] ([K, 3R]) and B is
    block placed so delta = x @ A @ B lands on the fused output columns;
  * HF PEFT checkpoints load via :func:`load_peft_adapter`
    (adapter_config.json + adapter_model.safetensors).

LoRA applies additively AFTER each base projection:
    y = x @ W + scaling[idx] * (x @ A[idx]) @ B[idx]
so quantized base weights are untouched (no dequant-merge) and one
request's adapter never perturbs another row's math.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig

# targets in our fused-layout params tree -> HF PEFT module names
_TARGETS = {
    "wqkv": ("q_proj", "k_proj", "v_proj"),
    "wo": ("o_proj",),
    "w_gate_up": ("gate_proj", "up_proj"),
    "w_down": ("down_proj",),
}


def _out_dims(cfg: ModelConfig, target: str) -> tuple[int, ...]:
    n, kvn, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    return {
        "wqkv": (n * d, kvn * d, kvn * d),
        "wo": (cfg.hidden_size,),
        "w_gate_up": (cfg.intermediate_size, cfg.intermediate_size),
        "w_down": (cfg.hidden_size,),
    }[target]


def _in_dim(cfg: ModelConfig, target: str) -> int:
    return {
        "wqkv": cfg.hidden_size,
        "wo": cfg.num_heads * cfg.head_dim,
        "w_gate_up": cfg.hidden_size,
        "w_down": cfg.intermediate_size,
    }[target]


class LoRAAdapter:
    """One adapter: per-target per-layer (A [K, R], B [R, N]) numpy pairs
    in the FUSED layout (block-diagonal fold already applied) + scaling."""

    def __init__(self, rank: int, scaling: float,
                 weights: dict[str, tuple[np.ndarray, np.ndarray]]):
        self.rank = rank            # folded rank (e.g. 3r for wqkv)
        self.scaling = scaling      # alpha / r
        self.weights = weights      # target -> (A [L, K, R], B [L, R, N])


def from_arrays(cfg: ModelConfig, per_target: dict[str, dict[str, Any]],
                rank: int, alpha: float) -> LoRAAdapter:
    """Build an adapter from per-projection A/B arrays.

    ``per_target``: {hf_proj_name: {"a": [L, K, r], "b": [L, r, n_out]}}
    with hf_proj_name in q_proj/k_proj/v_proj/o_proj/gate_proj/up_proj/
    down_proj. Missing projections contribute zero blocks.
    """
    weights = {}
    L = cfg.num_layers
    for target, projs in _TARGETS.items():
        present = [p for p in projs if p in per_target]
        if not present:
            continue
        k = _in_dim(cfg, target)
        outs = _out_dims(cfg, target)
        r_fold = rank * len(projs)
        a = np.zeros((L, k, r_fold), np.float32)
        b = np.zeros((L, r_fold, sum(outs)), np.float32)
        col0 = np.cumsum((0,) + outs[:-1]) if len(outs) > 1 else [0]
        for j, p in enumerate(projs):
            if p not in per_target:
                continue
            pa = np.asarray(per_target[p]["a"], np.float32)  # [L, K, r]
            pb = np.asarray(per_target[p]["b"], np.float32)  # [L, r, n]
            assert pa.shape == (L, k, rank), (p, pa.shape, (L, k, rank))
            assert pb.shape == (L, rank, outs[j]), (p, pb.shape)
            a[:, :, j * rank:(j + 1) * rank] = pa
            b[:, j * rank:(j + 1) * rank,
              col0[j]:col0[j] + outs[j]] = pb
        weights[target] = (a, b)
    return LoRAAdapter(rank=max(
        (rank * len(_TARGETS[t]) for t in weights), default=rank),
        scaling=alpha / rank, weights=weights)


def load_peft_adapter(cfg: ModelConfig, adapter_dir: str) -> LoRAAdapter:
    """Load a HuggingFace PEFT LoRA checkpoint directory
    (adapter_config.json + adapter_model.safetensors)."""
    from safetensors import safe_open

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    rank = int(acfg["r"])
    alpha = float(acfg.get("lora_alpha", rank))
    if acfg.get("use_rslora"):
        # rsLoRA scales by alpha / sqrt(r)
        scaling_alpha = alpha * rank / (rank ** 0.5)
    else:
        scaling_alpha = alpha

    path = os.path.join(adapter_dir, "adapter_model.safetensors")
    tensors = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            tensors[key] = f.get_tensor(key)

    per_target: dict[str, dict[str, list]] = {}
    L = cfg.num_layers
    for proj in [p for ps in _TARGETS.values() for p in ps]:
        a_list, b_list = [], []
        for i in range(L):
            stem = None
            for prefix in ("base_model.model.model.layers",
                           "base_model.model.layers", "model.layers"):
                cand = f"{prefix}.{i}."
                sub = ("self_attn." if proj in ("q_proj", "k_proj",
                                                "v_proj", "o_proj")
                       else "mlp.")
                key_a = cand + sub + proj + ".lora_A.weight"
                if key_a in tensors:
                    stem = cand + sub + proj
                    break
            if stem is None:
                break
            # HF stores lora_A [r, K], lora_B [N, r]; ours are transposed
            a_list.append(tensors[stem + ".lora_A.weight"].T)
            b_list.append(tensors[stem + ".lora_B.weight"].T)
        if len(a_list) == L:
            per_target[proj] = {"a": np.stack(a_list),
                                "b": np.stack(b_list)}
    if not per_target:
        raise ValueError(
            f"no LoRA tensors recognized in {path}; expected "
            "…layers.{{i}}.self_attn/mlp.<proj>.lora_A.weight names")
    return from_arrays(cfg, per_target, rank, scaling_alpha)


def stack_adapters(cfg: ModelConfig,
                   adapters: dict[str, LoRAAdapter],
                   dtype: Any = jnp.bfloat16,
                   ) -> tuple[dict[str, Any], dict[str, int]]:
    """Stack named adapters into the device tree Engine/forward consume.

    Returns (lora_tree, name -> index). Index 0 is the null adapter
    (zeros, scaling 0); adapters with different ranks zero-pad to the
    max. Targets appear if ANY adapter has them."""
    names = sorted(adapters)
    n = len(names) + 1
    targets = sorted({t for ad in adapters.values() for t in ad.weights})
    rmax = {t: max(ad.weights[t][0].shape[-1]
                   for ad in adapters.values() if t in ad.weights)
            for t in targets}
    L = cfg.num_layers
    tree: dict[str, Any] = {
        "scaling": jnp.asarray(
            [0.0] + [adapters[nm].scaling for nm in names], jnp.float32)}
    for t in targets:
        k = _in_dim(cfg, t)
        n_out = sum(_out_dims(cfg, t))
        a = np.zeros((n, L, k, rmax[t]), np.float32)
        b = np.zeros((n, L, rmax[t], n_out), np.float32)
        for ai, nm in enumerate(names, start=1):
            if t not in adapters[nm].weights:
                continue
            wa, wb = adapters[nm].weights[t]
            a[ai, :, :, :wa.shape[-1]] = wa
            b[ai, :, :wb.shape[1], :] = wb
        tree[t] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    index = {nm: i for i, nm in enumerate(names, start=1)}
    return tree, index


def apply_lora(lora: Optional[dict], lora_idx: Optional[jax.Array],
               target: str, x: jax.Array, li: Optional[jax.Array],
               y: jax.Array) -> jax.Array:
    """y + scaling[idx] * (x @ A[idx, li]) @ B[idx, li].

    x: [B, S, K]; y: [B, S, N]; lora_idx: [B] int32 (0 = null adapter).
    ``li`` traced layer index (None = single-layer leaves). No-op when
    the engine has no adapters for this target (static)."""
    if lora is None or lora_idx is None or target not in lora:
        return y
    a, b = lora[target]["a"], lora[target]["b"]
    if li is not None:
        a = jax.lax.dynamic_index_in_dim(a, li, 1, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(b, li, 1, keepdims=False)
    a_rows = a[lora_idx]                       # [B, K, R]
    b_rows = b[lora_idx]                       # [B, R, N]
    scale = lora["scaling"][lora_idx]          # [B]
    mid = jnp.einsum("bsk,bkr->bsr", x.astype(a_rows.dtype), a_rows)
    delta = jnp.einsum("bsr,brn->bsn", mid, b_rows)
    return y + (delta.astype(jnp.float32)
                * scale[:, None, None]).astype(y.dtype)
