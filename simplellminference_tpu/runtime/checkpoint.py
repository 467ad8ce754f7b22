"""Quantized-weight cache format: save/load the params pytree.

SURVEY.md §5 "Checkpoint/resume": the reference loads a pre-exported
headerless FP32 blob produced by an uncommitted PyTorch exporter
(model.cpp:204-245). Our equivalent artifact is a safetensors file of the
*already-quantized* params pytree (INT8 q + scales per weight) plus a JSON
config header — so a 7B INT8 load is one mmap'd read instead of
fp32-load + quantize (which needs 4x the host RAM and minutes of compute).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops.linear import QuantizedWeight

_FORMAT_VERSION = 1


def _flatten(tree: dict, prefix: str = "") -> dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path + "/"))
        elif isinstance(v, QuantizedWeight):
            # "#q" = int8; "#q4" = split-half nibble-packed int4
            out[path + ("#q4" if v.bits == 4 else "#q")] = v.q
            out[path + "#scales"] = v.scales
            if v.zs is not None:        # asymmetric (AWQ/GPTQ import)
                out[path + "#zs"] = v.zs
        else:
            out[path] = v
    return out


def _unflatten(flat: dict[str, Any]) -> dict:
    tree: dict = {}
    qparts: dict[str, dict] = {}
    for path, v in flat.items():
        if "#" in path:
            base, part = path.split("#")
            qparts.setdefault(base, {})[part] = v
            continue
        _set(tree, path, v)
    for base, parts in qparts.items():
        if "q4" in parts:
            _set(tree, base, QuantizedWeight(q=parts["q4"],
                                             scales=parts["scales"], bits=4,
                                             zs=parts.get("zs")))
        else:
            _set(tree, base, QuantizedWeight(q=parts["q"],
                                             scales=parts["scales"]))
    return tree


def _set(tree: dict, path: str, v):
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = v


def save_checkpoint(path: str, cfg: ModelConfig, params: dict,
                    metadata: Optional[dict] = None):
    """Write <path>/model.safetensors + config.json."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    tensors = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if arr.dtype == jnp.bfloat16:
            # safetensors-numpy can't express bf16: store raw bits + marker
            tensors[k + "@bf16"] = arr.view(np.uint16)
        else:
            tensors[k] = arr
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"format_version": _FORMAT_VERSION,
                   "model_config": dataclasses.asdict(cfg),
                   "metadata": metadata or {}}, f, indent=2)


def load_checkpoint(path: str, device_put=None
                    ) -> tuple[ModelConfig, dict]:
    """Load a directory written by save_checkpoint."""
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version in {path}")
    cfg = ModelConfig(**meta["model_config"])

    flat: dict[str, Any] = {}
    with safe_open(os.path.join(path, "model.safetensors"),
                   framework="np") as h:
        for name in h.keys():
            arr = h.get_tensor(name)
            if name.endswith("@bf16"):
                import ml_dtypes
                name = name[:-5]
                t = jnp.asarray(arr.view(ml_dtypes.bfloat16))
            else:
                t = jnp.asarray(arr)
            if device_put is not None:
                t = device_put(name.split("#")[0], t)
            flat[name] = t
    return cfg, _unflatten(flat)
