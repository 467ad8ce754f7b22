"""Reference raw-FP32 weight blob: loader + exporter.

The reference consumes a headerless, mmap'd raw-FP32 weight file walked in a
fixed group order with a hard-coded config (read_model_file model.cpp:204-245;
create_param_layers model.cpp:336-469). Users switching from the reference
already have such blobs — this module reads them directly into our params
pytree (and can write one back, which also gives the tests a round-trip
oracle without real checkpoints).

Blob layout contract (offsets in FP32 elements; SURVEY.md §2.6):

    [0]                 embedding [V, H]   — LM head is TIED to this
                        (both read offset 0, model.cpp:342-358)
    then                rmsnorm × (2L+1) [H] each — layer i's input norm at
                        index 2i, post-attn norm at 2i+1, final norm at 2L
                        (forward() indexing, model.cpp:52/93/131)
    then per group ×L   wq [Hq, H], wk [Hkv, H], wv [Hkv, H], wo [H, Hq],
                        up [I, H], gate [I, H], down [H, I]
                        (model.cpp:372-462; note up BEFORE gate)

All matrices are row-major ``[out, in]`` (the reference GEMV is y = W·x with
W [dim0, dim1] = [out, in], matmul_kernel.cpp:5-28) — the same orientation
as HF Linear weights, so the import transposes to our contraction-first
[K, N] and fuses q|k|v and gate|up exactly like the safetensors path
(runtime/weights.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig, QuantConfig
from simplellminference_tpu.ops.linear import QuantizedWeight


@dataclasses.dataclass(frozen=True)
class BlobEntry:
    name: str            # e.g. "wq.3", "norm.5", "embed"
    shape: tuple         # row-major [out, in] / [H]
    offset: int          # in FP32 elements from file start


def blob_layout(cfg: ModelConfig) -> list[BlobEntry]:
    """The reference's fixed walk order as (name, shape, offset) entries."""
    v, h, i = cfg.vocab_size, cfg.hidden_size, cfg.intermediate_size
    hq, hkv, L = cfg.q_size, cfg.kv_size, cfg.num_layers
    entries: list[BlobEntry] = []
    pos = 0

    def add(name: str, shape: tuple):
        nonlocal pos
        entries.append(BlobEntry(name, shape, pos))
        pos += int(np.prod(shape))

    add("embed", (v, h))                      # LM head ties here (Q5)
    for n in range(2 * L + 1):
        add(f"norm.{n}", (h,))
    for group, shape in (("wq", (hq, h)), ("wk", (hkv, h)), ("wv", (hkv, h)),
                         ("wo", (h, hq)), ("up", (i, h)), ("gate", (i, h)),
                         ("down", (h, i))):
        for li in range(L):
            add(f"{group}.{li}", shape)
    return entries


def blob_num_floats(cfg: ModelConfig) -> int:
    last = blob_layout(cfg)[-1]
    return last.offset + int(np.prod(last.shape))


def load_reference_blob(path: str, cfg: ModelConfig,
                        quant: QuantConfig = QuantConfig(),
                        dtype: Optional[Any] = None) -> dict:
    """mmap a reference-format blob and assemble our params pytree.

    The file must be exactly ``blob_num_floats(cfg) * 4`` bytes — unlike the
    reference (which would silently read garbage on a mismatched config,
    model.cpp:219-230) a size mismatch is a hard error.
    """
    from simplellminference_tpu.runtime.weights import quantize_params

    dtype = jnp.dtype(dtype or cfg.dtype)
    want = blob_num_floats(cfg)
    blob = np.memmap(path, dtype=np.float32, mode="r")
    if blob.size != want:
        raise ValueError(
            f"blob {path} has {blob.size} fp32 elements, config "
            f"{cfg.model_type} needs {want} — wrong config or truncated file")

    ents = {e.name: e for e in blob_layout(cfg)}

    def fetch(name: str) -> np.ndarray:
        e = ents[name]
        n = int(np.prod(e.shape))
        return np.asarray(blob[e.offset:e.offset + n]).reshape(e.shape)

    def mat(name: str) -> jax.Array:          # [out,in] -> our [K, N]
        return jnp.asarray(fetch(name).T, dtype)

    L = cfg.num_layers
    params: dict = {
        "embed": jnp.asarray(fetch("embed"), dtype),
        "layers": {
            "input_norm": jnp.stack(
                [jnp.asarray(fetch(f"norm.{2 * i}"), dtype) for i in range(L)]),
            "post_norm": jnp.stack(
                [jnp.asarray(fetch(f"norm.{2 * i + 1}"), dtype)
                 for i in range(L)]),
            "wqkv": jnp.stack(
                [jnp.concatenate([mat(f"wq.{i}"), mat(f"wk.{i}"),
                                  mat(f"wv.{i}")], axis=-1)
                 for i in range(L)]),
            "wo": jnp.stack([mat(f"wo.{i}") for i in range(L)]),
            "w_gate_up": jnp.stack(
                [jnp.concatenate([mat(f"gate.{i}"), mat(f"up.{i}")], axis=-1)
                 for i in range(L)]),
            "w_down": jnp.stack([mat(f"down.{i}") for i in range(L)]),
        },
        "final_norm": jnp.asarray(fetch(f"norm.{2 * L}"), dtype),
    }
    # The blob format is always tied (Q5). If the config says untied, the
    # head is still the embedding — materialize it so the graph matches.
    if not cfg.tie_word_embeddings:
        params["lm_head"] = params["embed"].T
    if quant.enabled:
        params = quantize_params(params, quant)
    return params


def _dequant(w) -> np.ndarray:
    if isinstance(w, QuantizedWeight):
        return np.asarray(w.dequantize(jnp.float32))
    return np.asarray(jnp.asarray(w, jnp.float32))


def save_reference_blob(path: str, cfg: ModelConfig, params: dict) -> None:
    """Export a params pytree to the reference blob format (FP32).

    Inverse of :func:`load_reference_blob`; quantized weights are
    dequantized first. Useful for migration tests and for driving the
    reference binary with weights produced here.
    """
    hq, hkv = cfg.q_size, cfg.kv_size
    L = cfg.num_layers
    lp = params["layers"]

    def rows(name: str) -> Iterator[np.ndarray]:
        if name == "embed":
            yield _dequant(params["embed"])
            return
        if name.startswith("norm."):
            n = int(name.split(".")[1])
            if n == 2 * L:
                yield _dequant(params["final_norm"])
            elif n % 2 == 0:
                yield _dequant(lp["input_norm"][n // 2])
            else:
                yield _dequant(lp["post_norm"][n // 2])
            return
        group, li = name.split(".")
        li = int(li)
        if group in ("wq", "wk", "wv"):
            qkv = _dequant(_index_layer(lp["wqkv"], li))     # [H, Hq+2Hkv]
            lo = {"wq": 0, "wk": hq, "wv": hq + hkv}[group]
            hi = lo + (hq if group == "wq" else hkv)
            yield qkv[:, lo:hi].T
        elif group == "wo":
            yield _dequant(_index_layer(lp["wo"], li)).T
        elif group in ("gate", "up"):
            gu = _dequant(_index_layer(lp["w_gate_up"], li))  # [H, 2I]
            i_sz = cfg.intermediate_size
            sl = slice(0, i_sz) if group == "gate" else slice(i_sz, 2 * i_sz)
            yield gu[:, sl].T
        elif group == "down":
            yield _dequant(_index_layer(lp["w_down"], li)).T
        else:  # pragma: no cover
            raise KeyError(name)

    with open(path, "wb") as f:
        for e in blob_layout(cfg):
            (arr,) = tuple(rows(e.name))
            assert tuple(arr.shape) == tuple(e.shape), (e.name, arr.shape,
                                                        e.shape)
            f.write(np.ascontiguousarray(arr, np.float32).tobytes())


def _index_layer(w, li: int):
    """Index the stacked-L axis of a plain or quantized weight."""
    if isinstance(w, QuantizedWeight):
        return QuantizedWeight(q=w.q[li], scales=w.scales[li],
                               bits=w.bits,
                               zs=None if w.zs is None else w.zs[li])
    return w[li]
