"""Native import of pre-quantized HF checkpoints (AWQ / GPTQ, 4-bit).

The reference framework loads only its own raw-FP32 blob
(/root/reference/source/model/model.cpp:204-245); the HF ecosystem's
standard 4-bit formats are AWQ (``quant_method: "awq"``, version "gemm")
and GPTQ. Both store, per linear layer::

    qweight : packed uint4 ints        (AWQ: int32 [K, N/8], packed along N;
                                        GPTQ: int32 [K/8, N], packed along K)
    qzeros  : packed uint4 zero points (int32 [K/G, N/8])
    scales  : fp16 [K/G, N]

with dequantization ``w[k, n] = (q[k, n] - z[k//G, n]) * s[k//G, n]``,
``q, z`` in [0, 15]. This module unpacks those INTO the framework's own
split-half nibble layout with NO dequant/requant round trip: the uint4
values shift by 8 into the signed int4 domain, the zero points fold into
``zs = (z - 8) * s``, and the fused Pallas kernel applies the asymmetric
correction as a per-group rank-1 update (ops/matmul.py ``has_zeros``).
Bit-exact with the checkpoint's own dequantization by construction.

Quirks encoded here (both are long-standing ecosystem conventions):
  * AWQ packs nibbles in the interleaved order [0, 2, 4, 6, 1, 3, 5, 7].
  * GPTQ stores ``qzeros`` minus one (AutoGPTQ adds 1 after unpacking).
GPTQ act-order checkpoints (``desc_act=true`` with a non-trivial g_idx)
reorder K per layer and are rejected — shuffling x at runtime would cost
more than the 4-bit savings.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.ops.linear import QuantizedWeight
from simplellminference_tpu.runtime import weights as W

_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def read_quantization_config(model_dir: str) -> Optional[dict]:
    """The ``quantization_config`` block of config.json, or None."""
    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get("quantization_config")


def _unpack_u4(packed: np.ndarray, axis: int, order: np.ndarray
               ) -> np.ndarray:
    """int32 array -> uint4 values [0, 15], expanding ``axis`` by 8.

    ``order[j]``: the output offset of the value stored in bit slot j.
    """
    shifts = (4 * np.arange(8, dtype=np.uint32))
    if packed.dtype == np.int32:                   # bit-preserving
        packed = np.ascontiguousarray(packed).view(np.uint32)
    u = packed.astype(np.uint32)[..., None]        # [..., 8] bit slots
    vals = (u >> shifts) & 0xF                     # slot-j values
    out = np.empty_like(vals)
    out[..., order] = vals                         # slot j -> offset order[j]
    # interleave into the target axis: [..., A, 8] -> [..., A*8]
    out = np.moveaxis(out, -1, axis + 1 if axis >= 0 else axis)
    s = list(packed.shape)
    s[axis] *= 8
    return out.reshape(s).astype(np.int32)


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AWQ "gemm" tensors -> (q_signed [K, N] int8, zs [G, N] f32, s f32).

    q_signed = q - 8 (int4 domain); zs = (z - 8) * s so that
    (q - z) * s == q_signed * s - zs.
    """
    q = _unpack_u4(qweight, axis=-1, order=_AWQ_ORDER) - 8    # [K, N]
    z = _unpack_u4(qzeros, axis=-1, order=_AWQ_ORDER) - 8     # [G, N]
    s = scales.astype(np.float32)
    return q.astype(np.int8), z.astype(np.float32) * s, s


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                g_idx: Optional[np.ndarray] = None
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GPTQ tensors -> (q_signed [K, N] int8, zs [G, N] f32, s f32).

    qweight packs along K (sequential nibble order); qzeros store z - 1.
    """
    k8 = qweight.shape[0]
    if g_idx is not None:
        expect = np.arange(k8 * 8, dtype=g_idx.dtype) // (
            (k8 * 8) // scales.shape[0])
        if not np.array_equal(np.asarray(g_idx), expect):
            raise NotImplementedError(
                "GPTQ act-order (desc_act) checkpoints are not supported")
    seq = np.arange(8)
    q = _unpack_u4(qweight, axis=0, order=seq) - 8            # [K, N]
    z = _unpack_u4(qzeros, axis=-1, order=seq) + 1 - 8        # [G, N]
    s = scales.astype(np.float32)
    return q.astype(np.int8), z.astype(np.float32) * s, s


def pack_split_half(q_signed: np.ndarray) -> np.ndarray:
    """[K, N] int8 in [-8, 7] -> the framework's [K/2, N] nibble layout
    (ref_ops.quantize_int4_groupwise packing)."""
    k = q_signed.shape[0]
    lo, hi = q_signed[: k // 2], q_signed[k // 2:]
    return ((lo & 0xF) | (hi << 4)).astype(np.int8)


def _fetch_quantized(fetch: Callable[[str], np.ndarray], base: str,
                     method: str) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    qw = fetch(base + ".qweight")
    qz = fetch(base + ".qzeros")
    sc = fetch(base + ".scales")
    if method == "awq":
        return unpack_awq(qw, qz, sc)
    gi = None
    try:
        gi = fetch(base + ".g_idx")
    except KeyError:
        pass
    return unpack_gptq(qw, qz, sc, gi)


def quantized_params_from_fetcher(
        cfg: ModelConfig, fetch: Callable[[str], np.ndarray], qcfg: dict,
        dtype: Optional[Any] = None,
        device_put: Optional[Callable[[str, jax.Array], jax.Array]] = None,
        ) -> dict:
    """Assemble a params tree from an AWQ/GPTQ checkpoint fetcher.

    Same contract as weights.params_from_fetcher, but quantizable paths
    come back as asymmetric-int4 QuantizedWeights (zs set) without ever
    materializing fp weights. Non-quantized tensors (embed, norms, and —
    commonly — lm_head) load as usual.
    """
    method = qcfg.get("quant_method")
    bits = qcfg.get("bits", 4)
    if method not in ("awq", "gptq"):
        raise ValueError(f"unsupported quant_method {method!r}")
    if bits != 4:
        raise NotImplementedError(f"{method} bits={bits} (only 4 supported)")

    dtype = jnp.dtype(dtype or cfg.dtype)
    pmap = W.llama_hf_param_map(cfg)
    params: dict = {}

    def load_q(hf_name: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        assert hf_name.endswith(".weight"), hf_name
        return _fetch_quantized(fetch, hf_name[: -len(".weight")], method)

    def load_plain(path: str, hf_name: str) -> jax.Array:
        t = jnp.asarray(fetch(hf_name))
        if path in W._TRANSPOSED:
            t = t.T
        if cfg.model_type == "gemma" and path.endswith("norm"):
            t = t.astype(jnp.float32) + 1.0
        return t.astype(dtype)

    def has(name: str) -> bool:
        try:
            fetch(name)
            return True
        except KeyError:
            return False

    for path, hf_names in pmap.items():
        per_layer = path.startswith("layers/")
        layers = range(cfg.num_layers) if per_layer else [None]
        quantized = path in W._QUANTIZABLE or (
            path == "lm_head"
            and has("lm_head.qweight"))
        stacked_q, stacked_zs, stacked_s, stacked_plain = [], [], [], []
        for li in layers:
            if quantized and not isinstance(hf_names, (tuple, str)):
                raise NotImplementedError(
                    f"{path}: quantized import of transform-mapped "
                    "(stacked-expert) checkpoints is not supported")
            names = hf_names if isinstance(hf_names, tuple) else (hf_names,)
            names = tuple(nm.format(i=li) if li is not None else nm
                          for nm in names)
            if quantized:
                qs, zss, ss = zip(*(load_q(nm) for nm in names))
                # multi-projection fusion concatenates along N (q/k/v,
                # gate/up — including the folded-expert [gate_e | up_e]
                # column blocks of MoE w_gate_up); per-expert w_down
                # blocks stack along K with their group rows (the
                # folded-expert row layout ops/moe.py consumes — the
                # dense decode matmul and the grouped-prefill dequant
                # both treat the result as one [E*Ie, H] matrix).
                ax = 0 if path in W._ROW_CONCAT else -1
                q = np.concatenate(qs, axis=ax) if len(qs) > 1 else qs[0]
                zsc = (np.concatenate(zss, axis=ax)
                       if len(zss) > 1 else zss[0])
                sc = np.concatenate(ss, axis=ax) if len(ss) > 1 else ss[0]
                k, g = q.shape[0], sc.shape[0]
                gs = k // g
                if gs != k and (k // 2) % gs != 0:
                    raise NotImplementedError(
                        f"{path}: group size {gs} does not divide K/2="
                        f"{k // 2} (split-half packing)")
                stacked_q.append(pack_split_half(q))
                stacked_zs.append(zsc)
                stacked_s.append(sc)
            else:
                axis = 0 if path in W._ROW_CONCAT else -1
                ts = [load_plain(path, nm) for nm in names]
                t = jnp.concatenate(ts, axis=axis) if len(ts) > 1 else ts[0]
                stacked_plain.append(t)
        if quantized:
            t = QuantizedWeight(
                q=jnp.asarray(np.stack(stacked_q) if per_layer
                              else stacked_q[0]),
                scales=jnp.asarray(np.stack(stacked_s) if per_layer
                                   else stacked_s[0]),
                bits=4,
                zs=jnp.asarray(np.stack(stacked_zs) if per_layer
                               else stacked_zs[0]))
        else:
            t = (jnp.stack(stacked_plain) if per_layer
                 else stacked_plain[0])
        if device_put is not None:
            t = jax.tree.map(lambda a: device_put(path, a), t)
        W._set_path(params, path, t)
    return params


def load_quantized_dir(model_dir: str, cfg: Optional[ModelConfig] = None,
                       dtype: Optional[Any] = None,
                       device_put=None) -> tuple[ModelConfig, dict]:
    """Load an AWQ/GPTQ HF checkpoint directory natively at 4 bits."""
    from safetensors import safe_open

    qcfg = read_quantization_config(model_dir)
    if qcfg is None:
        raise ValueError(f"{model_dir}: no quantization_config in "
                         "config.json — use load_safetensors_dir")
    if cfg is None:
        cfg = ModelConfig.from_pretrained_dir(model_dir)

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    index: dict[str, str] = {}
    handles = {}
    for f in files:
        h = safe_open(f, framework="np")
        handles[f] = h
        for name in h.keys():
            index[name] = f

    def fetch(name: str) -> np.ndarray:
        if name not in index:
            raise KeyError(f"tensor {name!r} not in checkpoint {model_dir}")
        return handles[index[name]].get_tensor(name)

    params = quantized_params_from_fetcher(cfg, fetch, qcfg, dtype=dtype,
                                           device_put=device_put)
    return cfg, params
