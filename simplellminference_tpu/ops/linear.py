"""Linear layer dispatch: plain matmul or INT8-group fused dequant+matmul.

Successor of the reference's ``MatmulLayer`` (matmul.cpp:14-26), which is a
GEMV-only FP32 dispatcher. Here a weight is either a plain ``jax.Array``
[K, N] or a :class:`QuantizedWeight`; ``linear`` routes to the MXU-tiled
Pallas dequant+matmul on TPU and to the jnp reference elsewhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from simplellminference_tpu.ops import ref_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """Group-quantized weight.

    bits=8: q [K, N] int8, scales [K//G, N].
    bits=4: q [K/2, N] int8 (two nibbles per byte, split-half packed —
    see ref_ops.quantize_int4_groupwise), scales [K//G, N].

    ``zs`` (bits=4 only, AWQ/GPTQ imports): per-group zero*scale
    [K//G, N] fp32 for asymmetric quantization, w = (q - z)*s = q*s - zs.
    None for the native symmetric scheme.
    """

    q: jax.Array
    scales: jax.Array
    bits: int = dataclasses.field(default=8, metadata=dict(static=True))
    zs: jax.Array | None = None

    @property
    def shape(self):
        """LOGICAL [.., K, N] shape (unpacked contraction dim)."""
        s = self.q.shape
        if self.bits == 4:
            return (*s[:-2], s[-2] * 2, s[-1])
        return s

    @property
    def group_size(self) -> int:
        return self.shape[-2] // self.scales.shape[-2]

    @classmethod
    def quantize(cls, w: jax.Array, group_size: int = 128,
                 scale_dtype=jnp.float32, bits: int = 8) -> "QuantizedWeight":
        if bits == 4:
            q, s = ref_ops.quantize_int4_groupwise(w, group_size, scale_dtype)
        else:
            assert bits == 8, bits
            q, s = ref_ops.quantize_int8_groupwise(w, group_size, scale_dtype)
        return cls(q=q, scales=s, bits=bits)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        if self.bits == 4:
            return ref_ops.dequantize_int4_groupwise(self.q, self.scales,
                                                     dtype, zs=self.zs)
        return ref_ops.dequantize_int8_groupwise(self.q, self.scales, dtype)


Weight = jax.Array | QuantizedWeight


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# Row count above which activation quantization kicks in (when enabled):
# below it the matmul is weight-bandwidth-bound (decode bursts, LM-head
# last-token rows) and W8A8 buys nothing; at/above it (prefill) the int8
# MXU path wins (measured on the 7B gate_up shape: 1.3x at M=128, ~2x at
# M>=256; breakeven between 64 and 128).
ACT_QUANT_MIN_ROWS = 128


def _act_quant_applies(x: jax.Array, w: "QuantizedWeight",
                       act_quant: str | None) -> bool:
    if act_quant is None:
        return False
    assert act_quant == "int8", act_quant
    m = 1
    for d in x.shape[:-1]:
        m *= d
    return (w.bits == 8 and w.zs is None and m >= ACT_QUANT_MIN_ROWS)


def linear(x: jax.Array, w: Weight, out_dtype=None,
           layer: jax.Array | None = None,
           act_quant: str | None = None) -> jax.Array:
    """y = x @ w. x: [..., K]; w: [K, N] (plain or quantized).

    Stacked-layer mode: w may carry a leading L axis ([L, K, N]) with a
    traced ``layer`` index — inside a ``lax.scan`` over layers, the Pallas
    kernel indexes the stacked HBM buffer directly (scalar-prefetched
    layer id) instead of forcing XLA to materialize a per-layer copy.

    ``act_quant="int8"`` (ModelConfig.act_quant): quantize the
    activations per token and run the W8A8 int8-MXU kernel — applied
    only to compute-bound shapes (static row count >= ACT_QUANT_MIN_ROWS,
    i.e. prefill chunks) over symmetric int8 weights.
    """
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QuantizedWeight):
        stacked = w.q.ndim == 3
        if stacked:
            assert layer is not None, "stacked weight needs a layer index"
        if _act_quant_applies(x, w, act_quant):
            if _use_pallas():
                from simplellminference_tpu.ops.matmul import (
                    quantized_matmul_w8a8)
                return quantized_matmul_w8a8(
                    x, w.q, w.scales, out_dtype=out_dtype,
                    layer=layer if stacked else None)
            q, s = w.q, w.scales
            if stacked:
                q = jax.lax.dynamic_index_in_dim(q, layer, 0, False)
                s = jax.lax.dynamic_index_in_dim(s, layer, 0, False)
            return ref_ops.quantized_matmul_w8a8_ref(x, q, s,
                                                     out_dtype=out_dtype)
        if _use_pallas():
            from simplellminference_tpu.ops.matmul import quantized_matmul
            return quantized_matmul(x, w.q, w.scales, out_dtype=out_dtype,
                                    layer=layer if stacked else None,
                                    bits=w.bits, zs=w.zs)
        q, s, zs = w.q, w.scales, w.zs
        if stacked:
            q = jax.lax.dynamic_index_in_dim(q, layer, 0, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(s, layer, 0, keepdims=False)
            if zs is not None:
                zs = jax.lax.dynamic_index_in_dim(zs, layer, 0,
                                                  keepdims=False)
        if w.bits == 4:
            return ref_ops.quantized_matmul_int4_ref(x, q, s,
                                                     out_dtype=out_dtype,
                                                     zs=zs)
        return ref_ops.quantized_matmul_ref(x, q, s, out_dtype=out_dtype)
    if w.ndim == 3:
        assert layer is not None, "stacked weight needs a layer index"
        w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)
