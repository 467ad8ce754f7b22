"""W8A8 (int8 activations x int8 weights) prefill matmul path.

Covers: the Pallas kernel vs the jnp reference (integer math is exact, so
only f32 summation order differs), the linear() routing gate (row-count
threshold, weight eligibility), and end-to-end model quality with
ModelConfig.act_quant="int8" (reference: the prefill matmuls this
accelerates are the successor of matmul_kernel.cu:5-38's GEMV).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # w8a8 kernel sweeps

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.linear import (ACT_QUANT_MIN_ROWS,
                                               QuantizedWeight, linear)
from simplellminference_tpu.ops.matmul import (quantize_activations_int8,
                                               quantized_matmul_w8a8)


def _quant_weight(key, k, n, gs):
    w = jax.random.normal(key, (k, n), jnp.float32) / 10
    if gs == 0:  # per-channel
        s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    else:
        s = jnp.max(jnp.abs(w.reshape(k // gs, gs, n)), axis=1) / 127.0
        s = jnp.repeat(s, 1, axis=0)
    q = jnp.round(w / jnp.repeat(s, k // s.shape[0], axis=0)
                  ).astype(jnp.int8)
    return q, s


@pytest.mark.parametrize("gs", [0, 128])
@pytest.mark.parametrize("m", [256, 384])
def test_w8a8_kernel_vs_ref(gs, m):
    k, n = 512, 384
    key = jax.random.PRNGKey(0)
    q, s = _quant_weight(key, k, n, gs)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    out = quantized_matmul_w8a8(x, q, s, interpret=True)
    ref = ref_ops.quantized_matmul_w8a8_ref(x, q, s,
                                            out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_w8a8_kernel_stacked_layer():
    k, n, m, L = 256, 256, 256, 3
    qs, ss = zip(*[_quant_weight(jax.random.PRNGKey(i), k, n, 128)
                   for i in range(L)])
    q = jnp.stack(qs)
    s = jnp.stack(ss)
    x = jax.random.normal(jax.random.PRNGKey(9), (m, k), jnp.bfloat16)
    for li in range(L):
        out = quantized_matmul_w8a8(x, q, s, interpret=True,
                                    layer=jnp.int32(li))
        ref = ref_ops.quantized_matmul_w8a8_ref(x, q[li], s[li],
                                                out_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-2, atol=1e-2)


def test_quantize_activations_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    xi, xs = quantize_activations_int8(x)
    assert xi.dtype == jnp.int8
    err = np.max(np.abs(np.asarray(xi, np.float32) * np.asarray(xs)
                        - np.asarray(x)))
    # per-row max-abs scaling: error bounded by half a quantization step
    assert err <= float(np.max(np.asarray(xs))) * 0.5 + 1e-6


def test_linear_row_gate():
    """Below ACT_QUANT_MIN_ROWS the act_quant path must be a no-op
    (decode bursts stay W8A16); at/above it the output changes to the
    W8A8 reference math on CPU."""
    k, n = 256, 256
    q, s = _quant_weight(jax.random.PRNGKey(0), k, n, 128)
    w = QuantizedWeight(q=q, scales=s)

    small = jax.random.normal(jax.random.PRNGKey(1),
                              (ACT_QUANT_MIN_ROWS - 1, k), jnp.float32)
    a = linear(small, w, act_quant="int8")
    b = linear(small, w)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    big = jax.random.normal(jax.random.PRNGKey(2),
                            (ACT_QUANT_MIN_ROWS, k), jnp.float32)
    got = linear(big, w, act_quant="int8")
    ref = ref_ops.quantized_matmul_w8a8_ref(big, q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_linear_int4_ineligible():
    """INT4 weights (and asymmetric zero-point imports) never take the
    W8A8 path — the kernel is int8-symmetric only."""
    k, n = 256, 128
    w4, _ = _quant_weight(jax.random.PRNGKey(0), k, n, 128)
    q4, s4 = ref_ops.quantize_int4_groupwise(
        jax.random.normal(jax.random.PRNGKey(1), (k, n)), 128)
    w = QuantizedWeight(q=q4, scales=s4, bits=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (512, k), jnp.float32)
    a = linear(x, w, act_quant="int8")
    b = linear(x, w)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_quality_with_act_quant():
    """Teacher-forced logits with act_quant="int8" stay close to the
    W8A16 baseline on a small random model (prefill-sized batch)."""
    import dataclasses

    from simplellminference_tpu.core.config import ModelConfig, QuantConfig
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.weights import quantize_params

    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=64, max_seq_len=512,
                      dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, QuantConfig(mode="int8",
                                                  group_size=0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 384), 1,
                                cfg.vocab_size)
    pos = jnp.arange(384, dtype=jnp.int32)[None]

    base, _ = llama.forward(cfg, qparams, tokens, pos)
    cfg8 = dataclasses.replace(cfg, act_quant="int8")
    got, _ = llama.forward(cfg8, qparams, tokens, pos)

    b = np.asarray(base, np.float32)
    g = np.asarray(got, np.float32)
    rel = np.linalg.norm(g - b) / np.linalg.norm(b)
    assert rel < 0.05, rel
    # top-1 agreement on most positions (random tiny models are the
    # worst case — near-uniform logits)
    agree = np.mean(b.argmax(-1) == g.argmax(-1))
    assert agree > 0.9, agree
