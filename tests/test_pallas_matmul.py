"""Pallas fused dequant+matmul vs the jnp reference (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU — SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.matmul import quantized_matmul


@pytest.mark.parametrize("m,k,n,gs", [
    (1, 256, 384, 128),      # decode GEMV shape
    (8, 512, 256, 128),      # small batch decode
    (24, 256, 128, 64),      # m not a multiple of 16 -> padding path
    (64, 384, 512, 128),     # prefill-ish
    (128, 256, 256, 256),    # one group per K block
    (8, 512, 256, 512),      # per-output-channel (group == K)
    (16, 1024, 384, 1024),   # per-channel spanning multiple K blocks
])
def test_quantized_matmul_matches_ref(rng, m, k, n, gs):
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    q, s = ref_ops.quantize_int8_groupwise(w, gs)
    got = quantized_matmul(x, q, s, out_dtype=jnp.float32, interpret=True)
    want = ref_ops.quantized_matmul_ref(x, q, s, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_quantized_matmul_batched_x(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    q, s = ref_ops.quantize_int8_groupwise(w, 128)
    got = quantized_matmul(x, q, s, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (2, 3, 128)
    want = ref_ops.quantized_matmul_ref(x, q, s, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
