"""Fused FFN megakernel vs the unfused reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # megakernel interpret sweeps

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.ffn_fused import (ffn_tiles, fused_ffn,
                                                  fused_ffn_available)


def _ref(x, nw, q1, s1, q2, s2, li, eps):
    xn = ref_ops.rmsnorm(x[None], nw[li], eps)[0]
    gu = ref_ops.quantized_matmul_ref(xn, q1[li], s1[li],
                                      out_dtype=jnp.float32)
    inter = q2.shape[1]
    swi = ref_ops.swiglu(gu[:, :inter], gu[:, inter:])
    dn = ref_ops.quantized_matmul_ref(swi.astype(jnp.bfloat16), q2[li],
                                      s2[li], out_dtype=jnp.float32)
    return (x.astype(jnp.float32) + dn).astype(x.dtype)


@pytest.mark.parametrize("h,inter,m", [(512, 1408, 8), (256, 1024, 3)])
def test_fused_ffn_matches_ref(rng, h, inter, m):
    L = 3
    li = 1
    q1 = jnp.asarray(rng.integers(-127, 128, (L, h, 2 * inter)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, 2 * inter)) * 1e-2,
                     jnp.float32)
    q2 = jnp.asarray(rng.integers(-127, 128, (L, inter, h)), jnp.int8)
    s2 = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, h)) * 1e-2, jnp.float32)
    nw = jnp.asarray(rng.standard_normal((L, h)) * 0.1 + 1.0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.bfloat16)

    assert ffn_tiles(h, inter, max(16, m)) is not None
    got = np.asarray(fused_ffn(x, nw, q1, s1, q2, s2, jnp.int32(li),
                               eps=1e-5, interpret=True), np.float32)
    want = np.asarray(_ref(x, nw, q1, s1, q2, s2, li, 1e-5), np.float32)
    # bf16 intermediates on a wide dynamic range: compare relative to the
    # output scale, not element-wise (both sides round h to bf16, but in
    # different accumulation orders).
    scale = float(np.std(want))
    np.testing.assert_allclose(got / scale, want / scale,
                               rtol=0, atol=8e-2)


def test_fused_ffn_availability_gates():
    from simplellminference_tpu.ops.linear import QuantizedWeight

    q1 = jnp.zeros((2, 512, 2816), jnp.int8)
    s1 = jnp.zeros((2, 1, 2816), jnp.float32)
    q2 = jnp.zeros((2, 1408, 512), jnp.int8)
    s2 = jnp.zeros((2, 1, 512), jnp.float32)
    lw = {"w_gate_up": QuantizedWeight(q=q1, scales=s1),
          "w_down": QuantizedWeight(q=q2, scales=s2)}
    assert fused_ffn_available(lw, 512, 1408, 8)
    assert not fused_ffn_available(lw, 512, 1408, 512)  # prefill-sized m
    # groupwise scales -> unavailable
    lw2 = {"w_gate_up": QuantizedWeight(
        q=q1, scales=jnp.zeros((2, 4, 2816), jnp.float32)),
        "w_down": QuantizedWeight(q=q2, scales=s2)}
    assert not fused_ffn_available(lw2, 512, 1408, 8)


def test_fused_wo_ffn_matches_ref(rng):
    from simplellminference_tpu.ops.ffn_fused import (fused_wo_ffn,
                                                      fused_wo_ffn_available)
    from simplellminference_tpu.ops.linear import QuantizedWeight

    L, h, nd, inter, m = 2, 512, 384 + 128, 1408, 8
    li = 1
    wq = jnp.asarray(rng.integers(-127, 128, (L, nd, h)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, h)) * 1e-2, jnp.float32)
    q1 = jnp.asarray(rng.integers(-127, 128, (L, h, 2 * inter)), jnp.int8)
    s1 = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, 2 * inter)) * 1e-2,
                     jnp.float32)
    q2 = jnp.asarray(rng.integers(-127, 128, (L, inter, h)), jnp.int8)
    s2 = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, h)) * 1e-2, jnp.float32)
    nw = jnp.asarray(rng.standard_normal((L, h)) * 0.1 + 1.0, jnp.float32)
    attn = jnp.asarray(rng.standard_normal((m, nd)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((m, h)), jnp.bfloat16)

    lw = {"wo": QuantizedWeight(q=wq, scales=ws),
          "w_gate_up": QuantizedWeight(q=q1, scales=s1),
          "w_down": QuantizedWeight(q=q2, scales=s2)}
    assert fused_wo_ffn_available(lw, nd, h, inter, m)

    got = np.asarray(fused_wo_ffn(attn, x, wq, ws, nw, q1, s1, q2, s2,
                                  jnp.int32(li), eps=1e-5, interpret=True),
                     np.float32)

    wo_out = ref_ops.quantized_matmul_ref(attn, wq[li], ws[li],
                                          out_dtype=jnp.float32)
    xres = (x.astype(jnp.float32) + wo_out).astype(jnp.bfloat16)
    want = np.asarray(_ref(xres, nw, q1, s1, q2, s2, li, 1e-5), np.float32)

    scale = float(np.std(want))
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=8e-2)
