"""Fused qkv megakernel (rms+qkv+rope+append) vs the composed reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.qkv_fused import (fused_qkv_append,
                                                  fused_qkv_available,
                                                  qkv_tiles)


@pytest.mark.parametrize("n,kvn,d,b", [(8, 8, 64, 4), (8, 2, 64, 3)])
def test_fused_qkv_append_matches_ref(rng, n, kvn, d, b):
    L, h, smax = 2, 512, 64
    li = 1
    nq = (n + 2 * kvn) * d
    wq = jnp.asarray(rng.integers(-127, 128, (L, h, nq)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, (L, 1, nq)) * 1e-2, jnp.float32)
    nw = jnp.asarray(rng.standard_normal((L, h)) * 0.1 + 1.0, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)
    positions = jnp.asarray([5, 13, 26][:b] + [0] * max(0, b - 3),
                            jnp.int32)
    sin, cos = ref_ops.rope_tables(positions, d, 10000.0)
    ck = jnp.asarray(rng.standard_normal((L, b, kvn, smax, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, b, kvn, smax, d)), jnp.float32)

    assert qkv_tiles(h, nq, d, 16) is not None
    q, nk, nv = fused_qkv_append(x, nw, wq, ws, sin, cos, ck, cv,
                                 jnp.int32(li), positions, n_heads=n,
                                 kv_heads=kvn, eps=1e-5, interpret=True)

    # composed reference
    xn = ref_ops.rmsnorm(x[:, None], nw[li], 1e-5)
    qkv = ref_ops.quantized_matmul_ref(xn[:, 0].astype(jnp.bfloat16),
                                       wq[li], ws[li],
                                       out_dtype=jnp.float32)
    qr = qkv[:, :n * d].reshape(b, 1, n, d)
    kr = qkv[:, n * d:(n + kvn) * d].reshape(b, 1, kvn, d)
    vr = qkv[:, (n + kvn) * d:].reshape(b, 1, kvn, d)
    qr = ref_ops.apply_rope(qr, sin[:, None], cos[:, None])[:, 0]
    kr = ref_ops.apply_rope(kr, sin[:, None], cos[:, None])[:, 0]

    scale = float(np.std(np.asarray(qr)))
    np.testing.assert_allclose(np.asarray(q) / scale,
                               np.asarray(qr) / scale, rtol=0, atol=4e-2)
    want_k = np.array(ck[li])
    want_v = np.array(cv[li])
    for i in range(b):
        want_k[i, :, int(positions[i])] = np.asarray(kr[i])
        want_v[i, :, int(positions[i])] = np.asarray(vr[i][:, :])
    np.testing.assert_allclose(np.asarray(nk[li]) / scale,
                               want_k / scale, rtol=0, atol=4e-2)
    np.testing.assert_allclose(np.asarray(nv[li]) / scale,
                               want_v / scale, rtol=0, atol=4e-2)
    # other layers untouched
    np.testing.assert_array_equal(np.asarray(nk[0]), np.asarray(ck[0]))


def test_fused_qkv_availability(rng):
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.ops.linear import QuantizedWeight

    cfg = ModelConfig(vocab_size=256, hidden_size=512,
                      intermediate_size=1024, num_layers=2, num_heads=8,
                      num_kv_heads=8, head_dim=64, max_seq_len=64,
                      dtype="float32")
    nq = (8 + 16) * 64
    w = QuantizedWeight(q=jnp.zeros((2, 512, nq), jnp.int8),
                        scales=jnp.zeros((2, 1, nq), jnp.float32))
    ck = jnp.zeros((2, 4, 8, 64, 64), jnp.float32)
    lw = {"wqkv": w}
    assert fused_qkv_available(lw, cfg, 4, 1, ck)
    assert not fused_qkv_available(lw, cfg, 4, 2, ck)        # prefill
    assert not fused_qkv_available({**lw, "wqkv_bias": 1}, cfg, 4, 1, ck)
