"""Flash prefill/decode Pallas kernels vs the dense jnp reference
(interpret mode on CPU; Mosaic-compiled on TPU — SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention.flash_decode import flash_decode
from simplellminference_tpu.ops.attention.flash_prefill import flash_prefill


@pytest.mark.parametrize("b,s,n,kvn,d,bq,bk", [
    (1, 256, 4, 2, 64, 128, 128),
    (2, 256, 4, 4, 128, 128, 128),    # MHA
    (1, 512, 8, 1, 64, 256, 128),     # MQA, uneven blocks
])
def test_flash_prefill_matches_ref(rng, b, s, n, kvn, d, bq, bk):
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    got = flash_prefill(q, k, v, causal=True, bq=bq, bk=bk, interpret=True)
    mask = np.asarray(ref_ops.causal_mask(s, s))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_prefill_cache_layout(rng):
    b, s, n, kvn, d = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)
    got = flash_prefill(q, kT, vT, causal=True, bq=128, bk=128,
                        kv_layout="bnsd", interpret=True)
    want = flash_prefill(q, k, v, causal=True, bq=128, bk=128,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("b,n,kvn,d,smax", [
    (2, 4, 2, 64, 256),
    (3, 8, 8, 128, 512),    # MHA
    (1, 8, 1, 64, 256),     # MQA
])
def test_flash_decode_matches_ref(rng, b, n, kvn, d, smax):
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    kv_lens = jnp.asarray(
        rng.integers(1, smax + 1, size=(b,)), jnp.int32)

    got = flash_decode(q, ck, cv, kv_lens, bk=128, interpret=True)

    # reference: mask invalid slots
    k = ck.transpose(0, 2, 1, 3)
    v = cv.transpose(0, 2, 1, 3)
    mask = (jnp.arange(smax)[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(q[:, None], k, v, mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_decode_len_one(rng):
    """Degenerate case: only one valid slot."""
    b, n, kvn, d, smax = 1, 4, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    got = flash_decode(q, ck, cv, jnp.asarray([1], jnp.int32), bk=128,
                       interpret=True)
    # attention over a single slot == v at that slot (per kv head group)
    want = cv[:, :, 0, :]                      # [B, kvN, D]
    want = jnp.repeat(want, n // kvn, axis=1)  # [B, N, D]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
