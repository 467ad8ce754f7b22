"""Flash prefill/decode Pallas kernels vs the dense jnp reference
(interpret mode on CPU; Mosaic-compiled on TPU — SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps

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

def test_flash_decode_auto_bk_odd_large_arena(rng):
    """smax > 1024 with smax % 256 != 0 (e.g. 1152 slots) must auto-pick a
    dividing bk instead of tripping the divisibility assert — the
    dispatcher only guarantees smax % 128 == 0."""
    b, n, kvn, d, smax = 1, 2, 1, 64, 1152
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    kv_lens = jnp.asarray([700], jnp.int32)
    got = flash_decode(q, ck, cv, kv_lens, interpret=True)  # bk=None: auto
    k = ck.transpose(0, 2, 1, 3)
    v = cv.transpose(0, 2, 1, 3)
    mask = (jnp.arange(smax)[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(q[:, None], k, v, mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

def _paged_ref(q, pool_k, pool_v, tables, kv_lens, offs, ks=None, vs=None):
    """Gather pages densely and run masked reference attention."""
    from simplellminference_tpu.memory.paged_kv import gather_dense
    ck, cv = gather_dense(pool_k, pool_v, tables, ks, vs)
    b, s = q.shape[0], q.shape[1]
    smax = ck.shape[2]
    key_pos = jnp.arange(smax)[None, None, None, :]
    q_pos = offs[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    mask = ((key_pos <= q_pos[:, None, :, None])
            & (key_pos < kv_lens[:, None, None, None]))
    return ref_ops.attention(q, ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)


@pytest.mark.parametrize("b,s,n,kvn,d,ps", [
    (2, 128, 4, 2, 64, 16),
    (1, 256, 8, 8, 128, 32),   # MHA, bq=256
    (2, 128, 4, 1, 64, 64),    # MQA
])
def test_paged_flash_prefill_matches_ref(rng, b, s, n, kvn, d, ps):
    """Chunked prefill through page tables == dense gathered reference,
    with per-row chunk offsets (batched suffix prefills)."""
    from simplellminference_tpu.ops.attention.paged_prefill import (
        paged_flash_prefill)
    mp = 8
    p = b * mp + 1
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    # each row: a page-aligned offset and a table of distinct pages
    offs = jnp.asarray([(i % 2) * ps for i in range(b)], jnp.int32)
    kv_lens = offs + jnp.asarray(
        rng.integers(1, s + 1, size=(b,)), jnp.int32)
    perm = rng.permutation(p - 1)[: b * mp] + 1
    tables = jnp.asarray(perm.reshape(b, mp), jnp.int32)

    got = paged_flash_prefill(q, pool_k, pool_v, tables, kv_lens, offs,
                              bq=128, interpret=True)
    want = _paged_ref(q, pool_k, pool_v, tables, kv_lens, offs)
    # compare only valid query rows (padded rows are garbage by contract)
    for i in range(b):
        valid = int(kv_lens[i] - offs[i])
        np.testing.assert_allclose(np.asarray(got[i, :valid]),
                                   np.asarray(want[i, :valid]),
                                   rtol=2e-3, atol=2e-3)


def test_paged_flash_prefill_quant_kv(rng):
    """INT8 KV pools with per-token scales dequantize in-kernel."""
    from simplellminference_tpu.ops.attention.paged_prefill import (
        paged_flash_prefill)
    b, s, n, kvn, d, ps, mp = 1, 128, 4, 2, 64, 32, 6
    p = 8
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (p, kvn, ps, d)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (p, kvn, ps, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (p, kvn, ps)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (p, kvn, ps)), jnp.float32)
    offs = jnp.zeros((b,), jnp.int32)
    kv_lens = jnp.asarray([100], jnp.int32)
    tables = jnp.asarray(
        rng.permutation(p)[: mp].reshape(b, mp), jnp.int32)

    got = paged_flash_prefill(q, kq, vq, tables, kv_lens, offs, bq=128,
                              interpret=True, k_scale=ks, v_scale=vs)
    want = _paged_ref(q, kq, vq, tables, kv_lens, offs, ks, vs)
    np.testing.assert_allclose(np.asarray(got[0, :100]),
                               np.asarray(want[0, :100]),
                               rtol=2e-3, atol=2e-3)


def test_paged_flash_prefill_stacked_layer(rng):
    """Stacked [L, ...] pools with a traced layer index read layer slices
    without copies (the scan-over-layers contract)."""
    from simplellminference_tpu.ops.attention.paged_prefill import (
        paged_flash_prefill)
    b, s, n, kvn, d, ps, mp, L = 1, 128, 2, 2, 64, 16, 8, 3
    p = 10
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((L, p, kvn, ps, d)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((L, p, kvn, ps, d)), jnp.float32)
    offs = jnp.zeros((b,), jnp.int32)
    kv_lens = jnp.asarray([s], jnp.int32)
    tables = jnp.asarray(rng.permutation(p)[: mp].reshape(b, mp),
                         jnp.int32)
    for li in (0, 2):
        got = paged_flash_prefill(q, pk, pv, tables, kv_lens, offs,
                                  bq=128, interpret=True,
                                  layer=jnp.asarray(li, jnp.int32))
        want = _paged_ref(q, pk[li], pv[li], tables, kv_lens, offs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


# ---------------- Gemma-2 soft cap + custom scale ----------------


def test_flash_prefill_logit_cap_and_scale(rng):
    b, s, n, kvn, d = 1, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 3
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32) * 3
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    got = flash_prefill(q, k, v, causal=True, bq=128, bk=128,
                        interpret=True, sm_scale=24.0 ** -0.5,
                        logit_cap=50.0)
    mask = np.asarray(ref_ops.causal_mask(s, s))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask),
                             scale=24.0 ** -0.5, logit_cap=50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # and the cap actually changes the output
    plain = flash_prefill(q, k, v, causal=True, bq=128, bk=128,
                          interpret=True)
    assert not np.allclose(np.asarray(got), np.asarray(plain), atol=1e-3)


def test_flash_decode_logit_cap(rng):
    b, n, kvn, d, smax = 2, 4, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32) * 3
    ck = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32) * 3
    cv = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    kv_lens = jnp.asarray([200, 77], jnp.int32)
    got = flash_decode(q, ck, cv, kv_lens, bk=128, interpret=True,
                       sm_scale=24.0 ** -0.5, logit_cap=30.0)
    mask = (jnp.arange(smax)[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(q[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask,
                             scale=24.0 ** -0.5, logit_cap=30.0)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_paged_decode_and_prefill_logit_cap(rng):
    from simplellminference_tpu.ops.attention.paged_decode import (
        paged_flash_decode)
    from simplellminference_tpu.ops.attention.paged_prefill import (
        paged_flash_prefill)
    b, s, n, kvn, d, ps, mp = 2, 128, 4, 2, 64, 16, 8
    p = b * mp + 1
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)),
                         jnp.float32) * 3
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    tables = jnp.asarray(
        (rng.permutation(p - 1)[: b * mp] + 1).reshape(b, mp), jnp.int32)
    kv_lens = jnp.asarray([100, 60], jnp.int32)
    # decode
    qd = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32) * 3
    got = paged_flash_decode(qd, pool_k, pool_v, tables, kv_lens,
                             interpret=True, sm_scale=24.0 ** -0.5,
                             logit_cap=50.0)
    want = _paged_ref(qd[:, None], pool_k, pool_v, tables, kv_lens,
                      kv_lens - 1)[:, 0]
    # _paged_ref has no cap: recompute with capped ref directly
    from simplellminference_tpu.memory.paged_kv import gather_dense
    ck, cv = gather_dense(pool_k, pool_v, tables)
    mask = (jnp.arange(ck.shape[2])[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(qd[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask,
                             scale=24.0 ** -0.5, logit_cap=50.0)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # chunked prefill
    qp = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 3
    offs = jnp.zeros((b,), jnp.int32)
    lens2 = jnp.asarray([100, 60], jnp.int32)
    got2 = paged_flash_prefill(qp, pool_k, pool_v, tables, lens2, offs,
                               bq=128, interpret=True,
                               sm_scale=24.0 ** -0.5, logit_cap=50.0)
    key_pos = jnp.arange(ck.shape[2])[None, None, None, :]
    q_pos = offs[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    mask2 = ((key_pos <= q_pos[:, None, :, None])
             & (key_pos < lens2[:, None, None, None]))
    want2 = ref_ops.attention(qp, ck.transpose(0, 2, 1, 3),
                              cv.transpose(0, 2, 1, 3), mask2,
                              scale=24.0 ** -0.5, logit_cap=50.0)
    for i in range(b):
        valid = int(lens2[i])
        np.testing.assert_allclose(np.asarray(got2[i, :valid]),
                                   np.asarray(want2[i, :valid]),
                                   rtol=2e-3, atol=2e-3)


def test_flash_kernels_attention_sinks(rng):
    """GPT-OSS sinks in all four kernels (interpret): equivalent to one
    always-visible zero-value key per head."""
    b, s, n, kvn, d = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(n), jnp.float32)

    mask = ref_ops.causal_mask(s, s)[None, None]
    want = ref_ops.attention(q, k, v, mask, sinks=sinks)
    got = flash_prefill(q, k, v, causal=True, bq=128, bk=128,
                        interpret=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    # decode against a partially-filled cache
    kc, vc = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    kv_lens = jnp.asarray([100, 37], jnp.int32)
    got_d = flash_decode(q[:, 0], kc, vc, kv_lens, bk=128,
                         interpret=True, sinks=sinks)
    m2 = (jnp.arange(s)[None, None, None, :]
          < kv_lens[:, None, None, None])
    want_d = ref_ops.attention(q[:, :1], k, v, m2, sinks=sinks)[:, 0]
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=2e-3, atol=2e-3)


def test_paged_kernels_attention_sinks(rng):
    """Sinks through the paged prefill + decode kernels (+ sliding
    window on the decode side)."""
    from simplellminference_tpu.memory.paged_kv import write_prefill
    from simplellminference_tpu.ops.attention.paged_decode import (
        paged_flash_decode)
    from simplellminference_tpu.ops.attention.paged_prefill import (
        paged_flash_prefill)
    b, s, n, kvn, d, ps = 2, 128, 4, 2, 64, 16
    npages, mp = 32, 8
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(n), jnp.float32)
    pool_k = jnp.zeros((npages, kvn, ps, d), jnp.float32)
    pool_v = jnp.zeros((npages, kvn, ps, d), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(npages - 1)[:b * mp].reshape(b, mp) + 1,
        jnp.int32)
    pool_k, pool_v, _, _ = write_prefill(pool_k, pool_v, k, v, tables)
    kv_lens = jnp.asarray([s, s - 40], jnp.int32)
    offs = jnp.zeros((b,), jnp.int32)

    got = paged_flash_prefill(q, pool_k, pool_v, tables, kv_lens, offs,
                              bq=128, interpret=True, sinks=sinks)
    want = _paged_ref_sinks(q, pool_k, pool_v, tables, kv_lens, offs,
                            sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    got_d = paged_flash_decode(q[:, 0], pool_k, pool_v, tables, kv_lens,
                               interpret=True, sinks=sinks, window=48)
    from simplellminference_tpu.memory.paged_kv import gather_dense
    ck, cv = gather_dense(pool_k, pool_v, tables)
    kp = jnp.arange(ck.shape[2])[None, None, None, :]
    m = ((kp < kv_lens[:, None, None, None])
         & (kp >= (kv_lens - 48)[:, None, None, None]))
    want_d = ref_ops.attention(q[:, :1], ck.transpose(0, 2, 1, 3),
                               cv.transpose(0, 2, 1, 3), m,
                               sinks=sinks)[:, 0]
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=2e-3, atol=2e-3)


def _paged_ref_sinks(q, pool_k, pool_v, tables, kv_lens, offs, sinks):
    from simplellminference_tpu.memory.paged_kv import gather_dense
    ck, cv = gather_dense(pool_k, pool_v, tables)
    s = q.shape[1]
    key_pos = jnp.arange(ck.shape[2])[None, None, None, :]
    q_pos = offs[:, None] + jnp.arange(s, dtype=jnp.int32)[None]
    mask = ((key_pos <= q_pos[:, None, :, None])
            & (key_pos < kv_lens[:, None, None, None]))
    return ref_ops.attention(q, ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask, sinks=sinks)
