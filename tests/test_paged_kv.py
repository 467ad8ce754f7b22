"""Paged KV cache: write/gather correctness, paged flash-decode kernel, and
paged forward parity vs the dense-cache path (SURVEY.md §4.5/§7.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.memory import paged_kv as pkv
from simplellminference_tpu.memory.allocator import PageAllocator
from simplellminference_tpu.memory.paged_kv import PagedKVCache
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention.paged_decode import (
    paged_flash_decode)


def test_write_prefill_then_gather_roundtrip(rng):
    p, kvn, ps, d = 16, 2, 8, 32
    b, s = 2, 20
    pool_k = jnp.zeros((p, kvn, ps, d), jnp.float32)
    pool_v = jnp.zeros((p, kvn, ps, d), jnp.float32)
    new_k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    # seq0 -> pages 0,1,2 ; seq1 -> pages 5,6,7 (3 pages for 20 tokens)
    tables = jnp.asarray([[0, 1, 2, -1], [5, 6, 7, -1]], jnp.int32)
    pool_k, pool_v, _, _ = pkv.write_prefill(pool_k, pool_v, new_k, new_v, tables)
    ck, cv = pkv.gather_dense(pool_k, pool_v, tables)
    # gathered [B, kvN, MP*ps, D]; first s slots must equal the input
    np.testing.assert_allclose(
        np.asarray(ck[:, :, :s]), np.asarray(new_k.transpose(0, 2, 1, 3)))
    np.testing.assert_allclose(
        np.asarray(cv[:, :, :s]), np.asarray(new_v.transpose(0, 2, 1, 3)))


def test_write_decode_places_token(rng):
    p, kvn, ps, d = 8, 2, 8, 16
    pool_k = jnp.zeros((p, kvn, ps, d), jnp.float32)
    pool_v = jnp.zeros((p, kvn, ps, d), jnp.float32)
    tables = jnp.asarray([[3, 4], [6, -1]], jnp.int32)
    new_k = jnp.asarray(rng.standard_normal((2, kvn, d)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((2, kvn, d)), jnp.float32)
    positions = jnp.asarray([9, 2], jnp.int32)   # page 4 slot 1; page 6 slot 2
    pool_k, pool_v, _, _ = pkv.write_decode(pool_k, pool_v, new_k, new_v,
                                            tables, positions)
    np.testing.assert_allclose(np.asarray(pool_k[4, :, 1]),
                               np.asarray(new_k[0]))
    np.testing.assert_allclose(np.asarray(pool_k[6, :, 2]),
                               np.asarray(new_k[1]))
    # nothing else written
    assert float(jnp.abs(pool_k).sum()) == pytest.approx(
        float(jnp.abs(new_k).sum()), rel=1e-5)


def test_paged_flash_decode_matches_gather_ref(rng):
    p, kvn, ps, d = 32, 2, 128, 64
    b, n, mp = 3, 4, 4
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    perm = rng.permutation(p)[:b * mp].reshape(b, mp)
    tables = jnp.asarray(perm, jnp.int32)
    kv_lens = jnp.asarray([1, 200, mp * ps], jnp.int32)

    got = paged_flash_decode(q, pool_k, pool_v, tables, kv_lens,
                             interpret=True)

    ck, cv = pkv.gather_dense(pool_k, pool_v, tables)
    mask = (jnp.arange(mp * ps)[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(q[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_paged_flash_decode_int8_kv_matches_gather_ref(rng):
    """INT8 KV pools with per-token-head scales: in-kernel dequant path."""
    p, kvn, ps, d = 16, 2, 16, 64
    b, n, mp = 2, 4, 4
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    qk, sk = pkv.quantize_kv(kf)
    qv, sv = pkv.quantize_kv(vf)
    perm = rng.permutation(p)[:b * mp].reshape(b, mp)
    tables = jnp.asarray(perm, jnp.int32)
    kv_lens = jnp.asarray([5, mp * ps], jnp.int32)

    got = paged_flash_decode(q, qk, qv, tables, kv_lens, interpret=True,
                             k_scale=sk, v_scale=sv)

    ck, cv = pkv.gather_dense(qk, qv, tables, sk, sv)
    mask = (jnp.arange(mp * ps)[None, None, None, :]
            < kv_lens[:, None, None, None])
    want = ref_ops.attention(q[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_paged_matches_dense(tiny_model, rng):
    """Prefill + N decode steps through pages == dense-cache path."""
    cfg, params = tiny_model
    ps, mp, num_pages = 8, 8, 32
    b = 2
    prompts = [[1, 2, 3, 4, 5, 6, 7], [10, 11, 12]]
    lens = [len(x) for x in prompts]
    bucket = 8

    pa = PageAllocator(num_pages, ps, b, mp)
    for i, ln in enumerate(lens):
        assert pa.alloc_seq(i, ln)
    cache = PagedKVCache.create(cfg.num_layers, num_pages, cfg.num_kv_heads,
                                ps, cfg.head_dim, jnp.float32)

    tokens = np.zeros((b, bucket), np.int32)
    for i, pr in enumerate(prompts):
        tokens[i, :len(pr)] = pr
    positions = np.broadcast_to(np.arange(bucket, dtype=np.int32),
                                (b, bucket))
    tables = jnp.asarray(pa.table())
    kv_lens = jnp.asarray(lens, jnp.int32)

    logits, cache = llama.forward_paged(
        cfg, params, jnp.asarray(tokens), jnp.asarray(positions), cache,
        tables, kv_lens, prefill=True)
    last = np.stack([np.asarray(logits)[i, lens[i] - 1] for i in range(b)])

    # dense reference
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.core.config import SamplingParams
    gen = Generator(cfg, params, max_batch=b, max_seq=64,
                    kv_dtype=jnp.float32)
    dense_cache = gen.new_cache(b)
    dense_last, dense_cache, _ = gen.prefill(dense_cache, prompts)
    np.testing.assert_allclose(last, np.asarray(dense_last),
                               rtol=2e-4, atol=2e-4)

    # 5 greedy decode steps, parity at every step
    toks = last.argmax(-1).astype(np.int32)
    dtoks = np.asarray(dense_last).argmax(-1).astype(np.int32)
    pos = np.asarray(lens, np.int32)
    for step in range(5):
        assert (toks == dtoks).all()
        for i in range(b):
            assert pa.extend(i, int(pos[i]) + 1)
        tables = jnp.asarray(pa.table())
        logits, cache = llama.forward_paged(
            cfg, params, jnp.asarray(toks[:, None]),
            jnp.asarray(pos[:, None]), cache, tables,
            jnp.asarray(pos + 1), prefill=False)
        dlogits, dense_cache = gen._decode_fn(
            params, jnp.asarray(dtoks[:, None]), jnp.asarray(pos[:, None]),
            dense_cache, jnp.asarray(pos + 1))
        np.testing.assert_allclose(np.asarray(logits[:, 0]),
                                   np.asarray(dlogits),
                                   rtol=3e-4, atol=3e-4)
        toks = np.asarray(logits[:, 0]).argmax(-1).astype(np.int32)
        dtoks = np.asarray(dlogits).argmax(-1).astype(np.int32)
        pos = pos + 1


def test_int8_kv_roundtrip_error_bounded(rng):
    """INT8 KV with per-token-head scales: dequant error <= scale/2."""
    p, kvn, ps, d = 8, 2, 8, 32
    b, s = 2, 12
    pool_k = jnp.zeros((p, kvn, ps, d), jnp.int8)
    pool_v = jnp.zeros((p, kvn, ps, d), jnp.int8)
    pool_ks = jnp.zeros((p, kvn, ps), jnp.float32)
    pool_vs = jnp.zeros((p, kvn, ps), jnp.float32)
    new_k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    tables = jnp.asarray([[0, 1, -1], [4, 5, -1]], jnp.int32)
    pool_k, pool_v, pool_ks, pool_vs = pkv.write_prefill(
        pool_k, pool_v, new_k, new_v, tables, pool_ks, pool_vs)
    ck, cv = pkv.gather_dense(pool_k, pool_v, tables, pool_ks, pool_vs)
    want = np.asarray(new_k.transpose(0, 2, 1, 3))
    got = np.asarray(ck[:, :, :s])
    scales = np.abs(want).max(-1, keepdims=True) / 127.0
    assert (np.abs(got - want) <= scales * 0.51 + 1e-6).all()


@pytest.mark.parametrize("kv_dtype", ["fp8", "int8"])
def test_quantized_kv_generation_close_to_bf16(tiny_model, kv_dtype):
    """Engine with fp8/int8 KV: runs end-to-end; early greedy tokens match
    the f32-KV path on a tiny model (quantization noise may diverge later
    tokens; the PPL harness is the real quality gate)."""
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine import Engine
    cfg, params = tiny_model
    prompts = [[1, 2, 3, 4, 5]]

    def run(dtype):
        ecfg = EngineConfig(max_batch_size=2,
                            kv=KVCacheConfig(page_size=8, num_pages=32,
                                             max_pages_per_seq=8,
                                             kv_dtype=dtype))
        eng = Engine(cfg, params, ecfg, decode_burst=4)
        return eng.generate(prompts, SamplingParams(max_new_tokens=8))[0]

    base = run("f32")
    quant = run(kv_dtype)
    assert len(quant) == 8
    assert quant[:2] == base[:2]


def test_paged_append_span_matches_scatter(rng):
    """Span write (speculative verify): Pallas kernel (interpret) vs the
    jnp scatter reference, spans crossing 8-row windows and pages."""
    from simplellminference_tpu.memory import paged_kv as pkv
    from simplellminference_tpu.ops.paged_append import paged_append_span

    L, p, kvn, ps, d = 2, 8, 2, 16, 128
    b, t = 3, 4
    pool_k = jnp.asarray(rng.standard_normal((L, p, kvn, ps, d)),
                         jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((L, p, kvn, ps, d)),
                         jnp.float32)
    tables = jnp.asarray([[0, 1, -1, -1], [2, 3, 4, -1], [5, 6, -1, -1]],
                         jnp.int32)
    # positions: within-window, crossing an 8-row boundary, crossing a page
    positions = jnp.asarray([2, 6, 14], jnp.int32)
    new_k = jnp.asarray(rng.standard_normal((b, t, kvn, d)), jnp.float32)
    new_v = jnp.asarray(rng.standard_normal((b, t, kvn, d)), jnp.float32)
    li = jnp.int32(1)

    del pkv
    got_k, got_v = paged_append_span(pool_k, pool_v, new_k, new_v, tables,
                                     positions, li, interpret=True)
    # scatter reference (the CPU fallback path's math)
    ps_ = ps
    pos = positions[:, None] + jnp.arange(t)[None]
    page_idx = jnp.take_along_axis(tables, pos // ps_, axis=1)
    slot = pos % ps_
    want_k = pool_k.at[li, page_idx, :, slot, :].set(new_k, mode="drop")
    want_v = pool_v.at[li, page_idx, :, slot, :].set(new_v, mode="drop")
    np.testing.assert_array_equal(np.asarray(got_k[:, :-1]),
                                  np.asarray(want_k[:, :-1]))
    np.testing.assert_array_equal(np.asarray(got_v[:, :-1]),
                                  np.asarray(want_v[:, :-1]))
