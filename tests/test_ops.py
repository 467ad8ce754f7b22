"""Unit tests for the reference op math (SURVEY.md §4.1).

These pin the jnp reference ops against straightforward numpy/torch math,
including the two reference bugs we deliberately fix (Q1 swiglu, Q2 rope).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplellminference_tpu.ops import ref_ops


def test_rmsnorm_matches_numpy(rng):
    x = rng.standard_normal((2, 5, 64), dtype=np.float32)
    w = rng.standard_normal(64, dtype=np.float32)
    eps = 1e-5
    got = ref_ops.rmsnorm(jnp.asarray(x), jnp.asarray(w), eps)
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * w
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_swiglu_is_silu_times_up(rng):
    """Correct SwiGLU = g*sigmoid(g)*up — NOT the reference's sigmoid(g)*up
    (Q1, swiglu_kernel.cpp:12-13)."""
    g = rng.standard_normal((4, 32), dtype=np.float32)
    u = rng.standard_normal((4, 32), dtype=np.float32)
    got = np.asarray(ref_ops.swiglu(jnp.asarray(g), jnp.asarray(u)))
    want = g * (1 / (1 + np.exp(-g))) * u
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and it differs from the reference's buggy version
    buggy = (1 / (1 + np.exp(-g))) * u
    assert not np.allclose(got, buggy)


def test_rope_rotation_properties(rng):
    """RoPE preserves norms and pos=0 is identity."""
    x = rng.standard_normal((1, 3, 4, 32), dtype=np.float32)
    pos = jnp.asarray([[0, 1, 7]], jnp.int32)
    sin, cos = ref_ops.rope_tables(pos, 32, 10000.0)
    out = np.asarray(ref_ops.apply_rope(jnp.asarray(x), sin, cos))
    np.testing.assert_allclose(out[0, 0], x[0, 0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_rope_matches_hf_rotate_half(rng):
    """Exact parity with HF Llama's rotate_half convention."""
    torch = pytest.importorskip("torch")
    d = 64
    x = rng.standard_normal((1, 5, 2, d), dtype=np.float32)
    pos = np.arange(5, dtype=np.int32)[None]
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    angles = pos[..., None] * inv_freq  # [1, 5, d/2]
    emb = np.concatenate([angles, angles], axis=-1)
    cos_hf, sin_hf = np.cos(emb), np.sin(emb)

    def rotate_half(t):
        return np.concatenate([-t[..., d // 2:], t[..., :d // 2]], axis=-1)

    want = x * cos_hf[:, :, None, :] + rotate_half(x) * sin_hf[:, :, None, :]
    sin, cos = ref_ops.rope_tables(jnp.asarray(pos), d, 10000.0)
    got = np.asarray(ref_ops.apply_rope(jnp.asarray(x), sin, cos))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_sdpa(rng):
    torch = pytest.importorskip("torch")
    b, sq, sk, n, kvn, d = 2, 4, 9, 8, 2, 16
    q = rng.standard_normal((b, sq, n, d), dtype=np.float32)
    k = rng.standard_normal((b, sk, kvn, d), dtype=np.float32)
    v = rng.standard_normal((b, sk, kvn, d), dtype=np.float32)
    mask = np.asarray(ref_ops.causal_mask(sq, sk, q_offset=sk - sq))[None, None]

    got = np.asarray(ref_ops.attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))

    tq = torch.tensor(q).permute(0, 2, 1, 3)
    tk = torch.tensor(k).permute(0, 2, 1, 3)
    tv = torch.tensor(v).permute(0, 2, 1, 3)
    want = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, attn_mask=torch.tensor(mask), enable_gqa=True)
    want = want.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_int8_groupwise_quant_roundtrip(rng):
    w = rng.standard_normal((256, 64), dtype=np.float32)
    q, s = ref_ops.quantize_int8_groupwise(jnp.asarray(w), 64)
    assert q.dtype == jnp.int8 and s.shape == (4, 64)
    deq = np.asarray(ref_ops.dequantize_int8_groupwise(q, s))
    # max error bounded by scale/2 per element
    err = np.abs(deq - w)
    bound = np.repeat(np.asarray(s), 64, axis=0) * 0.51
    assert (err <= bound).all()


def test_quantized_matmul_ref_matches_dequant(rng):
    x = rng.standard_normal((3, 256), dtype=np.float32)
    w = rng.standard_normal((256, 96), dtype=np.float32)
    q, s = ref_ops.quantize_int8_groupwise(jnp.asarray(w), 128)
    got = np.asarray(ref_ops.quantized_matmul_ref(jnp.asarray(x), q, s))
    want = x @ np.asarray(ref_ops.dequantize_int8_groupwise(q, s))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sampling_greedy_and_topk(rng):
    from simplellminference_tpu.ops import sampling
    logits = jnp.asarray(rng.standard_normal((4, 100), dtype=np.float32))
    g = sampling.greedy(logits)
    assert (np.asarray(g) == np.asarray(logits).argmax(-1)).all()
    # temperature 0 rows behave greedily through sample() too
    key = jax.random.PRNGKey(0)
    t = jnp.asarray([0.0, 1.0, 0.0, 0.5])
    out = sampling.sample(logits, key, t, jnp.asarray([0, 5, 0, 0]),
                          jnp.asarray([1.0, 0.9, 1.0, 1.0]))
    out = np.asarray(out)
    assert out[0] == np.asarray(logits)[0].argmax()
    assert out[2] == np.asarray(logits)[2].argmax()
    # top-k row must sample within its top-5 set
    top5 = np.argsort(np.asarray(logits)[1])[::-1][:5]
    assert out[1] in top5


def test_sampling_topp_renormalizes_after_topk(rng):
    """HF/vLLM order: top-k filters first, top-p runs on the RENORMALIZED
    survivor distribution.

    Near-uniform logits over v=1000, top_k=10, top_p=0.5: on the raw
    softmax the whole top-10 set holds ~1% of the mass, so a raw-softmax
    nucleus test keeps all 10; renormalized, each survivor holds ~10%, so
    the nucleus is exactly the first 5. Draws must stay in {0..4}."""
    from simplellminference_tpu.ops import sampling as S

    v = 1000
    logits = -np.arange(v, dtype=np.float32) * 1e-3  # strictly ordered
    lj = jnp.asarray(logits[None])
    t = jnp.asarray([1.0], jnp.float32)
    samp = jax.jit(lambda key: S.sample(
        lj, key, t, jnp.asarray([10], jnp.int32),
        jnp.asarray([0.5], jnp.float32)))   # 1 compile, 64 dispatches
    draws = set()
    for i in range(64):
        draws.add(int(samp(jax.random.PRNGKey(i))[0]))
    assert draws <= {0, 1, 2, 3, 4}, \
        f"top-p ran on un-renormalized probs: drew {sorted(draws)}"
    assert len(draws) > 1  # it is actually sampling, not argmaxing


def test_sampling_penalties_and_min_p():
    from simplellminference_tpu.ops import sampling as S

    # local generator: the min_p ~ 1.0 assertion below assumes a clear
    # argmax margin, which the session-scoped shared stream can't
    # guarantee (its state depends on which tests ran before)
    rng = np.random.default_rng(42)
    b, v = 4, 64
    logits = jnp.asarray(rng.standard_normal((b, v)) * 3, jnp.float32)
    counts = jnp.asarray(rng.integers(0, 3, (b, v)), jnp.float32)
    rp = jnp.asarray([1.0, 1.5, 2.0, 1.2], jnp.float32)
    fp = jnp.asarray([0.0, 0.3, 0.0, 0.1], jnp.float32)
    pp = jnp.asarray([0.0, 0.0, 0.7, 0.2], jnp.float32)

    got = np.asarray(S.apply_penalties(logits, counts, rp, fp, pp))
    lf = np.asarray(logits, np.float64)
    c = np.asarray(counts, np.float64)
    seen = c > 0
    pen = np.where(lf > 0, lf / np.asarray(rp)[:, None],
                   lf * np.asarray(rp)[:, None])
    want = np.where(seen, pen, lf)
    want = want - (np.asarray(fp)[:, None] * c
                   + np.asarray(pp)[:, None] * seen)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # greedy + penalties picks argmax of the PENALIZED logits
    tok = S.sample(logits, jax.random.PRNGKey(0),
                   jnp.zeros((b,)), jnp.zeros((b,), jnp.int32),
                   jnp.ones((b,)), counts=counts, repetition_penalty=rp,
                   frequency_penalty=fp, presence_penalty=pp)
    np.testing.assert_array_equal(np.asarray(tok), want.argmax(1))

    # min_p masks tokens below min_p * pmax: with min_p ~ 1.0 sampling
    # must return the argmax even at high temperature
    tok2 = S.sample(logits, jax.random.PRNGKey(1),
                    jnp.full((b,), 5.0), jnp.zeros((b,), jnp.int32),
                    jnp.ones((b,)), min_p=jnp.full((b,), 0.999))
    np.testing.assert_array_equal(np.asarray(tok2),
                                  np.asarray(logits).argmax(1))


def test_generator_penalties_match_engine(rng):
    """Generator.generate and the Engine apply identical penalty math."""
    import jax
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.generator import Generator

    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [rng.integers(1, cfg.vocab_size, 9).tolist(),
               rng.integers(1, cfg.vocab_size, 15).tolist()]
    sp = SamplingParams(max_new_tokens=10, repetition_penalty=1.7,
                        presence_penalty=0.3)
    gen = Generator(cfg, params, max_batch=2, max_seq=128)
    g = gen.generate(prompts, sp).token_ids
    eng = Engine(cfg, params, EngineConfig(
        max_batch_size=2, kv=KVCacheConfig(page_size=8, num_pages=64,
                                           max_pages_per_seq=16,
                                           kv_dtype="f32")))
    e = eng.generate(prompts, sp)
    assert g == e


def test_spec_rejection_sampling_preserves_marginals(rng):
    """The speculative accept/residual pair reproduces the target shaped
    distribution EXACTLY in expectation: emit draft d w.p. p(d), else
    draw from p|!=d — the emitted marginal must equal p (the core
    guarantee behind stochastic-row speculation)."""
    from simplellminference_tpu.ops import sampling as S

    v, n = 16, 20000
    logits = jnp.asarray(rng.standard_normal((1, v)) * 2, jnp.float32)
    temp = jnp.asarray([0.9], jnp.float32)
    top_k = jnp.asarray([8], jnp.int32)
    top_p = jnp.asarray([0.95], jnp.float32)
    min_p = jnp.asarray([0.0], jnp.float32)
    draft = jnp.asarray([int(np.asarray(logits)[0].argmax())], jnp.int32)

    pd = S.shaped_token_prob(logits, draft, temp, top_k, top_p, min_p)
    masked, si = S._shaped_sorted(logits, temp, top_k, top_p, min_p)
    target = np.zeros(v)
    target[np.asarray(si)[0]] = np.asarray(jax.nn.softmax(masked, -1))[0]

    @jax.jit
    def emit(seed):
        u = jax.random.uniform(
            jax.vmap(lambda k: jax.random.fold_in(k, 1))(
                S._row_keys(None, seed[None], jnp.asarray([0])))[0])
        res = S.sample_excluding(
            logits, temp, top_k, top_p, min_p, draft,
            S.spec_row_keys(seed[None], jnp.asarray([0]), 2))
        return jnp.where(u < pd[0], draft[0], res[0])

    draws = np.asarray(jax.vmap(emit)(
        jnp.arange(n, dtype=jnp.uint32)))
    emp = np.bincount(draws, minlength=v) / n
    # total-variation distance ~ O(sqrt(v/n)) noise ~ 0.02; allow 3x
    assert 0.5 * np.abs(emp - target).sum() < 0.06, (emp, target)
    # and the residual never emits filtered-out tokens
    assert set(np.unique(draws)) <= set(np.flatnonzero(target > 0))


def test_sample_excluding_empty_support_fallback(rng):
    """Excluding the only surviving token must fall back to the full
    shaped distribution instead of drawing from all -inf garbage."""
    from simplellminference_tpu.ops import sampling as S
    v = 32
    logits = jnp.zeros((1, v), jnp.float32).at[0, 3].set(50.0)
    tok = S.sample_excluding(
        logits, jnp.asarray([1.0]), jnp.asarray([1], jnp.int32),
        jnp.asarray([1.0]), jnp.asarray([0.0]),
        jnp.asarray([3], jnp.int32),
        S.spec_row_keys(jnp.asarray([5], jnp.uint32),
                        jnp.asarray([0]), 2))
    assert int(tok[0]) == 3


def test_sampling_gumbel_fast_path_matches_sorted(rng):
    """Seeded draws are TIER-invariant: a shaping-neutral row draws the
    same token whether the batch compiled the sort-free Gumbel path or
    the sorted path (e.g. because another row uses top-k) — the
    batch-composition-independence contract."""
    from simplellminference_tpu.ops import sampling as S

    b, v = 4, 512
    logits = jnp.asarray(rng.standard_normal((b, v)) * 2, jnp.float32)
    key = jax.random.PRNGKey(0)
    temp = jnp.asarray([0.7, 1.0, 1.3, 0.9], jnp.float32)
    seeds = jnp.asarray([11, 22, 33, 44], jnp.uint32)
    pos = jnp.asarray([5, 6, 7, 8], jnp.int32)
    neutral_k = jnp.zeros((b,), jnp.int32)
    neutral_p = jnp.ones((b,), jnp.float32)

    fast = S.sample(logits, key, temp, neutral_k, neutral_p,
                    seeds=seeds, seed_pos=pos)
    # force the sorted path: one row gets top_k = v (keeps everything,
    # identical distribution) — draws must still match exactly
    k2 = neutral_k.at[0].set(v)
    slow = S.sample(logits, key, temp, k2, neutral_p,
                    seeds=seeds, seed_pos=pos)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_sampling_gumbel_distribution(rng):
    """The sort-free path samples the right distribution (chi-square-ish
    check against softmax(logits/T) on a small vocab)."""
    from simplellminference_tpu.ops import sampling as S

    v, n = 8, 4000
    logits = jnp.asarray(rng.standard_normal((1, v)) * 1.5, jnp.float32)
    temp = jnp.asarray([0.8], jnp.float32)

    @jax.jit
    def one(seed):
        return S.sample(logits, jax.random.PRNGKey(0), temp,
                        jnp.zeros((1,), jnp.int32), jnp.ones((1,)),
                        seeds=seed[None].astype(jnp.uint32),
                        seed_pos=jnp.asarray([0]))[0]

    draws = np.asarray(jax.vmap(one)(jnp.arange(n, dtype=jnp.uint32)))
    emp = np.bincount(draws, minlength=v) / n
    want = np.asarray(jax.nn.softmax(logits[0] / temp[0]))
    assert 0.5 * np.abs(emp - want).sum() < 0.05, (emp, want)
