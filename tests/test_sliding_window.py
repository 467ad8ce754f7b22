"""Sliding-window attention (Mistral/Qwen2 `sliding_window`).

The reference has no long-context machinery at all (max_length hard-coded,
config.h:11; SURVEY.md §5 long-context row) — SWA is part of this build's
model-family surface: query i attends only keys with q_pos - k_pos <
window. Every attention path (dense, cached, paged prefill/decode/verify,
flash kernels in interpret mode) is checked against the masked dense
reference, plus an HF Mistral golden for end-to-end semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # windowed kernel sweeps + HF golden

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.memory import paged_kv as pkv
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.attention.flash_decode import flash_decode
from simplellminference_tpu.ops.attention.flash_prefill import flash_prefill
from simplellminference_tpu.ops.attention.paged_decode import (
    paged_flash_decode, paged_flash_verify)
from simplellminference_tpu.ops.attention.paged_prefill import (
    paged_flash_prefill)


def test_causal_mask_window_oracle():
    m = np.asarray(ref_ops.causal_mask(6, 6, window=3))
    for qi in range(6):
        for ki in range(6):
            assert m[qi, ki] == (ki <= qi and qi - ki < 3), (qi, ki)


@pytest.mark.parametrize("window", [32, 100, 128, 1000])
def test_flash_prefill_window_matches_ref(rng, window):
    b, s, n, kvn, d = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    got = flash_prefill(q, k, v, causal=True, bq=128, bk=128,
                        interpret=True, window=window)
    mask = ref_ops.causal_mask(s, s, window=window)[None, None]
    want = ref_ops.attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [7, 64, 200, 4096])
def test_flash_decode_window_matches_ref(rng, window):
    b, n, kvn, d, smax = 3, 4, 2, 64, 512
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, kvn, smax, d)), jnp.float32)
    kv_lens = jnp.asarray([1, 200, smax], jnp.int32)

    got = flash_decode(q, ck, cv, kv_lens, bk=128, interpret=True,
                       window=window)

    key_pos = jnp.arange(smax)[None, None, None, :]
    mask = ((key_pos < kv_lens[:, None, None, None])
            & (key_pos >= kv_lens[:, None, None, None] - window))
    want = ref_ops.attention(q[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [5, 130, 600])
def test_paged_flash_decode_window_matches_ref(rng, window):
    p, kvn, ps, d = 32, 2, 128, 64
    b, n, mp = 3, 4, 4
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    tables = jnp.asarray(rng.permutation(p)[:b * mp].reshape(b, mp),
                         jnp.int32)
    kv_lens = jnp.asarray([1, 200, mp * ps], jnp.int32)

    got = paged_flash_decode(q, pool_k, pool_v, tables, kv_lens,
                             interpret=True, window=window)

    ck, cv = pkv.gather_dense(pool_k, pool_v, tables)
    key_pos = jnp.arange(mp * ps)[None, None, None, :]
    mask = ((key_pos < kv_lens[:, None, None, None])
            & (key_pos >= kv_lens[:, None, None, None] - window))
    want = ref_ops.attention(q[:, None], ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [6, 150])
def test_paged_flash_verify_window_matches_ref(rng, window):
    """Speculative multi-row verify windows with SWA: per-row causal AND
    per-row sliding window."""
    p, kvn, ps, d = 32, 2, 128, 64
    b, n, mp, s = 2, 4, 4, 4
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    tables = jnp.asarray(rng.permutation(p)[:b * mp].reshape(b, mp),
                         jnp.int32)
    kv_lens = jnp.asarray([9, mp * ps], jnp.int32)

    got = paged_flash_verify(q, pool_k, pool_v, tables, kv_lens,
                             interpret=True, window=window)

    ck, cv = pkv.gather_dense(pool_k, pool_v, tables)
    key_pos = jnp.arange(mp * ps)[None, None, None, :]
    q_pos = (kv_lens[:, None] - s
             + jnp.arange(s, dtype=jnp.int32)[None])[:, None, :, None]
    mask = (key_pos <= q_pos) & (key_pos > q_pos - window)
    want = ref_ops.attention(q, ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [40, 300])
def test_paged_flash_prefill_window_matches_ref(rng, window):
    """Chunked prefill through the page tables with SWA: the second
    chunk's queries attend the cached prefix only within the window."""
    p, kvn, ps, d = 32, 2, 128, 64
    b, n, mp, s = 2, 4, 4, 256
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    pool_k = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    pool_v = jnp.asarray(rng.standard_normal((p, kvn, ps, d)), jnp.float32)
    tables = jnp.asarray(rng.permutation(p)[:b * mp].reshape(b, mp),
                         jnp.int32)
    chunk_offset = jnp.asarray([256, 128], jnp.int32)
    kv_lens = chunk_offset + s

    got = paged_flash_prefill(q, pool_k, pool_v, tables, kv_lens,
                              chunk_offset, bq=128, interpret=True,
                              window=window)

    ck, cv = pkv.gather_dense(pool_k, pool_v, tables)
    smax = ck.shape[2]
    key_pos = jnp.arange(smax)[None, None, None, :]
    q_pos = (chunk_offset[:, None]
             + jnp.arange(s, dtype=jnp.int32)[None])[:, None, :, None]
    mask = ((key_pos <= q_pos) & (key_pos < kv_lens[:, None, None, None])
            & (key_pos > q_pos - window))
    want = ref_ops.attention(q, ck.transpose(0, 2, 1, 3),
                             cv.transpose(0, 2, 1, 3), mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def _mistral_cfg(**ov):
    kw = dict(num_heads=4, num_kv_heads=2, head_dim=32, hidden_size=128,
              intermediate_size=96, vocab_size=256, num_layers=2,
              model_type="mistral", sliding_window=8, dtype="float32")
    kw.update(ov)
    return ModelConfig.tiny_test(**kw)


def test_mistral_sliding_window_golden_vs_hf():
    """End-to-end SWA semantics vs torch: prompt (16) > window (8), so
    late tokens must NOT see early ones."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, sliding_window=8,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.sliding_window == 8

    from simplellminference_tpu.runtime.weights import (
        params_from_torch_state_dict)
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 42, 8, 13,
                        99, 7, 21, 55, 2, 111]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    positions = np.arange(tokens.shape[1], dtype=np.int32)[None]
    got, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                           jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)

    # The window must actually bite: full-attention logits differ.
    cfg_full = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32",
                                        sliding_window=None)
    full, _ = llama.forward(cfg_full, params, jnp.asarray(tokens),
                            jnp.asarray(positions))
    assert not np.allclose(np.asarray(full), want, rtol=3e-4, atol=3e-4)


def test_engine_window_matches_dense_generator():
    """Paged engine (chunked writes, paged flash fallbacks, bursts) ==
    dense-cache Generator under SWA: prompts longer than the window."""
    from simplellminference_tpu.engine import Engine
    from simplellminference_tpu.runtime.generator import Generator

    cfg = _mistral_cfg(sliding_window=6)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    prompts = [list(range(1, 14)), [9, 8, 7], list(range(40, 61))]

    gen = Generator(cfg, params, max_batch=len(prompts), max_seq=128,
                    kv_dtype=jnp.float32)
    want = gen.generate(prompts,
                        SamplingParams(max_new_tokens=10)).token_ids

    ecfg = EngineConfig(
        max_batch_size=4,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=10))
    assert got == want


def test_sp_ring_prefill_supports_window_and_moe():
    """Sliding windows ride the SP ring since r4; the r4 MoE/MLA/
    post-norm/rotary carve-outs are lifted in r5 (see
    test_ring_attention.py::test_sp_prefill_moe_matches_dense etc.) —
    every model class now constructs a ring prefill."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama_sp

    cfg = _mistral_cfg()
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]).reshape(8),
                             (llama_sp.SEQ_AXIS,))
    llama_sp.make_sp_prefill(cfg, mesh)   # windowed models accepted
    moe = ModelConfig.tiny_test(num_experts=4, num_experts_per_tok=2)
    llama_sp.make_sp_prefill(moe, mesh)   # MoE accepted since r5


def test_qwen2_window_config_gates():
    base = dict(vocab_size=256, hidden_size=128, intermediate_size=96,
                num_hidden_layers=4, num_attention_heads=4,
                num_key_value_heads=2, model_type="qwen2",
                sliding_window=64)
    # default use_sliding_window=False: full attention
    assert ModelConfig.from_hf_dict(base).sliding_window is None
    # uniform SWA
    assert ModelConfig.from_hf_dict(
        dict(base, use_sliding_window=True,
             max_window_layers=0)).sliding_window == 64
    # cutoff above the stack: full attention everywhere
    assert ModelConfig.from_hf_dict(
        dict(base, use_sliding_window=True,
             max_window_layers=4)).sliding_window is None
    # heterogeneous stack: loud failure
    with pytest.raises(ValueError, match="max_window_layers"):
        ModelConfig.from_hf_dict(dict(base, use_sliding_window=True,
                                      max_window_layers=2))
