"""Ring attention (sequence parallelism) vs dense causal reference on the
8-device virtual CPU mesh (SURVEY §2.8 ring/CP row, §4.4 methodology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # SP ring + SP x TP + handoff compiles
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.parallel.ring_attention import ring_attention


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
@pytest.mark.parametrize("ring,b,s,n,kvn,d", [
    (4, 2, 64, 4, 4, 16),     # MHA
    (4, 1, 32, 8, 2, 32),     # GQA
    (8, 1, 64, 4, 1, 16),     # MQA, full 8-ring
])
def test_ring_attention_matches_dense_causal(ring, b, s, n, kvn, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)

    mask = np.asarray(ref_ops.causal_mask(s, s))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask))

    mesh = _mesh(ring)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_ring_attention_non_causal(ring=4):
    rng = np.random.default_rng(1)
    b, s, n, kvn, d = 1, 32, 2, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    ones = jnp.ones((1, 1, s, s), bool)
    want = ref_ops.attention(q, k, v, ones)
    mesh = _mesh(ring)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq",
                                          causal=False),
        mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_forward_matches_dense():
    """Full sequence-parallel model prefill (ring attention per layer,
    weights replicated, activations sequence-sharded) reproduces the
    single-device dense forward's logits."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)

    mesh = llama_sp.seq_mesh(4)
    fwd = llama_sp.make_sp_prefill(cfg, mesh)
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
@pytest.mark.parametrize("window", [8, 24, 40])
def test_ring_attention_sliding_window(window):
    """Windowed ring == dense sliding-window attention (VERDICT r3
    item 7): the window mask composes with global-position causality
    across rotated KV chunks, including windows smaller than, equal to,
    and larger than the per-shard chunk (s=64, ring=4 -> Sl=16)."""
    rng = np.random.default_rng(2)
    b, s, n, kvn, d = 1, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    mask = np.asarray(ref_ops.causal_mask(s, s, window=window))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask))
    mesh = _mesh(4)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq",
                                          window=window),
        mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_ring_attention_sinks_and_softcap():
    """GPT-OSS sinks + Gemma-2 soft cap through the ring's online
    softmax == the dense reference."""
    rng = np.random.default_rng(3)
    b, s, n, kvn, d = 1, 32, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mask = np.asarray(ref_ops.causal_mask(s, s))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask), logit_cap=30.0,
                             sinks=sinks)
    mesh = _mesh(4)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq",
                                          logit_cap=30.0, sinks=sinks),
        mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_sliding_window_model():
    """A Mistral-style sliding-window model prefills under the SP ring
    (llama_sp no longer rejects cfg.sliding_window)."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(max_seq_len=128, sliding_window=24)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)
    fwd = llama_sp.make_sp_prefill(cfg, llama_sp.seq_mesh(4))
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sp_tp_prefill_matches_dense():
    """2-D (seq x model) ring prefill: weights/heads sharded over model,
    sequence over seq — logits match the single-device dense forward
    (VERDICT r3 item 4, first half)."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp
    from simplellminference_tpu.parallel import sharding

    cfg = ModelConfig.tiny_test(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)

    mesh = llama_sp.sp_tp_mesh(4, 2)
    tp_params, pfx = llama_sp.make_sp_tp_prefill(cfg, mesh, params)
    tp_params = sharding.shard_params(cfg, tp_params, mesh)
    logits, ks, vs = pfx(tp_params, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
    assert ks.shape == (cfg.num_layers, 2, 64, cfg.num_kv_heads,
                        cfg.head_dim)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sp_tp_handoff_to_paged_engine():
    """Full SP -> TP -> paged-decode handoff (VERDICT r3 item 4): a
    prompt prefilled under SP(4) x TP(2) hands its K/V to the TP paged
    engine via Engine.adopt_prefill and decode continues — tokens equal
    the single-device engine's end to end."""
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine import Engine
    from simplellminference_tpu.models import llama, llama_sp
    from simplellminference_tpu.parallel import sharding

    cfg = ModelConfig.tiny_test(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(8)
    prompt = rng.integers(1, cfg.vocab_size, 32).tolist()
    samp = SamplingParams(max_new_tokens=8)

    # reference: single-device engine end to end
    kv = KVCacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                       kv_dtype="f32")
    ref_eng = Engine(cfg, params,
                     EngineConfig(max_batch_size=2, kv=kv),
                     decode_burst=4)
    want = ref_eng.generate([prompt], samp)[0]

    # SP(4) x TP(2) ring prefill
    mesh = llama_sp.sp_tp_mesh(4, 2)
    tp_params, pfx = llama_sp.make_sp_tp_prefill(cfg, mesh, params)
    tp_params_sh = sharding.shard_params(cfg, tp_params, mesh)
    tokens = jnp.asarray(np.asarray(prompt)[None], jnp.int32)
    logits, ks, vs = pfx(tp_params_sh, tokens)
    first = int(np.argmax(np.asarray(logits[0, -1])))

    # decode on the TP paged engine (data=4 x model=2 over the same 8
    # devices; pools replicate over data, shard kv heads over model)
    eng = Engine(cfg, params,
                 EngineConfig(max_batch_size=2,
                              mesh_shape={"data": 4, "model": 2}, kv=kv),
                 decode_burst=4)
    req = eng.adopt_prefill(
        prompt, first,
        lambda cache, tables: llama_sp.sp_kv_to_paged(cache, ks, vs,
                                                      tables),
        sampling=samp)
    eng.run()
    assert req.output_ids == want, (req.output_ids, want)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_moe_matches_dense():
    """Mixtral-shape MoE under the SP ring (r4 carve-out lifted): the
    expert FFN is per-token, so it rides each shard's local chunk; ring
    logits == dense forward logits."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(max_seq_len=128, num_experts=4,
                                num_experts_per_tok=2,
                                moe_intermediate_size=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)
    fwd = llama_sp.make_sp_prefill(cfg, llama_sp.seq_mesh(4))
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sp_tp_prefill_moe_matches_dense():
    """Mixtral-shape MoE over the 2-D (seq x model) mesh: experts shard
    over model (folded layout), sequence rings over seq."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(max_seq_len=128, num_experts=4,
                                num_experts_per_tok=2,
                                moe_intermediate_size=64,
                                vocab_size=256, num_heads=4,
                                num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)
    mesh = llama_sp.sp_tp_mesh(4, 2)
    tp_params, fwd = llama_sp.make_sp_tp_prefill(cfg, mesh, params)
    got, ks, vs = fwd(tp_params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
    assert ks.shape == (cfg.num_layers, 2, 64, cfg.num_kv_heads,
                        cfg.head_dim)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_mla_deepseek_matches_dense():
    """DeepSeek-shape MLA + MoE + dense-prefix stack under the SP ring
    (r4 carve-out lifted): the ring runs naive per-head K/V (the latent
    compression is upstream of attention); logits == the dense absorbed
    forward."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(
        num_heads=8, hidden_size=256, intermediate_size=512,
        vocab_size=256, num_layers=3, dtype="float32",
        model_type="deepseek_v2", kv_lora_rank=64, q_lora_rank=96,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        query_pre_attn_scalar=48.0, mla_absorbed=True, head_dim=128,
        num_kv_heads=1, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64,
        shared_expert_intermediate_size=64, first_k_dense=1,
        max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(8)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)
    fwd = llama_sp.make_sp_prefill(cfg, llama_sp.seq_mesh(4))
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_postnorm_and_partial_rotary():
    """OLMo-2-shape post-norm stacks and GLM-4-shape partial interleaved
    rotary under the SP ring (r4 carve-outs lifted)."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    rng = np.random.default_rng(9)
    for kw in (
        dict(pre_norms=False, sandwich_norms=True, qk_norm=True,
             qk_norm_full=True),                      # OLMo-2 shape
        dict(partial_rotary_factor=0.5, rope_interleaved=True,
             attention_bias=True),                    # GLM-4 shape
        dict(rope_interleaved=True),                  # Helium shape
    ):
        cfg = ModelConfig.tiny_test(max_seq_len=128, **kw)
        params = llama.init_params(cfg, jax.random.PRNGKey(5))
        tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                             jnp.int32)
        positions = jnp.broadcast_to(
            jnp.arange(64, dtype=jnp.int32)[None], (2, 64))
        want, _ = llama.forward(cfg, params, tokens, positions)
        fwd = llama_sp.make_sp_prefill(cfg, llama_sp.seq_mesh(4))
        got = fwd(params, tokens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=str(kw))


def test_sp_handoff_still_rejects_mla():
    """The one remaining gate: naive ring K/V cannot feed absorbed-MLA
    latent pools; the handoff path says so loudly."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(
        num_heads=8, hidden_size=256, model_type="deepseek_v2",
        kv_lora_rank=64, q_lora_rank=None, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, head_dim=128,
        num_kv_heads=1, query_pre_attn_scalar=48.0, mla_absorbed=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(6))
    mesh = llama_sp.sp_tp_mesh(4, 2)
    with pytest.raises(NotImplementedError, match="latent"):
        llama_sp.make_sp_tp_prefill(cfg, mesh, params)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_engine_native_sp_prefill_matches_single_device():
    """Engine-native long-prompt SP x TP prefill (r5): with
    `sp_prefill_threshold` set and a (data x model) mesh, a long prompt
    admitted NORMALLY rings over the whole mesh, its K/V scatter into
    the TP paged pools, and tokens match the single-device engine —
    no adopt_prefill orchestration."""
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine import Engine
    from simplellminference_tpu.models import llama

    cfg = ModelConfig.tiny_test(max_seq_len=512)
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, cfg.vocab_size, 96).tolist(),  # SP path
               [5, 6, 7],                                     # batched
               rng.integers(1, cfg.vocab_size, 60).tolist()]  # SP path

    def mk(mesh_shape, thresh=0):
        ecfg = EngineConfig(
            max_batch_size=4, mesh_shape=mesh_shape,
            sp_prefill_threshold=thresh,
            kv=KVCacheConfig(page_size=8, num_pages=128,
                             max_pages_per_seq=32, kv_dtype="f32"))
        return Engine(cfg, params, ecfg, decode_burst=3)

    want = mk(None).generate(prompts, SamplingParams(max_new_tokens=8))
    eng = mk({"data": 4, "model": 2}, thresh=48)
    assert eng._sp_prefill_fn is not None and eng._sp_ring == 4
    got = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    assert got == want
    m = eng.metrics.summary()
    assert m["sp_prefills"] == 2          # the two >=48-token prompts
    assert m["prefills"] >= 3             # short one took the batch path
