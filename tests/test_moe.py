"""Sparse-MoE (Mixtral-family) tests: the folded dense-expert FFN
(ops/moe.py) vs a per-expert-loop oracle and vs HuggingFace's torch
Mixtral; expert parallelism through the existing TP shard_map body; the
paged engine end to end.

The reference has no MoE (dense FFN only, model.cpp:99-121); this is part
of the framework's extension surface (SURVEY.md §2.8 "Expert parallel").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # MoE family + engine e2e

from simplellminference_tpu.core.config import ModelConfig, SamplingParams
from simplellminference_tpu.models import llama
from simplellminference_tpu.ops import moe


def _moe_cfg(**ov):
    kw = dict(num_heads=4, num_kv_heads=2, head_dim=32, hidden_size=128,
              intermediate_size=96, vocab_size=256, num_layers=2,
              num_experts=4, num_experts_per_tok=2, dtype="float32")
    kw.update(ov)
    return ModelConfig.tiny_test(**kw)


@pytest.fixture(params=["grouped", "folded"])
def moe_path(request, monkeypatch):
    """Run the test body under both prefill MoE implementations."""
    monkeypatch.setenv("SLI_MOE_GROUPED",
                       "1" if request.param == "grouped" else "0")
    return request.param


def test_moe_ffn_matches_expert_loop_oracle(moe_path):
    cfg = _moe_cfg()
    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key)
    lw = params["layers"]
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 128), jnp.float32)

    got = moe.moe_ffn(cfg, {k: v[0] for k, v in lw.items()}, None,
                      x[None], tp_axis=None)[0]
    want = moe.moe_ffn_ref(cfg, lw["router"][0], lw["w_gate_up"][0],
                           lw["w_down"][0], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_moe_grouped_matches_folded_exactly_shaped():
    """Grouped (ragged_dot) prefill == folded dense prefill, larger T so
    every expert sees a nonempty and a non-uniform group."""
    cfg = _moe_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(7))
    lw = {k: v[0] for k, v in params["layers"].items()}
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 33, 128), jnp.float32)
    got = moe.moe_ffn_grouped(cfg, lw, None, x)
    want_gates = moe.router_probs(
        x.reshape(-1, 128), lw["router"], cfg.num_experts_per_tok,
        cfg.norm_topk_prob)
    assert (np.asarray(want_gates) > 0).sum() > 0
    import os
    os.environ["SLI_MOE_GROUPED"] = "0"
    try:
        want = moe.moe_ffn(cfg, lw, None, x)
    finally:
        os.environ.pop("SLI_MOE_GROUPED")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_router_probs_topk_and_norm():
    cfg = _moe_cfg()
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 4), jnp.float32)
    p = np.asarray(moe.router_probs(x, w, 2, norm_topk=True))
    assert ((p > 0).sum(-1) <= 2).all()          # at most top-k selected
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
    # Unnormalized: rows sum to the softmax mass of the top-2 experts.
    logits = np.asarray(x) @ np.asarray(w)
    sm = np.exp(logits - logits.max(-1, keepdims=True))
    sm /= sm.sum(-1, keepdims=True)
    want = np.sort(sm, axis=-1)[:, -2:].sum(-1)
    p2 = np.asarray(moe.router_probs(x, w, 2, norm_topk=False))
    np.testing.assert_allclose(p2.sum(-1), want, rtol=1e-5)


def test_moe_forward_golden_vs_hf_mixtral():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=128, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        num_local_experts=4, num_experts_per_tok=2,
    )
    torch.manual_seed(0)
    hf = transformers.MixtralForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.num_experts == 4 and cfg.model_type == "mixtral"

    from simplellminference_tpu.runtime.weights import (
        params_from_torch_state_dict)
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    positions = np.arange(tokens.shape[1], dtype=np.int32)[None]
    got, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                           jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def _qwen_moe_cfg(**ov):
    kw = dict(num_heads=4, num_kv_heads=2, head_dim=32, hidden_size=128,
              intermediate_size=96, vocab_size=256, num_layers=2,
              num_experts=4, num_experts_per_tok=2,
              moe_intermediate_size=48, norm_topk_prob=False,
              shared_expert_intermediate_size=64, attention_bias=True,
              model_type="qwen2_moe", dtype="float32")
    kw.update(ov)
    return ModelConfig.tiny_test(**kw)


def test_qwen2_moe_golden_vs_hf(moe_path):
    """Qwen2-MoE semantics vs torch: un-renormalized top-k routing,
    shared expert with sigmoid gate, QKV bias."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Qwen2MoeForCausalLM"):
        pytest.skip("transformers too old for Qwen2MoeForCausalLM")

    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=128, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_intermediate_size=64, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        output_router_logits=False, sliding_window=None,
        use_sliding_window=False,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.num_experts == 4 and cfg.model_type == "qwen2_moe"
    assert not cfg.norm_topk_prob and cfg.attention_bias
    assert cfg.shared_expert_intermediate_size == 64

    from simplellminference_tpu.runtime.weights import (
        params_from_torch_state_dict)
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    positions = np.arange(tokens.shape[1], dtype=np.int32)[None]
    got, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                           jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_qwen2_moe_tp_matches(moe_path):
    """Shared expert under megatron TP (column/row shards + one psum)."""
    from simplellminference_tpu.models import llama_tp
    from simplellminference_tpu.parallel import mesh as mesh_lib, sharding

    cfg = _qwen_moe_cfg(num_heads=8, num_kv_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (2, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (2, 8))
    ref, _ = llama.forward(cfg, params, tokens, positions)

    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=2, model=4))
    tp_params, fwd = llama_tp.make_tp_forward(cfg, mesh, params)
    tp_params = sharding.shard_params(cfg, tp_params, mesh)
    got, _ = fwd(tp_params, tokens, positions, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mixed_sparse_dense_stack_rejected():
    with pytest.raises(ValueError, match="mixed dense/sparse"):
        ModelConfig.from_hf_dict(dict(
            vocab_size=256, hidden_size=128, intermediate_size=96,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, model_type="qwen2_moe",
            num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, mlp_only_layers=[0]))


def test_moe_expert_parallel_tp_matches(moe_path):
    """Experts sharded over the model axis (whole-expert column/row
    blocks + psum combine) == single-device MoE forward."""
    from simplellminference_tpu.models import llama_tp
    from simplellminference_tpu.parallel import mesh as mesh_lib, sharding

    cfg = _moe_cfg(num_heads=8, num_kv_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (2, 8))
    ref, _ = llama.forward(cfg, params, tokens, positions)

    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=2, model=4))
    tp_params, fwd = llama_tp.make_tp_forward(cfg, mesh, params)
    tp_params = sharding.shard_params(cfg, tp_params, mesh)
    got, _ = fwd(tp_params, tokens, positions, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_moe_quantized_close_to_fp(moe_path):
    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.runtime.weights import quantize_params

    cfg = _moe_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    qparams = quantize_params(params, QuantConfig(mode="int8",
                                                  group_size=0))
    assert not hasattr(qparams["layers"]["router"], "q"), \
        "router must stay full-precision"
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    positions = jnp.arange(4, dtype=jnp.int32)[None]
    ref, _ = llama.forward(cfg, params, tokens, positions)
    got, _ = llama.forward(cfg, qparams, tokens, positions)
    # INT8 weight error budget; routing decisions must be identical for a
    # comparison this tight to hold.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.15)


def test_moe_engine_end_to_end():
    """Tiny Mixtral through the continuous-batching paged engine."""
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig)
    from simplellminference_tpu.engine.engine import Engine

    cfg = _moe_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(6))
    ecfg = EngineConfig(
        max_batch_size=2,
        kv=KVCacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8,
                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=2)
    outs = eng.generate([[1, 2, 3, 4, 5], [9, 8, 7]],
                        SamplingParams(max_new_tokens=6))
    assert all(len(o) == 6 for o in outs)

    # Paged engine decode must agree with the dense-cache forward.
    from simplellminference_tpu.runtime.generator import Generator
    gen = Generator(cfg, params, max_batch=1, max_seq=32,
                    kv_dtype=jnp.float32)
    want = gen.generate([[1, 2, 3, 4, 5]],
                        SamplingParams(max_new_tokens=6)).token_ids[0]
    assert outs[0] == list(want), (outs[0], want)
