"""Golden tests for the extended model families: Llama-3 rope scaling and
Qwen2 (QKV bias), each vs the HuggingFace torch implementation on a random
tiny model (no network). Same methodology as test_llama_golden.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # HF-golden family parity (torch model construction dominates)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama
from simplellminference_tpu.models.registry import get_model_family
from simplellminference_tpu.runtime.weights import params_from_torch_state_dict


def _logits_match(hf, cfg, params, tokens, rtol=2e-4, atol=2e-4):
    with torch.no_grad():
        want = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    positions = np.arange(tokens.shape[1], dtype=np.int32)[None]
    positions = np.broadcast_to(positions, tokens.shape)
    got, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                           jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


def test_llama3_rope_scaling_matches_hf():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=500000.0, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64})
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.rope_scaling is not None
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens)


def test_qwen2_matches_hf():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(2)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.attention_bias and cfg.model_type == "qwen2"
    assert get_model_family("qwen2").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "wqkv_bias" in params["layers"]
    tokens = np.array([[1, 5, 9, 200, 17, 3]], np.int32)
    _logits_match(hf, cfg, params, tokens)


def test_qwen2_decode_with_cache_matches_no_cache():
    cfg = ModelConfig.tiny_test(attention_bias=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    from simplellminference_tpu.runtime.kv_cache import DenseKVCache
    toks = jnp.asarray([[4, 8, 15, 16, 23, 42]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    full, _ = llama.forward(cfg, params, toks, pos)

    cache = DenseKVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads,
                                cfg.head_dim, jnp.float32)
    lg, cache = llama.forward(cfg, params, toks[:, :5], pos[:, :5], cache,
                              jnp.zeros((1,), jnp.int32),
                              jnp.asarray([5], jnp.int32))
    lg2, _ = llama.forward(cfg, params, toks[:, 5:], pos[:, 5:], cache,
                           jnp.asarray([5], jnp.int32),
                           jnp.asarray([6], jnp.int32))
    np.testing.assert_allclose(np.asarray(lg2[:, 0]), np.asarray(full[:, 5]),
                               rtol=1e-4, atol=1e-4)


def test_rope_scaling_config_hashable():
    cfg = ModelConfig.llama3_2_3b(num_layers=2)
    hash(cfg)  # jit static arg requirement
    assert dict(cfg.rope_scaling)["factor"] == 32.0


def test_gemma_matches_hf():
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=True,
        hidden_activation="gelu_pytorch_tanh")
    torch.manual_seed(3)
    hf = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "gemma"
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    assert abs(cfg.embed_scale - 128.0 ** 0.5) < 1e-9
    assert get_model_family("gemma").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[2, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def _engine_generate(cfg, params, prompts, max_new):
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine import Engine

    ecfg = EngineConfig(max_batch_size=4,
                        kv=KVCacheConfig(page_size=8, num_pages=64,
                                         max_pages_per_seq=16,
                                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=3)
    return eng.generate(prompts, SamplingParams(max_new_tokens=max_new))


def _generator_generate(cfg, params, prompts, max_new):
    from simplellminference_tpu.core.config import SamplingParams
    from simplellminference_tpu.runtime.generator import Generator

    gen = Generator(cfg, params, max_batch=4, max_seq=128)
    return gen.generate(prompts,
                        SamplingParams(max_new_tokens=max_new)).token_ids


@pytest.mark.parametrize("family", ["qwen2", "gemma"])
def test_family_paged_engine_matches_dense(family):
    """The paged serving forward must apply family-specific pieces (QKV
    bias, GeGLU, embed scaling) identically to the dense forward —
    regression for the paged path silently dropping them."""
    if family == "qwen2":
        hf_cfg = transformers.Qwen2Config(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            rms_norm_eps=1e-5, rope_theta=10000.0)
        torch.manual_seed(4)
        hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    else:
        hf_cfg = transformers.GemmaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, rms_norm_eps=1e-6,
            tie_word_embeddings=True,
            hidden_activation="gelu_pytorch_tanh")
        torch.manual_seed(5)
        hf = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    prompts = [[2, 5, 9, 200, 17], [7, 7, 7]]
    dense = _generator_generate(cfg, params, prompts, 10)
    paged = _engine_generate(cfg, params, prompts, 10)
    assert paged == dense

def test_gemma_legacy_hidden_act_resolution():
    """Stock google/gemma configs carry legacy `hidden_act: "gelu"` that
    HF transformers IGNORES (it resolves from hidden_activation, default
    gelu_pytorch_tanh). A bare gelu in hidden_act must not leak through."""
    d = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, head_dim=32, model_type="gemma",
             hidden_act="gelu")  # legacy field: must be ignored for gemma
    cfg = ModelConfig.from_hf_dict(d)
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    # explicit hidden_activation always wins
    cfg2 = ModelConfig.from_hf_dict({**d, "hidden_activation": "gelu"})
    assert cfg2.hidden_act == "gelu"
    # non-gemma models still resolve hidden_act normally
    cfg3 = ModelConfig.from_hf_dict(
        {**d, "model_type": "llama", "hidden_act": "silu"})
    assert cfg3.hidden_act == "silu"


def test_qwen3_matches_hf():
    """Qwen3: per-head q/k RMSNorm before RoPE, no QKV bias, explicit
    head_dim decoupled from hidden_size/num_heads."""
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=48, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=1000000.0, tie_word_embeddings=False)
    torch.manual_seed(4)
    hf = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    # random q/k norm weights (ones would mask a head-mapping bug)
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.self_attn.q_norm.weight.mul_(0).add_(
                torch.rand_like(layer.self_attn.q_norm.weight) + 0.5)
            layer.self_attn.k_norm.weight.mul_(0).add_(
                torch.rand_like(layer.self_attn.k_norm.weight) + 0.5)
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.qk_norm and not cfg.attention_bias
    assert cfg.head_dim == 48
    assert get_model_family("qwen3").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert params["layers"]["q_norm"].shape == (2, 48)
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens)


def test_qwen3_paged_engine_matches_dense():
    """The paged serving forward must apply the q/k norms identically to
    the dense forward (and the fused-QKV megakernel must NOT be selected
    for qk_norm models)."""
    cfg = ModelConfig.tiny_test(qk_norm=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    # perturb the norms away from ones so a dropped norm changes tokens
    params["layers"]["q_norm"] = params["layers"]["q_norm"] * 1.5
    params["layers"]["k_norm"] = params["layers"]["k_norm"] * 0.7
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 8)
    got = _engine_generate(cfg, params, prompts, 8)
    assert got == want


def _gemma2_cfg(**kw):
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=True,
        hidden_activation="gelu_pytorch_tanh",
        query_pre_attn_scalar=24.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=4,
        attn_implementation="eager")
    base.update(kw)
    return transformers.Gemma2Config(**base)


def test_gemma2_matches_hf():
    """Gemma-2: sandwich norms, attn/final logit soft caps,
    query_pre_attn_scalar score scale, ALTERNATING sliding/full layers
    (window 4 < seq 8 so the sliding mask actually bites)."""
    hf_cfg = _gemma2_cfg()
    torch.manual_seed(6)
    hf = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.sandwich_norms and cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 24.0
    assert cfg.layer_types is not None and cfg.sliding_window == 4
    assert cfg.window_pattern() == (2, (4, None))
    assert abs(cfg.embed_scale - 128.0 ** 0.5) < 1e-9
    assert get_model_family("gemma2").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert params["layers"]["post_attn_norm"].shape == (4, 128)
    tokens = np.array([[2, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_gemma2_paged_engine_matches_dense():
    """The paged serving path must apply every Gemma-2 piece (sandwich
    norms, soft caps, alternating windows) identically to the dense
    path — including decode steps where the sliding window trims the
    paged attention reads."""
    cfg = ModelConfig.tiny_test(
        num_layers=4, sandwich_norms=True, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, query_pre_attn_scalar=24.0,
        sliding_window=6,
        layer_types=("sliding_attention", "full_attention") * 2,
        hidden_act="gelu_pytorch_tanh")
    params = llama.init_params(cfg, jax.random.PRNGKey(7))
    # perturb the sandwich norms so dropping one changes tokens
    params["layers"]["post_attn_norm"] = (
        params["layers"]["post_attn_norm"] * 1.3)
    params["layers"]["post_ffn_norm"] = (
        params["layers"]["post_ffn_norm"] * 0.6)
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8, 9], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 10)
    got = _engine_generate(cfg, params, prompts, 10)
    assert got == want


def test_window_pattern_and_layer_types_validation():
    cfg = ModelConfig.tiny_test()
    assert cfg.window_pattern() == (1, (None,))
    cfg = ModelConfig.tiny_test(sliding_window=8)
    assert cfg.window_pattern() == (1, (8,))
    cfg = ModelConfig.tiny_test(
        num_layers=4, sliding_window=8,
        layer_types=["sliding_attention", "full_attention"] * 2)  # list ok
    assert cfg.window_pattern() == (2, (8, None))
    assert cfg.layer_windows == (8, None, 8, None)
    hash(cfg)  # jit static arg requirement
    with pytest.raises(ValueError, match="entries"):
        ModelConfig.tiny_test(num_layers=4, sliding_window=8,
                              layer_types=("sliding_attention",) * 3)
    with pytest.raises(ValueError, match="sliding_window is unset"):
        ModelConfig.tiny_test(num_layers=2,
                              layer_types=("sliding_attention",
                                           "full_attention"))
    with pytest.raises(ValueError, match="unknown layer_types"):
        ModelConfig.tiny_test(num_layers=2, sliding_window=4,
                              layer_types=("sliding_attention", "bogus"))


def _deepseek_cfg(klass, **kw):
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, n_routed_experts=None,
        q_lora_rank=None, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32,
        # all layers dense: HF builds MoE for layer_idx >= this
        first_k_dense_replace=2,
        attn_implementation="eager", attention_bias=False)
    base.update(kw)
    return klass(**base)


def test_deepseek_v2_mla_matches_hf():
    """DeepSeek-V2 MLA (direct q_proj, Lite-style): compressed KV latent,
    shared interleaved-rope key, padded naive cache."""
    hf_cfg = _deepseek_cfg(transformers.DeepseekV2Config)
    torch.manual_seed(8)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.mla and cfg.q_lora_rank is None
    # absorbed default: MQA latent cache, lanes = pad128(dc + rope)
    assert cfg.mla_absorbed and cfg.num_kv_heads == 1
    assert cfg.qk_head_dim == 48 and cfg.head_dim == 128
    assert cfg.query_pre_attn_scalar == 48.0
    assert get_model_family("deepseek_v2").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "kv_a" in params["layers"] and "q_proj" in params["layers"]
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_v2_q_lora_matches_hf():
    """Full-size V2 style: low-rank queries (q_a -> norm -> q_b)."""
    hf_cfg = _deepseek_cfg(transformers.DeepseekV2Config, q_lora_rank=48)
    torch.manual_seed(9)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.q_lora_rank == 48
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "q_b" in params["layers"]
    tokens = np.array([[2, 7, 11, 199, 23, 5]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_mla_paged_engine_matches_dense():
    """The paged serving path (padded pools, flash kernels on TPU) must
    decode MLA models exactly like the dense path."""
    cfg = ModelConfig.from_hf_dict(
        _deepseek_cfg(transformers.DeepseekV2Config).to_dict(),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 8)
    got = _engine_generate(cfg, params, prompts, 8)
    assert got == want


def test_deepseek_absorbed_shared_pool_matches_naive():
    """Absorbed MLA stores ONE latent row in a SHARED pool (cache.v is
    None — half the memory; kernels DMA each page once for score and
    value); tokens must equal the dual-pool naive engine exactly."""
    hf = _deepseek_cfg(transformers.DeepseekV2Config).to_dict()
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    def run(absorbed):
        from simplellminference_tpu.core.config import (EngineConfig,
                                                        KVCacheConfig,
                                                        SamplingParams)
        from simplellminference_tpu.engine import Engine
        cfg = ModelConfig.from_hf_dict(hf, dtype="float32",
                                       mla_absorbed=absorbed)
        params = llama.init_params(cfg, jax.random.PRNGKey(11))
        ecfg = EngineConfig(max_batch_size=4,
                            kv=KVCacheConfig(page_size=8, num_pages=64,
                                             max_pages_per_seq=16,
                                             kv_dtype="f32"))
        eng = Engine(cfg, params, ecfg, decode_burst=3)
        assert (eng.cache.v is None) == absorbed
        return eng.generate(prompts, SamplingParams(max_new_tokens=8))

    assert run(True) == run(False)


def test_deepseek_unsupported_routing_rejected():
    """All three released DeepSeek routing schemes are supported; an
    unknown scoring function is rejected loudly."""
    with pytest.raises(ValueError, match="routing"):
        ModelConfig.from_hf_dict(
            _deepseek_cfg(transformers.DeepseekV2Config,
                          n_routed_experts=8, n_group=2, topk_group=1,
                          scoring_func="sigmoid",
                          topk_method="greedy",
                          first_k_dense_replace=1).to_dict())


def test_deepseek_v2_group_limited_matches_hf():
    """Big-V2 routing: softmax scores, top-k restricted to the
    topk_group groups with the highest max score."""
    hf_cfg = _deepseek_cfg(
        transformers.DeepseekV2Config, num_hidden_layers=3,
        n_routed_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=64, n_shared_experts=1,
        norm_topk_prob=False, routed_scaling_factor=16.0,
        first_k_dense_replace=1, topk_method="group_limited_greedy",
        n_group=2, topk_group=1, aux_loss_alpha=0.0, seq_aux=False)
    torch.manual_seed(16)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.router_n_group == 2 and cfg.router_score_fn == "softmax"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_v3_mla_matches_hf():
    """DeepSeek-V3 shares the MLA attention; dense-FFN config golden."""
    hf_cfg = _deepseek_cfg(transformers.DeepseekV3Config, q_lora_rank=48)
    torch.manual_seed(12)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.mla and cfg.model_type == "deepseek_v3"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[3, 8, 13, 201, 29, 6, 88]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


_YARN_RS = dict(rope_type="yarn", factor=4.0,
                original_max_position_embeddings=64, beta_fast=32,
                beta_slow=1, mscale=0.707, mscale_all_dim=0.707)


def test_deepseek_v2_yarn_matches_hf():
    """Yarn rope scaling (every real DeepSeek checkpoint): NTK-by-parts
    frequency blend + attention-factor-scaled sin/cos. V2 keeps the
    plain (nope+rope)^-0.5 score scale (HF DeepseekV2Attention)."""
    hf_cfg = _deepseek_cfg(transformers.DeepseekV2Config,
                           rope_scaling=dict(_YARN_RS))
    torch.manual_seed(21)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.query_pre_attn_scalar == 48.0  # no mscale^2 on V2
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_v3_yarn_matches_hf():
    """V3 + yarn additionally folds mscale(factor, mscale_all_dim)^2
    into the softmax scale (HF DeepseekV3Attention.__init__)."""
    rs = dict(_YARN_RS, factor=40.0, mscale=1.0, mscale_all_dim=1.0)
    hf_cfg = _deepseek_cfg(transformers.DeepseekV3Config, q_lora_rank=48,
                           rope_scaling=rs)
    torch.manual_seed(22)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    import math
    m = 0.1 * 1.0 * math.log(40.0) + 1.0
    assert abs(cfg.query_pre_attn_scalar - 48.0 / m ** 4) < 1e-9
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[3, 8, 13, 201, 29, 6, 88]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_yarn_tables_match_hf_parameters():
    """Table-level yarn check against HF _compute_yarn_parameters for a
    generic (non-DeepSeek) config: plain attention factor
    0.1*ln(factor)+1 when mscale is absent."""
    from transformers.modeling_rope_utils import _compute_yarn_parameters
    from simplellminference_tpu.ops.ref_ops import rope_tables
    rs = dict(rope_type="yarn", factor=8.0,
              original_max_position_embeddings=128)
    hf_cfg = transformers.LlamaConfig(
        hidden_size=256, num_attention_heads=4, head_dim=64,
        max_position_embeddings=1024, rope_theta=10000.0,
        rope_scaling=dict(rs))
    inv, att = _compute_yarn_parameters(hf_cfg, torch.device("cpu"))
    pos = jnp.array([0.0, 7.0, 101.0])
    sin, cos = rope_tables(pos, 64, 10000.0, rope_scaling=rs)
    want_sin = np.sin(pos[:, None] * inv.numpy()[None]) * att
    want_cos = np.cos(pos[:, None] * inv.numpy()[None]) * att
    np.testing.assert_allclose(np.asarray(sin), want_sin, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cos), want_cos, atol=1e-5)


def test_deepseek_v2_moe_matches_hf():
    """DeepSeek-V2 MoE: greedy softmax routing WITHOUT renorm, times
    routed_scaling_factor, unweighted shared experts, and a dense first
    layer (first_k_dense_replace) living in its own stacked group."""
    hf_cfg = _deepseek_cfg(
        transformers.DeepseekV2Config, num_hidden_layers=3,
        n_routed_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, n_shared_experts=2,
        norm_topk_prob=False, routed_scaling_factor=2.0,
        first_k_dense_replace=1, topk_method="greedy",
        aux_loss_alpha=0.0, seq_aux=False, n_group=1, topk_group=1)
    torch.manual_seed(13)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.num_experts == 4 and cfg.first_k_dense == 1
    assert cfg.routed_scaling_factor == 2.0
    assert not cfg.norm_topk_prob and not cfg.shared_expert_gate
    assert cfg.shared_expert_intermediate_size == 128
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "dense_layers" in params
    assert params["dense_layers"]["w_gate_up"].shape[0] == 1
    assert params["layers"]["w_gate_up"].shape[0] == 2
    assert "shared_gate" not in params["layers"]
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_v2_moe_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        _deepseek_cfg(transformers.DeepseekV2Config, num_hidden_layers=3,
                      n_routed_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=64, n_shared_experts=1,
                      norm_topk_prob=False, routed_scaling_factor=1.5,
                      first_k_dense_replace=1).to_dict(), dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(14))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 8)
    got = _engine_generate(cfg, params, prompts, 8)
    assert got == want


def test_deepseek_v3_moe_matches_hf():
    """DeepSeek-V3 noaux_tc routing: sigmoid scores, group-limited
    selection on bias-corrected scores (n_group/topk_group), weights
    from the UNBIASED scores, renormalized, times scaling."""
    hf_cfg = _deepseek_cfg(
        transformers.DeepseekV3Config, num_hidden_layers=3,
        n_routed_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=64, n_shared_experts=1,
        norm_topk_prob=True, routed_scaling_factor=2.5,
        first_k_dense_replace=1, n_group=2, topk_group=1)
    torch.manual_seed(15)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    # nonzero selection bias so the noaux path actually changes routing
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.add_(
                torch.randn(8) * 0.3)
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.router_score_fn == "sigmoid"
    assert cfg.router_n_group == 2 and cfg.router_topk_group == 1
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "router_bias" in params["layers"]
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_mla_naive_mode_matches_hf():
    """mla_absorbed=False keeps the per-head padded cache — same HF
    logits through a different cache layout."""
    hf_cfg = _deepseek_cfg(transformers.DeepseekV2Config)
    torch.manual_seed(8)
    hf = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32",
                                   mla_absorbed=False)
    assert not cfg.mla_absorbed
    assert cfg.head_dim == 64 and cfg.num_kv_heads == cfg.num_heads
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_deepseek_absorbed_engine_cache_is_small():
    """The absorbed paged engine caches ONE latent row per token: the
    pools are [L, P, 1, ps, pad128(dc+rope)] — and decode still matches
    the dense path exactly."""
    cfg = ModelConfig.from_hf_dict(
        _deepseek_cfg(transformers.DeepseekV2Config).to_dict(),
        dtype="float32")
    assert cfg.num_kv_heads == 1 and cfg.head_dim == 128
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 8)

    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig)
    from simplellminference_tpu.engine import Engine
    ecfg = EngineConfig(max_batch_size=4,
                        kv=KVCacheConfig(page_size=8, num_pages=64,
                                         max_pages_per_seq=16,
                                         kv_dtype="f32"))
    eng = Engine(cfg, params, ecfg, decode_burst=3)
    assert eng.cache.k.shape == (2, 65, 1, 8, 128)  # +1 trash page
    from simplellminference_tpu.core.config import SamplingParams
    got = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    assert got == want


def test_gemma3_matches_hf():
    """Gemma-3 (text): per-head q/k RMSNorm ((1+w) Gemma convention),
    sandwich norms, 5:1 sliding/full layer pattern with a DIFFERENT rope
    base for sliding layers (rope_local_base_freq) — the per-window rope
    tables must select the right theta per sublayer."""
    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        tie_word_embeddings=True, query_pre_attn_scalar=24.0,
        sliding_window=4, sliding_window_pattern=2,
        layer_types=["sliding_attention", "full_attention"] * 2,
        attn_implementation="eager")
    torch.manual_seed(17)
    hf = transformers.Gemma3ForCausalLM(hf_cfg).eval()
    # random q/k norms so a dropped/wrong-convention norm changes logits
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.self_attn.q_norm.weight.add_(
                torch.rand_like(layer.self_attn.q_norm.weight) * 0.5)
            layer.self_attn.k_norm.weight.add_(
                torch.rand_like(layer.self_attn.k_norm.weight) * 0.5)
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "gemma3_text"
    assert cfg.qk_norm and cfg.sandwich_norms
    assert cfg.rope_local_theta == 10000.0 and cfg.rope_theta == 1000000.0
    assert cfg.window_pattern() == (2, (4, None))
    assert abs(cfg.embed_scale - 128.0 ** 0.5) < 1e-9
    assert get_model_family("gemma3_text").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[2, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_gemma3_paged_engine_matches_dense():
    cfg = ModelConfig.tiny_test(
        num_layers=4, qk_norm=True, sandwich_norms=True,
        query_pre_attn_scalar=24.0, sliding_window=6,
        rope_theta=1000000.0, rope_local_theta=10000.0,
        layer_types=("sliding_attention", "full_attention") * 2,
        hidden_act="gelu_pytorch_tanh", embed_scale=128.0 ** 0.5)
    params = llama.init_params(cfg, jax.random.PRNGKey(18))
    params["layers"]["q_norm"] = params["layers"]["q_norm"] * 1.4
    params["layers"]["k_norm"] = params["layers"]["k_norm"] * 0.7
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8, 9], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 10)
    got = _engine_generate(cfg, params, prompts, 10)
    assert got == want


# ------------------------------------------------------------- GPT-OSS


def _gpt_oss_cfg(**kw):
    base = dict(
        vocab_size=256, hidden_size=96, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8,
        layer_types=["sliding_attention", "full_attention"] * 2,
        attention_bias=True, attention_dropout=0.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 64,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "truncate": False},
        attn_implementation="eager")
    base.update(kw)
    return transformers.GptOssConfig(**base)


def test_gpt_oss_matches_hf():
    """GPT-OSS: attention sinks, alternating sliding/full layers, yarn
    rope, clamped-SwiGLU MoE with router/expert biases, q/k/v/o biases."""
    hf_cfg = _gpt_oss_cfg()
    torch.manual_seed(31)
    hf = transformers.GptOssForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.attn_sinks and cfg.o_bias and cfg.moe_bias
    assert cfg.hidden_act == "swiglu_oss"
    assert cfg.window_pattern() == (2, (8, None))
    assert get_model_family("gpt_oss").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert "sinks" in params["layers"] and "wo_bias" in params["layers"]
    assert "w_gate_up_bias" in params["layers"]
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120, 9, 33, 2, 90]],
                      np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_gpt_oss_paged_engine_matches_dense():
    """Sinks + sliding windows + MoE biases through the paged serving
    path must decode exactly like the dense path."""
    cfg = ModelConfig.from_hf_dict(_gpt_oss_cfg().to_dict(),
                                   dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(13))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 8)
    got = _engine_generate(cfg, params, prompts, 8)
    assert got == want


def test_attention_sinks_reference_semantics():
    """ref_ops.attention sinks == explicit concat-a-zero-value-key."""
    from simplellminference_tpu.ops import ref_ops as ro
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 4, 3, 16), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 3, 16))
    sinks = jnp.asarray([0.5, -1.0, 2.0])
    mask = ro.causal_mask(4, 4)[None, None]
    got = ro.attention(q, k, v, mask, sinks=sinks)
    # oracle: append a key whose score IS the sink and a zero value
    scale = 16 ** -0.5
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k) * scale
    logits = jnp.where(mask, logits, -1e30)
    col = jnp.broadcast_to(sinks[None, :, None, None], (2, 3, 4, 1))
    probs = jax.nn.softmax(jnp.concatenate([logits, col], -1), axis=-1)
    want = jnp.einsum("bnqk,bknd->bqnd", probs[..., :-1], v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


# --------------------------------------------------------------- Phi-3


def _phi3_cfg(**kw):
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0,
        attn_implementation="eager")
    base.update(kw)
    return transformers.Phi3Config(**base)


def test_phi3_matches_hf():
    """Phi-3: pre-fused qkv_proj/gate_up_proj checkpoints (HF ships them
    in our exact concat order) on the plain Llama graph."""
    hf_cfg = _phi3_cfg()
    torch.manual_seed(41)
    hf = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "phi3"
    assert get_model_family("phi3").name == "llama"
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_phi3_longrope_matches_hf():
    """Longrope scaling: per-dim short/long frequency factors + the
    sqrt(1 + ln(f)/ln(orig)) attention factor. Positions below
    original_max use the short factors — identical to HF eager there
    (past the boundary we select per position, the vLLM convention)."""
    half = 16  # head_dim 32
    rs = {"type": "longrope",
          "short_factor": [1.0 + 0.03 * i for i in range(half)],
          "long_factor": [2.0 + 0.11 * i for i in range(half)]}
    hf_cfg = _phi3_cfg(rope_scaling=rs, max_position_embeddings=512,
                       original_max_position_embeddings=128)
    torch.manual_seed(42)
    hf = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    rs_f = dict(cfg.rope_scaling)
    assert rs_f["factor"] == 4.0
    assert rs_f["original_max_position_embeddings"] == 128
    hash(cfg)  # frozen list values must stay hashable
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120, 31, 90]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_phi3_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        _phi3_cfg(rope_scaling={
            "type": "longrope",
            "short_factor": [1.0] * 16,
            "long_factor": [3.0] * 16},
            max_position_embeddings=512,
            original_max_position_embeddings=16).to_dict(),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(17))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    # crosses the orig_max=16 boundary mid-decode: per-position factor
    # selection must stay cache-consistent between the two paths
    want = _generator_generate(cfg, params, prompts, 16)
    got = _engine_generate(cfg, params, prompts, 16)
    assert got == want


def test_granite_matches_hf():
    """Granite (IBM): Llama graph + four muP-style scalar multipliers —
    embedding_multiplier, attention_multiplier (the score scale),
    residual_multiplier on every block output, logits / logits_scaling."""
    hf_cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
        embedding_multiplier=12.0, attention_multiplier=0.0078125,
        residual_multiplier=0.22, logits_scaling=16.0,
        attention_bias=False, mlp_bias=False)
    torch.manual_seed(43)
    hf = transformers.GraniteForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "granite"
    assert get_model_family("granite").name == "llama"
    assert cfg.embed_scale == 12.0
    assert cfg.residual_scale == 0.22
    assert cfg.logit_scale == 1.0 / 16.0
    # attention_multiplier rides query_pre_attn_scalar = scale**-2
    assert np.isclose(cfg.query_pre_attn_scalar ** -0.5, 0.0078125)
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_granite_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="granite", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, rms_norm_eps=1e-5,
             embedding_multiplier=12.0, attention_multiplier=0.125,
             residual_multiplier=0.22, logits_scaling=8.0),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(19))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_olmo2_matches_hf():
    """OLMo-2: post-norm-only stack (h += norm(attn(h)); h += norm(mlp(h)),
    NO input/pre-FFN norms) with FULL-WIDTH q/k RMSNorm before the head
    split (one rms denominator across heads, unlike Qwen3's per-head)."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(44)
    hf = transformers.Olmo2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "olmo2"
    assert get_model_family("olmo2").name == "llama"
    assert not cfg.pre_norms and cfg.qk_norm and cfg.qk_norm_full
    assert cfg.sandwich_norms
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    lw = params["layers"]
    assert "input_norm" not in lw and "post_norm" not in lw
    assert lw["q_norm"].shape == (2, 128) and lw["k_norm"].shape == (2, 64)
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_olmo2_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="olmo2", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, rms_norm_eps=1e-5),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(23))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_olmoe_matches_hf():
    """OLMoE: pre-norm Llama stack + OLMo-style FULL-WIDTH q/k RMSNorm
    + Mixtral-semantics sparse MoE (softmax over all experts, top-k,
    norm_topk_prob defaulting OFF like Qwen2-MoE)."""
    hf_cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=False)
    torch.manual_seed(45)
    hf = transformers.OlmoeForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "olmoe"
    assert cfg.pre_norms and cfg.qk_norm and cfg.qk_norm_full
    assert cfg.num_experts == 8 and not cfg.norm_topk_prob
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    assert params["layers"]["q_norm"].shape == (2, 128)
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_olmoe_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="olmoe", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, rms_norm_eps=1e-5,
             num_experts=8, num_experts_per_tok=2,
             norm_topk_prob=False),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(29))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_glm4_matches_hf():
    """GLM-4: partial rotary (first half of head_dim, repeat-interleaved
    frequency layout with half-split rotation), QKV bias, pre-fused
    gate_up checkpoint, and BOTH pre-norms and pre-residual output norms
    (post_self_attn/post_mlp_layernorm)."""
    hf_cfg = transformers.Glm4Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        partial_rotary_factor=0.5, attention_bias=True,
        pad_token_id=0, eos_token_id=2)  # defaults exceed the tiny vocab
    torch.manual_seed(46)
    hf = transformers.Glm4ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "glm4"
    assert cfg.partial_rotary_factor == 0.5 and cfg.rope_interleaved
    assert cfg.sandwich_norms and cfg.pre_norms and cfg.attention_bias
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    lw = params["layers"]
    assert "post_attn_norm" in lw and "input_norm" in lw
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_glm4_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="glm4", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             max_position_embeddings=256, rms_norm_eps=1e-5,
             partial_rotary_factor=0.5, attention_bias=True),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(31))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_helium_matches_hf():
    """Helium (kyutai): Llama graph with INTERLEAVED rope over the full
    head_dim — HF's apply repeat-interleaves the truncated cos/sin
    tables so lanes (2i, 2i+1) share frequency f_i (GLM-4's pairing
    with rotary_dim == head_dim)."""
    hf_cfg = transformers.HeliumConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-8,
        rope_theta=100000.0, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=1)
    torch.manual_seed(47)
    hf = transformers.HeliumForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "helium"
    assert cfg.rope_interleaved and cfg.partial_rotary_factor == 1.0
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_helium_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="helium", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             max_position_embeddings=256, rms_norm_eps=1e-8),
        dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(32))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_smollm3_matches_hf():
    """SmolLM3: Llama graph with NoPE — every no_rope_layers==0 layer
    applies NO rotary at all (identity rotation; the scan period covers
    the 3-rope + 1-nope repeat), tied embeddings."""
    hf_cfg = transformers.SmolLM3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=2000000.0, tie_word_embeddings=True,
        attention_bias=False, pad_token_id=0, eos_token_id=2)
    assert hf_cfg.no_rope_layers == [1, 1, 1, 0]
    torch.manual_seed(48)
    hf = transformers.SmolLM3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "smollm3"
    assert cfg.nope_layers == (False, False, False, True)
    assert cfg.scan_pattern() == (
        4, (None,) * 4, (False, False, False, True))
    assert cfg.window_pattern() == (1, (None,))  # windows alone: period 1
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_smollm3_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="smollm3", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=4,
             num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, rms_norm_eps=1e-6,
             no_rope_layers=[1, 1, 1, 0], tie_word_embeddings=True),
        dtype="float32")
    assert cfg.layer_nope == (False, False, False, True)
    params = llama.init_params(cfg, jax.random.PRNGKey(33))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want


def test_seed_oss_matches_hf():
    """Seed-OSS (ByteDance): Llama graph with QKV bias
    (attention_bias=True, o_proj bias off) and explicit head_dim."""
    hf_cfg = transformers.SeedOssConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=True, attention_out_bias=False, mlp_bias=False,
        attention_dropout=0.0, residual_dropout=0.0,
        pad_token_id=0, eos_token_id=2)
    torch.manual_seed(49)
    hf = transformers.SeedOssForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "seed_oss" and cfg.attention_bias
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_ernie4_5_matches_hf():
    """Ernie-4.5 dense: Llama graph with Helium-style INTERLEAVED rope
    over the full head_dim ("glm rope style with full dim"), tied
    embeddings, use_bias-named QKV bias flag."""
    hf_cfg = transformers.Ernie4_5Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=500000.0, tie_word_embeddings=True, use_bias=False,
        pad_token_id=0, eos_token_id=2)
    torch.manual_seed(50)
    hf = transformers.Ernie4_5ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.model_type == "ernie4_5"
    assert cfg.rope_interleaved and cfg.partial_rotary_factor == 1.0
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    tokens = np.array([[1, 5, 9, 200, 17, 3, 77, 120]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_ernie4_5_with_bias_matches_hf():
    """use_bias=True puts a bias on EVERY projection (qkv, o_proj, AND
    gate/up/down). HF zero-inits biases, so randomize them first — a
    dropped bias must actually move the logits."""
    hf_cfg = transformers.Ernie4_5Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=500000.0, tie_word_embeddings=True, use_bias=True,
        pad_token_id=0, eos_token_id=2)
    torch.manual_seed(51)
    hf = transformers.Ernie4_5ForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if name.endswith(".bias"):
                p.uniform_(-0.1, 0.1)
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    assert cfg.attention_bias and cfg.o_bias and cfg.mlp_bias
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    lw = params["layers"]
    assert "wqkv_bias" in lw and "wo_bias" in lw
    assert "w_gate_up_bias" in lw and "w_down_bias" in lw
    tokens = np.array([[1, 5, 9, 200, 17, 3]], np.int32)
    _logits_match(hf, cfg, params, tokens, rtol=5e-4, atol=5e-4)


def test_ernie4_5_bias_paged_engine_matches_dense():
    cfg = ModelConfig.from_hf_dict(
        dict(model_type="ernie4_5", vocab_size=256, hidden_size=64,
             intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             max_position_embeddings=256, rms_norm_eps=1e-5,
             tie_word_embeddings=True, use_bias=True),
        dtype="float32")
    assert cfg.o_bias and cfg.mlp_bias
    params = llama.init_params(cfg, jax.random.PRNGKey(34))
    assert "w_gate_up_bias" in params["layers"]
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _generator_generate(cfg, params, prompts, 12)
    got = _engine_generate(cfg, params, prompts, 12)
    assert got == want
