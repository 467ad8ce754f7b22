"""Golden tests for the extended model families: Llama-3 rope scaling and
Qwen2 (QKV bias), each vs the HuggingFace torch implementation on a random
tiny model (no network). Same methodology as test_llama_golden.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
