"""Golden tests: our Llama vs HuggingFace's torch Llama (random tiny model).

This is the reference's implied-but-never-committed methodology done
properly (SURVEY.md §4: the vestigial layer_outputs ofstream at
model.cpp:42 points at manual diffing vs a gitignored /pytorch exporter).
We instantiate a random tiny ``LlamaForCausalLM`` (no network needed),
convert its state dict, and require logit agreement and token-exact greedy
decode (BASELINE config #1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # HF-golden layer/output comparison

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simplellminference_tpu.core.config import ModelConfig, SamplingParams
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime.generator import Generator
from simplellminference_tpu.runtime.weights import params_from_torch_state_dict


@pytest.fixture(scope="module")
def hf_model_and_params():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    params = params_from_torch_state_dict(cfg, hf.state_dict(), dtype="float32")
    return hf, cfg, params


def test_prefill_logits_match_hf(hf_model_and_params):
    hf, cfg, params = hf_model_and_params
    tokens = np.array([[1, 5, 9, 200, 17, 3]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    positions = np.arange(tokens.shape[1], dtype=np.int32)[None]
    got, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                           jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_no_cache(hf_model_and_params):
    """Token-by-token cached decode == one-shot forward logits."""
    _, cfg, params = hf_model_and_params
    tokens = np.array([[1, 7, 42, 9, 100]], np.int32)
    s = tokens.shape[1]
    positions = np.arange(s, dtype=np.int32)[None]
    full, _ = llama.forward(cfg, params, jnp.asarray(tokens),
                            jnp.asarray(positions))

    from simplellminference_tpu.runtime.kv_cache import DenseKVCache
    cache = DenseKVCache.create(cfg.num_layers, 1, 16, cfg.num_kv_heads,
                                cfg.head_dim, jnp.float32)
    outs = []
    for i in range(s):
        logits, cache = llama.forward(
            cfg, params, jnp.asarray(tokens[:, i:i + 1]),
            jnp.asarray([[i]], jnp.int32), cache,
            offsets=jnp.asarray([i]), kv_lens=jnp.asarray([i + 1]))
        outs.append(np.asarray(logits[:, 0]))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_greedy_decode_token_exact_vs_hf(hf_model_and_params):
    hf, cfg, params = hf_model_and_params
    prompt = [1, 34, 7, 90]
    n_new = 12
    with torch.no_grad():
        want = hf.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
            use_cache=True, pad_token_id=0)[0, len(prompt):].numpy()

    gen = Generator(cfg, params, max_batch=1, max_seq=64, kv_dtype=jnp.float32)
    res = gen.generate([prompt], SamplingParams(max_new_tokens=n_new))
    assert res.token_ids[0] == list(want), (res.token_ids[0], list(want))


def test_batched_generate_matches_single(hf_model_and_params):
    """Ragged batch: each sequence decodes exactly as it would alone."""
    _, cfg, params = hf_model_and_params
    prompts = [[1, 34, 7, 90], [2, 3], [1, 2, 3, 4, 5, 6, 7]]
    gen = Generator(cfg, params, max_batch=4, max_seq=64, kv_dtype=jnp.float32)
    batch = gen.generate(prompts, SamplingParams(max_new_tokens=8))
    for i, p in enumerate(prompts):
        single = gen.generate([p], SamplingParams(max_new_tokens=8))
        assert batch.token_ids[i] == single.token_ids[0]


def test_fused_generate_matches_loop(hf_model_and_params):
    _, cfg, params = hf_model_and_params
    prompts = [[1, 34, 7, 90], [5, 6, 7]]
    gen = Generator(cfg, params, max_batch=2, max_seq=64, kv_dtype=jnp.float32)
    loop = gen.generate(prompts, SamplingParams(max_new_tokens=6))
    fused = np.asarray(gen.generate_fused(prompts, max_new_tokens=6))
    for i in range(len(prompts)):
        assert loop.token_ids[i] == fused[i].tolist()


def test_tied_embeddings():
    cfg = ModelConfig.tiny_test(tie_word_embeddings=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    assert "lm_head" not in params
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    logits, _ = llama.forward(cfg, params, tokens, pos)
    assert logits.shape == (1, 3, cfg.vocab_size)
    # logits for token t at position where input embeds equal row t should
    # at least be finite and fp32
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())
