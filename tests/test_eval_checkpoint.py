"""PPL harness golden test vs torch; quantized checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # checkpoint+PPL harness e2e

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from simplellminference_tpu.core.config import (ModelConfig, QuantConfig,
                                                SamplingParams)
from simplellminference_tpu.evaluate import perplexity
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
from simplellminference_tpu.runtime.generator import Generator
from simplellminference_tpu.runtime.weights import (
    params_from_torch_state_dict, quantize_params)


@pytest.fixture(scope="module")
def hf_and_params():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_dict(hf_cfg.to_dict(), dtype="float32")
    params = params_from_torch_state_dict(cfg, hf.state_dict(),
                                          dtype="float32")
    return hf, cfg, params


def test_perplexity_matches_torch(hf_and_params):
    hf, cfg, params = hf_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 256, 100).tolist()

    got = perplexity(cfg, params, ids, window=48, stride=48)

    # torch reference: same windowing (nonoverlapping), mean NLL over all
    # next-token targets
    total_nll, total_tok = 0.0, 0
    start = 0
    while start < len(ids) - 1:
        chunk = torch.tensor([ids[start:start + 48]])
        with torch.no_grad():
            logits = hf(chunk).logits
        logp = torch.log_softmax(logits[:, :-1].float(), -1)
        tgt = chunk[:, 1:]
        nll = -logp.gather(-1, tgt[..., None])[..., 0].sum()
        total_nll += float(nll)
        total_tok += tgt.numel()
        start += 48
    want = float(np.exp(total_nll / total_tok))
    assert got == pytest.approx(want, rel=1e-3)


def test_perplexity_strided_window(hf_and_params):
    _, cfg, params = hf_and_params
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 256, 120).tolist()
    # stride < window runs and yields a finite, lower-or-similar ppl
    p1 = perplexity(cfg, params, ids, window=64, stride=32)
    p2 = perplexity(cfg, params, ids, window=64, stride=64)
    assert np.isfinite(p1) and np.isfinite(p2)


def test_int8_ppl_delta_gate(hf_and_params):
    """The BASELINE quality gate logic on a tiny model: INT8 group-quant
    PPL should sit close to FP32 PPL (random tiny model: loose bound)."""
    _, cfg, params = hf_and_params
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 256, 96).tolist()
    p_fp = perplexity(cfg, params, ids, window=48)
    qparams = quantize_params(params, QuantConfig(mode="int8", group_size=32))
    p_q = perplexity(cfg, qparams, ids, window=48)
    # tiny random model → generous budget; real gate is 0.1 on WikiText-2
    assert abs(p_q - p_fp) / p_fp < 0.05


def test_int8_per_channel_ppl_delta(hf_and_params):
    """Per-output-channel INT8 (group_size=0 — the fast default) stays
    within the PPL budget; scales are [1, N] per weight."""
    _, cfg, params = hf_and_params
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 256, 96).tolist()
    p_fp = perplexity(cfg, params, ids, window=48)
    qparams = quantize_params(params, QuantConfig(mode="int8", group_size=0))
    assert qparams["layers"]["wqkv"].scales.shape[-2] == 1
    p_q = perplexity(cfg, qparams, ids, window=48)
    assert abs(p_q - p_fp) / p_fp < 0.05


def test_int8_lm_head_ppl_delta(hf_and_params):
    """quantize_lm_head also quantizes the head; PPL must stay close."""
    _, cfg, params = hf_and_params
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 256, 96).tolist()
    p_fp = perplexity(cfg, params, ids, window=48)
    qparams = quantize_params(
        params, QuantConfig(mode="int8", group_size=32,
                            quantize_lm_head=True))
    from simplellminference_tpu.ops.linear import QuantizedWeight
    assert isinstance(qparams["lm_head"], QuantizedWeight)
    p_q = perplexity(cfg, qparams, ids, window=48)
    assert abs(p_q - p_fp) / p_fp < 0.05


def test_checkpoint_roundtrip_quantized(hf_and_params, tmp_path):
    _, cfg, params = hf_and_params
    qparams = quantize_params(params, QuantConfig(mode="int8", group_size=32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, cfg, qparams, metadata={"quant": "int8"})

    cfg2, params2 = load_checkpoint(path)
    assert cfg2 == cfg
    # identical generation
    g1 = Generator(cfg, qparams, max_seq=64, kv_dtype=jnp.float32)
    g2 = Generator(cfg2, params2, max_seq=64, kv_dtype=jnp.float32)
    sp = SamplingParams(max_new_tokens=8)
    assert (g1.generate([[1, 2, 3]], sp).token_ids
            == g2.generate([[1, 2, 3]], sp).token_ids)


def test_checkpoint_roundtrip_bf16(hf_and_params, tmp_path):
    _, cfg, params = hf_and_params
    bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    path = str(tmp_path / "ckpt_bf16")
    save_checkpoint(path, cfg, bf)
    _, params2 = load_checkpoint(path)
    for a, b in zip(jax.tree.leaves(bf), jax.tree.leaves(params2)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a).view(np.uint16),
                                      np.asarray(b).view(np.uint16))
