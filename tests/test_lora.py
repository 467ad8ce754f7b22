"""Multi-LoRA serving tests: adapter math, engine correctness vs
merged-weight references, per-slot isolation, adapter-aware prefix
cache, and the HF PEFT checkpoint loader.

The reference serves exactly one weight set (mmap blob,
model.cpp:204-245); multi-LoRA is a capability extension — correctness
oracle is weight merging: serving with adapter X must equal a dense
model whose weights are W + scaling * A_X @ B_X.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-LoRA engine e2e

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine, RequestState
from simplellminference_tpu.models import llama
from simplellminference_tpu.runtime import lora as lora_lib
from simplellminference_tpu.runtime.generator import Generator


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny_test(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _rand_adapter(cfg, seed, rank=4, alpha=8.0, targets=("wqkv", "wo",
                                                         "w_gate_up",
                                                         "w_down")):
    """Random adapter in the fused layout (B nonzero so it has effect)."""
    rng = np.random.default_rng(seed)
    L = cfg.num_layers
    dims = {
        "wqkv": (cfg.hidden_size,
                 (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim),
        "wo": (cfg.num_heads * cfg.head_dim, cfg.hidden_size),
        "w_gate_up": (cfg.hidden_size, 2 * cfg.intermediate_size),
        "w_down": (cfg.intermediate_size, cfg.hidden_size),
    }
    weights = {}
    for t in targets:
        k, n = dims[t]
        a = rng.standard_normal((L, k, rank)).astype(np.float32) * 0.05
        b = rng.standard_normal((L, rank, n)).astype(np.float32) * 0.05
        weights[t] = (a, b)
    return lora_lib.LoRAAdapter(rank=rank, scaling=alpha / rank,
                                weights=weights)


def _merge(cfg, params, adapter):
    """Dense reference: fold scaling * A @ B into each base weight."""
    merged = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    merged["layers"] = dict(params["layers"])
    for t, (a, b) in adapter.weights.items():
        delta = jnp.einsum("lkr,lrn->lkn", jnp.asarray(a),
                           jnp.asarray(b)) * adapter.scaling
        merged["layers"][t] = (params["layers"][t]
                               + delta.astype(params["layers"][t].dtype))
    return merged


def make_engine(cfg, params, loras=None, prefix_entries=0):
    ecfg = EngineConfig(
        max_batch_size=4,
        kv=KVCacheConfig(page_size=8, num_pages=64, max_pages_per_seq=16,
                         kv_dtype="f32"),
        prefix_cache_entries=prefix_entries)
    return Engine(cfg, params, ecfg, decode_burst=3, loras=loras)


def _dense(cfg, params, prompts, max_new):
    gen = Generator(cfg, params, max_batch=len(prompts), max_seq=128,
                    kv_dtype=jnp.float32)
    return gen.generate(prompts,
                        SamplingParams(max_new_tokens=max_new)).token_ids


def test_apply_lora_matches_einsum(model):
    cfg, _ = model
    ad = _rand_adapter(cfg, 1, targets=("wqkv",))
    tree, index = lora_lib.stack_adapters(cfg, {"x": ad},
                                          dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, cfg.hidden_size)),
                    jnp.float32)
    y = jnp.zeros((2, 3, (cfg.num_heads + 2 * cfg.num_kv_heads)
                   * cfg.head_dim), jnp.float32)
    li = jnp.asarray(1, jnp.int32)
    idx = jnp.asarray([index["x"], 0], jnp.int32)   # row 1: null adapter
    got = lora_lib.apply_lora(tree, idx, "wqkv", x, li, y)
    a, b = ad.weights["wqkv"]
    want0 = (x[0] @ jnp.asarray(a[1]) @ jnp.asarray(b[1])) * ad.scaling
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), 0.0, atol=1e-7)


def test_engine_lora_matches_merged_weights(model):
    """A mixed batch — adapter A, adapter B, and base — must decode
    exactly like three dense models with the adapters merged in."""
    cfg, params = model
    ad_a = _rand_adapter(cfg, 10)
    ad_b = _rand_adapter(cfg, 11, rank=2, alpha=4.0,
                         targets=("wqkv", "w_down"))
    prompts = [[1, 2, 3, 4, 5], [1, 2, 3, 4, 5], [1, 2, 3, 4, 5]]
    want_a = _dense(cfg, _merge(cfg, params, ad_a), prompts[:1], 8)[0]
    want_b = _dense(cfg, _merge(cfg, params, ad_b), prompts[:1], 8)[0]
    want_0 = _dense(cfg, params, prompts[:1], 8)[0]
    assert want_a != want_0 and want_b != want_0, \
        "adapters too weak to change tokens — test is vacuous"

    eng = make_engine(cfg, params, loras={"a": ad_a, "b": ad_b})
    r_a = eng.add_request(prompt_ids=prompts[0], lora="a",
                          sampling=SamplingParams(max_new_tokens=8))
    r_b = eng.add_request(prompt_ids=prompts[1], lora="b",
                          sampling=SamplingParams(max_new_tokens=8))
    r_0 = eng.add_request(prompt_ids=prompts[2],
                          sampling=SamplingParams(max_new_tokens=8))
    eng.run()
    assert r_a.output_ids == want_a
    assert r_b.output_ids == want_b
    assert r_0.output_ids == want_0


def test_from_arrays_blockdiag_fold(model):
    """Separate q/k/v LoRA pairs fold block-diagonally into the fused
    wqkv target: delta lands on exactly the right output columns."""
    cfg, _ = model
    rng = np.random.default_rng(3)
    L, h, r = cfg.num_layers, cfg.hidden_size, 3
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    aq = rng.standard_normal((L, h, r)).astype(np.float32)
    bq = rng.standard_normal((L, r, nq)).astype(np.float32)
    av = rng.standard_normal((L, h, r)).astype(np.float32)
    bv = rng.standard_normal((L, r, nkv)).astype(np.float32)
    ad = lora_lib.from_arrays(
        cfg, {"q_proj": {"a": aq, "b": bq},
              "v_proj": {"a": av, "b": bv}}, rank=r, alpha=6.0)
    a, b = ad.weights["wqkv"]
    x = rng.standard_normal((h,)).astype(np.float32)
    delta = x @ a[0] @ b[0]
    np.testing.assert_allclose(delta[:nq], x @ aq[0] @ bq[0], rtol=1e-4)
    np.testing.assert_allclose(delta[nq:nq + nkv], 0.0, atol=1e-5)
    np.testing.assert_allclose(delta[nq + nkv:], x @ av[0] @ bv[0],
                               rtol=1e-4)
    assert ad.scaling == pytest.approx(6.0 / 3)


def test_unknown_adapter_fails_cleanly(model):
    cfg, params = model
    eng = make_engine(cfg, params, loras={"a": _rand_adapter(cfg, 5)})
    req = eng.add_request(prompt_ids=[1, 2, 3], lora="nope",
                          sampling=SamplingParams(max_new_tokens=4))
    assert req.state == RequestState.FAILED
    assert "unknown LoRA adapter" in req.error
    # engine still serves
    ok = eng.add_request(prompt_ids=[1, 2, 3], lora="a",
                         sampling=SamplingParams(max_new_tokens=4))
    eng.run()
    assert len(ok.output_ids) == 4


def test_prefix_cache_is_adapter_scoped(model):
    """KV pages written under adapter X are not a valid prefix for the
    base model (LoRA changes the k/v projections): no cross-adapter
    prefix hits, but same-adapter reuse still works."""
    cfg, params = model
    eng = make_engine(cfg, params, loras={"a": _rand_adapter(cfg, 6)},
                      prefix_entries=4)
    prompt = list(range(1, 26))  # 25 tokens -> 3 full pages retained
    r1 = eng.add_request(prompt_ids=prompt, lora="a",
                         sampling=SamplingParams(max_new_tokens=4))
    eng.run()
    r2 = eng.add_request(prompt_ids=prompt,   # base model, same text
                         sampling=SamplingParams(max_new_tokens=4))
    eng.run()
    assert r2.cached_len == 0, "cross-adapter prefix hit is unsound"
    r3 = eng.add_request(prompt_ids=prompt, lora="a",
                         sampling=SamplingParams(max_new_tokens=4))
    eng.run()
    assert r3.cached_len > 0, "same-adapter prefix should hit"
    assert r3.output_ids == r1.output_ids


def test_peft_loader_roundtrip(model, tmp_path):
    """A synthetic HF PEFT directory loads into the fused layout."""
    safetensors = pytest.importorskip("safetensors.numpy")
    cfg, params = model
    rng = np.random.default_rng(7)
    r, h = 2, cfg.hidden_size
    nq = cfg.num_heads * cfg.head_dim
    tensors = {}
    for i in range(cfg.num_layers):
        stem = f"base_model.model.model.layers.{i}.self_attn.q_proj"
        tensors[stem + ".lora_A.weight"] = rng.standard_normal(
            (r, h)).astype(np.float32)
        tensors[stem + ".lora_B.weight"] = rng.standard_normal(
            (nq, r)).astype(np.float32)
    safetensors.save_file(tensors,
                          os.path.join(tmp_path, "adapter_model.safetensors"))
    with open(os.path.join(tmp_path, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": 16,
                   "target_modules": ["q_proj"]}, f)
    ad = lora_lib.load_peft_adapter(cfg, str(tmp_path))
    assert "wqkv" in ad.weights
    a, b = ad.weights["wqkv"]
    assert a.shape == (cfg.num_layers, h, 3 * r)
    assert ad.scaling == pytest.approx(16 / r)
    # the q block matches the checkpoint; k/v blocks are zero
    np.testing.assert_allclose(
        a[0, :, :r],
        tensors["base_model.model.model.layers.0.self_attn."
                "q_proj.lora_A.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(b[0, r:, :], 0.0, atol=0)
