"""KV-cache quantization QUALITY evidence (VERDICT r1 item 8).

Teacher-forced decode perplexity through the PAGED path — the decode
steps read K/V back from the quantized pools, so this measures exactly
what fp8/int8 KV storage costs, with the f32 pools as the oracle.
(The INT8 path additionally has a token-exact engine test; fp8 had no
quantified evidence before this.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # teacher-forced PPL ladders (per-dtype compiles)

from simplellminference_tpu.core.config import ModelConfig, next_power_of_2
from simplellminference_tpu.memory.allocator import PageAllocator
from simplellminference_tpu.memory.paged_kv import (PagedKVCache,
                                                    kv_storage_dtype)
from simplellminference_tpu.models import llama


@pytest.fixture(scope="module")
def mid_model():
    # big enough that KV rounding noise has layers to compound through
    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=4, num_heads=8,
                      num_kv_heads=4, head_dim=32, max_seq_len=256,
                      dtype="float32")
    return cfg, llama.init_params(cfg, jax.random.PRNGKey(7))


def _decode_ppl(cfg, params, ids, kv_dtype: str) -> float:
    """Prefill the first half of ``ids``; teacher-force the second half
    one decode step at a time, scoring each next-token prediction."""
    ps, npages = 8, 64
    n = len(ids)
    half = n // 2
    alloc = PageAllocator(npages, ps, 1, 32)
    assert alloc.alloc_seq(0, n)
    tables = jnp.asarray(alloc.row(0)[None])
    cache = PagedKVCache.create(cfg.num_layers, npages, cfg.num_kv_heads,
                                ps, cfg.head_dim,
                                kv_storage_dtype(kv_dtype))

    bucket = next_power_of_2(half)
    tokens = np.zeros((1, bucket), np.int32)
    tokens[0, :half] = ids[:half]
    positions = np.arange(bucket, dtype=np.int32)[None]
    logits, cache = llama.forward_paged(
        cfg, params, jnp.asarray(tokens), jnp.asarray(positions), cache,
        tables, jnp.asarray([half], np.int32), prefill=True,
        last_token_only=True)
    nll = [-float(jax.nn.log_softmax(logits[0, -1])[ids[half]])]

    for t in range(half, n - 1):
        logits, cache = llama.forward_paged(
            cfg, params, jnp.asarray([[ids[t]]], jnp.int32),
            jnp.asarray([[t]], jnp.int32), cache, tables,
            jnp.asarray([t + 1], np.int32), prefill=False)
        nll.append(-float(jax.nn.log_softmax(logits[0, 0])[ids[t + 1]]))
    return float(np.exp(np.mean(nll)))


def test_fp8_and_int8_kv_ppl_close_to_f32(mid_model):
    cfg, params = mid_model
    rng = np.random.default_rng(3)
    ids = rng.integers(1, cfg.vocab_size, 64).tolist()

    ppl = {dt: _decode_ppl(cfg, params, ids, dt)
           for dt in ("f32", "bf16", "fp8", "int8")}
    base = ppl["f32"]
    # storage-precision ladder: bf16 ~ exact, int8 (scaled) tight, fp8
    # (e4m3 direct cast, ~2 mantissa digits) small but visible
    assert abs(ppl["bf16"] - base) / base < 0.02, ppl
    assert abs(ppl["int8"] - base) / base < 0.05, ppl
    assert abs(ppl["fp8"] - base) / base < 0.10, ppl
    print("kv-quality ppl:", {k: round(v, 3) for k, v in ppl.items()})
