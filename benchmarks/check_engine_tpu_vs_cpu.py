"""Engine (paged KV) greedy tokens: TPU Pallas path vs CPU scatter path.

Catches paged-kernel bugs (paged_append RMW, trash-page redirection,
head-packed paged_flash_decode) against the jnp reference."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    ModelConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.models import llama

    cfg = ModelConfig.tinyllama_1_1b(num_layers=4, max_seq_len=512,
                                     num_heads=16, num_kv_heads=16,
                                     head_dim=128, hidden_size=2048,
                                     dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=4,
                        kv=KVCacheConfig(page_size=16, num_pages=128,
                                         max_pages_per_seq=16))
    eng = Engine(cfg, params, ecfg, decode_burst=4)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, ln).tolist()
               for ln in (12, 30, 7, 45, 20, 33)]
    outs = eng.generate(prompts, SamplingParams(max_new_tokens=16))
    print("ENGTOKENS", jax.default_backend(), outs)


if __name__ == "__main__":
    main()
