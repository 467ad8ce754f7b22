"""Cross-backend check: greedy decode tokens on real TPU vs CPU reference.

Runs the same random TinyLlama-shaped model (bf16 + INT8 variants) through
Generator.generate on whichever backend this process sees; prints the token
ids. The wrapper compares TPU output against a CPU subprocess — catching
Pallas kernel bugs (stacked qmm, flash decode, kv_append aliasing) against
the pure-jnp path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    from simplellminference_tpu.core.config import (ModelConfig, QuantConfig,
                                                    SamplingParams)
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.runtime.weights import quantize_params

    quant = "--int8" in sys.argv
    # --per-channel: group_size=0 -> one scale per output column (the
    # production decode config; exercises the fused FFN megakernel path)
    gs = 0 if "--per-channel" in sys.argv else 128
    cfg = ModelConfig.tinyllama_1_1b(num_layers=4, max_seq_len=256,
                                     dtype="bfloat16")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    if quant:
        params = quantize_params(params, QuantConfig(mode="int8",
                                                     group_size=gs))
    gen = Generator(cfg, params, max_batch=2, max_seq=256)
    res = gen.generate([[1, 2, 3, 4, 5], [9, 8, 7]],
                       SamplingParams(max_new_tokens=12))
    print("TOKENS", jax.default_backend(), res.token_ids)


if __name__ == "__main__":
    main()
