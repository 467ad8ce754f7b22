"""simplellminference_tpu — a TPU-native quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas framework with the full capabilities of the
C++/CUDA reference ``Boundwhd/SimpleLLMInference`` (Llama-architecture decode:
RMSNorm, GQA attention with RoPE + KV cache, SwiGLU FFN, tied LM head,
tokenizer round trip, greedy generation — reference: source/model/model.cpp),
redesigned TPU-first and extended with INT8 group-quantized Pallas
dequant+matmul kernels, paged KV cache, continuous batching, flash prefill,
and tensor sharding over a `jax.sharding.Mesh`.

Layer map (successor of the reference's 5-layer stack, SURVEY.md §1):

    core/      — configs, dtype policies            (replaces include/base, config.h)
    memory/    — paged KV allocator + page tables   (replaces memory/alloc,tensor)
    ops/       — Pallas kernels + jnp references    (replaces kernel/{cpu,cuda})
    models/    — functional model graphs            (replaces op/ + model forward)
    parallel/  — mesh, shardings, collectives       (absent in reference)
    runtime/   — weights, KV cache, generator       (replaces model init/predict)
    engine/    — continuous batching scheduler      (absent in reference)
    cli/       — generate / bench entry points      (replaces gitignored /demo)
"""

__version__ = "0.1.0"

from simplellminference_tpu.core.config import (  # noqa: F401
    EngineConfig,
    KVCacheConfig,
    ModelConfig,
    QuantConfig,
)
