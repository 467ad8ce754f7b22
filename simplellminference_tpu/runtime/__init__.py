"""Runtime: weight loading, KV caches, jitted prefill/decode, generation.

Successor of the reference's L5 ``LlamaModel::{init, forward, predict}``
(model.cpp:22-187), redesigned for JAX: weights are loaded from HF
safetensors into a sharded params pytree (instead of mmap'ing a headerless
FP32 blob, model.cpp:204-245), the decode step is a single jitted function
with a donated KV cache (instead of ~480 kernel launches per token,
SURVEY.md §3.3), and sampling runs on-device (instead of a per-token D2H
logits copy + CPU argmax, model.cpp:175-179).
"""
