"""Op layer: Pallas TPU kernels + pure-jnp reference implementations.

Successor of the reference's L3/L4 (source/kernel/{cpu,cuda}, source/op —
SURVEY.md §2.3-2.5). Layout:

    ref_ops.py    — pure-jnp reference math for every op (the "CPU backend")
    rmsnorm.py    — fused Pallas RMSNorm
    rope.py       — RoPE table precompute + application (correct GQA handling,
                    unlike reference Q2 which overruns k: rope_kernel.cpp:27)
    matmul.py     — Pallas fused INT8-group dequant+matmul (MXU-tiled)
    quant.py      — weight group-quantization
    attention/    — flash prefill + paged flash decode kernels
    sampling.py   — on-device greedy/temperature/top-k/top-p sampling

Every Pallas kernel has a jnp reference and a dispatch wrapper that selects
the kernel on TPU and the reference elsewhere (or under interpret mode).
"""
