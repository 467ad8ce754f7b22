"""Absorbed (shared-latent-pool) vs naive MLA decode throughput, on-chip.

Mid-size MLA model (DeepSeek-V2-Lite attention geometry at 16 layers,
dense FFN), batch 8, ~1k context, decode through the Engine. The
absorbed cache stores ONE 640-lane latent row per token; since the
shared-pool change the row is stored ONCE (cache.v is None) and the
attention kernels DMA each page once for both score and value.

Usage: python benchmarks/bench_mla.py [--steps 128]
"""
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax

from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.models import llama

HF = dict(
    model_type="deepseek_v2", vocab_size=8192, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=16, num_attention_heads=16,
    num_key_value_heads=16, max_position_embeddings=4096,
    rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=False,
    n_routed_experts=None, q_lora_rank=None, kv_lora_rank=512,
    qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
    first_k_dense_replace=16, attention_bias=False)


def run(absorbed: bool, steps: int, ctx: int = 1024, batch: int = 8):
    cfg = ModelConfig.from_hf_dict(HF, dtype="bfloat16",
                                   mla_absorbed=absorbed)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=batch, prefill_chunk=512,
        kv=KVCacheConfig(page_size=128,
                         num_pages=batch * (ctx + steps + 512) // 128 + 8,
                         max_pages_per_seq=(ctx + steps + 512) // 128 + 2,
                         kv_dtype="bf16"))
    eng = Engine(cfg, params, ecfg, decode_burst=16)
    if absorbed:
        assert eng.cache.v is None   # shared single latent pool
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, 8000, size=ctx)) for _ in range(batch)]
    samp = SamplingParams(max_new_tokens=steps, ignore_eos=True)
    reqs = [eng.add_request(prompt_ids=p, sampling=samp) for p in prompts]
    # warm (compile prefill+burst graphs): run a few steps
    while any(r.num_generated < 8 for r in reqs if r.state.value != "failed"):
        eng.step()
    n0 = sum(r.num_generated for r in reqs)
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    n = sum(r.num_generated for r in reqs) - n0
    return n / dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()
    a = run(True, args.steps)
    print(f"absorbed(shared pool): {a:.1f} tok/s", flush=True)
    b = run(False, args.steps)
    print(f"naive:                 {b:.1f} tok/s  ({a / b:.2f}x)",
          flush=True)
