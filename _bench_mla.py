"""Absorbed vs naive MLA decode throughput on the real chip.

Mid-size MLA model (V2-Lite attention geometry at 16 layers, dense FFN),
batch 8, ~1k context: KV traffic dominates the naive mode
(2*16 heads*256 lanes vs 2*640 lanes per token per layer)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from simplellminference_tpu.core.config import (EngineConfig, KVCacheConfig,
                                                ModelConfig, SamplingParams)
from simplellminference_tpu.engine import Engine
from simplellminference_tpu.models import llama

base = dict(
    model_type="deepseek_v2", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=16, num_attention_heads=16,
    num_key_value_heads=16, max_position_embeddings=4096,
    rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=False,
    q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
    qk_rope_head_dim=64, v_head_dim=128)

PLEN, STEPS, B = 960, 64, 8

def run(absorbed):
    cfg = ModelConfig.from_hf_dict(base, dtype="bfloat16",
                                   mla_absorbed=absorbed)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    ps = 128
    cap = PLEN + STEPS + 64 + ps
    ecfg = EngineConfig(
        max_batch_size=B,
        kv=KVCacheConfig(page_size=ps, num_pages=B * (cap // ps + 1) + 8,
                         max_pages_per_seq=cap // ps + 1),
        prefix_cache_entries=0)
    rng = np.random.default_rng(1)

    def timed(steps):
        eng = Engine(cfg, params, ecfg, decode_burst=16)
        def submit():
            for _ in range(B):
                eng.add_request(
                    prompt_ids=rng.integers(1, 32000, PLEN).tolist(),
                    sampling=SamplingParams(max_new_tokens=steps))
        submit(); eng.run()     # compile
        best = None
        for _ in range(2):
            submit()
            t0 = time.perf_counter(); eng.run()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    tf, th = timed(STEPS), timed(STEPS // 2)
    dec = max(tf - th, 1e-9)
    return B * (STEPS - STEPS // 2) / dec

t_n = run(False)
t_a = run(True)
print(f"MLA decode tok/s @ctx~1k b8: naive {t_n:.1f}  absorbed {t_a:.1f}"
      f"  ({t_a / t_n:.2f}x)")
