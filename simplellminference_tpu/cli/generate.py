"""Text generation CLI.

Successor of the reference's gitignored /demo driver (.gitignore:2) over
``LlamaModel::predict`` (model.cpp:142-187) — with everything it lacked:
HF checkpoint loading, INT8 quantization, sampling controls, stop tokens,
streaming detokenization, and timing stats.

Usage:
    python -m simplellminference_tpu.cli.generate \
        --model-dir /path/to/hf_llama --prompt "..." --max-new-tokens 128 \
        [--quant int8|int4] [--temperature 0.8 --top-k 50 --top-p 0.95]

Without --model-dir, runs a random-weight TinyLlama with a byte tokenizer
(smoke-test mode).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", default=None,
                    help="HF checkpoint dir (config.json + *.safetensors)")
    ap.add_argument("--blob", default=None,
                    help="reference-format raw FP32 weight blob "
                         "(SimpleLLMInference export; needs --config)")
    ap.add_argument("--config", default=None,
                    help="HF-style config.json for --blob")
    ap.add_argument("--tokenizer", default=None,
                    help="tokenizer path override (default: model dir)")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--min-p", type=float, default=0.0)
    ap.add_argument("--repetition-penalty", type=float, default=1.0)
    ap.add_argument("--frequency-penalty", type=float, default=0.0)
    ap.add_argument("--presence-penalty", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int4"])
    ap.add_argument("--act-quant", action="store_true",
                    help="W8A8 prefill: per-token int8 activations on "
                         "the MXU's double-rate int8 path (requires "
                         "--quant int8; validate quality with eval_ppl)")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--no-stream", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simplellminference_tpu.core.config import (ModelConfig, QuantConfig,
                                                    SamplingParams)
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.tokenizer import (ByteTokenizer,
                                                  StreamingDetokenizer,
                                                  load_tokenizer)

    quant = QuantConfig(mode=args.quant, group_size=args.group_size)

    t0 = time.perf_counter()
    if args.blob:
        # Migration path: the reference's mmap'd raw-FP32 blob
        # (model.cpp:204-245) + an explicit config.
        if not args.config or not args.tokenizer:
            ap.error("--blob requires --config and --tokenizer")
        from simplellminference_tpu.runtime.raw_blob import load_reference_blob
        cfg = ModelConfig.from_hf_json(args.config, dtype=args.dtype)
        params = load_reference_blob(args.blob, cfg, quant=quant,
                                     dtype=args.dtype)
        tok = load_tokenizer(args.tokenizer)
    elif args.model_dir:
        from simplellminference_tpu.runtime import hf_quant
        if hf_quant.read_quantization_config(args.model_dir):
            # pre-quantized AWQ/GPTQ checkpoint: native 4-bit import
            cfg, params = hf_quant.load_quantized_dir(args.model_dir,
                                                      dtype=args.dtype)
        else:
            from simplellminference_tpu.runtime.weights import (
                load_safetensors_dir)
            cfg, params = load_safetensors_dir(args.model_dir, quant=quant,
                                               dtype=args.dtype)
        tok = load_tokenizer(args.tokenizer or args.model_dir)
    else:
        print("[no --model-dir: random TinyLlama + byte tokenizer]",
              file=sys.stderr)
        cfg = ModelConfig.tinyllama_1_1b(num_layers=4, dtype=args.dtype,
                                         vocab_size=258)
        params = llama.init_params(cfg, jax.random.PRNGKey(args.seed))
        if quant.enabled:
            from simplellminference_tpu.runtime.weights import quantize_params
            params = quantize_params(params, quant)
        tok = ByteTokenizer()
    load_s = time.perf_counter() - t0

    if args.act_quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, act_quant="int8")
    gen = Generator(cfg, params, max_batch=1,
                    max_seq=min(args.max_seq, cfg.max_seq_len))
    prompt_ids = tok.encode(args.prompt)
    sp = SamplingParams(max_new_tokens=args.max_new_tokens,
                        temperature=args.temperature, top_k=args.top_k,
                        top_p=args.top_p, min_p=args.min_p,
                        repetition_penalty=args.repetition_penalty,
                        frequency_penalty=args.frequency_penalty,
                        presence_penalty=args.presence_penalty,
                        seed=args.seed,
                        stop_token_ids=(tok.eos_id,) if tok.eos_id >= 0 else ())

    print(args.prompt, end="", flush=True)
    stream = StreamingDetokenizer(tok)
    t1 = time.perf_counter()
    first_tok_t = None
    n = 0
    # Python-loop generation with streaming output.
    cache = gen.new_cache(1)
    last_logits, cache, lens = gen.prefill(cache, [prompt_ids])
    import numpy as np

    from simplellminference_tpu.ops import sampling as sampling_ops
    key = jax.random.PRNGKey(sp.seed or 0)
    pos = jnp.asarray(lens, jnp.int32)
    temp = jnp.full((1,), sp.temperature, jnp.float32)
    top_k = jnp.full((1,), sp.top_k, jnp.int32)
    top_p = jnp.full((1,), sp.top_p, jnp.float32)

    def pick(logits, key):
        if sp.greedy:
            return sampling_ops.greedy(logits)
        return sampling_ops.sample(logits, key, temp, top_k, top_p)

    key, sub = jax.random.split(key)
    nxt = pick(last_logits, sub)
    while n < sp.max_new_tokens:
        tid = int(np.asarray(nxt)[0])
        if first_tok_t is None:
            first_tok_t = time.perf_counter()
        if tid in sp.stop_token_ids:
            break
        n += 1
        piece = stream.push(tid)
        if piece and not args.no_stream:
            print(piece, end="", flush=True)
        logits, cache = gen._decode_fn(gen.params, nxt[:, None], pos[:, None],
                                       cache, pos + 1)
        key, sub = jax.random.split(key)
        nxt = pick(logits, sub)
        pos = pos + 1
    tail = stream.flush()
    if args.no_stream:
        print(stream._tok.decode(stream._ids), end="")
    elif tail:
        print(tail, end="")
    print()
    el = time.perf_counter() - t1
    ttft = (first_tok_t - t1) if first_tok_t else 0.0
    print(f"[load {load_s:.1f}s | ttft {ttft*1e3:.0f}ms | "
          f"{n} tokens in {el:.2f}s = {n / max(el, 1e-9):.1f} tok/s]",
          file=sys.stderr)


if __name__ == "__main__":
    main()
