"""WikiText-2-style perplexity CLI (BASELINE configs #1/#2 quality gate).

Usage:
    python -m simplellminference_tpu.cli.eval_ppl \
        --model-dir /path/to/hf_llama --text-file wiki.test.txt \
        [--compare-int8] [--window 2048] [--kv-dtype bf16]

Prints one JSON line: {"ppl": ..., "ppl_int8": ..., "delta": ...}.
The INT8 gate passes when delta <= 0.1 (BASELINE.md config #2).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--text-file", required=True,
                    help="plain-text eval corpus (e.g. WikiText-2 test)")
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="truncate the corpus (0 = all)")
    ap.add_argument("--compare-int8", action="store_true",
                    help="also evaluate INT8 group-quant and report delta")
    ap.add_argument("--compare-int4", action="store_true",
                    help="also report int4 group-quant PPL + delta")
    ap.add_argument("--compare-w8a8", action="store_true",
                    help="also report INT8-weights + int8-activation "
                         "(ModelConfig.act_quant) PPL + delta — the "
                         "quality gate for --act-quant serving")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.evaluate import perplexity
    from simplellminference_tpu.runtime.weights import (load_safetensors_dir,
                                                        quantize_params)
    from simplellminference_tpu.tokenizer import load_tokenizer

    tok = load_tokenizer(args.model_dir)
    with open(args.text_file) as f:
        text = f.read()
    ids = tok.encode(text)
    if args.max_tokens:
        ids = ids[:args.max_tokens]
    print(f"[{len(ids)} tokens]", file=sys.stderr)

    cfg, params = load_safetensors_dir(args.model_dir, dtype=args.dtype)
    result = {"ppl": round(perplexity(cfg, params, ids, args.window,
                                      args.stride, progress=True), 4)}
    if args.compare_int8:
        qparams = quantize_params(
            params, QuantConfig(mode="int8", group_size=args.group_size))
        result["ppl_int8"] = round(perplexity(cfg, qparams, ids, args.window,
                                              args.stride, progress=True), 4)
        result["delta"] = round(result["ppl_int8"] - result["ppl"], 4)
        result["gate_0.1"] = "PASS" if result["delta"] <= 0.1 else "FAIL"
    if args.compare_int4:
        qparams = quantize_params(
            params, QuantConfig(mode="int4", group_size=args.group_size))
        result["ppl_int4"] = round(perplexity(cfg, qparams, ids, args.window,
                                              args.stride, progress=True), 4)
        result["delta_int4"] = round(result["ppl_int4"] - result["ppl"], 4)
    if args.compare_w8a8:
        import dataclasses
        qparams = quantize_params(
            params, QuantConfig(mode="int8", group_size=args.group_size))
        cfg8 = dataclasses.replace(cfg, act_quant="int8")
        result["ppl_w8a8"] = round(perplexity(cfg8, qparams, ids,
                                              args.window, args.stride,
                                              progress=True), 4)
        result["delta_w8a8"] = round(result["ppl_w8a8"] - result["ppl"], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
