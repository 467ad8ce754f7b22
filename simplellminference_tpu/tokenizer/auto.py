"""Tokenizer auto-detection for a model directory."""

from __future__ import annotations

import os

from simplellminference_tpu.tokenizer.bytes import ByteTokenizer
from simplellminference_tpu.tokenizer.hf import HFTokenizer
from simplellminference_tpu.tokenizer.sentencepiece import SentencePieceTokenizer


def load_tokenizer(model_dir_or_file: str):
    """tokenizer.model -> native SentencePiece; tokenizer.json -> HF fast.

    (The reference takes an explicit sentencepiece path, model.h:61.)
    """
    p = model_dir_or_file
    if p == "bytes":
        from simplellminference_tpu.tokenizer.bytes import ByteTokenizer
        return ByteTokenizer()
    if os.path.isfile(p):
        if p.endswith(".json"):
            return HFTokenizer(p)
        return SentencePieceTokenizer.from_file(p)
    sp = os.path.join(p, "tokenizer.model")
    if os.path.exists(sp):
        return SentencePieceTokenizer.from_file(sp)
    hf = os.path.join(p, "tokenizer.json")
    if os.path.exists(hf):
        return HFTokenizer(hf)
    raise FileNotFoundError(
        f"no tokenizer.model or tokenizer.json under {p!r}")
