"""HuggingFace ``tokenizer.json`` wrapper (Rust `tokenizers` backend).

Covers the Llama-3/tiktoken-style BPE path the reference declared but never
implemented (encode.h:8-14 pulls in tiktoken/json headers that are unused).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence


class HFTokenizer:
    def __init__(self, tokenizer_json_path: str,
                 config_path: Optional[str] = None):
        from tokenizers import Tokenizer as _RustTokenizer

        self._t = _RustTokenizer.from_file(tokenizer_json_path)
        self._bos = -1
        self._eos = -1
        # Resolve special ids from tokenizer_config.json / generation defaults.
        cfg_dir = os.path.dirname(tokenizer_json_path)
        cfg_path = config_path or os.path.join(cfg_dir, "tokenizer_config.json")
        bos_tok = eos_tok = None
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                tc = json.load(f)

            def _tok_str(v):
                return v["content"] if isinstance(v, dict) else v

            bos_tok = _tok_str(tc.get("bos_token"))
            eos_tok = _tok_str(tc.get("eos_token"))
        self._bos = self._id_of(bos_tok or "<s>")
        self._eos = self._id_of(eos_tok or "</s>")

    def _id_of(self, token: str) -> int:
        i = self._t.token_to_id(token)
        return -1 if i is None else i

    @property
    def vocab_size(self) -> int:
        return self._t.get_vocab_size()

    @property
    def bos_id(self) -> int:
        return self._bos

    @property
    def eos_id(self) -> int:
        return self._eos

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = self._t.encode(text, add_special_tokens=False).ids
        if add_bos and self._bos >= 0:
            return [self._bos] + ids
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._t.decode(list(ids), skip_special_tokens=True)
