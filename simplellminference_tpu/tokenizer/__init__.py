"""Tokenizers: SentencePiece (native parser), HF tokenizer.json, bytes.

Successor of the reference's ``SPELayer`` (encode.cpp:5-27), which wraps the
sentencepiece C++ library, plus the Llama-3 BPE path it declared but never
implemented (encode.h:8-14). This package implements the SentencePiece
model format natively (no sentencepiece dependency): a protobuf wire-format
parser for ``tokenizer.model`` and both BPE-merge and unigram-Viterbi
encoders, with byte fallback — and a streaming detokenizer (the reference
decodes one id at a time with no incremental state, model.cpp:172-182).
"""

from simplellminference_tpu.tokenizer.base import (  # noqa: F401
    StreamingDetokenizer,
    Tokenizer,
)
from simplellminference_tpu.tokenizer.auto import load_tokenizer  # noqa: F401
from simplellminference_tpu.tokenizer.bytes import ByteTokenizer  # noqa: F401
from simplellminference_tpu.tokenizer.sentencepiece import (  # noqa: F401
    SentencePieceTokenizer,
)
