"""Minimal protobuf wire-format reader/writer (no protobuf dependency).

Just enough to parse (and, for tests, synthesize) SentencePiece
``ModelProto`` files. Field numbers follow sentencepiece_model.proto:

    ModelProto:   pieces = 1 (repeated SentencePiece),
                  trainer_spec = 2, normalizer_spec = 3
    SentencePiece: piece = 1 (string), score = 2 (float), type = 3 (enum)
                  type: NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4
                        UNUSED=5 BYTE=6
    TrainerSpec:  model_type = 3 (UNIGRAM=1 BPE=2), unk_id = 40,
                  bos_id = 41, eos_id = 42, pad_id = 43
    NormalizerSpec: add_dummy_prefix = 6, remove_extra_whitespaces = 7,
                  escape_whitespaces = 8
"""

from __future__ import annotations

import struct
from typing import Iterator


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message's fields."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:       # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:     # 64-bit
            val = buf[i:i + 8]
            i += 8
        elif wt == 2:     # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:     # 32-bit
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def as_float32(val: bytes) -> float:
    return struct.unpack("<f", val)[0]


def as_signed(val: int) -> int:
    """Interpret a varint as a signed int32/int64 (two's complement)."""
    return val - (1 << 64) if val >= (1 << 63) else (
        val - (1 << 32) if val >= (1 << 31) else val)


# ---- writer (used by tests to synthesize tiny tokenizer.model files) ----

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def field_varint(num: int, v: int) -> bytes:
    return _varint(num << 3) + _varint(v)


def field_float(num: int, v: float) -> bytes:
    return _varint((num << 3) | 5) + struct.pack("<f", v)


def field_bytes(num: int, v: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(v)) + v


def field_str(num: int, v: str) -> bytes:
    return field_bytes(num, v.encode("utf-8"))
