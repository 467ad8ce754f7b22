"""Native SentencePiece tokenizer: ModelProto parser + BPE/unigram encode.

Replaces the reference's dependency on the sentencepiece C++ library
(encode.cpp:6-27) with a from-scratch implementation of the model format:

  * BPE mode (Llama/Llama-2/TinyLlama ``tokenizer.model``): greedy
    best-score adjacent-pair merging over the piece vocabulary.
  * Unigram mode: Viterbi max-score segmentation over a prefix trie.
  * Byte fallback to ``<0xXX>`` pieces; ▁ (U+2581) whitespace escaping;
    dummy-prefix normalization.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Optional, Sequence

from simplellminference_tpu.tokenizer import proto

_WS = "▁"  # ▁

NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


@dataclasses.dataclass
class Piece:
    text: str
    score: float
    type: int = NORMAL


class SentencePieceTokenizer:
    def __init__(self, pieces: list[Piece], model_type: str = "bpe",
                 unk_id: int = 0, bos_id: int = 1, eos_id: int = 2,
                 pad_id: int = -1, add_dummy_prefix: bool = True):
        self.pieces = pieces
        self.model_type = model_type
        self.unk_id = unk_id
        self._bos = bos_id
        self._eos = eos_id
        self.pad_id = pad_id
        self.add_dummy_prefix = add_dummy_prefix

        self.piece_to_id: dict[str, int] = {}
        self.byte_pieces: dict[int, int] = {}   # byte value -> id
        for i, p in enumerate(pieces):
            if p.type == BYTE:
                # "<0xAB>"
                self.byte_pieces[int(p.text[3:5], 16)] = i
            if p.text not in self.piece_to_id:
                self.piece_to_id[p.text] = i
        self._trie = None  # built lazily for unigram

    # ---- loading ----

    @classmethod
    def from_file(cls, path: str) -> "SentencePieceTokenizer":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SentencePieceTokenizer":
        pieces: list[Piece] = []
        model_type = "unigram"
        unk_id, bos_id, eos_id, pad_id = 0, 1, 2, -1
        add_dummy_prefix = True
        for field, wt, val in proto.iter_fields(blob):
            if field == 1 and wt == 2:                     # SentencePiece
                text, score, ptype = "", 0.0, NORMAL
                for f2, w2, v2 in proto.iter_fields(val):
                    if f2 == 1:
                        text = v2.decode("utf-8")
                    elif f2 == 2:
                        score = proto.as_float32(v2)
                    elif f2 == 3:
                        ptype = v2
                pieces.append(Piece(text, score, ptype))
            elif field == 2 and wt == 2:                   # TrainerSpec
                for f2, w2, v2 in proto.iter_fields(val):
                    if f2 == 3:
                        model_type = {1: "unigram", 2: "bpe", 3: "word",
                                      4: "char"}.get(v2, "unigram")
                    elif f2 == 40:
                        unk_id = proto.as_signed(v2)
                    elif f2 == 41:
                        bos_id = proto.as_signed(v2)
                    elif f2 == 42:
                        eos_id = proto.as_signed(v2)
                    elif f2 == 43:
                        pad_id = proto.as_signed(v2)
            elif field == 3 and wt == 2:                   # NormalizerSpec
                for f2, w2, v2 in proto.iter_fields(val):
                    if f2 == 6:
                        add_dummy_prefix = bool(v2)
        return cls(pieces, model_type, unk_id, bos_id, eos_id, pad_id,
                   add_dummy_prefix)

    # ---- protocol ----

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    @property
    def bos_id(self) -> int:
        return self._bos

    @property
    def eos_id(self) -> int:
        return self._eos

    # ---- encoding ----

    def _normalize(self, text: str) -> str:
        text = text.replace(" ", _WS)
        if self.add_dummy_prefix and not text.startswith(_WS):
            text = _WS + text
        return text

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = (self._encode_bpe(self._normalize(text))
               if self.model_type == "bpe"
               else self._encode_unigram(self._normalize(text)))
        if add_bos and self._bos >= 0:
            return [self._bos] + ids
        return ids

    def _byte_fallback(self, ch: str) -> list[int]:
        if self.byte_pieces:
            return [self.byte_pieces[b] for b in ch.encode("utf-8")]
        return [self.unk_id]

    def _encode_bpe(self, text: str) -> list[int]:
        """Greedy highest-score adjacent merge (SentencePiece BPE).

        Scores in a BPE model are -(merge rank); repeatedly merge the
        adjacent symbol pair whose concatenation is the best-scoring piece.
        Doubly-linked list + heap: O(n log n).
        """
        if not text:
            return []
        syms = list(text)
        nxt = list(range(1, len(syms) + 1))
        prv = list(range(-1, len(syms) - 1))
        alive = [True] * len(syms)

        heap: list[tuple[float, int, int, str]] = []

        def push(i: int):
            j = nxt[i]
            if j >= len(syms):
                return
            merged = syms[i] + syms[j]
            pid = self.piece_to_id.get(merged)
            if pid is not None:
                heapq.heappush(heap, (-self.pieces[pid].score, i, j, merged))

        for i in range(len(syms) - 1):
            push(i)

        while heap:
            _, i, j, merged = heapq.heappop(heap)
            if not (alive[i] and alive[j] and nxt[i] == j
                    and syms[i] + syms[j] == merged):
                continue
            syms[i] = merged
            alive[j] = False
            nxt[i] = nxt[j]
            if nxt[i] < len(syms):
                prv[nxt[i]] = i
            push(i)
            if prv[i] >= 0:
                push(prv[i])

        ids: list[int] = []
        i = 0
        while i < len(syms):
            if alive[i]:
                pid = self.piece_to_id.get(syms[i])
                if pid is None:
                    for ch in syms[i]:
                        ids.extend(self._byte_fallback(ch))
                else:
                    ids.append(pid)
            i = nxt[i] if alive[i] else i + 1
        return ids

    # ---- unigram (Viterbi) ----

    def _build_trie(self):
        trie: dict = {}
        for i, p in enumerate(self.pieces):
            if p.type in (NORMAL, USER_DEFINED):
                node = trie
                for ch in p.text:
                    node = node.setdefault(ch, {})
                node[""] = (i, p.score)
        self._trie = trie

    def _encode_unigram(self, text: str) -> list[int]:
        if not text:
            return []
        if self._trie is None:
            self._build_trie()
        n = len(text)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        back: list[Optional[tuple[int, int]]] = [None] * (n + 1)  # (start, id)
        unk_penalty = min((p.score for p in self.pieces
                           if p.type == NORMAL), default=-10.0) - 10.0
        for s in range(n):
            if best[s] == NEG:
                continue
            node = self._trie
            e = s
            matched = False
            while e < n and text[e] in node:
                node = node[text[e]]
                e += 1
                if "" in node:
                    pid, score = node[""]
                    if best[s] + score > best[e]:
                        best[e] = best[s] + score
                        back[e] = (s, pid)
                    matched = True
            # unk/byte fallback: single char step
            if best[s] + unk_penalty > best[s + 1]:
                best[s + 1] = best[s] + unk_penalty
                back[s + 1] = (s, -1)
        ids: list[int] = []
        e = n
        while e > 0:
            s, pid = back[e]
            if pid == -1:
                ids[:0] = self._byte_fallback(text[s])
            else:
                ids.insert(0, pid)
            e = s
        return ids

    # ---- decoding ----

    def decode(self, ids: Sequence[int]) -> str:
        out: list[bytes] = []
        for i in ids:
            if i < 0 or i >= len(self.pieces):
                continue
            p = self.pieces[i]
            if p.type == BYTE:
                out.append(bytes([int(p.text[3:5], 16)]))
            elif p.type in (CONTROL, UNKNOWN):
                continue
            else:
                out.append(p.text.encode("utf-8"))
        text = b"".join(out).decode("utf-8", errors="replace")
        text = text.replace(_WS, " ")
        if self.add_dummy_prefix and text.startswith(" "):
            text = text[1:]
        return text

    def id_to_piece(self, i: int) -> str:
        return self.pieces[i].text
