"""Token-level index over a character FSM (guided decoding).

Bridges the tokenizer's vocabulary and a :class:`RegexFSM`: for an FSM
state, which *tokens* (multi-character vocab entries) keep the match
alive? Computed by walking a character trie of the vocabulary against
the FSM — the trie prunes entire subtrees the moment a prefix dies, so
a state's full-vocab mask costs far less than vocab x token-length
steps. Masks are cached per FSM state (generation revisits states
constantly: e.g. "inside a JSON string" is one state).

EOS is allowed exactly at accepting states; every other special /
undecodable token is banned while a constraint is active.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from simplellminference_tpu.structured.regex_fsm import RegexFSM


class _TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: dict[str, _TrieNode] = {}
        self.token_ids: list[int] = []


def token_strings(tokenizer) -> list[Optional[str]]:
    """Per-token text contribution, or None for tokens that must not be
    sampled under a constraint (control/special tokens, partial-UTF-8
    byte-fallback pieces, empty strings).

    SentencePiece pieces contribute their text with the word-boundary
    marker as a literal space; single-byte BYTE pieces below 0x80
    contribute that ASCII character (multi-byte fallback sequences are
    excluded — the FSM walks characters, not bytes). HF tokenizers
    contribute their decoded text via an anchor-differencing decode
    (decode([anchor, t]) - decode([anchor]) preserves leading spaces
    that a bare decode([t]) strips).
    """
    v = tokenizer.vocab_size
    out: list[Optional[str]] = [None] * v

    pieces = getattr(tokenizer, "pieces", None)
    if pieces is not None:                      # our SentencePiece
        from simplellminference_tpu.tokenizer.sentencepiece import (
            BYTE, CONTROL, UNKNOWN, _WS)
        for i, p in enumerate(pieces[:v]):
            if p.type == BYTE:
                b = int(p.text[3:5], 16)
                out[i] = chr(b) if b < 0x80 else None
            elif p.type in (CONTROL, UNKNOWN):
                out[i] = None
            else:
                t = p.text.replace(_WS, " ")
                out[i] = t or None
        return out

    if type(tokenizer).__name__ == "ByteTokenizer":
        for i in range(min(v, 256)):
            out[i] = chr(i) if i < 0x80 else None
        return out

    # generic: anchor differencing around a fixed token id. Any id with
    # stable text works; scan for one that decodes non-empty alone.
    anchor = None
    for cand in range(min(v, 512)):
        if tokenizer.decode([cand]):
            anchor = cand
            break
    for i in range(v):
        try:
            if anchor is None:
                t = tokenizer.decode([i])
            else:
                base = tokenizer.decode([anchor])
                t = tokenizer.decode([anchor, i])
                t = t[len(base):] if t.startswith(base) else \
                    tokenizer.decode([i])
        except Exception:
            t = ""
        out[i] = t if t and "�" not in t else None
    return out


class TokenIndex:
    """allowed-token masks + state advance for one (FSM, vocabulary)."""

    def __init__(self, fsm: RegexFSM, texts: Sequence[Optional[str]],
                 eos_id: int):
        self.fsm = fsm
        self.texts = texts
        self.eos_id = eos_id
        self.vocab = len(texts)
        self._root = _TrieNode()
        for tid, text in enumerate(texts):
            if text is None or tid == eos_id:
                continue
            node = self._root
            for ch in text:
                nxt = node.children.get(ch)
                if nxt is None:
                    nxt = node.children[ch] = _TrieNode()
                node = nxt
            node.token_ids.append(tid)
        self._masks: dict[int, np.ndarray] = {}
        self._succ: dict[int, tuple[list[int], np.ndarray]] = {}

    def allowed(self, state: int) -> np.ndarray:
        """Boolean [vocab] mask of tokens legal from ``state``."""
        m = self._masks.get(state)
        if m is None:
            m = np.zeros(self.vocab, bool)
            self._walk(self._root, state, m)
            if self.fsm.accepting(state) and 0 <= self.eos_id < self.vocab:
                m[self.eos_id] = True
            self._masks[state] = m
        return m

    def _walk(self, node: _TrieNode, state: int, m: np.ndarray):
        for ch, child in node.children.items():
            nxt = self.fsm.step(state, ch)
            if nxt < 0:
                continue
            if child.token_ids:
                m[child.token_ids] = True
            self._walk(child, nxt, m)

    def advance(self, state: int, token_id: int) -> int:
        """FSM state after emitting ``token_id`` (-1 = dead)."""
        text = self.texts[token_id] if 0 <= token_id < self.vocab else None
        if text is None:
            return state if token_id == self.eos_id else -1
        return self.fsm.step_string(state, text)

    def successors(self, state: int) -> tuple[list[int], np.ndarray]:
        """(distinct successor states, token->successor-index map) for
        one FSM step from ``state``.

        The engine's pipelined guided decoding uploads the successor
        states' masks as a fan-out table and selects the next step's
        mask IN-GRAPH from the device-carried sampled token, so a guided
        row never forces a host sync between bursts. Computed by the
        same pruned trie walk as :meth:`allowed` (a token's successor is
        the FSM state at its trie node); tokens illegal from ``state``
        map to index 0 (they cannot be sampled — the mask bans them).
        EOS (legal only at accepting states) maps to ``state`` itself,
        matching :meth:`advance`. Cached per state."""
        hit = self._succ.get(state)
        if hit is not None:
            return hit
        t2s = np.zeros(self.vocab, np.int32)
        succ: dict[int, int] = {}
        self._walk_succ(self._root, state, succ, t2s)
        if self.fsm.accepting(state) and 0 <= self.eos_id < self.vocab:
            idx = succ.setdefault(state, len(succ))
            t2s[self.eos_id] = idx
        states = [s for s, _ in sorted(succ.items(), key=lambda kv: kv[1])]
        self._succ[state] = (states, t2s)
        return states, t2s

    def _walk_succ(self, node: _TrieNode, state: int,
                   succ: dict[int, int], t2s: np.ndarray):
        for ch, child in node.children.items():
            nxt = self.fsm.step(state, ch)
            if nxt < 0:
                continue
            if child.token_ids:
                idx = succ.setdefault(nxt, len(succ))
                t2s[child.token_ids] = idx
            self._walk_succ(child, nxt, succ, t2s)
