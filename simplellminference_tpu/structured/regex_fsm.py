"""Regex -> finite-state machine for constrained decoding.

A self-contained regex subset compiler (no ``re`` introspection, no
third-party FSM libraries): recursive-descent parser -> Thompson NFA ->
lazily-determinized DFA over NFA-state sets. The FSM drives
token-masked sampling (structured/token_index.py): at each step the
engine only permits tokens whose characters keep the FSM alive.

Full-match semantics (anchored at both ends, like ``re.fullmatch``).

Supported syntax: literals, ``.``, escapes (\\d \\D \\w \\W \\s \\S
\\n \\r \\t \\xHH \\uHHHH and escaped metacharacters), character
classes ``[a-z0-9_]`` / ``[^...]``, groups ``(...)`` (non-capturing;
``(?:...)`` accepted), alternation ``|``, quantifiers ``* + ?``
and bounded ``{m} {m,} {m,n}`` (n <= 1024 — bounded reps expand by
duplication).

The reference has no sampling machinery at all (greedy argmax on CPU,
argmax.cpp:7-17); this subsystem extends the TPU build's on-device
sampler with vLLM/outlines-style guided decoding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

MAX_CODEPOINT = 0x10FFFF
_MAX_BOUND = 1024


# ---------------------------------------------------------------- charsets

@dataclass(frozen=True)
class CharSet:
    """Sorted, disjoint, inclusive codepoint ranges."""

    ranges: tuple[tuple[int, int], ...]

    def contains(self, cp: int) -> bool:
        lo, hi = 0, len(self.ranges)
        while lo < hi:
            mid = (lo + hi) // 2
            a, b = self.ranges[mid]
            if cp < a:
                hi = mid
            elif cp > b:
                lo = mid + 1
            else:
                return True
        return False

    @staticmethod
    def of(*ranges: tuple[int, int]) -> "CharSet":
        return CharSet(_normalize(ranges))

    def negate(self) -> "CharSet":
        out, prev = [], 0
        for a, b in self.ranges:
            if a > prev:
                out.append((prev, a - 1))
            prev = b + 1
        if prev <= MAX_CODEPOINT:
            out.append((prev, MAX_CODEPOINT))
        return CharSet(tuple(out))

    def union(self, other: "CharSet") -> "CharSet":
        return CharSet(_normalize(self.ranges + other.ranges))


def _normalize(ranges) -> tuple[tuple[int, int], ...]:
    rs = sorted((a, b) for a, b in ranges if a <= b)
    out: list[tuple[int, int]] = []
    for a, b in rs:
        if out and a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return tuple(out)


_D = CharSet.of((48, 57))
_W = CharSet.of((48, 57), (65, 90), (97, 122), (95, 95))
_S = CharSet.of((9, 13), (32, 32))
_DOT = CharSet.of((10, 10)).negate()          # any char except newline


# ---------------------------------------------------------------- AST

@dataclass(frozen=True)
class Lit:
    cs: CharSet


@dataclass(frozen=True)
class Cat:
    parts: tuple


@dataclass(frozen=True)
class Alt:
    options: tuple


@dataclass(frozen=True)
class Rep:
    node: object
    lo: int
    hi: Optional[int]   # None = unbounded


Node = Union[Lit, Cat, Alt, Rep]


class RegexError(ValueError):
    pass


class _Parser:
    def __init__(self, pat: str):
        self.p = pat
        self.i = 0

    def peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def take(self) -> str:
        c = self.peek()
        self.i += 1
        return c

    def parse(self) -> Node:
        node = self.alt()
        if self.i != len(self.p):
            raise RegexError(f"unexpected {self.peek()!r} at {self.i}")
        return node

    def alt(self) -> Node:
        opts = [self.cat()]
        while self.peek() == "|":
            self.take()
            opts.append(self.cat())
        return opts[0] if len(opts) == 1 else Alt(tuple(opts))

    def cat(self) -> Node:
        parts = []
        while self.peek() not in ("", "|", ")"):
            parts.append(self.rep())
        if len(parts) == 1:
            return parts[0]
        return Cat(tuple(parts))

    def rep(self) -> Node:
        node = self.atom()
        while True:
            c = self.peek()
            if c == "*":
                self.take()
                node = Rep(node, 0, None)
            elif c == "+":
                self.take()
                node = Rep(node, 1, None)
            elif c == "?":
                self.take()
                node = Rep(node, 0, 1)
            elif c == "{":
                save = self.i
                bounds = self._try_bounds()
                if bounds is None:
                    self.i = save
                    break
                node = Rep(node, *bounds)
            else:
                break
        return node

    def _try_bounds(self):
        assert self.take() == "{"
        digits = ""
        while self.peek().isdigit():
            digits += self.take()
        if not digits:
            return None          # literal '{'
        lo = int(digits)
        hi: Optional[int] = lo
        if self.peek() == ",":
            self.take()
            digits = ""
            while self.peek().isdigit():
                digits += self.take()
            hi = int(digits) if digits else None
        if self.peek() != "}":
            return None
        self.take()
        if hi is not None and (hi < lo or hi > _MAX_BOUND):
            raise RegexError(f"bad repetition bounds {{{lo},{hi}}}")
        if lo > _MAX_BOUND:
            raise RegexError(f"repetition bound {lo} > {_MAX_BOUND}")
        return lo, hi

    def atom(self) -> Node:
        c = self.take()
        if c == "(":
            if self.peek() == "?":
                self.take()
                if self.take() != ":":
                    raise RegexError("only (?:...) groups supported")
            node = self.alt()
            if self.take() != ")":
                raise RegexError("unclosed group")
            return node
        if c == "[":
            return Lit(self._char_class())
        if c == ".":
            return Lit(_DOT)
        if c == "\\":
            return Lit(self._escape())
        if c in "*+?{)":
            raise RegexError(f"dangling {c!r}")
        return Lit(CharSet.of((ord(c), ord(c))))

    def _escape(self) -> CharSet:
        c = self.take()
        if not c:
            raise RegexError("trailing backslash")
        table = {"d": _D, "D": _D.negate(), "w": _W, "W": _W.negate(),
                 "s": _S, "S": _S.negate()}
        if c in table:
            return table[c]
        if c == "n":
            return CharSet.of((10, 10))
        if c == "r":
            return CharSet.of((13, 13))
        if c == "t":
            return CharSet.of((9, 9))
        if c == "x" or c == "u":
            n = 2 if c == "x" else 4
            hexs = self.p[self.i:self.i + n]
            if len(hexs) != n:
                raise RegexError(f"bad \\{c} escape")
            self.i += n
            cp = int(hexs, 16)
            return CharSet.of((cp, cp))
        return CharSet.of((ord(c), ord(c)))   # escaped literal/meta

    def _char_class(self) -> CharSet:
        negate = False
        if self.peek() == "^":
            self.take()
            negate = True
        items: list[tuple[int, int]] = []
        sets: list[CharSet] = []
        first = True
        while True:
            c = self.peek()
            if c == "":
                raise RegexError("unclosed character class")
            if c == "]" and not first:
                self.take()
                break
            first = False
            self.take()
            if c == "\\":
                cs = self._escape()
                if len(cs.ranges) != 1 or cs.ranges[0][0] != cs.ranges[0][1]:
                    sets.append(cs)      # \d etc. inside a class
                    continue
                lo = cs.ranges[0][0]
            else:
                lo = ord(c)
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.take()
                d = self.take()
                if d == "\\":
                    cs2 = self._escape()
                    if len(cs2.ranges) != 1 \
                            or cs2.ranges[0][0] != cs2.ranges[0][1]:
                        raise RegexError("bad class range end")
                    hi = cs2.ranges[0][0]
                else:
                    hi = ord(d)
                if hi < lo:
                    raise RegexError("reversed class range")
                items.append((lo, hi))
            else:
                items.append((lo, lo))
        cs = CharSet(_normalize(items))
        for s in sets:
            cs = cs.union(s)
        return cs.negate() if negate else cs


# ---------------------------------------------------------------- NFA

class _NFA:
    """Thompson construction. State: int; transitions: (CharSet, dst);
    eps: epsilon edges."""

    def __init__(self):
        self.trans: list[list[tuple[CharSet, int]]] = []
        self.eps: list[list[int]] = []

    def state(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def build(self, node: Node) -> tuple[int, int]:
        """Returns (start, accept)."""
        if isinstance(node, Lit):
            s, a = self.state(), self.state()
            self.trans[s].append((node.cs, a))
            return s, a
        if isinstance(node, Cat):
            if not node.parts:
                s = self.state()
                return s, s
            s, a = self.build(node.parts[0])
            for part in node.parts[1:]:
                s2, a2 = self.build(part)
                self.eps[a].append(s2)
                a = a2
            return s, a
        if isinstance(node, Alt):
            s, a = self.state(), self.state()
            for opt in node.options:
                os, oa = self.build(opt)
                self.eps[s].append(os)
                self.eps[oa].append(a)
            return s, a
        if isinstance(node, Rep):
            lo, hi = node.lo, node.hi
            if hi is None:
                # X{lo,} = X^lo followed by X*
                s = a = self.state()
                for _ in range(lo):
                    s2, a2 = self.build(node.node)
                    self.eps[a].append(s2)
                    a = a2
                ss, sa = self.build(node.node)   # the star
                loop_in = self.state()
                out = self.state()   # fresh accept with NO outgoing
                # edges: a parent skip-edge targeting this fragment's
                # accept must not be able to re-enter the loop body
                self.eps[a].append(loop_in)
                self.eps[loop_in].append(ss)
                self.eps[loop_in].append(out)
                self.eps[sa].append(loop_in)
                return s, out
            # X{lo,hi}: lo required copies + (hi-lo) optional copies
            s = a = self.state()
            for _ in range(lo):
                s2, a2 = self.build(node.node)
                self.eps[a].append(s2)
                a = a2
            for _ in range(hi - lo):
                s2, a2 = self.build(node.node)
                self.eps[a].append(s2)
                self.eps[a].append(a2)   # skip edge
                a = a2
            return s, a
        raise AssertionError(node)


class RegexFSM:
    """Lazily-determinized DFA over NFA state sets.

    States are small ints (0 = start). ``step(state, ch)`` returns the
    successor state or -1 when the character kills the match.
    ``accepting(state)`` is full-match acceptance. Only *productive*
    NFA states (those that can still reach accept) are kept, so a
    non-(-1) state always has at least one path to acceptance.
    """

    def __init__(self, pattern: str):
        self.pattern = pattern
        ast = _Parser(pattern).parse()
        nfa = _NFA()
        start, accept = nfa.build(ast)
        self._nfa = nfa
        self._accept = accept
        self._productive = self._find_productive(nfa, accept)
        if start not in self._productive \
                and not self._eps_reach(start, accept):
            raise RegexError(f"regex {pattern!r} matches nothing")
        s0 = frozenset(st for st in self._closure({start})
                       if st in self._productive or st == accept)
        self._sets: list[frozenset[int]] = [s0]
        self._ids: dict[frozenset[int], int] = {s0: 0}
        self._steps: list[dict[int, int]] = [{}]
        self._accepting: list[bool] = [accept in s0]

    # -- NFA helpers --

    def _closure(self, states: set[int]) -> set[int]:
        out, stack = set(states), list(states)
        while stack:
            s = stack.pop()
            for t in self._nfa.eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return out

    def _eps_reach(self, s: int, target: int) -> bool:
        return target in self._closure({s})

    @staticmethod
    def _find_productive(nfa: _NFA, accept: int) -> set[int]:
        """NFA states with a path (of any kind) to ``accept``."""
        rev: list[list[int]] = [[] for _ in nfa.trans]
        for s, edges in enumerate(nfa.trans):
            for _, d in edges:
                rev[d].append(s)
        for s, eps in enumerate(nfa.eps):
            for d in eps:
                rev[d].append(s)
        seen = {accept}
        stack = [accept]
        while stack:
            s = stack.pop()
            for p in rev[s]:
                if p not in seen:
                    seen.add(p)
                    stack.append(p)
        return seen

    # -- public DFA interface --

    @property
    def start(self) -> int:
        return 0

    def accepting(self, state: int) -> bool:
        return self._accepting[state]

    def step(self, state: int, ch: str) -> int:
        """Advance by one character; -1 = dead."""
        cp = ord(ch)
        cached = self._steps[state].get(cp)
        if cached is not None:
            return cached
        nxt: set[int] = set()
        for s in self._sets[state]:
            for cs, d in self._nfa.trans[s]:
                if cs.contains(cp):
                    nxt.add(d)
        nxt = {s for s in self._closure(nxt) if s in self._productive}
        if not nxt:
            self._steps[state][cp] = -1
            return -1
        key = frozenset(nxt)
        sid = self._ids.get(key)
        if sid is None:
            sid = len(self._sets)
            self._sets.append(key)
            self._ids[key] = sid
            self._steps.append({})
            self._accepting.append(self._accept in key)
        self._steps[state][cp] = sid
        return sid

    def step_string(self, state: int, text: str) -> int:
        for ch in text:
            state = self.step(state, ch)
            if state < 0:
                return -1
        return state

    def out_charsets(self, state: int) -> list[CharSet]:
        """The charsets labelling this state's outgoing NFA edges (used
        by the token index to enumerate candidate first characters)."""
        return [cs for s in self._sets[state]
                for cs, d in self._nfa.trans[s] if d in self._productive]

    def fullmatch(self, text: str) -> bool:
        s = self.step_string(self.start, text)
        return s >= 0 and self.accepting(s)
