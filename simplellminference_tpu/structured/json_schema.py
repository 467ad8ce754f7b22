"""JSON schema -> regex for guided JSON generation.

Compiles a practical JSON-schema subset into a :mod:`regex_fsm`
pattern whose full matches are exactly the compact (whitespace-free)
JSON documents satisfying the schema. Supported keywords:

  type: object / array / string / integer / number / boolean / null
  enum, const                     (scalar + string literals)
  properties (+ required)         object members, declared order;
                                  non-required members may be omitted
  items, minItems, maxItems       arrays (bounds <= 64 expand exactly)
  minLength, maxLength, pattern   strings (pattern must itself be a
                                  supported regex, anchored implicitly)
  anyOf / oneOf                   alternation
  $ref "#/$defs/..." or "#/definitions/..." (non-recursive)

Unsupported keywords raise loudly rather than silently widening the
language. Numbers follow RFC 8259 (no leading +, no leading zeros).
"""

from __future__ import annotations

import json
from typing import Any

_INT = r"-?(0|[1-9][0-9]*)"
_NUM = r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"
# one JSON string character: anything except '"', '\' and control
# chars, or an escape sequence
_CHAR = r'([^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
_STR = f'"{_CHAR}*"'
_BOOL = r"(true|false)"
_NULL = r"null"

_UNBOUNDED_ITEMS = 64


class SchemaError(ValueError):
    pass


def _lit(text: str) -> str:
    """Regex matching ``text`` literally."""
    out = []
    for ch in text:
        if ch in r"\.[]{}()*+?|^$/-":
            out.append("\\" + ch)
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    return "".join(out)


def _json_lit(value: Any) -> str:
    return _lit(json.dumps(value, separators=(",", ":"),
                           ensure_ascii=False))


def schema_to_regex(schema: Any, root: Any = None, depth: int = 0) -> str:
    """Anchored regex for one schema node."""
    if depth > 32:
        raise SchemaError("schema nesting too deep (recursive $ref?)")
    if root is None:
        root = schema
    if schema is True or schema == {}:
        return any_json_regex()
    if not isinstance(schema, dict):
        raise SchemaError(f"unsupported schema node {schema!r}")

    if "$ref" in schema:
        return schema_to_regex(_resolve_ref(schema["$ref"], root), root,
                               depth + 1)
    if "const" in schema:
        return _json_lit(schema["const"])
    if "enum" in schema:
        return "(" + "|".join(_json_lit(v) for v in schema["enum"]) + ")"
    for key in ("anyOf", "oneOf"):
        if key in schema:
            opts = [schema_to_regex(s, root, depth + 1)
                    for s in schema[key]]
            return "(" + "|".join(f"({o})" for o in opts) + ")"

    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            schema_to_regex({**schema, "type": one}, root, depth + 1)
            for one in t) + ")"
    if t == "integer":
        return _INT
    if t == "number":
        return _NUM
    if t == "boolean":
        return _BOOL
    if t == "null":
        return _NULL
    if t == "string":
        if "pattern" in schema:
            return f'"(?:{schema["pattern"]})"'
        lo = int(schema.get("minLength", 0))
        hi = schema.get("maxLength")
        if hi is None:
            return f'"{_CHAR}{{{lo},}}"' if lo else _STR
        return f'"{_CHAR}{{{lo},{int(hi)}}}"'
    if t == "array":
        item = schema_to_regex(schema.get("items", True), root, depth + 1)
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        if hi is None:
            if lo == 0:
                return rf"\[(({item})(,({item}))*)?\]"
            return rf"\[({item})(,({item})){{{lo - 1},}}\]"
        hi = int(hi)
        if hi == 0:
            return r"\[\]"
        body = rf"({item})(,({item})){{{max(lo - 1, 0)},{hi - 1}}}"
        return rf"\[({body})?\]" if lo == 0 else rf"\[{body}\]"
    if t == "object" or (t is None and "properties" in schema):
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props)))
        unknown = required - set(props)
        if unknown:
            raise SchemaError(f"required names not in properties: "
                              f"{sorted(unknown)}")
        if not props:
            return r"\{\}"
        # members in declared order; optional members may be absent.
        # Comma placement: enumerate member subsets as an alternation of
        # "first member chosen" x "rest", built right-to-left.
        members = [(_lit(json.dumps(name, ensure_ascii=False)) + ":"
                    + "(" + schema_to_regex(sub, root, depth + 1) + ")",
                    name in required)
                   for name, sub in props.items()]
        return r"\{" + _members_regex(members) + r"\}"
    if t is None:
        return any_json_regex()
    raise SchemaError(f"unsupported type {t!r}")


def _members_regex(members: list[tuple[str, bool]]) -> str:
    """Object-body regex: declared order, optionals omissible, commas
    exactly between present members.

    ``after[i]`` = members i.. assuming an earlier member was emitted
    (each present member carries a leading comma — optionals are then
    independent ``(,m)?`` factors). The no-member-yet prefix recurses:
    the first present member has no comma, everything after it uses
    ``after``."""
    after = [""] * (len(members) + 1)
    for i in range(len(members) - 1, -1, -1):
        m, req = members[i]
        after[i] = (f",{m}" if req else f"(,{m})?") + after[i + 1]

    def first(i: int) -> str:
        if i == len(members):
            return ""
        m, req = members[i]
        if req:
            return f"{m}{after[i + 1]}"
        return f"({m}{after[i + 1]}|{first(i + 1)})"

    return first(0)


def _resolve_ref(ref: str, root: Any) -> Any:
    if not ref.startswith("#/"):
        raise SchemaError(f"only local $refs supported: {ref!r}")
    node = root
    for part in ref[2:].split("/"):
        part = part.replace("~1", "/").replace("~0", "~")
        if not isinstance(node, dict) or part not in node:
            raise SchemaError(f"unresolvable $ref {ref!r}")
        node = node[part]
    return node


def any_json_regex(depth: int = 3) -> str:
    """Any JSON value, nesting bounded to ``depth`` levels (a regex
    cannot express unbounded nesting; 3 levels covers typical
    ``response_format: json_object`` replies)."""
    scalar = f"({_STR}|{_NUM}|{_BOOL}|{_NULL})"
    val = scalar
    for _ in range(depth):
        arr = rf"\[({val}(,{val})*)?\]"
        obj = rf"\{{({_STR}:{val}(,{_STR}:{val})*)?\}}"
        val = f"({scalar}|{arr}|{obj})"
    return val
