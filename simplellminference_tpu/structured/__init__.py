"""Guided (constrained) decoding: regex / JSON-schema token masking.

The sampler only sees tokens that keep a character FSM alive; the FSM
comes from a user regex, a JSON schema, or a choice list. See
regex_fsm.py (compiler), token_index.py (vocabulary masks),
json_schema.py (schema -> regex)."""

from simplellminference_tpu.structured.json_schema import (any_json_regex,
                                                           schema_to_regex)
from simplellminference_tpu.structured.regex_fsm import RegexError, RegexFSM
from simplellminference_tpu.structured.token_index import (TokenIndex,
                                                           token_strings)

__all__ = ["RegexFSM", "RegexError", "TokenIndex", "token_strings",
           "schema_to_regex", "any_json_regex"]
