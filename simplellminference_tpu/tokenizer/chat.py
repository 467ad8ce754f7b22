"""Chat-template rendering: HF ``tokenizer_config.json`` jinja templates
with a ChatML fallback.

The reference has no chat support at all (its predict() takes a raw
prompt string, model.cpp:142-187); this renders OpenAI-style ``messages``
into the model's expected prompt format for /v1/chat/completions.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence


def load_chat_template(model_dir: str) -> Optional[str]:
    """The ``chat_template`` string from tokenizer_config.json, if any."""
    path = os.path.join(model_dir, "tokenizer_config.json")
    try:
        with open(path) as f:
            tpl = json.load(f).get("chat_template")
        if isinstance(tpl, list):  # newer HF: list of {name, template}
            for entry in tpl:
                if entry.get("name") in (None, "default"):
                    return entry.get("template")
            return tpl[0].get("template") if tpl else None
        return tpl
    except (OSError, ValueError):
        return None


def render_chat(messages: Sequence[dict], template: Optional[str] = None,
                bos_token: str = "", eos_token: str = "",
                add_generation_prompt: bool = True) -> str:
    """Render OpenAI-style messages ([{role, content}, ...]) to a prompt.

    Uses the model's jinja chat template when provided (HF semantics);
    otherwise a generic ChatML layout.
    """
    if template:
        try:
            import jinja2

            env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
            env.globals["raise_exception"] = _raise
            return env.from_string(template).render(
                messages=list(messages), bos_token=bos_token,
                eos_token=eos_token,
                add_generation_prompt=add_generation_prompt)
        except Exception:
            pass  # fall through to the generic layout
    parts = []
    for m in messages:
        parts.append(f"<|im_start|>{m.get('role', 'user')}\n"
                     f"{m.get('content', '')}<|im_end|>\n")
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    return "".join(parts)


def _raise(msg):
    raise ValueError(msg)
