"""Model family registry.

The reference supports exactly one architecture, hard-wired (config.h:5-17).
Here families register a (forward, init_params, loader-mapping) triple keyed
by HF ``model_type`` so new families plug in without touching the runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from simplellminference_tpu.core.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    forward: Callable
    init_params: Callable
    hf_param_map: Callable  # ModelConfig -> {our param path: hf tensor name}


_REGISTRY: dict[str, ModelFamily] = {}


def register(family: ModelFamily, aliases: tuple[str, ...] = ()):
    _REGISTRY[family.name] = family
    for a in aliases:
        _REGISTRY[a] = family


def get_model_family(name: str) -> ModelFamily:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model family {name!r}; known: {sorted(set(_REGISTRY))}")
    return _REGISTRY[name]


def _register_builtin():
    from simplellminference_tpu.models import llama
    from simplellminference_tpu.runtime.weights import llama_hf_param_map

    register(
        ModelFamily(
            name="llama",
            forward=llama.forward,
            init_params=llama.init_params,
            hf_param_map=llama_hf_param_map,
        ),
        # HF model_types sharing the Llama graph shape (qwen2 adds the
        # QKV bias via cfg.attention_bias; mixtral swaps the dense FFN
        # for the sparse-MoE block via cfg.num_experts).
        aliases=("mistral", "tinyllama", "qwen2", "gemma", "mixtral",
                 "qwen2_moe", "qwen3", "qwen3_moe", "gemma2",
                 "deepseek_v2", "deepseek_v3", "gemma3_text", "gpt_oss",
                 "phi3", "granite", "olmo2", "olmoe", "glm4", "helium",
                 "smollm3", "seed_oss", "ernie4_5"),
    )


_register_builtin()
