"""Weight loading: HF safetensors / torch state dicts → params pytree.

Successor of the reference's weight path — mmap of a headerless raw-FP32
blob walked in a fixed group order with a hard-coded config
(read_model_file model.cpp:204-245; create_param_layers model.cpp:336-469).
Here the contract is the standard HF checkpoint: ``config.json`` +
``*.safetensors``, mapped by name, transposed to our [K, N]
contraction-first layout, **fused** (q/k/v → wqkv, gate/up → w_gate_up —
see models/llama.py), optionally INT8 group-quantized at load, and
``jax.device_put`` with per-parameter shardings.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplellminference_tpu.core.config import ModelConfig, QuantConfig
from simplellminference_tpu.ops.linear import QuantizedWeight

# Param-tree paths use "/" notation. A tuple of HF names means: load each,
# transpose to [K, N], and concatenate along the output (N) axis.
_HF_LLAMA_MAP: dict[str, Any] = {
    "embed": "model.embed_tokens.weight",            # [V, H] (no transpose)
    "final_norm": "model.norm.weight",
    "lm_head": "lm_head.weight",                     # [V, H] -> transpose
    "layers/input_norm": "model.layers.{i}.input_layernorm.weight",
    "layers/post_norm": "model.layers.{i}.post_attention_layernorm.weight",
    "layers/wqkv": ("model.layers.{i}.self_attn.q_proj.weight",
                    "model.layers.{i}.self_attn.k_proj.weight",
                    "model.layers.{i}.self_attn.v_proj.weight"),
    "layers/wo": "model.layers.{i}.self_attn.o_proj.weight",      # [H, N*D] -> T
    "layers/w_gate_up": ("model.layers.{i}.mlp.gate_proj.weight",
                         "model.layers.{i}.mlp.up_proj.weight"),
    "layers/w_down": "model.layers.{i}.mlp.down_proj.weight",
}

# HF Linear weights are [out, in]; ours are [in, out] => transpose all
# projection matrices. Embedding/norms keep HF orientation.
_TRANSPOSED = {"lm_head", "layers/wqkv", "layers/wo", "layers/w_gate_up",
               "layers/w_down", "layers/router", "layers/shared_gate_up",
               "layers/shared_down", "layers/shared_gate",
               "layers/q_proj", "layers/q_a", "layers/q_b",
               "layers/kv_a", "layers/kv_b"}

# Tuple entries for these paths concatenate along the CONTRACTION (row)
# axis after transpose — per-expert w_down blocks stack rows [E*Ie, H].
_ROW_CONCAT = {"layers/w_down"}

# Paths eligible for weight-only INT8 group quantization. Embedding, norms,
# and the LM head stay high-precision (standard practice; also how the
# BASELINE PPL budget is met).
_QUANTIZABLE = {"layers/wqkv", "layers/wo", "layers/w_gate_up",
                "layers/w_down", "layers/shared_gate_up",
                "layers/shared_down",
                "layers/q_proj", "layers/q_b", "layers/kv_b"}


class Mapped:
    """Param-map entry with a custom load transform: the HF tensor is
    fetched RAW (no transpose) and ``fn(arr)`` returns it in our layout
    (e.g. GPT-OSS stacked expert tensors with interleaved gate/up)."""

    def __init__(self, name: str, fn: Callable):
        self.name = name
        self.fn = fn


def llama_hf_param_map(cfg: ModelConfig) -> dict[str, Any]:
    """Param map for the Llama graph family (llama, mistral, qwen2, ...).

    Qwen2 shares the graph with QKV bias added (cfg.attention_bias)."""
    m = dict(_HF_LLAMA_MAP)
    if cfg.num_experts:
        # Sparse-MoE FFN: experts fold into the dense stacked layouts
        # (ops/moe.py) — per-expert [gate_e | up_e] column blocks for
        # w_gate_up, per-expert row blocks for w_down. Mixtral names the
        # projections w1/w3/w2 under block_sparse_moe; Qwen2-MoE uses
        # gate/up/down_proj under mlp and adds the shared expert.
        if cfg.model_type == "gpt_oss":
            # GPT-OSS experts are STACKED tensors with INTERLEAVED
            # gate/up columns: gate_up_proj [E, H, 2Ie] where gate =
            # [..., ::2], up = [..., 1::2] (HF GptOssExperts) — fold to
            # our per-expert [gate_e | up_e] column-block layout.
            pre = "model.layers.{i}.mlp"
            m["layers/router"] = pre + ".router.weight"
            m["layers/router_bias"] = pre + ".router.bias"

            def _deinterleave(t):
                return jnp.concatenate([t[..., 0::2], t[..., 1::2]], -1)

            m["layers/w_gate_up"] = Mapped(
                pre + ".experts.gate_up_proj",
                lambda t: _deinterleave(t).transpose(1, 0, 2).reshape(
                    t.shape[1], -1))                     # [H, E*2Ie]
            m["layers/w_gate_up_bias"] = Mapped(
                pre + ".experts.gate_up_proj_bias",
                lambda t: _deinterleave(t).reshape(-1))  # [E*2Ie]
            m["layers/w_down"] = Mapped(
                pre + ".experts.down_proj",
                lambda t: t.reshape(-1, t.shape[-1]))    # [E*Ie, H]
            m["layers/w_down_bias"] = pre + ".experts.down_proj_bias"
        else:
            if cfg.model_type in ("qwen2_moe", "deepseek_v2",
                                  "deepseek_v3", "olmoe"):
                pre = "model.layers.{i}.mlp"
                names = ("gate_proj", "up_proj")
                down = "down_proj"
            else:
                pre = "model.layers.{i}.block_sparse_moe"
                names = ("w1", "w3")
                down = "w2"
            m["layers/router"] = pre + ".gate.weight"
            if cfg.router_score_fn == "sigmoid":
                # DeepSeek-V3 noaux_tc selection bias
                m["layers/router_bias"] = (
                    pre + ".gate.e_score_correction_bias")
            m["layers/w_gate_up"] = tuple(
                pre + f".experts.{e}.{w}.weight"
                for e in range(cfg.num_experts) for w in names)
            m["layers/w_down"] = tuple(
                pre + f".experts.{e}.{down}.weight"
                for e in range(cfg.num_experts))
        if cfg.shared_expert_intermediate_size:
            # Qwen2-MoE: "shared_expert" + sigmoid gate;
            # DeepSeek: "shared_experts" (plural), no gate.
            se = ("shared_experts" if not cfg.shared_expert_gate
                  else "shared_expert")
            m["layers/shared_gate_up"] = (
                pre + f".{se}.gate_proj.weight",
                pre + f".{se}.up_proj.weight")
            m["layers/shared_down"] = pre + f".{se}.down_proj.weight"
            if cfg.shared_expert_gate:
                m["layers/shared_gate"] = pre + ".shared_expert_gate.weight"
    if cfg.model_type == "phi3":
        # Phi-3 ships its projections already fused, in our exact
        # concat order: qkv_proj = [q|k|v], gate_up_proj = [gate|up].
        m["layers/wqkv"] = "model.layers.{i}.self_attn.qkv_proj.weight"
        m["layers/w_gate_up"] = (
            "model.layers.{i}.mlp.gate_up_proj.weight")
    if cfg.tie_word_embeddings:
        m.pop("lm_head")
    if cfg.attention_bias:
        m["layers/wqkv_bias"] = (
            "model.layers.{i}.self_attn.q_proj.bias",
            "model.layers.{i}.self_attn.k_proj.bias",
            "model.layers.{i}.self_attn.v_proj.bias")
    if cfg.qk_norm:  # Qwen3: per-head q/k RMSNorm before RoPE
        m["layers/q_norm"] = "model.layers.{i}.self_attn.q_norm.weight"
        m["layers/k_norm"] = "model.layers.{i}.self_attn.k_norm.weight"
    if cfg.attn_sinks:  # GPT-OSS per-head attention-sink logits
        m["layers/sinks"] = "model.layers.{i}.self_attn.sinks"
    if cfg.o_bias:
        m["layers/wo_bias"] = "model.layers.{i}.self_attn.o_proj.bias"
    if cfg.mlp_bias and not cfg.num_experts:
        # Dense-FFN biases (Ernie-4.5 use_bias): gate/up fuse in the
        # w_gate_up column order, down stays [H].
        m["layers/w_gate_up_bias"] = (
            "model.layers.{i}.mlp.gate_proj.bias",
            "model.layers.{i}.mlp.up_proj.bias")
        m["layers/w_down_bias"] = "model.layers.{i}.mlp.down_proj.bias"
    if cfg.mla:  # DeepSeek MLA: latent KV + optional low-rank queries
        del m["layers/wqkv"]
        m["layers/kv_a"] = (
            "model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight")
        m["layers/kv_a_norm"] = (
            "model.layers.{i}.self_attn.kv_a_layernorm.weight")
        m["layers/kv_b"] = "model.layers.{i}.self_attn.kv_b_proj.weight"
        if cfg.q_lora_rank:
            m["layers/q_a"] = "model.layers.{i}.self_attn.q_a_proj.weight"
            m["layers/q_a_norm"] = (
                "model.layers.{i}.self_attn.q_a_layernorm.weight")
            m["layers/q_b"] = "model.layers.{i}.self_attn.q_b_proj.weight"
        else:
            m["layers/q_proj"] = (
                "model.layers.{i}.self_attn.q_proj.weight")
    if cfg.sandwich_norms:
        if cfg.model_type == "glm4":
            # GLM-4 keeps the standard pre-norm names (input_layernorm /
            # post_attention_layernorm) and ADDS pre-residual output
            # norms under its own names; its gate_up ships pre-fused.
            m["layers/post_attn_norm"] = (
                "model.layers.{i}.post_self_attn_layernorm.weight")
            m["layers/post_ffn_norm"] = (
                "model.layers.{i}.post_mlp_layernorm.weight")
            m["layers/w_gate_up"] = (
                "model.layers.{i}.mlp.gate_up_proj.weight")
        else:
            # Gemma-2: post_attention_layernorm norms the attention
            # OUTPUT (our post_attn_norm); the pre-FFN norm (our
            # post_norm role) loads from pre_feedforward_layernorm.
            m["layers/post_attn_norm"] = (
                "model.layers.{i}.post_attention_layernorm.weight")
            m["layers/post_norm"] = (
                "model.layers.{i}.pre_feedforward_layernorm.weight")
            m["layers/post_ffn_norm"] = (
                "model.layers.{i}.post_feedforward_layernorm.weight")
    if not cfg.pre_norms:
        # OLMo-2: no input_layernorm / pre-FFN norm exist at all; its
        # post_attention/post_feedforward norms mapped just above.
        del m["layers/input_norm"], m["layers/post_norm"]
    if cfg.first_k_dense:
        # DeepSeek dense-prefix layers: every "layers/" path also exists
        # as "dense_layers/" except the MoE pieces, whose place the plain
        # dense FFN takes. The loader iterates dense_layers/ over
        # range(first_k_dense) and layers/ over the remainder.
        for path in list(m):
            if not path.startswith("layers/"):
                continue
            if path.split("/")[1] in ("router", "router_bias",
                                      "w_gate_up", "w_down",
                                      "shared_gate_up", "shared_down",
                                      "shared_gate"):
                continue
            m["dense_" + path] = m[path]
        m["dense_layers/w_gate_up"] = (
            "model.layers.{i}.mlp.gate_proj.weight",
            "model.layers.{i}.mlp.up_proj.weight")
        m["dense_layers/w_down"] = "model.layers.{i}.mlp.down_proj.weight"
    return m


def _set_path(tree: dict, path: str, value):
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _maybe_quantize(path: str, w, quant: QuantConfig):
    eligible = path in _QUANTIZABLE or (path == "lm_head"
                                        and quant.quantize_lm_head)
    if quant.enabled and eligible and not isinstance(w, QuantizedWeight):
        k = w.shape[-2]
        bits = 4 if quant.mode == "int4" else 8
        gs = quant.group_size or k          # 0 = per-output-channel
        if k % gs != 0:
            gs = int(np.gcd(k, gs)) or k
        if bits == 4 and gs != k and (k // 2) % gs != 0:
            # int4 split-half packing needs gs | K/2 (ref_ops)
            gs = int(np.gcd(k // 2, gs)) or k
        return QuantizedWeight.quantize(w, gs, bits=bits)
    return w


def params_from_fetcher(cfg: ModelConfig,
                        fetch: Callable[[str], np.ndarray],
                        quant: QuantConfig = QuantConfig(),
                        dtype: Optional[Any] = None,
                        device_put: Optional[Callable[[str, jax.Array], jax.Array]] = None,
                        ) -> dict:
    """Assemble the params pytree given ``fetch(hf_name) -> np.ndarray``.

    ``device_put(path, array)`` lets callers shard each tensor as it lands
    (parallel/sharding.py builds this from a mesh); default is host->default
    device.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    pmap = llama_hf_param_map(cfg)
    params: dict = {}

    def load_one(path: str, hf_name, layer: Optional[int]):
        if isinstance(hf_name, Mapped):
            name = (hf_name.name.format(i=layer) if layer is not None
                    else hf_name.name)
            return hf_name.fn(jnp.asarray(fetch(name))).astype(dtype)
        name = hf_name.format(i=layer) if layer is not None else hf_name
        t = jnp.asarray(fetch(name))
        if path.replace("dense_layers/", "layers/") in _TRANSPOSED:
            t = t.T
        if cfg.model_type in ("gemma", "gemma2", "gemma3_text") \
                and path.endswith("norm"):
            # Gemma RMSNorm multiplies by (1 + w); fold the +1 into the
            # stored weight so the standard rmsnorm applies unchanged.
            t = t.astype(jnp.float32) + 1.0
        return t.astype(dtype)

    for path, hf_names in pmap.items():
        # DeepSeek dense-prefix split: dense_layers/ covers HF layers
        # [0, first_k_dense); layers/ the rest (group-local stacking)
        if path.startswith("dense_layers/"):
            layers = range(cfg.first_k_dense)
        elif path.startswith("layers/"):
            layers = range(cfg.first_k_dense, cfg.num_layers)
        else:
            layers = [None]
        per_layer = layers != [None]
        stacked = []
        for li in layers:
            if isinstance(hf_names, tuple):
                axis = 0 if path in _ROW_CONCAT else -1
                t = jnp.concatenate(
                    [load_one(path, n, li) for n in hf_names], axis=axis)
            else:
                t = load_one(path, hf_names, li)
            stacked.append(t)
        t = jnp.stack(stacked) if per_layer else stacked[0]
        t = _maybe_quantize(path.replace("dense_layers/", "layers/"),
                            t, quant)
        if device_put is not None:
            t = jax.tree.map(lambda a: device_put(path, a), t)
        _set_path(params, path, t)
    return params


def load_safetensors_dir(model_dir: str, cfg: Optional[ModelConfig] = None,
                         quant: QuantConfig = QuantConfig(),
                         dtype: Optional[Any] = None,
                         device_put=None) -> tuple[ModelConfig, dict]:
    """Load a HF checkpoint directory (config.json + *.safetensors)."""
    from safetensors import safe_open

    if cfg is None:
        cfg = ModelConfig.from_pretrained_dir(model_dir)

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    index: dict[str, str] = {}
    handles = {}
    for f in files:
        h = safe_open(f, framework="np")
        handles[f] = h
        for name in h.keys():
            index[name] = f

    def fetch(name: str) -> np.ndarray:
        if name not in index:
            raise KeyError(f"tensor {name!r} not in checkpoint {model_dir}")
        return handles[index[name]].get_tensor(name)

    params = params_from_fetcher(cfg, fetch, quant=quant, dtype=dtype,
                                 device_put=device_put)
    return cfg, params


def params_from_torch_state_dict(cfg: ModelConfig, state_dict,
                                 quant: QuantConfig = QuantConfig(),
                                 dtype: Optional[Any] = None) -> dict:
    """Convert a torch (HF Llama) state dict — used by the golden tests."""
    def fetch(name: str) -> np.ndarray:
        t = state_dict[name]
        return t.detach().to("cpu").float().numpy()

    return params_from_fetcher(cfg, fetch, quant=quant, dtype=dtype)


def canonicalize_layouts(params: dict) -> dict:
    """device_put every array into row-major (default) device layout.

    Params produced by jitted builders/converters can come back in an
    XLA-chosen layout (e.g. scales in {2,0,1}); the Pallas custom calls
    constrain their operands to row-major, and a non-row-major stacked
    scales array forces a full relocation copy INSIDE the layer loop
    (~22 MB per layer per step for 7B w_down — 12% of the decode step).
    One explicit device_put here makes the in-jit reshape a bitcast.
    """
    from jax.experimental.layout import Format, Layout

    def fix(x):
        if not isinstance(x, jax.Array):
            return x
        fmt = Format(Layout(major_to_minor=tuple(range(x.ndim))),
                     x.sharding)
        return jax.device_put(x, fmt)

    return jax.tree.map(fix, params)


def quantize_params(params: dict, quant: QuantConfig) -> dict:
    """Post-hoc quantization of an already-loaded fp params tree."""
    out = dict(params)
    out["layers"] = {
        name: _maybe_quantize(f"layers/{name}", w, quant)
        for name, w in params["layers"].items()
    }
    if "lm_head" in params:
        out["lm_head"] = _maybe_quantize("lm_head", params["lm_head"], quant)
    return out
