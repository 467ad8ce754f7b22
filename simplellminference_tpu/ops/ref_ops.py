"""Pure-jnp reference implementations of every op.

These are (a) the CPU-runnable reference path (BASELINE config #1), and
(b) the golden baselines every Pallas kernel is unit-tested against
(SURVEY.md §4.1). The math here is the *correct* Llama math — the reference's
behavioral bugs Q1 (swiglu missing the gate factor, swiglu_kernel.cpp:12-13)
and Q2 (RoPE overrunning k under GQA, rope_kernel.cpp:27) are deliberately
not replicated (SURVEY.md §7.5).

Shape conventions (batch-first, TPU-friendly trailing dims):
    x:       [B, S, H]           activations
    q/k/v:   [B, S, N, D]        per-head layout
    weights: [K, N]              row-major contraction-first (x @ w)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * w, accumulated in fp32.

    Reference: rms_kernel.cpp:5-23 (its CUDA twin has a cross-block race,
    SURVEY.md Q3 — irrelevant here, XLA/Pallas reductions are race-free).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dtype) * weight


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SiLU(gate) * up — the *correct* SwiGLU.

    The reference computes sigmoid(gate) * up on both backends, missing the
    `gate *` factor (Q1: swiglu_kernel.cpp:12-13, swiglu_kernel.cu:9-10).
    """
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up



def glu_act(gate, up, act: str = "silu"):
    """Gated linear unit with a configurable activation.

    "silu" is SwiGLU (Llama family; the correct math the reference's Q1
    bug misses); "gelu_pytorch_tanh"/"gelu" are Gemma's GeGLU variants.
    """
    import jax
    import jax.numpy as jnp

    g = gate.astype(jnp.float32)
    if act == "swiglu_oss":
        # GPT-OSS clamped SwiGLU (HF GptOssExperts: alpha=1.702,
        # limit=7.0): gate clamps above, up clamps both ways, and the
        # "+1" feeds the gate through even at up == 0.
        g = jnp.minimum(g, 7.0)
        u = jnp.clip(up.astype(jnp.float32), -7.0, 7.0)
        glu = g * jax.nn.sigmoid(g * 1.702)
        return ((u + 1.0) * glu).astype(gate.dtype)
    if act == "silu":
        a = g * jax.nn.sigmoid(g)
    elif act in ("gelu_pytorch_tanh", "gelu_tanh"):
        a = jax.nn.gelu(g, approximate=True)
    elif act == "gelu":
        a = jax.nn.gelu(g, approximate=False)
    else:
        raise ValueError(f"unknown activation {act!r}")
    return (a * up.astype(jnp.float32)).astype(gate.dtype)

def rope_tables(positions: jax.Array, head_dim: int, theta: float,
                dtype=jnp.float32,
                rope_scaling: dict | tuple | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """sin/cos tables for the given positions: [..., head_dim // 2].

    freq_d = theta^(-2d/head_dim), angle = pos * freq — matches the
    reference's precomputed cache (rope_cache_cal, rope_kernel.cpp:4-19)
    but computed for arbitrary position tensors instead of a [max_seq]
    arena, with optional HF-style frequency scaling ("llama3" wavelength-
    banded scaling, "linear" position-interpolation scaling).
    """
    half = head_dim // 2
    amp = 1.0  # post-scaling of sin/cos (yarn "attention factor")
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim)
    if rope_scaling is not None:
        rs = dict(rope_scaling) if not isinstance(rope_scaling, dict) \
            else rope_scaling
        kind = rs.get("rope_type", rs.get("type", "llama3"))
        factor = float(rs.get("factor", 8.0))
        if kind == "linear":
            freqs = freqs / factor
        elif kind == "longrope":
            return _longrope_tables(positions, freqs, rs, factor, dtype)
        elif kind == "yarn":
            freqs, amp = _yarn_freqs(freqs, head_dim, theta, rs, factor)
        elif kind == "llama3":
            low = float(rs.get("low_freq_factor", 1.0))
            high = float(rs.get("high_freq_factor", 4.0))
            old_len = float(rs.get("original_max_position_embeddings", 8192))
            wavelen = 2.0 * jnp.pi / freqs
            low_wavelen = old_len / low
            high_wavelen = old_len / high
            # smooth band: interpolate between scaled and unscaled
            smooth = (old_len / wavelen - low) / (high - low)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            scaled = (1.0 - smooth) * (freqs / factor) + smooth * freqs
            freqs = jnp.where(wavelen > low_wavelen, freqs / factor,
                              jnp.where(wavelen < high_wavelen, freqs,
                                        scaled))
        elif kind != "default":
            raise ValueError(f"unsupported rope_type {kind!r}")
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., half]
    return ((amp * jnp.sin(angles)).astype(dtype),
            (amp * jnp.cos(angles)).astype(dtype))


def _longrope_tables(positions: jax.Array, freqs: jax.Array, rs: dict,
                     factor: float, dtype):
    """Phi-3 longrope (HF ``_compute_longrope_parameters`` semantics):
    per-dim inverse-frequency division by the short or long factor
    array, sin/cos scaled by sqrt(1 + ln(factor)/ln(orig)).

    Factor selection is PER POSITION (pos >= original_max uses
    long_factor) — cache-consistent for incremental decoding (the vLLM
    convention); HF eager instead switches the whole sequence once the
    forward's seq_len crosses the boundary.
    """
    short = jnp.asarray(rs["short_factor"], jnp.float32)
    long = jnp.asarray(rs["long_factor"], jnp.float32)
    orig = int(rs.get("original_max_position_embeddings", 4096))
    att = rs.get("attention_factor")
    if att is None:
        att = (1.0 if factor <= 1.0
               else math.sqrt(1.0 + math.log(factor) / math.log(orig)))
    pos = positions[..., None].astype(jnp.float32)
    a_short = pos * (freqs / short)
    a_long = pos * (freqs / long)
    angles = jnp.where(positions[..., None] < orig, a_short, a_long)
    return ((att * jnp.sin(angles)).astype(dtype),
            (att * jnp.cos(angles)).astype(dtype))


def yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    """DeepSeek/yarn attention magnitude correction: 0.1·m·ln(s) + 1."""
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_freqs(freqs: jax.Array, head_dim: int, theta: float, rs: dict,
                factor: float) -> tuple[jax.Array, float]:
    """Yarn (NTK-by-parts) frequency interpolation + attention factor.

    Matches HF ``_compute_yarn_parameters`` (modeling_rope_utils):
    per-dim blend between the original ("extrapolated") inverse
    frequencies and position-interpolated freqs/factor, ramped between
    the beta_fast/beta_slow correction dims; sin/cos post-scaled by the
    yarn attention factor (the DeepSeek mscale ratio when
    mscale/mscale_all_dim are present). DeepSeek-V2/V3 checkpoints use
    this for their 160k contexts.
    """
    half = head_dim // 2
    orig = float(rs.get("original_max_position_embeddings") or 4096)
    beta_fast = float(rs.get("beta_fast") or 32.0)
    beta_slow = float(rs.get("beta_slow") or 1.0)

    att = rs.get("attention_factor")
    if att is None:
        ms, msad = rs.get("mscale"), rs.get("mscale_all_dim")
        if ms and msad:
            att = yarn_mscale(factor, float(ms)) / yarn_mscale(
                factor, float(msad))
        else:
            att = yarn_mscale(factor)

    def correction_dim(num_rotations: float) -> float:
        return (head_dim * math.log(orig / (num_rotations * 2 * math.pi))
                ) / (2 * math.log(theta))

    low, high = correction_dim(beta_fast), correction_dim(beta_slow)
    if rs.get("truncate", True):
        low, high = math.floor(low), math.ceil(high)
    low = max(low, 0)
    high = min(high, head_dim - 1)
    if low == high:
        high += 0.001
    # ramp 0 -> 1 over [low, high]: dims below low keep the original
    # freqs (extrapolate), dims above high interpolate (freqs/factor)
    ramp = jnp.clip(
        (jnp.arange(half, dtype=jnp.float32) - low) / (high - low), 0.0, 1.0)
    return freqs / factor * ramp + freqs * (1.0 - ramp), float(att)


def rope_tables_for(cfg, positions: jax.Array, dtype=jnp.float32):
    """rope_tables driven by a ModelConfig (theta + scaling).

    MLA (DeepSeek): tables cover only the rope part of the key
    (qk_rope_head_dim) and are consumed INTERLEAVED
    (:func:`apply_rope_interleaved`)."""
    d = cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim
    if cfg.partial_rotary_factor < 1.0 and not cfg.mla:
        return rope_tables_partial(
            positions, d, cfg.partial_rotary_factor, cfg.rope_theta,
            dtype, rope_scaling=cfg.rope_scaling)
    return rope_tables(positions, d, cfg.rope_theta, dtype,
                       rope_scaling=cfg.rope_scaling)


def rope_tables_by_window(cfg, positions: jax.Array, wins,
                          dtype=jnp.float32) -> dict:
    """{window: (sin, cos)} for a per-layer window pattern.

    Gemma-3: sliding_attention layers rotate with rope_local_theta
    (plain, unscaled) while full_attention layers use the global theta
    + rope_scaling. Everything else: one shared table pair."""
    g = rope_tables_for(cfg, positions, dtype)
    if cfg.rope_local_theta is None:
        return {w: g for w in set(wins)}
    loc = rope_tables(positions, cfg.head_dim, cfg.rope_local_theta,
                      dtype)
    return {w: (loc if w is not None else g) for w in set(wins)}


def rope_tables_by_sublayer(cfg, positions: jax.Array, wins, nope,
                            dtype=jnp.float32) -> list:
    """Per-sublayer (sin, cos) for one scan period (cfg.scan_pattern()):
    window-keyed tables (Gemma-3 sliding layers use a local theta) with
    IDENTITY tables (sin=0, cos=1 — apply_rope becomes a no-op) for
    NoPE sublayers (SmolLM3 no_rope_layers)."""
    byw = rope_tables_by_window(cfg, positions, wins, dtype)
    if not any(nope):
        return [byw[w] for w in wins]
    sh = (*positions.shape, cfg.head_dim // 2)
    ident = (jnp.zeros(sh, dtype), jnp.ones(sh, dtype))
    return [ident if np_ else byw[w] for w, np_ in zip(wins, nope)]


def apply_rope(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """Half-split (NeoX/Llama-style) rotation of the last dim.

    x: [B, S, N, D]; sin/cos: [B, S, D/2] (broadcast over heads).
    Pairs (i, i + D/2) rotate together — same convention as the reference
    (rope_kernel.cpp:22-41) and HF Llama's rotate_half.
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    sin = sin[..., None, :]  # [B, S, 1, half]
    cos = cos[..., None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = xf1 * cos - xf2 * sin
    r2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)


def rope_tables_partial(positions: jax.Array, head_dim: int,
                        rotary_factor: float, theta: float,
                        dtype=jnp.float32, rope_scaling=None
                        ) -> tuple[jax.Array, jax.Array]:
    """sin/cos of width rd/2 for partial rotary (rd = head_dim *
    rotary_factor): frequencies run over rotary_dim, matching HF's
    inv_freq built with dim = head_dim * partial_rotary_factor."""
    rd = int(head_dim * rotary_factor)
    return rope_tables(positions, rd, theta, dtype,
                       rope_scaling=rope_scaling)          # [..., rd/2]


def apply_rope_partial(x: jax.Array, sin: jax.Array, cos: jax.Array,
                       interleaved: bool = False) -> jax.Array:
    """Rotate only the FIRST 2 * sin.shape[-1] dims; the trailing dims
    pass through unrotated (partial rotary: GLM-4, Nemotron, StableLM).

    x: [B, S, N, D]; sin/cos: [B, S, rd/2] with rd <= D. GLM-4's
    rotate_half is the INTERLEAVED pairing (lanes (2i, 2i+1) share
    frequency f_i — its apply repeat-interleaves the truncated tables);
    Nemotron/StableLM keep the half-split pairing."""
    rd = 2 * sin.shape[-1]
    rot = (apply_rope_interleaved if interleaved else apply_rope)(
        x[..., :rd], sin, cos)
    if rd == x.shape[-1]:
        return rot
    return jnp.concatenate([rot, x[..., rd:]], axis=-1)


def apply_rope_interleaved(x: jax.Array, sin: jax.Array,
                           cos: jax.Array) -> jax.Array:
    """Interleaved (GPT-NeoX-original / DeepSeek-style) rotation: pairs
    (2i, 2i+1) form the complex components — NOT the half-split layout.

    x: [B, S, N, D]; sin/cos: [B, S, D/2]. Matches DeepSeek's
    torch.view_as_complex application (modeling_deepseek_v2
    apply_rotary_emb), where freq index i rotates lanes (2i, 2i+1).
    """
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    sin = sin[..., None, :]  # [B, S, 1, D/2]
    cos = cos[..., None, :]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(x.shape).astype(x.dtype)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, S, kvN, D] -> [B, S, kvN * n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, s, n, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, n, n_rep, d)).reshape(
        b, s, n * n_rep, d)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array | None = None,
              scale: float | None = None,
              logit_cap: float | None = None,
              sinks: jax.Array | None = None) -> jax.Array:
    """Dense reference attention with fp32 softmax.

    q: [B, Sq, N, D]; k/v: [B, Sk, kvN, D]; mask: broadcastable to
    [B, N, Sq, Sk] (True = attend). GQA via head-group expansion
    (reference: mha_kernel.cpp:36-77 computes this per-head serially).
    ``logit_cap``: Gemma-2 score soft cap — cap * tanh(s / cap) before
    masking/softmax. ``sinks`` [N]: GPT-OSS attention sinks — a learned
    per-head logit that joins the softmax denominator but contributes
    no value (equivalent to one always-visible zero-value key).
    """
    n_rep = q.shape[2] // k.shape[2]
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if logit_cap:
        logits = logit_cap * jnp.tanh(logits / logit_cap)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    if sinks is not None:
        b, n, sq, _ = logits.shape
        col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None, None], (b, n, sq, 1))
        probs = jax.nn.softmax(
            jnp.concatenate([logits, col], axis=-1), axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def causal_mask(sq: int, sk: int, q_offset: jax.Array | int = 0,
                window: int | None = None) -> jax.Array:
    """[Sq, Sk] boolean causal mask; query i attends to keys <= q_offset + i.

    ``window``: sliding-window attention (Mistral semantics) — query i
    additionally attends only to keys with q_pos - k_pos < window."""
    qi = jnp.arange(sq)[:, None] + q_offset
    ki = jnp.arange(sk)[None, :]
    mask = ki <= qi
    if window is not None:
        mask = mask & (ki > qi - window)
    return mask


def quantize_int8_groupwise(w: jax.Array, group_size: int,
                            scale_dtype=jnp.float32):
    """Symmetric per-group INT8 quantization along the contraction dim.

    w: [..., K, N] -> (q: int8 [..., K, N], scales: [..., K // group, N]);
    leading dims (e.g. the stacked layer axis) pass through.
    scale = absmax(group) / 127; q = round(w / scale).
    """
    *lead, k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    wg = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(wg), axis=-2)                      # [..., G, N]
    scales = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scales[..., None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(*lead, k, n), scales.astype(scale_dtype)


def dequantize_int8_groupwise(q: jax.Array, scales: jax.Array,
                              dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_int8_groupwise: [..., K, N] + [..., G, N]."""
    *lead, k, n = q.shape
    g = scales.shape[-2]
    wq = q.astype(jnp.float32).reshape(*lead, g, k // g, n)
    out = wq * scales.astype(jnp.float32)[..., None, :]
    return out.reshape(*lead, k, n).astype(dtype)


def quantize_int4_groupwise(w: jax.Array, group_size: int,
                            scale_dtype=jnp.float32):
    """Symmetric per-group INT4 quantization, split-half nibble packed.

    w: [..., K, N] -> (packed: int8 [..., K/2, N], scales: [..., K//G, N]).
    Values are clipped to [-7, 7] (symmetric; scale = absmax(group) / 7).

    Packing layout (split-half along K): ``packed[..., i, n]`` holds
    logical row ``i`` in its LOW nibble and row ``i + K/2`` in its HIGH
    nibble. A K-block of packed rows therefore unpacks into two
    contraction slabs that are ``K/2`` apart — no sublane interleave
    anywhere, and the matmul kernel reads each packed byte exactly once
    (ops/matmul.py int4 path). Requires ``group_size | K/2`` (or
    ``group_size == K``: per-output-channel scales).
    """
    *lead, k, n = w.shape
    assert k % 2 == 0 and (group_size == k
                           or (k // 2) % group_size == 0), (k, group_size)
    wg = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(wg), axis=-2)
    scales = jnp.maximum(absmax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scales[..., None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(*lead, k, n)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scales.astype(scale_dtype)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of the split-half packing: [..., K/2, N] int8 -> [..., K, N].

    Low nibble = rows [0, K/2), high nibble = rows [K/2, K); both
    sign-extended via arithmetic shifts (int4 domain [-8, 7])."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize_int4_groupwise(packed: jax.Array, scales: jax.Array,
                              dtype=jnp.float32,
                              zs: jax.Array | None = None) -> jax.Array:
    """[..., K/2, N] packed + [..., K//G, N] scales -> [..., K, N].

    ``zs`` (asymmetric checkpoints): per-group zero*scale in fp32;
    w = q*s - zs (i.e. (q - z)*s with zs = z*s precomputed)."""
    w = dequantize_int8_groupwise(unpack_int4(packed), scales, jnp.float32)
    if zs is not None:
        k = w.shape[-2]
        w = w - jnp.repeat(zs.astype(jnp.float32), k // zs.shape[-2],
                           axis=-2)
    return w.astype(dtype)


def quantized_matmul_int4_ref(x: jax.Array, packed: jax.Array,
                              scales: jax.Array, out_dtype=None,
                              zs: jax.Array | None = None) -> jax.Array:
    """Reference fused int4 dequant+matmul (matches the Pallas kernel's
    group-wise fp32 partial-sum math).

    With ``zs`` (asymmetric AWQ/GPTQ checkpoints): w = (q - z)*s where
    zs[g, n] = z'[g, n] * s[g, n] in fp32 — the kernel computes
    x @ (q*s) - rowsum_g(x) * zs per group (runtime/hf_quant.py builds
    zs at load; cites /root/reference/source/model/model.cpp:204-245,
    the FP32-only mmap loader this quantized import path supersedes)."""
    out = quantized_matmul_ref(x, unpack_int4(packed), scales,
                               out_dtype=jnp.float32)
    if zs is not None:
        *lead, k = x.shape
        g = zs.shape[-2]
        xg = x.astype(jnp.float32).reshape(*lead, g, k // g)
        rs = xg.sum(-1)                                   # [..., G]
        corr = jnp.einsum("...g,gn->...n", rs, zs.astype(jnp.float32))
        out = out - corr
    return out.astype(out_dtype or x.dtype)


def quantized_matmul_ref(x: jax.Array, q: jax.Array, scales: jax.Array,
                         out_dtype=None) -> jax.Array:
    """Reference for the fused dequant+matmul: x @ dequant(q, scales).

    x: [..., K]; q: [K, N] int8; scales: [K // group, N].
    Group-wise partial sums in fp32 (matches the Pallas kernel's math).
    """
    out_dtype = out_dtype or x.dtype
    k, n = q.shape
    g = scales.shape[0]
    gs = k // g
    xg = x.astype(jnp.float32).reshape(*x.shape[:-1], g, gs)
    qg = q.astype(jnp.float32).reshape(g, gs, n)
    # per-group dot then scale: sum_g scale[g] * (x_g @ q_g)
    partial = jnp.einsum("...gk,gkn->...gn", xg, qg)
    out = jnp.einsum("...gn,gn->...n", partial, scales.astype(jnp.float32))
    return out.astype(out_dtype)


def quantized_matmul_w8a8_ref(x: jax.Array, q: jax.Array,
                              scales: jax.Array,
                              out_dtype=None) -> jax.Array:
    """Reference for the W8A8 kernel: per-token int8 activations against
    int8 weights, integer dots, scales applied to the f32 partials
    (matches ops/matmul.py _qmm_w8a8_kernel; the integer part is exact,
    so kernel-vs-ref differs only in f32 summation order).
    """
    out_dtype = out_dtype or x.dtype
    from simplellminference_tpu.ops.matmul import quantize_activations_int8
    k, n = q.shape
    g = scales.shape[0]
    gs = k // g
    xi, xs = quantize_activations_int8(x)
    xg = xi.astype(jnp.int32).reshape(*x.shape[:-1], g, gs)
    qg = q.astype(jnp.int32).reshape(g, gs, n)
    partial = jnp.einsum("...gk,gkn->...gn", xg, qg).astype(jnp.float32)
    out = jnp.einsum("...gn,gn->...n", partial, scales.astype(jnp.float32))
    return (out * xs).astype(out_dtype)
