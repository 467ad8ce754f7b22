"""Fused FFN megakernel: rmsnorm -> gate_up -> SwiGLU -> down -> +residual
in ONE pallas_call.

Decode on this hardware is HBM-bound with a practical pipelined-DMA
ceiling of ~740 GB/s (benchmarks/micro.py stream tests), so the budget
killers are the per-kernel ramp/drain bubbles between the FFN's two
matmuls and the standalone elementwise ops between them. This kernel runs
both weight streams back-to-back in a single linearized grid:

  phase A (steps 0..T1):  rmsnorm(x) once, then gate_up accumulation —
      grid walks (n1 block, k1 step); each n1 block is scaled
      (per-output-channel INT8) when its K loop completes; the LAST phase-A
      step applies SwiGLU into a K-sliced scratch for phase B.
  phase B (steps T1..T):  down accumulation over the SwiGLU scratch; the
      final step applies the down scales and adds the residual.

Because Pallas prefetches grid step i+1's blocks during step i, the first
down-projection block is already resident when phase B starts (its phase-A
index map pins block (layer, 0, 0)) — the second matmul has NO ramp, and
there is no XLA fusion boundary anywhere in the FFN.

Reference scope: this replaces the reference's rmsnorm/up/gate/swiglu/down
op sequence (model.cpp:93-128) on the decode hot path.

Constraints (dispatcher falls back to the unfused ops otherwise):
per-output-channel scales, stacked [L, ...] int8 weights, m <= 64,
divisibility of the tile choices below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplellminference_tpu.ops.matmul import _best_tile, _largest_divisor


def _kernel(layer_ref, x_ref, nw_ref, q1_ref, s1_ref, q2_ref, s2_ref,
            out_ref, xn_ref, acc1_ref, gu_ref, h_ref, acc2_ref, *,
            eps: float, k1: int, n1: int, k2: int, bk1: int, bn1: int,
            bk2: int, out_dtype):
    i = pl.program_id(0)
    t1 = n1 * k1
    m = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)                     # [m, H]
        inv = jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps)
        xn = (x * inv * nw_ref[0, 0][None].astype(jnp.float32)
              ).astype(jnp.bfloat16)
        for kk in range(k1):
            xn_ref[kk] = xn[:, kk * bk1:(kk + 1) * bk1]
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(i < t1)
    def _():
        j1 = i // k1
        kk1 = i % k1

        @pl.when(kk1 == 0)
        def _():
            acc1_ref[:] = jnp.zeros_like(acc1_ref)

        acc1_ref[:] += jnp.dot(xn_ref[kk1], q1_ref[0].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        @pl.when(kk1 == k1 - 1)
        def _():
            # per-output-channel scale applied as this n1 block completes
            gu_ref[j1] = acc1_ref[:] * s1_ref[0, 0][None].astype(jnp.float32)

    @pl.when(i == t1 - 1)
    def _():
        # SwiGLU: gate blocks [0, n1/2), up blocks [n1/2, n1)
        half = n1 // 2
        per = bn1 // bk2
        for jb in range(half):
            g = gu_ref[jb]
            u = gu_ref[jb + half]
            sw = (g * jax.lax.logistic(g) * u).astype(jnp.bfloat16)
            for t in range(per):
                h_ref[jb * per + t] = sw[:, t * bk2:(t + 1) * bk2]

    @pl.when(i >= t1)
    def _():
        kk2 = i - t1
        acc2_ref[:] += jnp.dot(h_ref[kk2], q2_ref[0].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    @pl.when(i == t1 + k2 - 1)
    def _():
        out_ref[:] = (acc2_ref[:] * s2_ref[0, 0][None].astype(jnp.float32)
                      + x_ref[:].astype(jnp.float32)).astype(out_dtype)


def ffn_tiles(h: int, inter: int, m_pad: int) -> tuple[int, int, int] | None:
    """(bk1, bn1, bk2) for the fused FFN, or None if no valid tiling.

    bn1 divides ``inter`` (gate/up halves stay block-aligned), bk1 divides
    ``h``; bk2 divides bn1 and is a multiple of 32 (int8 sublane tile of
    the down-weight block). VMEM: both weight streams' double buffers are
    live at once, so target ~10 MB total.
    """
    # 256-row K blocks measured ~0.3% faster than 512 on the 7B decode
    # stream (half the first-block DMA ramp; the gate_up stream is long
    # enough that steady-state efficiency is unchanged)
    bk1 = _largest_divisor(h, 256, 128)
    if h % bk1:  # the fallback (128) need not divide h: silent K-column
        return None  # truncation otherwise
    # VMEM residents independent of bn1: gate_up scratch (2I·m f32),
    # x/out/acc2/xn/h buffers, the down-weight double buffer (<= 2·256·h).
    fixed = (2 * inter * m_pad * 4 + m_pad * h * 12 + m_pad * h * 2
             + m_pad * inter * 2 + 2 * 256 * h)

    def fits1(d: int) -> bool:
        return 2 * bk1 * d + m_pad * d * 4 + fixed <= 12 * 2 ** 20

    bn1 = _best_tile(inter, 5504, 128, hard_cap=8192, fits=fits1)
    if inter % bn1 != 0:
        return None
    # bk2: multiple of 32 dividing bn1 (so SwiGLU slabs tile exactly)
    bk2 = 0
    for d in (512, 256, 128, 384, 160, 96, 64, 32):
        if bn1 % d == 0 and 2 * d * h <= 2 * 2 ** 20:
            bk2 = d
            break
    if not bk2:
        return None
    return bk1, bn1, bk2


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ffn(x: jax.Array, norm_w: jax.Array, q1: jax.Array,
              s1: jax.Array, q2: jax.Array, s2: jax.Array,
              layer: jax.Array, eps: float = 1e-5,
              interpret: bool = False) -> jax.Array:
    """x: [m, H]. q1: [L, H, 2I] int8, s1: [L, 1, 2I] (per-channel);
    q2: [L, I, H] int8, s2: [L, 1, H]. Returns x + down(swiglu(...)).
    Caller guarantees a valid tiling exists (see :func:`ffn_tiles`)."""
    m, h = x.shape
    l_, _, n1_full = q1.shape
    inter = q2.shape[1]
    assert n1_full == 2 * inter

    m_pad = max(16, -(-m // 8) * 8)
    x2 = x.astype(jnp.bfloat16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    tiles = ffn_tiles(h, inter, m_pad)
    assert tiles is not None, (h, inter)
    bk1, bn1, bk2 = tiles
    k1 = h // bk1
    n1 = n1_full // bn1
    k2 = inter // bk2
    t1 = n1 * k1
    grid = (t1 + k2,)

    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    # accept pre-shaped [L, 1, H] norms: reshaping here (inside the
    # caller's layer scan) makes XLA re-lay the whole array out every
    # layer step (models/llama.py hoists the reshape)
    nw3 = norm_w if norm_w.ndim == 3 else norm_w.reshape(l_, 1, h)
    s1r = s1.reshape(l_, 1, n1_full)
    s2r = s2.reshape(l_, 1, h)

    def q1_index(i, li):
        # phase B pins the last phase-A block: same index -> no DMA
        ic = jnp.minimum(i, t1 - 1)
        return (li[0], ic % k1, ic // k1)

    def s1_index(i, li):
        return (li[0], 0, jnp.minimum(i, t1 - 1) // k1)

    def q2_index(i, li):
        # phase A pins block (layer, 0, 0): it is ALREADY resident when
        # phase B's first step runs -> the down matmul has no DMA ramp.
        return (li[0], jnp.maximum(i - t1, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, h), lambda i, li: (0, 0)),        # x
            pl.BlockSpec((1, 1, h), lambda i, li: (li[0], 0, 0)),  # norm
            pl.BlockSpec((1, bk1, bn1), q1_index),                 # q1
            pl.BlockSpec((1, 1, bn1), s1_index),                   # s1
            pl.BlockSpec((1, bk2, h), q2_index),                   # q2
            pl.BlockSpec((1, 1, h), lambda i, li: (li[0], 0, 0)),  # s2
        ],
        out_specs=pl.BlockSpec((m_pad, h), lambda i, li: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((k1, m_pad, bk1), jnp.bfloat16),   # xn slabs
            pltpu.VMEM((m_pad, bn1), jnp.float32),        # acc1
            pltpu.VMEM((n1, m_pad, bn1), jnp.float32),    # gate_up
            pltpu.VMEM((k2, m_pad, bk2), jnp.bfloat16),   # swiglu slabs
            pltpu.VMEM((m_pad, h), jnp.float32),          # acc2
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, k1=k1, n1=n1, k2=k2, bk1=bk1,
                          bn1=bn1, bk2=bk2, out_dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * h * (n1_full + inter),
            bytes_accessed=h * n1_full + inter * h,
            transcendentals=m_pad * inter,
        ),
        interpret=interpret,
    )(layer, x2, nw3, q1, s1r, q2, s2r)
    return out[:m]


def _wo_kernel(layer_ref, attn_ref, x_ref, wq_ref, ws_ref, nw_ref, q1_ref,
               s1_ref, q2_ref, s2_ref, out_ref, at_ref, acc0_ref, xres_ref,
               xn_ref, acc1_ref, gu_ref, h_ref, acc2_ref, *, eps: float,
               k0: int, k1: int, n1: int, k2: int, bk0: int, bk1: int,
               bn1: int, bk2: int, out_dtype):
    """wo + residual + rmsnorm + gate_up + SwiGLU + down + residual."""
    i = pl.program_id(0)
    t0 = k0
    t1 = t0 + n1 * k1

    @pl.when(i == 0)
    def _():
        a = attn_ref[:].astype(jnp.bfloat16)
        for kk in range(k0):
            at_ref[kk] = a[:, kk * bk0:(kk + 1) * bk0]
        acc0_ref[:] = jnp.zeros_like(acc0_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    @pl.when(i < t0)
    def _():
        acc0_ref[:] += jnp.dot(at_ref[i], wq_ref[0].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    @pl.when(i == t0 - 1)
    def _():
        # Round exactly like the unfused path (qmm -> bf16 out -> bf16
        # residual add): keeps fused and unfused decode token streams
        # IDENTICAL, which the TPU-vs-CPU parity harness relies on.
        wo_out = (acc0_ref[:] * ws_ref[0, 0][None].astype(jnp.float32)
                  ).astype(jnp.bfloat16)
        xres = (x_ref[:] + wo_out).astype(jnp.float32)
        xres_ref[:] = xres
        inv = jax.lax.rsqrt(jnp.mean(xres * xres, axis=1, keepdims=True)
                            + eps)
        xn = (xres * inv * nw_ref[0, 0][None].astype(jnp.float32)
              ).astype(jnp.bfloat16)
        for kk in range(k1):
            xn_ref[kk] = xn[:, kk * bk1:(kk + 1) * bk1]

    @pl.when((i >= t0) & (i < t1))
    def _():
        j1 = (i - t0) // k1
        kk1 = (i - t0) % k1

        @pl.when(kk1 == 0)
        def _():
            acc1_ref[:] = jnp.zeros_like(acc1_ref)

        acc1_ref[:] += jnp.dot(xn_ref[kk1], q1_ref[0].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        @pl.when(kk1 == k1 - 1)
        def _():
            gu_ref[j1] = acc1_ref[:] * s1_ref[0, 0][None].astype(jnp.float32)

    @pl.when(i == t1 - 1)
    def _():
        half = n1 // 2
        per = bn1 // bk2
        for jb in range(half):
            g = gu_ref[jb]
            u = gu_ref[jb + half]
            sw = (g * jax.lax.logistic(g) * u).astype(jnp.bfloat16)
            for t in range(per):
                h_ref[jb * per + t] = sw[:, t * bk2:(t + 1) * bk2]

    @pl.when(i >= t1)
    def _():
        acc2_ref[:] += jnp.dot(h_ref[i - t1], q2_ref[0].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    @pl.when(i == t1 + k2 - 1)
    def _():
        out_ref[:] = (acc2_ref[:] * s2_ref[0, 0][None].astype(jnp.float32)
                      + xres_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_wo_ffn(attn: jax.Array, x: jax.Array, wo_q: jax.Array,
                 wo_s: jax.Array, norm_w: jax.Array, q1: jax.Array,
                 s1: jax.Array, q2: jax.Array, s2: jax.Array,
                 layer: jax.Array, eps: float = 1e-5,
                 interpret: bool = False) -> jax.Array:
    """x + down(swiglu(gate_up(rms(x + attn @ wo)))) — the whole post-
    attention half of a decoder layer as ONE weight stream.

    attn: [m, N*D]; x: [m, H]; wo_q: [L, N*D, H] int8 (+ per-channel
    wo_s [L, 1, H]); q1/s1/q2/s2 as :func:`fused_ffn`.

    NOT dispatched from the model: on v5e 7B decode this measured ~10
    tok/s SLOWER than standalone wo qmm + :func:`fused_ffn` (the extra
    VMEM residency squeezes the gate_up stream's buffering). Kept as a
    tested building block for parts with more VMEM headroom.
    """
    m, nd = attn.shape
    _, h = x.shape
    l_, _, n1_full = q1.shape
    inter = q2.shape[1]

    m_pad = max(16, -(-m // 8) * 8)
    a2 = attn.astype(jnp.bfloat16)
    x2 = x.astype(jnp.bfloat16)
    if m_pad != m:
        a2 = jnp.pad(a2, ((0, m_pad - m), (0, 0)))
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    tiles = ffn_tiles(h, inter, m_pad)
    assert tiles is not None, (h, inter)
    bk1, bn1, bk2 = tiles
    # NOTE: bk0=256 does NOT match the standalone qmm's K split (512),
    # so the f32 accumulation order — and occasionally the bf16-rounded
    # result — differs from the unfused path. Acceptable here: this
    # kernel is not dispatched from the model (see docstring).
    bk0 = _largest_divisor(nd, 256, 128)
    k0 = nd // bk0
    k1 = h // bk1
    n1 = n1_full // bn1
    k2 = inter // bk2
    t0 = k0
    t1 = t0 + n1 * k1
    grid = (t1 + k2,)

    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    nw3 = norm_w.reshape(l_, 1, h)
    ws3 = wo_s.reshape(l_, 1, h)
    s1r = s1.reshape(l_, 1, n1_full)
    s2r = s2.reshape(l_, 1, h)

    def wo_index(i, li):
        return (li[0], jnp.minimum(i, t0 - 1), 0)

    def q1_index(i, li):
        ic = jnp.clip(i - t0, 0, n1 * k1 - 1)
        return (li[0], ic % k1, ic // k1)

    def s1_index(i, li):
        return (li[0], 0, jnp.clip(i - t0, 0, n1 * k1 - 1) // k1)

    def q2_index(i, li):
        return (li[0], jnp.maximum(i - t1, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, nd), lambda i, li: (0, 0)),       # attn
            pl.BlockSpec((m_pad, h), lambda i, li: (0, 0)),        # x
            pl.BlockSpec((1, bk0, h), wo_index),                   # wo q
            pl.BlockSpec((1, 1, h), lambda i, li: (li[0], 0, 0)),  # wo s
            pl.BlockSpec((1, 1, h), lambda i, li: (li[0], 0, 0)),  # norm
            pl.BlockSpec((1, bk1, bn1), q1_index),                 # q1
            pl.BlockSpec((1, 1, bn1), s1_index),                   # s1
            pl.BlockSpec((1, bk2, h), q2_index),                   # q2
            pl.BlockSpec((1, 1, h), lambda i, li: (li[0], 0, 0)),  # s2
        ],
        out_specs=pl.BlockSpec((m_pad, h), lambda i, li: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((k0, m_pad, bk0), jnp.bfloat16),   # attn slabs
            pltpu.VMEM((m_pad, h), jnp.float32),          # acc0 (wo)
            pltpu.VMEM((m_pad, h), jnp.float32),          # x + attn@wo
            pltpu.VMEM((k1, m_pad, bk1), jnp.bfloat16),   # xn slabs
            pltpu.VMEM((m_pad, bn1), jnp.float32),        # acc1
            pltpu.VMEM((n1, m_pad, bn1), jnp.float32),    # gate_up
            pltpu.VMEM((k2, m_pad, bk2), jnp.bfloat16),   # swiglu slabs
            pltpu.VMEM((m_pad, h), jnp.float32),          # acc2
        ],
    )

    out = pl.pallas_call(
        functools.partial(_wo_kernel, eps=eps, k0=k0, k1=k1, n1=n1, k2=k2,
                          bk0=bk0, bk1=bk1, bn1=bn1, bk2=bk2,
                          out_dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * (nd * h + h * n1_full + inter * h),
            bytes_accessed=nd * h + h * n1_full + inter * h,
            transcendentals=m_pad * inter,
        ),
        interpret=interpret,
    )(layer, a2, x2, wo_q, ws3, nw3, q1, s1r, q2, s2r)
    return out[:m]


def fused_wo_ffn_available(lw, nd: int, h: int, inter: int, m: int) -> bool:
    """True when the wo+FFN megakernel applies on top of the FFN gates."""
    from simplellminference_tpu.ops.linear import QuantizedWeight

    wo = lw.get("wo")
    if not (isinstance(wo, QuantizedWeight) and wo.q.ndim == 3
            and wo.scales.shape[-2] == 1 and wo.bits == 8):
        return False
    if nd % 128 != 0:
        return False
    return fused_ffn_available(lw, h, inter, m)


def fused_ffn_available(lw, h: int, inter: int, m: int) -> bool:
    """True when the decode-path fused FFN kernel applies."""
    from simplellminference_tpu.ops.linear import QuantizedWeight

    gu, dn = lw.get("w_gate_up"), lw.get("w_down")
    if not (isinstance(gu, QuantizedWeight) and isinstance(dn, QuantizedWeight)):
        return False
    if gu.bits != 8 or dn.bits != 8:
        return False  # int4 rides the unfused path (capacity mode)
    if gu.q.ndim != 3 or dn.q.ndim != 3:
        return False
    if gu.scales.shape[-2] != 1 or dn.scales.shape[-2] != 1:
        return False  # per-output-channel scales only
    if m > 64:
        return False
    return ffn_tiles(h, inter, max(16, -(-m // 8) * 8)) is not None
