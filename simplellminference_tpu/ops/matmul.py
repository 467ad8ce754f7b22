"""Fused INT8-group dequant + matmul Pallas kernel (MXU-tiled).

The successor of the reference's decode-hot GEMV kernel (one CUDA block per
output row, warp-shuffle reduction — matmul_kernel.cu:5-38), redesigned for
the TPU roofline: weight-only INT8 halves HBM traffic vs bf16, the int8
tiles are cast to bf16 in VMEM and fed to the MXU per contraction group,
and the per-group scale is applied to the fp32 accumulator — so dequant
costs one VPU cast per weight element and the kernel stays HBM-bound at
~K*N bytes per call.

    y[M, N] = sum_g  (x[:, g] @ cast(q[g])) * scales[g, :]

Grid: (M/bm, N/bn, K/bk), K innermost ("arbitrary") with an fp32 VMEM
accumulator written out on the last K step. Pallas pipelines the HBM->VMEM
block DMAs across grid steps automatically (double buffering).

**Stacked-layer mode**: weights may be [L, K, N] with a traced ``layer``
index; the layer id is scalar-prefetched and consumed by the BlockSpec
index maps, so a ``lax.scan`` over layers reads each layer's weight
directly from the stacked HBM buffer. (Passing a ``dynamic_slice`` of the
stacked weight into ``pallas_call`` instead forces XLA to materialize a
full copy of the layer — custom calls can't fuse slices — which measured
246 GB/s vs 434 GB/s on v5e; see benchmarks/micro.py qmm_stacked.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n: int, cap: int, mult: int) -> int:
    """Largest d <= cap with n % d == 0 and d % mult == 0 (fallback: mult)."""
    d = min(cap, n)
    d -= d % mult
    while d >= mult:
        if n % d == 0:
            return d
        d -= mult
    return mult


def _best_tile(n: int, target: int, mult: int, hard_cap: int,
               fits=None) -> int:
    """Divisor of n (multiple of `mult`) nearest `target` in log space.

    Unlike a plain largest-divisor-below-cap, this may pick a tile LARGER
    than target when n's factorization is awkward — e.g. n = 22016
    (= 128·172) has no divisor between 512 and 5504, and 5504 runs ~40%
    faster than 512 (sweep in benchmarks/micro.py). ``fits(d)`` vetoes
    candidates (VMEM budget).
    """
    import math
    best, best_cost = mult, float("inf")
    d = mult
    while d <= min(n, hard_cap):
        if n % d == 0 and (fits is None or fits(d)):
            cost = abs(math.log(d / target))
            if cost < best_cost:
                best, best_cost = d, cost
        d += mult
    return best


def _qmm_kernel(meta_ref, x_ref, q_ref, s_ref, out_ref, acc_ref, *,
                n_groups: int, group_size: int, out_dtype,
                per_channel: bool):
    # s_ref block = this K step's group rows ([1, 1, n_groups, bn]); the
    # wrapper reshapes scales to [L, K/bk, n_groups, N] so the block's
    # last-two dims (n_groups, bn) satisfy tiling by full-extent equality
    # and the per-group row index below is STATIC (required for non-f32
    # scale dtypes, whose sublane alignment Mosaic cannot prove for
    # dynamic row indices). Per-channel mode (one scale row per output
    # column, the standard near-lossless weight-only INT8 scheme): the
    # group spans ALL K steps, so the raw int32-domain sum accumulates and
    # the scale applies once at write-out.
    k_step = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk] bf16
    if per_channel:
        qg = q_ref[0].astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x, qg, preferred_element_type=jnp.float32)
    else:
        for g in range(n_groups):
            sl = slice(g * group_size, (g + 1) * group_size)
            qg = q_ref[0, sl, :].astype(jnp.bfloat16)   # VPU cast, no mul
            partial = jnp.dot(x[:, sl], qg,
                              preferred_element_type=jnp.float32)
            scale_row = s_ref[0, 0, g, :]
            acc_ref[:] += partial * scale_row[None, :].astype(jnp.float32)

    @pl.when(k_step == n_k - 1)
    def _():
        if per_channel:
            scale_row = s_ref[0, 0, 0, :]
            out_ref[:] = (acc_ref[:]
                          * scale_row[None, :].astype(jnp.float32)
                          ).astype(out_dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_dtype)


def _qmm4_kernel(meta_ref, xlo_ref, xhi_ref, q_ref, slo_ref, shi_ref,
                 *rest, n_groups: int, group_size: int,
                 out_dtype, per_channel: bool, has_zeros: bool):
    """INT4 variant: q_ref block is split-half nibble packed ([bkp, bn]
    int8 covering logical rows kk*bkp.. of BOTH halves). Each packed
    byte is read once; the two unpacked slabs contract against the two
    x operands (same array, lo/hi column windows). Sign extension via
    arithmetic shifts (int4 domain [-8, 7]).

    ``has_zeros`` (asymmetric AWQ/GPTQ imports): two extra operands hold
    per-group zero*scale rows; w = (q - z)*s decomposes as
    x@(q*s) - rowsum_g(x)*zs, so the correction costs one row-sum and
    one rank-1 update per group — no extra weight traffic."""
    if has_zeros:
        zlo_ref, zhi_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    k_step = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xl = xlo_ref[:]                              # [bm, bkp] bf16
    xh = xhi_ref[:]
    qp = q_ref[0].astype(jnp.int32)              # [bkp, bn] packed bytes
    # Mosaic has no i8 vector shifts — sign-extend the nibbles in i32:
    # low nibble = bits 0-3 (<<28 >>28), high nibble = bits 4-7 (<<24 >>28).
    lo = jnp.right_shift(jnp.left_shift(qp, 28), 28).astype(jnp.bfloat16)
    hi = jnp.right_shift(jnp.left_shift(qp, 24), 28).astype(jnp.bfloat16)
    if per_channel and not has_zeros:
        acc_ref[:] += (jnp.dot(xl, lo, preferred_element_type=jnp.float32)
                       + jnp.dot(xh, hi,
                                 preferred_element_type=jnp.float32))
    else:
        for g in range(n_groups):
            sl = slice(g * group_size, (g + 1) * group_size)
            p_lo = jnp.dot(xl[:, sl], lo[sl],
                           preferred_element_type=jnp.float32)
            acc_ref[:] += p_lo * slo_ref[0, 0, g][None].astype(jnp.float32)
            p_hi = jnp.dot(xh[:, sl], hi[sl],
                           preferred_element_type=jnp.float32)
            acc_ref[:] += p_hi * shi_ref[0, 0, g][None].astype(jnp.float32)
            if has_zeros:
                rs_lo = jnp.sum(xl[:, sl].astype(jnp.float32), axis=1,
                                keepdims=True)           # [bm, 1]
                rs_hi = jnp.sum(xh[:, sl].astype(jnp.float32), axis=1,
                                keepdims=True)
                acc_ref[:] -= rs_lo * zlo_ref[0, 0, g][None].astype(
                    jnp.float32)
                acc_ref[:] -= rs_hi * zhi_ref[0, 0, g][None].astype(
                    jnp.float32)

    @pl.when(k_step == n_k - 1)
    def _():
        if per_channel and not has_zeros:
            scale_row = slo_ref[0, 0, 0, :]
            out_ref[:] = (acc_ref[:]
                          * scale_row[None, :].astype(jnp.float32)
                          ).astype(out_dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_dtype)


def _qmm_w8a8_kernel(meta_ref, x_ref, xs_ref, q_ref, s_ref, out_ref,
                     acc_ref, *, n_groups: int, group_size: int,
                     out_dtype, per_channel: bool):
    """W8A8 variant of _qmm_kernel: int8 activations x int8 weights on the
    MXU's double-rate int8 path (v5e: 394 TOPS vs 197 bf16 TFLOPs), i32
    group partials scaled into an f32 accumulator. The per-token
    activation scale (xs, [bm, 1]) applies once at write-out."""
    k_step = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [bm, bk] int8
    if per_channel:
        # Pure i32 accumulation — exact, zero per-step VPU cost (the
        # grouped path pays an i32->f32 convert + scale per group, which
        # eats ~40% of the int8 MXU gain). |sum| <= K * 127^2 < 2^31 for
        # K <= 133k: no overflow for any supported shape.
        acc_ref[:] += jnp.dot(x, q_ref[0],
                              preferred_element_type=jnp.int32)
    else:
        for g in range(n_groups):
            sl = slice(g * group_size, (g + 1) * group_size)
            partial = jnp.dot(x[:, sl], q_ref[0, sl, :],
                              preferred_element_type=jnp.int32)
            scale_row = s_ref[0, 0, g, :]
            acc_ref[:] += (partial.astype(jnp.float32)
                           * scale_row[None, :].astype(jnp.float32))

    @pl.when(k_step == n_k - 1)
    def _():
        if per_channel:
            scale_row = s_ref[0, 0, 0, :]
            res = (acc_ref[:].astype(jnp.float32) * xs_ref[:]
                   * scale_row[None, :].astype(jnp.float32))
        else:
            res = acc_ref[:] * xs_ref[:]             # [bm, 1] row scales
        out_ref[:] = res.astype(out_dtype)


def quantize_activations_int8(x: jax.Array):
    """Per-token (last-axis) symmetric int8: returns (xi, xs) with
    x ~= xi * xs. xs: [..., 1] f32."""
    xs = (jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
          / 127.0)
    xs = jnp.maximum(xs, 1e-10)
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                  ).astype(jnp.int8)
    return xi, xs


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "bm", "bn", "bk"))
def quantized_matmul_w8a8(x: jax.Array, q: jax.Array, scales: jax.Array,
                          out_dtype=jnp.bfloat16, interpret: bool = False,
                          bm: int | None = None, bn: int = 2048,
                          bk: int = 512,
                          layer: jax.Array | None = None) -> jax.Array:
    """y = quant8(x) @ dequant(q, scales): W8A8 on the int8 MXU path.

    Same contract as :func:`quantized_matmul` (bits=8, symmetric, no
    n_start/ring support) but the activations are quantized per token
    (per row, symmetric int8) so both MXU operands are int8 — double
    matmul throughput on v5e+. This is the PREFILL path: prefill is
    compute-bound, decode is weight-bandwidth-bound and stays W8A16.

    Accuracy: per-token activation scales x per-group weight scales
    (W8A8-token; the standard near-lossless recipe minus smoothing).
    Gate behind ``ModelConfig.act_quant`` and validate per checkpoint.
    """
    if q.ndim == 2:
        q = q[None]
        scales = scales[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None, "stacked weights need a layer index"
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    orig_shape = x.shape
    _, k, n = q.shape
    group_size = k // scales.shape[1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d

    xi, xs = quantize_activations_int8(x.reshape(m, k))

    # int8 min tile is (32, 128)
    if bm is None:
        bm = _largest_divisor(m, 256, 32) if m >= 32 else 32
    pad_m = (-m) % bm
    if pad_m:
        xi = jnp.pad(xi, ((0, pad_m), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_m), (0, 0)))
    m_p = m + pad_m

    bk_eff = _largest_divisor(k, bk, max(group_size, 128))

    def fits(d: int) -> bool:
        vmem = (2 * bm * bk_eff                # x blocks (int8)
                + 2 * bk_eff * d               # q blocks (int8)
                + 2 * scales.shape[1] * d * 4  # scales blocks
                + 2 * bm * d * 2               # out blocks (bf16)
                + bm * d * 4 * 2)              # accumulator + i32 partial
        return vmem <= 13 * 2 ** 20

    bn_eff = _best_tile(n, bn, 128, hard_cap=8192, fits=fits)
    per_channel = group_size == k
    if per_channel:
        n_groups = 1
    else:
        if bk_eff % group_size != 0:
            bk_eff = group_size
        n_groups = bk_eff // group_size

    grid = (m_p // bm, n // bn_eff, k // bk_eff)

    n_kslabs = 1 if per_channel else k // bk_eff
    scales4 = scales.reshape(scales.shape[0], n_kslabs, n_groups, n)
    scales4 = _pin_row_major(scales4, interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk_eff), lambda i, j, kk, mt: (i, kk)),
            pl.BlockSpec((bm, 1), lambda i, j, kk, mt: (i, 0)),
            pl.BlockSpec((1, bk_eff, bn_eff),
                         lambda i, j, kk, mt: (mt[0], kk, j)),
            pl.BlockSpec((1, 1, n_groups, bn_eff),
                         (lambda i, j, kk, mt: (mt[0], 0, 0, j))
                         if per_channel else
                         (lambda i, j, kk, mt: (mt[0], kk, 0, j))),
        ],
        out_specs=pl.BlockSpec((bm, bn_eff), lambda i, j, kk, mt: (i, j)),
        scratch_shapes=[pltpu.VMEM(
            (bm, bn_eff), jnp.int32 if per_channel else jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_qmm_w8a8_kernel, n_groups=n_groups,
                          group_size=group_size, out_dtype=out_dtype,
                          per_channel=per_channel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k,
            bytes_accessed=(m_p * k + k * n + scales.size * 4
                            + m_p * n * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, xi, xs, q, scales4)

    if pad_m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n)


def _pin_row_major(a: jax.Array, interpret: bool) -> jax.Array:
    """Row-major layout constraint (see scales4 note in quantized_matmul)."""
    if (not interpret and jax.default_backend() == "tpu"
            and jax.device_count() == 1):
        try:
            from jax.experimental.layout import (Layout,
                                                 with_layout_constraint)
            a = with_layout_constraint(
                a, Layout(major_to_minor=tuple(range(a.ndim))))
        except ImportError:
            pass
    return a


def _quantized_matmul_int4(x, q, scales, out_dtype, interpret, bm, bn, bk,
                           layer, n_start, n_size, zs=None):
    """INT4 path of :func:`quantized_matmul` (same contract; ``q`` is
    [L, K/2, N] split-half nibble packed, scales over logical K groups).

    Grid runs over PACKED rows — K/2 steps' worth of weight DMA, i.e.
    half the int8 path's weight traffic. x rides along twice (lo/hi
    logical column windows of the same [M, K] array: two operands, two
    tiny DMAs, no host reshape/copy).

    ``zs``: per-group zero*scale [L?, K/gs, N] for asymmetric AWQ/GPTQ
    weights (see _qmm4_kernel has_zeros)."""
    if q.ndim == 2:
        q = q[None]
        scales = scales[None]
        if zs is not None:
            zs = zs[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None, "stacked weights need a layer index"
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    has_zeros = zs is not None

    orig_shape = x.shape
    _, kp, n = q.shape
    k = 2 * kp
    g_rows = scales.shape[1]
    group_size = k // g_rows
    per_channel = group_size == k
    if kp % 128 or n % 128:
        # Mosaic requires (8, 128)-tileable blocks; sub-128 packed-K or N
        # (tiny test models) can't express the split-half layout — jnp
        # reference math, still jittable/fusible.
        from simplellminference_tpu.ops import ref_ops
        li = layer[0] if hasattr(layer, "shape") else layer
        qs = jax.lax.dynamic_index_in_dim(q, li, 0, keepdims=False)
        ss = jax.lax.dynamic_index_in_dim(scales, li, 0, keepdims=False)
        zss = (None if zs is None else
               jax.lax.dynamic_index_in_dim(zs, li, 0, keepdims=False))
        out = ref_ops.quantized_matmul_int4_ref(x, qs, ss,
                                                out_dtype=out_dtype, zs=zss)
        if n_size is not None:
            start = (jnp.zeros((), jnp.int32) if n_start is None
                     else jnp.asarray(n_start, jnp.int32))
            out = jax.lax.dynamic_slice_in_dim(out, start, n_size, -1)
        return out
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    x2 = x.reshape(m, k).astype(jnp.bfloat16)

    if bm is None:
        bm = _largest_divisor(m, 256, 16) if m >= 16 else 16
    pad_m = (-m) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    m_p = m + pad_m

    # Packed K block: divisor of K/2, multiple of the (logical) group
    # size — a group never straddles the K/2 midpoint by construction of
    # the packing (ref_ops.quantize_int4_groupwise).
    assert per_channel or kp % group_size == 0, (k, group_size)
    gmult = 128 if per_channel else max(group_size, 128)
    bkp = _largest_divisor(kp, max(bk // 2, gmult), gmult)
    if kp % bkp:
        if per_channel:
            bkp = next(d for d in range(min(bk // 2, kp), 0, -1)
                       if kp % d == 0)
        else:
            bkp = _largest_divisor(kp, max(bk // 2, group_size), group_size)

    def fits(d: int) -> bool:
        vmem = (4 * bm * bkp * 2             # two x operands, double-buf
                + 2 * bkp * d                # packed q blocks (int8)
                + (8 if has_zeros else 4) * g_rows * d * 4  # scale (+zs)
                + 2 * bm * d * 2             # out blocks
                + bm * d * 4                 # accumulator
                + 2 * bkp * d * 2 * 2)       # unpacked lo/hi bf16
        return vmem <= 13 * 2 ** 20

    n_out = n_size if n_size is not None else n
    bn_eff = _best_tile(n_out, bn, 128, hard_cap=8192, fits=fits)
    if per_channel:
        n_groups = 1
        # with zeros the per-channel row must still scale inline (the
        # rank-1 correction needs scaled partials), so the kernel runs
        # the grouped path with one group spanning the whole K block
        block_gs = bkp if has_zeros else group_size
    else:
        if bkp % group_size != 0:
            bkp = group_size
        n_groups = bkp // group_size
        block_gs = group_size

    if n_start is None:
        n_off = jnp.zeros((1,), jnp.int32)
    else:
        n_off = (jnp.asarray(n_start, jnp.int32) // bn_eff).reshape(1)
    meta = jnp.concatenate([layer, n_off])

    n_k = kp // bkp
    grid = (m_p // bm, n_out // bn_eff, n_k)

    # Scales as [L, 2*n_k, n_groups, N]: row kk = step kk's lo-half
    # groups, row n_k + kk = its hi-half groups (bitcast reshape of the
    # logical [L, K/gs, N] — lo groups are exactly the first half of the
    # group rows). Passed twice with the two row windows.
    if per_channel:
        scales4 = scales.reshape(scales.shape[0], 1, 1, n)
        s_lo_idx = lambda i, j, kk, mt: (mt[0], 0, 0, mt[1] + j)
        s_hi_idx = s_lo_idx
    else:
        scales4 = scales.reshape(scales.shape[0], 2 * n_k, n_groups, n)
        s_lo_idx = lambda i, j, kk, mt: (mt[0], kk, 0, mt[1] + j)
        s_hi_idx = lambda i, j, kk, mt: (mt[0], n_k + kk, 0, mt[1] + j)
    scales4 = _pin_row_major(scales4, interpret)

    in_specs = [
        # x lo half: columns [kk*bkp, ..); hi half: K/2 + the same
        pl.BlockSpec((bm, bkp), lambda i, j, kk, mt: (i, kk)),
        pl.BlockSpec((bm, bkp), lambda i, j, kk, mt: (i, n_k + kk)),
        pl.BlockSpec((1, bkp, bn_eff),
                     lambda i, j, kk, mt: (mt[0], kk, mt[1] + j)),
        pl.BlockSpec((1, 1, n_groups, bn_eff), s_lo_idx),
        pl.BlockSpec((1, 1, n_groups, bn_eff), s_hi_idx),
    ]
    operands = [meta, x2, x2, q, scales4, scales4]
    if has_zeros:
        zs4 = zs.astype(jnp.float32).reshape(scales4.shape)
        zs4 = _pin_row_major(zs4, interpret)
        in_specs += [pl.BlockSpec((1, 1, n_groups, bn_eff), s_lo_idx),
                     pl.BlockSpec((1, 1, n_groups, bn_eff), s_hi_idx)]
        operands += [zs4, zs4]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn_eff), lambda i, j, kk, mt: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn_eff), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, n_groups=n_groups,
                          group_size=block_gs, out_dtype=out_dtype,
                          per_channel=per_channel, has_zeros=has_zeros),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, n_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_out * k,
            bytes_accessed=(m_p * k * 2 + kp * n_out
                            + scales.size * (8 if has_zeros else 4)
                            + m_p * n_out * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    if pad_m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n_out)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "bm", "bn", "bk", "n_size",
                                             "bits"))
def quantized_matmul(x: jax.Array, q: jax.Array, scales: jax.Array,
                     out_dtype=jnp.bfloat16, interpret: bool = False,
                     bm: int | None = None, bn: int = 4096,
                     bk: int = 512, layer: jax.Array | None = None,
                     n_start: jax.Array | None = None,
                     n_size: int | None = None, bits: int = 8,
                     zs: jax.Array | None = None) -> jax.Array:
    """y = x @ dequant(q, scales)  (optionally of stacked layer ``layer``).

    x: [..., K] (any float dtype; computed in bf16 on the MXU).
    q: [K, N] int8 or [L, K, N] with ``layer`` given;
    scales: [K // group_size, N] (or [L, K // group_size, N]).

    ``n_start``/``n_size``: compute only output columns
    [n_start, n_start + n_size) — n_start is a traced scalar consumed by
    the BlockSpec index maps (must be a multiple of the N tile; n_size
    static). This is the ring collective-matmul building block: each ring
    step computes one output chunk while the previous chunk's partial sum
    rides the ICI (parallel/collective.py).

    ``bits=4``: q is [K/2, N] split-half nibble packed (two int4 values
    per byte — ref_ops.quantize_int4_groupwise); the kernel unpacks in
    VMEM, so weight HBM traffic halves again vs int8. ``zs`` (bits=4
    only): per-group zero*scale for asymmetric AWQ/GPTQ weights.
    """
    if bits == 4:
        return _quantized_matmul_int4(x, q, scales, out_dtype, interpret,
                                      bm, bn, bk, layer, n_start, n_size,
                                      zs=zs)
    assert zs is None, "zero points only supported on the int4 path"
    if q.ndim == 2:
        q = q[None]
        scales = scales[None]
        layer = jnp.zeros((), jnp.int32)
    assert layer is not None, "stacked weights need a layer index"
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    orig_shape = x.shape
    _, k, n = q.shape
    group_size = k // scales.shape[1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    x2 = x.reshape(m, k).astype(jnp.bfloat16)

    # Tile sizes: respect int8 (32,128) / bf16 (16,128) min tiles.
    if bm is None:
        bm = _largest_divisor(m, 256, 16) if m >= 16 else 16
    pad_m = (-m) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    m_p = m + pad_m

    # N tile: nearest divisor to the target in log space, vetoing tiles
    # whose double-buffered blocks + fp32 accumulator bust the ~16 MB VMEM
    # (the decode path bm=16 affords bn≈5504; prefill bm=256 does not).
    # Per-channel scales span all of K, so they put no floor on the K
    # block — split K at the normal 512 target (the raw f32 accumulator
    # carries across K steps; the scale applies once at write-out).
    # Without this the K block clamps to the whole K and e.g. the 7B wo
    # runs as 4x4 MB single-K-step blocks with a double-size DMA ramp.
    gmult = 128 if group_size == k else max(group_size, 128)
    bk_eff = _largest_divisor(k, bk, gmult)

    def fits(d: int) -> bool:
        vmem = (2 * bm * bk_eff * 2          # x blocks (bf16)
                + 2 * bk_eff * d             # q blocks (int8)
                + 2 * scales.shape[1] * d * 4  # scales blocks
                + 2 * bm * d * 2             # out blocks (bf16)
                + bm * d * 4)                # accumulator
        return vmem <= 13 * 2 ** 20

    n_out = n_size if n_size is not None else n
    bn_eff = _best_tile(n_out, bn, 128, hard_cap=8192, fits=fits)
    per_channel = group_size == k  # one scale row per output column
    if per_channel:
        n_groups = 1
    else:
        if bk_eff % group_size != 0:
            bk_eff = group_size  # group must tile the K block
        n_groups = bk_eff // group_size

    if n_start is None:
        n_off = jnp.zeros((1,), jnp.int32)
    else:
        # runtime contract: n_start % bn_eff == 0 (ring chunk sizes are
        # chosen as multiples of the tile by the caller)
        n_off = (jnp.asarray(n_start, jnp.int32) // bn_eff).reshape(1)
    meta = jnp.concatenate([layer, n_off])

    grid = (m_p // bm, n_out // bn_eff, k // bk_eff)

    # Scales as [L, K/bk, n_groups, N]: one block per K grid step. Pin the
    # reshape result to row-major — otherwise XLA's layout assignment can
    # give it a permuted layout and then insert a full relocation copy
    # (~22 MB per layer-step for 7B w_down) to satisfy the custom call's
    # row-major operand constraint.
    n_kslabs = 1 if per_channel else k // bk_eff
    scales4 = scales.reshape(scales.shape[0], n_kslabs, n_groups, n)
    scales4 = _pin_row_major(scales4, interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk_eff), lambda i, j, kk, mt: (i, kk)),
            pl.BlockSpec((1, bk_eff, bn_eff),
                         lambda i, j, kk, mt: (mt[0], kk, mt[1] + j)),
            pl.BlockSpec((1, 1, n_groups, bn_eff),
                         (lambda i, j, kk, mt: (mt[0], 0, 0, mt[1] + j))
                         if per_channel else
                         (lambda i, j, kk, mt: (mt[0], kk, 0, mt[1] + j))),
        ],
        out_specs=pl.BlockSpec((bm, bn_eff), lambda i, j, kk, mt: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn_eff), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_groups=n_groups,
                          group_size=group_size, out_dtype=out_dtype,
                          per_channel=per_channel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, n_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_out * k,
            bytes_accessed=(m_p * k * 2 + k * n_out + scales.size * 4
                            + m_p * n_out * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, x2, q, scales4)

    if pad_m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n_out)
