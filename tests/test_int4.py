"""INT4 weight quantization: pack/unpack, ref matmul, Pallas kernel
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU),
and the linear()/QuantizedWeight dispatch.

Extends the BASELINE north-star INT8 scheme (SURVEY.md §7.1) one tier
down: two nibbles per byte (split-half packed along K), so the decode
weight stream halves again.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # int4 kernel sweeps

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.ops.linear import QuantizedWeight, linear
from simplellminference_tpu.ops.matmul import quantized_matmul


def test_pack_unpack_roundtrip(rng):
    k, n = 64, 32
    vals = rng.integers(-7, 8, (k, n)).astype(np.int8)
    lo, hi = vals[: k // 2], vals[k // 2:]
    packed = jnp.asarray((lo & 0xF) | (hi << 4), jnp.int8)
    out = np.asarray(ref_ops.unpack_int4(packed))
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("gs", [32, 64, 128])
def test_quantize_int4_roundtrip_error(rng, gs):
    k, n = 256, 96
    w = rng.standard_normal((k, n)).astype(np.float32)
    packed, scales = ref_ops.quantize_int4_groupwise(jnp.asarray(w), gs)
    assert packed.shape == (k // 2, n)
    assert scales.shape == (k // gs, n)
    deq = np.asarray(ref_ops.dequantize_int4_groupwise(packed, scales))
    # worst-case quantization error is half a step = absmax/14 per group
    step = np.abs(w).reshape(k // gs, gs, n).max(axis=1) / 7.0
    bound = np.repeat(step, gs, axis=0)            # [k, n]
    assert np.all(np.abs(deq - w) <= 0.5001 * bound)


def test_quantize_int4_stacked_layers(rng):
    w = rng.standard_normal((3, 128, 64)).astype(np.float32)
    packed, scales = ref_ops.quantize_int4_groupwise(jnp.asarray(w), 32)
    assert packed.shape == (3, 64, 64)
    for li in range(3):
        p1, s1 = ref_ops.quantize_int4_groupwise(jnp.asarray(w[li]), 32)
        np.testing.assert_array_equal(np.asarray(packed[li]), np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(scales[li]), np.asarray(s1))


@pytest.mark.parametrize("m,k,n,gs", [
    (1, 256, 384, 128),      # decode GEMV shape
    (8, 512, 256, 128),      # small batch decode
    (24, 256, 128, 64),      # m not a multiple of 16 -> padding path
    (64, 384, 512, 64),      # prefill-ish, odd K/2 blocking
    (128, 512, 256, 256),    # group == packed block
    (8, 512, 256, 512),      # per-output-channel (group == K)
    (16, 1024, 384, 1024),   # per-channel spanning multiple K blocks
])
def test_int4_kernel_matches_ref(rng, m, k, n, gs):
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    packed, s = ref_ops.quantize_int4_groupwise(w, gs)
    got = quantized_matmul(x, packed, s, out_dtype=jnp.float32,
                           interpret=True, bits=4)
    want = ref_ops.quantized_matmul_int4_ref(x, packed, s,
                                             out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_int4_kernel_stacked_layer_index(rng):
    L, m, k, n, gs = 3, 8, 256, 128, 64
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((L, k, n)), jnp.float32)
    packed, s = ref_ops.quantize_int4_groupwise(w, gs)
    for li in range(L):
        got = quantized_matmul(x, packed, s, out_dtype=jnp.float32,
                               interpret=True, bits=4,
                               layer=jnp.asarray(li, jnp.int32))
        want = ref_ops.quantized_matmul_int4_ref(x, packed[li], s[li],
                                                 out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_quantized_weight_bits4_linear(rng):
    k, n = 256, 128
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qw = QuantizedWeight.quantize(w, group_size=64, bits=4)
    assert qw.bits == 4 and qw.shape == (k, n) and qw.group_size == 64
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.bfloat16)
    got = linear(x, qw, out_dtype=jnp.float32)   # CPU -> ref path
    want = jnp.dot(x.astype(jnp.float32), qw.dequantize(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-1)


def test_quantized_weight_bits_static_under_jit(rng):
    """bits is tree metadata: jit must retrace (not crash) across bits."""
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    q8 = QuantizedWeight.quantize(w, group_size=64, bits=8)
    q4 = QuantizedWeight.quantize(w, group_size=64, bits=4)
    x = jnp.asarray(rng.standard_normal((2, 128)), jnp.bfloat16)

    @jax.jit
    def f(x, qw):
        return linear(x, qw, out_dtype=jnp.float32)

    r8, r4 = f(x, q8), f(x, q4)
    for r, qw in ((r8, q8), (r4, q4)):
        want = jnp.dot(x.astype(jnp.float32),
                       qw.dequantize(jnp.float32).astype(jnp.bfloat16
                                                         ).astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(r), np.asarray(want),
                                   rtol=3e-2, atol=1e-1)


# ---------------------------------------------------------------------------
# End-to-end: int4 model quality, engine decode, checkpoint roundtrip
# ---------------------------------------------------------------------------

def _tiny():
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama
    cfg = ModelConfig.tiny_test()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_int4_ppl_delta(rng):
    """quantize_params(mode=int4) keeps PPL near fp32 on a tiny model —
    the BASELINE config-#2 gate logic one tier down (looser budget:
    int4 carries real quantization error)."""
    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.evaluate import perplexity
    from simplellminference_tpu.runtime.weights import quantize_params
    cfg, params = _tiny()
    ids = rng.integers(1, 256, 96).tolist()
    p_fp = perplexity(cfg, params, ids, window=48)
    qp = quantize_params(params, QuantConfig(mode="int4", group_size=32))
    assert qp["layers"]["wqkv"].bits == 4
    p_q = perplexity(cfg, qp, ids, window=48)
    assert abs(p_q - p_fp) / p_fp < 0.15


def test_int4_engine_matches_dense_generator(rng):
    """Paged continuous-batching engine over int4 weights produces the
    same greedy tokens as the dense-cache Generator over the SAME int4
    params (kernel-path consistency, not quantization quality)."""
    from simplellminference_tpu.core.config import (EngineConfig,
                                                    KVCacheConfig,
                                                    QuantConfig,
                                                    SamplingParams)
    from simplellminference_tpu.engine.engine import Engine
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.runtime.weights import quantize_params
    cfg, params = _tiny()
    qp = quantize_params(params, QuantConfig(mode="int4", group_size=32))
    prompts = [rng.integers(1, 256, n).tolist() for n in (5, 9, 3)]

    gen = Generator(cfg, qp, max_batch=3, max_seq=64, kv_dtype=jnp.float32)
    want = gen.generate(prompts, SamplingParams(max_new_tokens=8)).token_ids

    ecfg = EngineConfig(max_batch_size=4,
                        kv=KVCacheConfig(page_size=8, num_pages=64,
                                         max_pages_per_seq=16,
                                         kv_dtype="f32"))
    eng = Engine(cfg, qp, ecfg, decode_burst=4)
    got = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    assert got == want


def test_int4_checkpoint_roundtrip(rng, tmp_path):
    from simplellminference_tpu.core.config import QuantConfig, SamplingParams
    from simplellminference_tpu.runtime.checkpoint import (load_checkpoint,
                                                           save_checkpoint)
    from simplellminference_tpu.runtime.generator import Generator
    from simplellminference_tpu.runtime.weights import quantize_params
    cfg, params = _tiny()
    qp = quantize_params(params, QuantConfig(mode="int4", group_size=32,
                                             quantize_lm_head=True))
    path = str(tmp_path / "ckpt4")
    save_checkpoint(path, cfg, qp, metadata={"quant": "int4"})
    cfg2, qp2 = load_checkpoint(path)
    assert qp2["layers"]["wqkv"].bits == 4
    assert qp2["lm_head"].bits == 4
    g1 = Generator(cfg, qp, max_seq=64, kv_dtype=jnp.float32)
    g2 = Generator(cfg2, qp2, max_seq=64, kv_dtype=jnp.float32)
    sp = SamplingParams(max_new_tokens=8)
    assert (g1.generate([[1, 2, 3]], sp).token_ids
            == g2.generate([[1, 2, 3]], sp).token_ids)


def test_int4_tp_row_shard_rejected():
    """spec_tree refuses K/row-sharded int4 (split-half packing would
    silently mis-pair x columns with nibbles)."""
    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.parallel.sharding import spec_tree
    from simplellminference_tpu.runtime.weights import quantize_params
    cfg, params = _tiny()
    qp = quantize_params(params, QuantConfig(mode="int4", group_size=32))
    with pytest.raises(ValueError, match="int4"):
        spec_tree(cfg, qp)
