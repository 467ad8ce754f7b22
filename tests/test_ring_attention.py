"""Ring attention (sequence parallelism) vs dense causal reference on the
8-device virtual CPU mesh (SURVEY §2.8 ring/CP row, §4.4 methodology)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from simplellminference_tpu.ops import ref_ops
from simplellminference_tpu.parallel.ring_attention import ring_attention


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
@pytest.mark.parametrize("ring,b,s,n,kvn,d", [
    (4, 2, 64, 4, 4, 16),     # MHA
    (4, 1, 32, 8, 2, 32),     # GQA
    (8, 1, 64, 4, 1, 16),     # MQA, full 8-ring
])
def test_ring_attention_matches_dense_causal(ring, b, s, n, kvn, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)

    mask = np.asarray(ref_ops.causal_mask(s, s))[None, None]
    want = ref_ops.attention(q, k, v, jnp.asarray(mask))

    mesh = _mesh(ring)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_ring_attention_non_causal(ring=4):
    rng = np.random.default_rng(1)
    b, s, n, kvn, d = 1, 32, 2, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvn, d)), jnp.float32)
    ones = jnp.ones((1, 1, s, s), bool)
    want = ref_ops.attention(q, k, v, ones)
    mesh = _mesh(ring)
    f = shard_map(
        lambda q_, k_, v_: ring_attention(q_, k_, v_, "seq",
                                          causal=False),
        mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"), check_vma=False)
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4+ devices")
def test_sp_prefill_forward_matches_dense():
    """Full sequence-parallel model prefill (ring attention per layer,
    weights replicated, activations sequence-sharded) reproduces the
    single-device dense forward's logits."""
    from simplellminference_tpu.core.config import ModelConfig
    from simplellminference_tpu.models import llama, llama_sp

    cfg = ModelConfig.tiny_test(max_seq_len=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 64)),
                         jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None],
                                 (2, 64))
    want, _ = llama.forward(cfg, params, tokens, positions)

    mesh = llama_sp.seq_mesh(4)
    fwd = llama_sp.make_sp_prefill(cfg, mesh)
    got = fwd(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
