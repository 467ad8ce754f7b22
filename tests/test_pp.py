"""Pipeline-parallel forward (models/llama_pp.py) vs the single-device
reference, on the 8-device virtual CPU mesh.

Checks the GPipe schedule end to end: microbatch pipelining, bubble-tick
trash-layer KV redirection (no corruption of real cache state), PP x TP
composition, and multi-step prefill -> decode agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # pipeline-parallel GPipe compiles

from simplellminference_tpu.core.config import ModelConfig
from simplellminference_tpu.models import llama, llama_pp
from simplellminference_tpu.runtime.kv_cache import DenseKVCache


def _cfg(num_layers=4):
    return ModelConfig.tiny_test(num_heads=8, num_kv_heads=4, head_dim=32,
                                 hidden_size=256, intermediate_size=512,
                                 vocab_size=256, num_layers=num_layers,
                                 dtype="float32")


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (4, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (4, 8))
    return cfg, params, tokens, positions


@pytest.mark.parametrize("pp,tp,m", [(2, 1, 2), (4, 1, 4), (4, 2, 2),
                                     (2, 4, 4), (4, 1, 1)])
def test_pp_no_cache_matches(setup, pp, tp, m):
    cfg, params, tokens, positions = setup
    ref, _ = llama.forward(cfg, params, tokens, positions)
    mesh = llama_pp.pp_mesh(pp, tp)
    pp_params, fwd, _ = llama_pp.make_pp_forward(cfg, mesh, params,
                                                 microbatches=m)
    pp_params = llama_pp.shard_pp_params(cfg, pp_params, mesh)
    got = fwd(pp_params, tokens, positions)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pp,tp,m", [(4, 1, 2), (2, 2, 4)])
def test_pp_prefill_then_decode_matches(setup, pp, tp, m):
    """Prefill writes the (trash-layer-guarded) cache; two subsequent
    decode steps must match the dense single-device reference — any
    bubble-tick corruption of real KV state would diverge here."""
    cfg, params, tokens, positions = setup
    b = tokens.shape[0]
    mesh = llama_pp.pp_mesh(pp, tp)
    pp_params, fwd, alloc = llama_pp.make_pp_forward(cfg, mesh, params,
                                                     microbatches=m)
    pp_params = llama_pp.shard_pp_params(cfg, pp_params, mesh)

    refc = DenseKVCache.create(cfg.num_layers, b, 64, cfg.num_kv_heads,
                               cfg.head_dim, jnp.float32)
    ppc = alloc(b, 64, jnp.float32)

    offs = jnp.zeros((b,), jnp.int32)
    lens = jnp.full((b,), 8, jnp.int32)
    ref, refc = llama.forward(cfg, params, tokens, positions, refc, offs,
                              lens)
    got, ppc = fwd(pp_params, tokens, positions, ppc, offs, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    pos = 8
    for _ in range(2):
        tok = jnp.argmax(ref[:, -1], -1).astype(jnp.int32)[:, None]
        p = jnp.full((b, 1), pos, jnp.int32)
        o = jnp.full((b,), pos, jnp.int32)
        ln = jnp.full((b,), pos + 1, jnp.int32)
        ref, refc = llama.forward(cfg, params, tok, p, refc, o, ln,
                                  prefill_from_zero=False)
        got, ppc = fwd(pp_params, tok, p, ppc, o, ln,
                       prefill_from_zero=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        pos += 1


def test_pp_last_token_only(setup):
    cfg, params, tokens, positions = setup
    b = tokens.shape[0]
    mesh = llama_pp.pp_mesh(4, 2)
    pp_params, fwd, alloc = llama_pp.make_pp_forward(cfg, mesh, params,
                                                     microbatches=2)
    pp_params = llama_pp.shard_pp_params(cfg, pp_params, mesh)
    ppc = alloc(b, 64, jnp.float32)
    offs = jnp.zeros((b,), jnp.int32)
    lens = jnp.full((b,), 8, jnp.int32)
    full, _ = fwd(pp_params, tokens, positions, alloc(b, 64, jnp.float32),
                  offs, lens)
    last, _ = fwd(pp_params, tokens, positions, ppc, offs, lens,
                  last_token_only=True)
    assert last.shape == (b, 1, cfg.vocab_size)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(full[:, -1]), rtol=1e-5,
                               atol=1e-5)


def test_pp_tied_embeddings_and_quant():
    """Tied LM head (vocab-parallel logits from the embedding) + INT8
    weights through the PP schedule."""
    from simplellminference_tpu.core.config import QuantConfig
    from simplellminference_tpu.runtime.weights import quantize_params

    cfg = _cfg()
    cfg = ModelConfig.tiny_test(num_heads=8, num_kv_heads=4, head_dim=32,
                                hidden_size=256, intermediate_size=512,
                                vocab_size=256, num_layers=4,
                                dtype="float32", tie_word_embeddings=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    qparams = quantize_params(params, QuantConfig(mode="int8",
                                                  group_size=64))
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (2, 4)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (2, 4))
    ref, _ = llama.forward(cfg, qparams, tokens, positions)
    mesh = llama_pp.pp_mesh(2, 2)
    pp_params, fwd, _ = llama_pp.make_pp_forward(cfg, mesh, qparams,
                                                 microbatches=2)
    pp_params = llama_pp.shard_pp_params(cfg, pp_params, mesh)
    got = fwd(pp_params, tokens, positions)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pp_rejects_bad_layer_split():
    cfg = _cfg(num_layers=3)
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    mesh = llama_pp.pp_mesh(2, 1)
    with pytest.raises(AssertionError):
        llama_pp.make_pp_forward(cfg, mesh, params)
