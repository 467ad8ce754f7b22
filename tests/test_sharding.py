"""TP/DP sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # GSPMD sharding compiles

from simplellminference_tpu.core.config import ModelConfig, QuantConfig
from simplellminference_tpu.models import llama
from simplellminference_tpu.parallel import mesh as mesh_lib
from simplellminference_tpu.parallel import sharding
from simplellminference_tpu.runtime.kv_cache import DenseKVCache
from simplellminference_tpu.runtime.weights import quantize_params


@pytest.fixture(scope="module")
def cfg_params():
    cfg = ModelConfig.tiny_test(num_kv_heads=4, num_heads=4, head_dim=32,
                                hidden_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _forward_logits(cfg, params, cache=None):
    tokens = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (2, 4))
    if cache is None:
        logits, _ = llama.forward(cfg, params, tokens, pos)
    else:
        logits, _ = llama.forward(cfg, params, tokens, pos, cache,
                                  offsets=jnp.zeros(2, jnp.int32),
                                  kv_lens=jnp.full((2,), 4, jnp.int32))
    return np.asarray(logits)


def test_mesh_auto_shapes():
    assert mesh_lib.MeshConfig.auto(8) == mesh_lib.MeshConfig(1, 8)
    assert mesh_lib.MeshConfig.auto(16) == mesh_lib.MeshConfig(2, 8)
    assert mesh_lib.MeshConfig.auto(1) == mesh_lib.MeshConfig(1, 1)
    m = mesh_lib.build_mesh(mesh_lib.MeshConfig(2, 4))
    assert m.shape == {"data": 2, "model": 4}


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_sharded_forward_matches_single_device(cfg_params, tp):
    cfg, params = cfg_params
    want = _forward_logits(cfg, params)

    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=1, model=tp),
                               devices=jax.devices()[:tp])
    sharded = sharding.shard_params(cfg, params, mesh)
    got = _forward_logits(cfg, sharded)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dp_tp_sharded_cache_decode(cfg_params):
    cfg, params = cfg_params
    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=2, model=4))
    sharded = sharding.shard_params(cfg, params, mesh)
    cache = DenseKVCache.create(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                                cfg.head_dim, jnp.float32)
    cache = sharding.shard_kv_cache(cache, mesh, cfg.num_kv_heads)
    got = _forward_logits(cfg, sharded, cache)
    want = _forward_logits(
        cfg, params,
        DenseKVCache.create(cfg.num_layers, 2, 16, cfg.num_kv_heads,
                            cfg.head_dim, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_quantized_forward(cfg_params):
    cfg, params = cfg_params
    qparams = quantize_params(params, QuantConfig(mode="int8", group_size=32))
    want = _forward_logits(cfg, qparams)
    mesh = mesh_lib.build_mesh(mesh_lib.MeshConfig(data=1, model=4),
                               devices=jax.devices()[:4])
    sharded = sharding.shard_params(cfg, qparams, mesh)
    got = _forward_logits(cfg, sharded)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
