"""Ring collective-matmul kernels vs psum baseline on the 8-device mesh.

The overlap decompositions (SURVEY.md §2.9 / BASELINE north star: all-
reduce overlapped with the next matmul) must be numerically identical to
the monolithic psum GSPMD emits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ring collective matmul compiles
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from simplellminference_tpu.parallel import collective
from simplellminference_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                                  MeshConfig, build_mesh)


@pytest.fixture(scope="module")
def mesh():
    return build_mesh(MeshConfig(data=1, model=8))


def _mats(rng, m=4, k=64, n=128):
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, n)) / np.sqrt(k), jnp.float32)
    return x, w


def test_matmul_allreduce_ring_matches_psum(mesh, rng):
    x, w = _mats(rng)
    want = np.asarray(x @ w)

    def run(fn):
        f = shard_map(
            lambda xs, ws: fn(xs, ws, MODEL_AXIS), mesh=mesh,
            in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None)),
            out_specs=P(None, None), check_vma=False)
        return np.asarray(jax.jit(f)(x, w))

    got_ring = run(collective.matmul_allreduce_ring)
    got_psum = run(collective.psum_baseline)
    np.testing.assert_allclose(got_psum, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_ring, want, rtol=1e-5, atol=1e-5)


def test_matmul_reduce_scatter_chunks(mesh, rng):
    x, w = _mats(rng)
    want = np.asarray(x @ w)

    f = shard_map(
        lambda xs, ws: collective.matmul_reduce_scatter(xs, ws, MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None)),
        out_specs=P(None, MODEL_AXIS), check_vma=False)
    got = np.asarray(jax.jit(f)(x, w))  # device d owns output chunk d
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_allgather_matmul(mesh, rng):
    # x sequence-sharded [S/tp, K]; w column-sharded [K, N/tp]
    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 128)) / 8.0, jnp.float32)
    want = np.asarray(x @ w)

    f = shard_map(
        lambda xs, ws: collective.allgather_matmul(xs, ws, MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
        out_specs=P(None, MODEL_AXIS), check_vma=False)
    got = np.asarray(jax.jit(f)(x, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tp1_degenerate(rng):
    x, w = _mats(rng)
    mesh1 = build_mesh(MeshConfig(data=1, model=1),
                       devices=jax.devices()[:1])
    f = shard_map(
        lambda xs, ws: collective.matmul_allreduce_ring(xs, ws, MODEL_AXIS),
        mesh=mesh1, in_specs=(P(None, None), P(None, None)),
        out_specs=P(None, None), check_vma=False)
    got = np.asarray(jax.jit(f)(x, w))
    np.testing.assert_allclose(got, np.asarray(x @ w), rtol=1e-5, atol=1e-5)
