"""Worker for the multi-process multi-host test (SURVEY.md §4.4).

Launched as a subprocess (2 processes x 4 virtual CPU devices each) by
tests/test_multihost.py:

    python tests/multihost_worker.py <coordinator> <nprocs> <pid>

Joins the distributed runtime via multihost.initialize, builds the
(data, model) pod mesh, runs ONE shard_map TP forward of a tiny Llama on
a fixed batch, and prints the greedy tokens — the parent asserts both
processes print identical tokens, equal to a single-process run.
"""

import os
import sys

nproc = int(sys.argv[2])
if nproc > 1:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from simplellminference_tpu.core.config import ModelConfig  # noqa: E402
from simplellminference_tpu.models import llama, llama_tp  # noqa: E402
from simplellminference_tpu.parallel import (multihost,  # noqa: E402
                                             sharding)


def main():
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    if nprocs > 1:
        multihost.initialize(coordinator_address=coordinator,
                             num_processes=nprocs, process_id=pid)
    info = multihost.host_info()
    mesh = multihost.pod_mesh(tp=4)

    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=8, num_kv_heads=4, head_dim=8,
                      max_seq_len=64, dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tp_params, fwd = llama_tp.make_tp_forward(cfg, mesh, params)
    tp_params = sharding.shard_params(cfg, tp_params, mesh)

    tokens = np.tile(np.arange(1, 9, dtype=np.int32)[None], (2, 1))
    positions = np.tile(np.arange(8, dtype=np.int32)[None], (2, 1))
    logits, _ = fwd(tp_params, jnp.asarray(tokens),
                    jnp.asarray(positions), None)

    # replicate the argmax so every process can read the full result
    tok = jax.jit(
        lambda l: jnp.argmax(l[:, -1], -1).astype(jnp.int32),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))(logits)
    tok = np.asarray(jax.device_get(tok))
    print(f"MHOST pid={info.process_id}/{info.process_count} "
          f"devices={info.global_devices} tokens={tok.tolist()}",
          flush=True)


if __name__ == "__main__":
    main()
