"""Distributed layer: device meshes, shardings, and collectives.

The reference has NO distributed backend at all (SURVEY.md §2.9 — the only
cross-device transport is a blocking cudaMemcpy). Here parallelism is
mesh-native from the start: a ``jax.sharding.Mesh`` with named axes, per-
parameter ``PartitionSpec``s, and XLA collectives over ICI/DCN inserted by
GSPMD (with Pallas collective-matmul overlap as the escalation path).
"""

from simplellminference_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    build_mesh,
)
from simplellminference_tpu.parallel.sharding import (  # noqa: F401
    param_specs,
    shard_params,
)
