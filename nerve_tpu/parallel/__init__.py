"""Device-mesh construction, sharding rules, and collectives.

The reference is single-device (train_baseline.py:37 picks cuda/mps/cpu); its
only multi-participant axis is the federated client↔server star over Flower
gRPC. Here parallelism is first-class: an explicit `jax.sharding.Mesh` with
axes ('data', 'client', 'model') — data parallelism for all training loops,
a client axis for federated simulation (FedAvg = weighted psum over ICI), and
a model/spatial axis for height-sharded (halo-exchange) frame inference at
1080p+ (`nerve_tpu.parallel.spatial`).
"""

from nerve_tpu.parallel.mesh import (  # noqa: F401
    best_data_mesh,
    batch_sharding,
    local_device_count,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from nerve_tpu.parallel.spatial import (  # noqa: F401
    spatial_sharding,
    spatial_sr_apply,
)
