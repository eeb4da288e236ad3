"""Multi-host (DCN) federated FedAvg over ``jax.distributed`` process groups.

The reference's "truly distributed" federated mode is a server process and
client processes exchanging weights over gRPC (nerve_cl/federated/
server.py:113-138, client.py:27-134). The TPU-native analogue (SURVEY
§2c:180-184) is a multi-controller SPMD program: each HOST process joins a
``jax.distributed`` process group, contributes its local cohort of clients
(its shard of the global client axis), and one federated round is the same
single jitted ``shard_map``-psum program as the single-host mesh simulation
(``nerve_tpu.federated.simulation``) — the FedAvg reduce now rides DCN
across process boundaries instead of gRPC, with no parameter-server hop.

No TPU pod is available in this environment, so the path is exercised by a
2-process CPU dryrun (``scripts/dryrun_dcn.py``, run by
``tests/test_dcn.py``): each process exposes N virtual CPU devices and the
round executes against the 2N-device global mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerve_tpu.federated.privacy import PrivacyConfig
from nerve_tpu.federated.simulation import build_fedavg_round
from nerve_tpu.parallel import make_mesh

Params = Any


def initialize_process(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """Join the distributed process group (idempotent per process).

    Call BEFORE any other JAX API touches the backend. On a TPU pod each
    host calls this with its slice-assigned process_id; the CPU dryrun
    passes an explicit localhost coordinator.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_client_mesh() -> Mesh:
    """Client-axis mesh over ALL global devices (every process's devices)."""
    return make_mesh(data=1, client=jax.device_count())


def shard_local_clients(
    mesh: Mesh,
    local_data: Any,
    local_weights: Optional[np.ndarray] = None,
    axis: str = "client",
) -> Tuple[Any, jnp.ndarray]:
    """Assemble this process's client cohort into global sharded arrays.

    ``local_data``: pytree whose leaves have leading axis = this process's
    client count (must equal clients_per_device × local_device_count so the
    global client axis is evenly laid out). Returns (client_data, weights)
    as GLOBAL arrays sharded ``P(axis)`` over the mesh — each process only
    materialises its own shard, the multi-host contract of
    ``jax.make_array_from_process_local_data``.
    """
    sharding = NamedSharding(mesh, P(axis))
    client_data = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_data,
    )
    n_local = len(jax.tree_util.tree_leaves(local_data)[0])
    w = np.asarray(
        local_weights if local_weights is not None else np.ones(n_local),
        np.float32,
    )
    weights = jax.make_array_from_process_local_data(sharding, w)
    return client_data, weights


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Host-local pytree → fully-replicated global arrays on the mesh.

    Every process must pass identical values (e.g. the same seeded init) —
    the standard multi-controller replication contract.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


class DcnFederatedRound:
    """One-round runner for the multi-host federated mode.

    Wraps ``build_fedavg_round`` (the exact same round program as the
    single-host simulation — behavioural parity is by construction) with
    the global-array plumbing each process needs.
    """

    def __init__(
        self,
        loss_fn: Callable[[Params, Any], jnp.ndarray],
        mesh: Optional[Mesh] = None,
        local_steps: int = 5,
        local_lr: float = 1e-3,
        privacy: Optional[PrivacyConfig] = None,
        axis: str = "client",
    ):
        self.mesh = mesh or global_client_mesh()
        self.axis = axis
        self._round = build_fedavg_round(
            loss_fn, self.mesh, local_steps, local_lr, privacy, axis
        )

    def run(self, params, client_data, weights, key) -> Tuple[Params, dict]:
        """params/key: replicated globals (see :func:`replicate`);
        client_data/weights: from :func:`shard_local_clients`."""
        new_params, metrics = self._round(params, client_data, weights, key)
        return new_params, {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }
