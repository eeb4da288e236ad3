"""Mesh-parallel federated simulation: FedAvg as a psum over ICI.

This is the TPU-native replacement for the reference's federated simulation
(the Flower gRPC star + the non-functional ``FederatedTrainer`` stub,
nerve_cl/federated/server.py:141-193). The client population is laid out on
the ('client',) mesh axis:

  * every device shard holds a cohort of simulated clients (leading client
    axis of the stacked datasets);
  * one ROUND is ONE jitted ``shard_map`` program: each shard vmaps local
    SGD over its clients, then the sample-count-weighted FedAvg reduce is a
    ``lax.psum`` over the client axis — riding ICI instead of gRPC;
  * optional DP: each client's model delta is norm-clipped before the
    reduce, and calibrated Gaussian noise is added to the aggregate
    (DP-FedAvg), all inside the same program.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerve_tpu.federated.privacy import PrivacyConfig
from nerve_tpu.parallel import make_mesh

Params = Any


def _local_sgd(loss_fn, params, data, steps: int, lr: float) -> Params:
    """Client-local adaptation: ``steps`` full-batch SGD steps."""

    def step(p, _):
        g = jax.grad(loss_fn)(p, data)
        return jax.tree_util.tree_map(lambda pi, gi: pi - lr * gi, p, g), None

    params, _ = jax.lax.scan(step, params, None, length=steps)
    return params


def build_fedavg_round(
    loss_fn: Callable[[Params, Any], jnp.ndarray],
    mesh: Mesh,
    local_steps: int = 5,
    local_lr: float = 1e-3,
    privacy: Optional[PrivacyConfig] = None,
    axis: str = "client",
):
    """Compile one federated round as a single SPMD program.

    Args:
        loss_fn: (params, client_batch) → scalar; client_batch is one client's
            local dataset pytree.
        mesh: mesh containing the ``client`` axis.
        privacy: if set, client deltas are clipped to ``max_grad_norm`` and
            the aggregate gets N(0, σ·C/num_clients) noise (DP-FedAvg).

    Returns:
        round_fn(params, client_data, weights, rng_key) → (new_params, metrics)
        where client_data has a leading total-client axis sharded over
        ``client`` and weights is (num_clients,) sample counts.
    """

    def shard_body(params, client_data, weights, key):
        # client_data/weights: the local shard (clients_per_shard, ...).
        def one_client(data):
            adapted = _local_sgd(loss_fn, params, data, local_steps, local_lr)
            delta = jax.tree_util.tree_map(lambda a, p: a - p, adapted, params)
            return delta

        deltas = jax.vmap(one_client)(client_data)

        if privacy is not None:
            cmax = privacy.max_grad_norm

            def clip(delta_tree):
                leaves = jax.tree_util.tree_leaves(delta_tree)
                norm = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
                scale = jnp.minimum(1.0, cmax / jnp.maximum(norm, 1e-12))
                return jax.tree_util.tree_map(lambda l: l * scale, delta_tree)

            deltas = jax.vmap(clip)(deltas)

        w = weights.astype(jnp.float32)
        weighted = jax.tree_util.tree_map(
            lambda d: jnp.tensordot(w, d, axes=(0, 0)), deltas
        )
        # FedAvg reduce over ICI.
        total_w = jax.lax.psum(jnp.sum(w), axis)
        agg = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis) / total_w, weighted
        )

        if privacy is not None:
            # Same key on every shard → identical (replicated) noise.
            std = privacy.noise_multiplier * privacy.max_grad_norm / total_w
            leaves, treedef = jax.tree_util.tree_flatten(agg)
            keys = jax.random.split(key, len(leaves))
            leaves = [
                l + std * jax.random.normal(k, l.shape, l.dtype)
                for l, k in zip(leaves, keys)
            ]
            agg = jax.tree_util.tree_unflatten(treedef, leaves)

        new_params = jax.tree_util.tree_map(jnp.add, params, agg)
        update_norm = jnp.sqrt(
            sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree_util.tree_leaves(agg)
            )
        )
        return new_params, {"update_norm": update_norm, "total_weight": total_w}

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


class MeshFederatedSimulation:
    """Stateful wrapper: non-IID client datasets on the mesh, round loop.

    Args:
        loss_fn: (params, client_data) → scalar.
        params: initial global parameters.
        client_data: pytree with leading axis = num_clients (must divide the
            client-axis size of the mesh).
        weights: per-client sample counts (defaults to uniform).
    """

    def __init__(
        self,
        loss_fn,
        params: Params,
        client_data: Any,
        weights: Optional[np.ndarray] = None,
        mesh: Optional[Mesh] = None,
        local_steps: int = 5,
        local_lr: float = 1e-3,
        privacy: Optional[PrivacyConfig] = None,
        seed: int = 0,
    ):
        num_clients = len(jax.tree_util.tree_leaves(client_data)[0])
        self.mesh = mesh or make_mesh(data=1, client=jax.device_count())
        self.params = params
        self.key = jax.random.PRNGKey(seed)
        csize = self.mesh.shape["client"]
        if num_clients % csize:
            raise ValueError(f"{num_clients} clients not divisible by client axis {csize}")
        cd_sharding = NamedSharding(self.mesh, P("client"))
        self.client_data = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), cd_sharding), client_data
        )
        self.weights = jax.device_put(
            jnp.asarray(
                weights if weights is not None else np.ones(num_clients), jnp.float32
            ),
            cd_sharding,
        )
        self._round = build_fedavg_round(
            loss_fn, self.mesh, local_steps, local_lr, privacy
        )
        self.history = []

    def run_round(self) -> Dict[str, float]:
        self.key, sub = jax.random.split(self.key)
        self.params, metrics = self._round(
            self.params, self.client_data, self.weights, sub
        )
        metrics = {k: float(v) for k, v in metrics.items()}
        self.history.append(metrics)
        return metrics

    def run(self, num_rounds: int):
        for _ in range(num_rounds):
            self.run_round()
        return self.history


def dryrun_fedavg_mesh(n_devices: int, devices=None) -> None:
    """Tiny end-to-end mesh-FedAvg round used by __graft_entry__."""
    mesh = make_mesh(data=1, client=n_devices, devices=devices)
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (4, 4)), "b": jnp.zeros((4,))}

    def loss_fn(p, batch):
        x, y = batch
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2)

    n_clients = 2 * n_devices
    kx, ky = jax.random.split(key)
    data = (
        jax.random.normal(kx, (n_clients, 8, 4)),
        jax.random.normal(ky, (n_clients, 8, 4)),
    )
    sim = MeshFederatedSimulation(
        loss_fn, params, data, mesh=mesh, local_steps=2, local_lr=0.05,
        privacy=PrivacyConfig(noise_multiplier=0.01),
    )
    m = sim.run_round()
    assert np.isfinite(m["update_norm"]), m
