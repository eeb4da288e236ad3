#!/usr/bin/env python
"""Federated training entry point.

Parity with the reference's experiments/train_federated.py (modes simulation /
server / client), with two upgrades: the ``simulation`` mode runs the REAL
mesh-parallel FedAvg (``MeshFederatedSimulation`` — the reference's simulation
never trains, server.py:166-193), and a ``trainer`` mode runs the in-process
client/strategy loop. The non-IID client data keeps the reference's
per-client offset scheme (client_id % 5 intensity shifts,
train_federated.py:18-24).
"""

from __future__ import annotations

# Direct-script execution (`python experiments/<name>.py`) puts experiments/
# on sys.path but not the repo root; make `import nerve_tpu` work without an
# editable install. No-op when imported as the experiments.* package or when
# the console script (pip-installed) runs.
if __package__ in (None, ""):
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu.federated import (
    FederatedTrainer,
    MeshFederatedSimulation,
    VideoEnhancementClient,
    VideoEnhancementStrategy,
    start_server,
)
from nerve_tpu.federated.privacy import PrivacyConfig
from nerve_tpu.federated.transport import run_client
from nerve_tpu.models import LightweightSuperResolution
from nerve_tpu.parallel import make_mesh
from nerve_tpu.utils import data as data_lib


def build_argparser():
    p = argparse.ArgumentParser(description="NERVE-TPU federated training")
    p.add_argument("--mode", choices=["simulation", "trainer", "server", "client"],
                   default="simulation")
    p.add_argument("--num-clients", type=int, default=8)
    p.add_argument("--num-rounds", type=int, default=5)
    p.add_argument("--local-epochs", type=int, default=2)
    p.add_argument("--local-steps", type=int, default=5)
    p.add_argument("--samples-per-client", type=int, default=32)
    p.add_argument("--server-address", default="[::]:8080")
    p.add_argument("--client-id", type=int, default=0)
    p.add_argument("--dp", action="store_true", help="enable differential privacy")
    p.add_argument("--seed", type=int, default=42)
    return p


def client_dataset(client_id: int, n: int, seed: int):
    """Non-IID local data: intensity offset by client_id % 5 (parity)."""
    offset = (client_id % 5) * 0.1
    key = jax.random.PRNGKey(seed * 100 + client_id)
    return data_lib.make_sr_dataset(key, n, lr_size=16, scale=2, content_offset=offset)


def run_mesh_simulation(args):
    model = LightweightSuperResolution(scale_factor=2)
    mesh = make_mesh(data=1, client=min(jax.device_count(), args.num_clients))
    csize = mesh.shape["client"]
    num_clients = (args.num_clients // csize) * csize or csize

    datasets = [client_dataset(c, args.samples_per_client, args.seed)
                for c in range(num_clients)]
    lrs = jnp.stack([jnp.asarray(d["lr"]) for d in datasets])
    hrs = jnp.stack([jnp.asarray(d["hr"]) for d in datasets])

    variables = model.init(jax.random.PRNGKey(args.seed), lrs[0, :1])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})  # frozen at init in the sim

    def loss_fn(p, batch):
        lr, hr = batch
        out = model.apply({"params": p, "batch_stats": batch_stats}, lr)
        return jnp.mean((out.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)

    privacy = PrivacyConfig(noise_multiplier=0.1) if args.dp else None
    sim = MeshFederatedSimulation(
        loss_fn, params, (lrs, hrs), mesh=mesh,
        local_steps=args.local_steps, local_lr=1e-3, privacy=privacy,
        seed=args.seed,
    )
    for r in range(args.num_rounds):
        m = sim.run_round()
        loss = float(loss_fn(sim.params, (lrs[0], hrs[0])))
        print(f"round {r + 1}: update_norm={m['update_norm']:.5f} client0_loss={loss:.5f}")
    return {"rounds": args.num_rounds, "final_loss": loss}


def run_trainer(args):
    model = LightweightSuperResolution(scale_factor=2)
    clients = [
        VideoEnhancementClient(
            model, client_dataset(c, args.samples_per_client, args.seed),
            num_frames=1, local_epochs=args.local_epochs, batch_size=8,
            privacy=PrivacyConfig() if args.dp else None, seed=c,
        )
        for c in range(args.num_clients)
    ]
    trainer = FederatedTrainer(
        clients, clients[0].get_parameters(),
        VideoEnhancementStrategy(fraction_fit=0.5, min_fit_clients=2),
    )
    trainer.run(args.num_rounds)
    ev = trainer.evaluate_round()
    print(f"final weighted eval: {ev}")
    return {"rounds": args.num_rounds, "final_loss": ev.get("loss")}


def run_server(args):
    model = LightweightSuperResolution(scale_factor=2)
    params = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, 16, 16, 3))
    )["params"]
    from nerve_tpu.federated.common import tree_to_arrays

    start_server(
        tree_to_arrays(params),
        num_rounds=args.num_rounds,
        address=args.server_address,
        min_clients=2,
    )
    return {}


def run_external_client(args):
    model = LightweightSuperResolution(scale_factor=2)
    client = VideoEnhancementClient(
        model, client_dataset(args.client_id, args.samples_per_client, args.seed),
        num_frames=1, local_epochs=args.local_epochs, batch_size=8, seed=args.client_id,
    )
    run_client(client, args.server_address, f"client-{args.client_id}")
    return {}


def main(argv=None):
    args = build_argparser().parse_args(argv)
    out = {
        "simulation": run_mesh_simulation,
        "trainer": run_trainer,
        "server": run_server,
        "client": run_external_client,
    }[args.mode](args)
    if out:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
