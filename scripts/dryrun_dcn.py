#!/usr/bin/env python
"""2-process DCN federated dryrun: FedAvg psum across process boundaries.

Validates the multi-host federated mode (nerve_tpu.federated.dcn) without a
TPU pod: two CPU processes each expose 4 virtual devices, join one
``jax.distributed`` process group, and run federated rounds over the
8-device global client mesh. Each worker independently computes the exact
single-host reference (all clients, plain vmap + weighted mean) and asserts
the distributed result matches to f32 tolerance — the cross-process psum
must be arithmetically identical to the local formulation.

This is the TPU-native analogue of the reference's server↔client process
split (nerve_cl/federated/server.py:113-138): same process isolation, but
the aggregation is an in-program collective instead of gRPC round-trips.

Parent mode (default): spawns the two workers, waits, propagates failure.
    python scripts/dryrun_dcn.py
Worker mode (internal):
    python scripts/dryrun_dcn.py --worker I --port P
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4
CLIENTS_PER_DEVICE = 2
ROUNDS = 2


def _worker(process_id: int, port: int) -> None:
    # Bind platform/virtual devices BEFORE touching the backend. The env
    # vars are set by the parent; the config update binds even where a
    # sitecustomize (axon plugin) overrides JAX_PLATFORMS.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nerve_tpu.federated import dcn
    from nerve_tpu.federated.privacy import PrivacyConfig

    dcn.initialize_process(f"localhost:{port}", N_PROCESSES, process_id)
    assert jax.device_count() == N_PROCESSES * DEVICES_PER_PROCESS, (
        jax.device_count()
    )
    assert jax.local_device_count() == DEVICES_PER_PROCESS

    import jax.numpy as jnp
    import numpy as np

    mesh = dcn.global_client_mesh()

    def loss_fn(p, batch):
        x, y = batch
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2)

    # Deterministic per-GLOBAL-client data so every process can regenerate
    # the full population for the local reference check.
    n_total = CLIENTS_PER_DEVICE * N_PROCESSES * DEVICES_PER_PROCESS
    key = jax.random.PRNGKey(7)

    def client_batch(cid: int):
        kx, ky = jax.random.split(jax.random.fold_in(key, cid))
        x = jax.random.normal(kx, (8, 4))
        y = jax.random.normal(ky, (8, 1)) + x[:, :1]
        return np.asarray(x), np.asarray(y)

    all_x = np.stack([client_batch(c)[0] for c in range(n_total)])
    all_y = np.stack([client_batch(c)[1] for c in range(n_total)])
    all_w = 1.0 + np.arange(n_total, dtype=np.float32)  # non-uniform weights

    n_local = n_total // N_PROCESSES
    lo, hi = process_id * n_local, (process_id + 1) * n_local
    client_data, weights = dcn.shard_local_clients(
        mesh, (all_x[lo:hi], all_y[lo:hi]), all_w[lo:hi]
    )

    params0 = {"w": np.zeros((4, 1), np.float32), "b": np.zeros((1,), np.float32)}
    params = dcn.replicate(mesh, params0)
    # Clip active, noise OFF → deterministic, reference-checkable rounds.
    privacy = PrivacyConfig(max_grad_norm=0.5, noise_multiplier=0.0)
    runner = dcn.DcnFederatedRound(
        loss_fn, mesh=mesh, local_steps=3, local_lr=0.05, privacy=privacy
    )

    # ---- exact single-host reference (full population, no mesh) ---------- #
    from nerve_tpu.federated.simulation import _local_sgd

    def reference_round(p):
        def one(cx, cy):
            adapted = _local_sgd(loss_fn, p, (cx, cy), 3, 0.05)
            delta = jax.tree_util.tree_map(lambda a, q: a - q, adapted, p)
            leaves = jax.tree_util.tree_leaves(delta)
            norm = jnp.sqrt(sum(jnp.sum(l**2) for l in leaves))
            s = jnp.minimum(1.0, 0.5 / jnp.maximum(norm, 1e-12))
            return jax.tree_util.tree_map(lambda l: l * s, delta)

        deltas = jax.vmap(one)(jnp.asarray(all_x), jnp.asarray(all_y))
        w = jnp.asarray(all_w)
        agg = jax.tree_util.tree_map(
            lambda d: jnp.tensordot(w, d, axes=(0, 0)) / jnp.sum(w), deltas
        )
        return jax.tree_util.tree_map(jnp.add, p, agg)

    ref = {k: jnp.asarray(v) for k, v in params0.items()}
    dummy_key = jax.random.PRNGKey(0)
    for r in range(ROUNDS):
        params, metrics = runner.run(
            params, client_data, weights, dcn.replicate(mesh, dummy_key)
        )
        ref = reference_round(ref)
        got = {k: np.asarray(v) for k, v in params.items()}
        err = max(
            float(np.max(np.abs(got[k] - np.asarray(ref[k])))) for k in got
        )
        assert err < 1e-5, f"round {r}: DCN vs local reference err {err}"
        assert np.isfinite(metrics["update_norm"]), metrics
        if process_id == 0:
            print(
                f"round {r}: update_norm={metrics['update_norm']:.5f} "
                f"total_weight={metrics['total_weight']:.0f} "
                f"ref_err={err:.2e}", flush=True,
            )
    if process_id == 0:
        print(f"dcn dryrun OK: {N_PROCESSES} processes x "
              f"{DEVICES_PER_PROCESS} devices, {n_total} clients, "
              f"{ROUNDS} rounds match local reference", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args()
    if args.worker is not None:
        _worker(args.worker, args.port)
        return 0

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
        ).strip(),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for i in range(N_PROCESSES)
    ]
    rc = 0
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            out += "\n<TIMEOUT>"
        if pr.returncode != 0:
            rc = 1
        sys.stdout.write(f"--- worker {i} (exit {pr.returncode}) ---\n{out}\n")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
