#!/usr/bin/env python
"""Continual learning across content-type task sequences.

Parity with the reference's experiments/train_continual.py (EWC / replay
strategies over per-content synthetic tasks) — with its verified defect fixed:
the reference wires ``EWC`` to ``EnhancementEngine`` whose 5-D forward and
dict output crash ``compute_fisher`` (train_continual.py:125-128 +
ewc.py:117-136). Here Fisher flows through the model's real temporal forward
via a proper ``loss_fn(params, batch)``. The ``maml`` strategy the reference
declares but never wires (:117) is implemented.
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

from nerve_tpu import load_config, training
from nerve_tpu.continual import EWC, MAML, EpisodicMemory, Reptile, SynapticIntelligence
from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.utils import data as data_lib
from nerve_tpu.utils.metrics import psnr


def build_argparser():
    p = argparse.ArgumentParser(description="NERVE-TPU continual training")
    p.add_argument("--strategy", choices=["ewc", "replay", "si", "maml", "reptile"],
                   default="ewc")
    p.add_argument("--num-tasks", type=int, default=5)
    p.add_argument("--epochs-per-task", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ewc-lambda", type=float, default=5000.0)
    p.add_argument("--memory-capacity", type=int, default=1000)
    p.add_argument("--replay-batch", type=int, default=8)
    p.add_argument("--samples-per-task", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    return p


def make_model_and_loss(num_frames: int = 3, lr_size: int = 32, seed: int = 0):
    """Model + pure loss over *params only* (BN stats held fixed at their
    init values so the continual-learning state is a single params pytree —
    EWC Fisher, SI importances and MAML inner loops all differentiate through
    the model's real temporal forward)."""
    model = SuperResolutionNet(num_features=16, num_residual_blocks=2)
    example = data_lib.expand_temporal(
        jnp.zeros((1, lr_size, lr_size, 3), jnp.float32), num_frames
    )
    variables = model.init(jax.random.PRNGKey(seed), example)
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, batch):
        lr, hr = batch
        lr_win = data_lib.expand_temporal(lr, num_frames)
        out = model.apply({"params": params, "batch_stats": batch_stats}, lr_win)
        return jnp.mean((out.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)

    return model, loss_fn, variables["params"]


def eval_all_tasks(loss_fn, params, tasks):
    """PSNR on every task seen so far — the forgetting measurement."""
    out = {}
    for name, data in tasks:
        mse = float(loss_fn(params, (jnp.asarray(data["lr"]), jnp.asarray(data["hr"]))))
        out[name] = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    return out


def train_with_penalty(model, loss_fn, init_params, tasks, args, kind: str):
    """EWC or SI regularised sequential training."""
    import optax

    params = init_params
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    ewc = EWC(loss_fn, lam=args.ewc_lambda) if kind == "ewc" else None
    si = SynapticIntelligence(lam=1.0) if kind == "si" else None
    rng = np.random.default_rng(args.seed)

    for task_id, (name, data) in enumerate(tasks):
        if si is not None:
            si.start_task(params)

        def total_loss(p, batch):
            loss = loss_fn(p, batch)
            if ewc is not None:
                loss = loss + ewc.penalty(p)
            if si is not None:
                loss = loss + si.penalty(p)
            return loss

        @jax.jit
        def step(p, o, batch):
            loss, grads = jax.value_and_grad(total_loss)(p, batch)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss, grads

        for _ in range(args.epochs_per_task):
            for b in data_lib.batches(data, args.batch_size, rng=rng):
                batch = (jnp.asarray(b["lr"]), jnp.asarray(b["hr"]))
                old_params = params
                params, opt_state, loss, grads = step(params, opt_state, batch)
                if si is not None:
                    si.update_importance(old_params, params, grads)

        batches = [
            (jnp.asarray(b["lr"]), jnp.asarray(b["hr"]))
            for b in data_lib.batches(data, args.batch_size)
        ]
        if ewc is not None:
            ewc.register_task(task_id, params, batches)
        if si is not None:
            si.register_task(params)
        scores = eval_all_tasks(loss_fn, params, tasks[: task_id + 1])
        print(f"[{kind}] task {task_id} ({name}) done; PSNR per seen task: "
              + ", ".join(f"{k}={v:.2f}" for k, v in scores.items()))
    return params, eval_all_tasks(loss_fn, params, tasks)


def train_with_replay(model, loss_fn, init_params, tasks, args):
    """Episodic-replay training (parity: train_continual.py:72-112)."""
    import optax

    params = init_params
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    memory = EpisodicMemory(capacity=args.memory_capacity, strategy="stratified")
    rng = np.random.default_rng(args.seed)

    @jax.jit
    def step(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    for task_id, (name, data) in enumerate(tasks):
        for _ in range(args.epochs_per_task):
            for b in data_lib.batches(data, args.batch_size, rng=rng):
                lr, hr = b["lr"], b["hr"]
                replay = memory.sample(args.replay_batch)
                if replay is not None:
                    lr = np.concatenate([lr, replay["lr"]])
                    hr = np.concatenate([hr, replay["hr"]])
                params, opt_state, _ = step(
                    params, opt_state, (jnp.asarray(lr), jnp.asarray(hr))
                )
        # Store up to 50 samples per task (parity: :107-108).
        for i in range(min(50, len(data["lr"]))):
            memory.store(data["lr"][i], data["hr"][i], {"content_type": name})
        scores = eval_all_tasks(loss_fn, params, tasks[: task_id + 1])
        print(f"[replay] task {task_id} ({name}); PSNR: "
              + ", ".join(f"{k}={v:.2f}" for k, v in scores.items()))
    return params, eval_all_tasks(loss_fn, params, tasks)


def train_with_meta(model, loss_fn, init_params, tasks, args, kind: str):
    """MAML / Reptile meta-training over the task distribution."""
    params = init_params
    half = args.samples_per_task // 2
    support = (
        jnp.stack([jnp.asarray(d["lr"][:half]) for _, d in tasks]),
        jnp.stack([jnp.asarray(d["hr"][:half]) for _, d in tasks]),
    )
    query = (
        jnp.stack([jnp.asarray(d["lr"][half:]) for _, d in tasks]),
        jnp.stack([jnp.asarray(d["hr"][half:]) for _, d in tasks]),
    )
    if kind == "maml":
        meta = MAML(loss_fn, params, inner_lr=args.lr, outer_lr=args.lr,
                    inner_steps=3, first_order=True)
        for it in range(args.epochs_per_task * len(tasks)):
            loss = meta.train_step(support, query)
            if it % 5 == 0:
                print(f"[maml] iter {it}: meta-loss {loss:.5f}")
        params = meta.params
    else:
        meta = Reptile(loss_fn, params, inner_lr=args.lr, outer_lr=0.3, inner_steps=3)
        for it in range(args.epochs_per_task * len(tasks)):
            meta.train_step(support)
        params = meta.params
    return params, eval_all_tasks(loss_fn, params, tasks)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    tasks = data_lib.make_task_sequence(
        args.seed, args.num_tasks, args.samples_per_task, lr_size=32
    )
    model, loss_fn, init_params = make_model_and_loss(seed=args.seed)
    if args.strategy in ("ewc", "si"):
        _, scores = train_with_penalty(model, loss_fn, init_params, tasks, args, args.strategy)
    elif args.strategy == "replay":
        _, scores = train_with_replay(model, loss_fn, init_params, tasks, args)
    else:
        _, scores = train_with_meta(model, loss_fn, init_params, tasks, args, args.strategy)
    print(json.dumps({"final_psnr_per_task": scores}))
    return scores


if __name__ == "__main__":
    main()
