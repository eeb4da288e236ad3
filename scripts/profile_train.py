#!/usr/bin/env python
"""Attribute the SR train step's device time to pipeline stages (fwd and bwd).

bench_suite's config #3 (train_baseline: feats=32, blocks=4, tw=1, batch 16
@64², f32) measures ~680 ms/step on v5e — orders of magnitude off the conv
roofline for ~30 GFLOP/step. This script breaks the step down so the slow
stage can be attacked rather than guessed at: it times, via the
dispatch-amortised ``timed_scan``,

  * the full train step (fwd+bwd+optimizer),
  * the full forward,
  * each stage in isolation, forward and value_and_grad: feature extraction,
    motion estimation + warp (align_to_center), temporal aggregation,
    the RDB chain (XLA f32 formulation — the training path), and the
    fusion/upsample epilogue (fuse_from_features).

Per-stage grads flow to BOTH params and inputs (as inside the real step).

Run: python scripts/profile_train.py [--batch 16 --lr-size 64]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json

import jax
import jax.numpy as jnp

from nerve_tpu import training
from nerve_tpu.config.schema import TrainingConfig
from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.utils import data as data_lib
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr-size", type=int, default=64)
    p.add_argument("--features", type=int, default=32)
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="f32", choices=("f32", "bf16"))
    args = p.parse_args(argv)

    b, hw, f = args.batch, args.lr_size, args.features
    import jax.numpy as _jnp
    model = SuperResolutionNet(
        scale_factor=2, num_features=f, num_residual_blocks=args.blocks,
        temporal_window=1,
        dtype=_jnp.bfloat16 if args.dtype == "bf16" else _jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    data = data_lib.make_sr_dataset(key, b, lr_size=hw, scale=2)
    lr_win = data_lib.expand_temporal(jnp.asarray(data["lr"]), 3)
    hr = jnp.asarray(data["hr"])

    tx = training.create_optimizer(TrainingConfig(epochs=1), 1)
    state = training.create_sr_state(model, lr_win, tx, seed=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    step = training.make_sr_train_step(model)

    overhead = measure_dispatch_overhead()
    results = {}

    def record(name, fn, *a, iters=args.iters):
        ms = timed_scan(fn, *a, iters=iters, dispatch_overhead_ms=overhead)[
            "ms_per_call"
        ]
        results[name] = round(ms, 2)
        print(f"{name:32s} {ms:8.2f} ms", flush=True)

    # ---- full step and full forward ---------------------------------------- #
    def step_loss(lr_b, hr_b):
        # timed_scan threads arg0 (lr_b); run the step on fixed initial state
        # each iteration — it measures the step's cost, not training progress.
        # The returned value must depend on EVERY updated leaf, or XLA
        # dead-codes the optimizer update (and most of the backward) out of
        # the scan: fetch one element per new-param leaf (negligible work).
        s, metrics = step(state, lr_b, hr_b)
        dep = jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), s.params, 0.0
        )
        return metrics["loss"] + dep * 1e-20

    record("train_step (fwd+bwd+opt)", step_loss, lr_win, hr)

    def fwd(lr_b):
        return model.apply(variables, lr_b)

    record("forward (eval mode)", fwd, lr_win)

    def fwd_train_loss(lr_b):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                lr_b, True, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.square(out - hr))

        l, g = jax.value_and_grad(loss_fn)(state.params)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
        )

    record("fwd+bwd (no optimizer)", fwd_train_loss, lr_win)

    # ---- stages ------------------------------------------------------------ #
    t = 3
    flat = lr_win.reshape(b * t, hw, hw, lr_win.shape[-1])

    def feats_fwd(x):
        return model.apply(variables, x, False, method=model.extract_features)

    record("feature_extractor fwd", feats_fwd, flat)

    def feats_vjp(x):
        def loss_fn(params, xx):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xx, False, method=model.extract_features,
            )
            return jnp.mean(jnp.square(out))

        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.params, x)
        return l + jnp.sum(jnp.abs(g[1]))

    record("feature_extractor fwd+bwd", feats_vjp, flat)

    feats = feats_fwd(flat)
    nb = feats[: b * (t - 1)]
    ctr = jnp.concatenate([feats[b * (t - 1):]] * (t - 1), axis=0)

    def align_fwd(nb_, ctr_):
        return model.apply(variables, nb_, ctr_, method=model.align_to_center)

    record("motion+warp fwd", align_fwd, nb, ctr)

    def align_vjp(nb_):
        def loss_fn(params, n_):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                n_, ctr, method=model.align_to_center,
            )
            return jnp.mean(jnp.square(out))

        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.params, nb_)
        return l + jnp.sum(jnp.abs(g[1]))

    record("motion+warp fwd+bwd", align_vjp, nb)

    aligned = [feats[b * 2:], feats[:b], feats[b : 2 * b]]

    def fuse_fwd(a0):
        return model.apply(
            variables, [a0] + aligned[1:], aligned[0], lr_win[:, 1],
            method=model.fuse_from_features,
        )

    record("aggregate+RDB+fuse fwd", fuse_fwd, aligned[0])

    def fuse_vjp(a0):
        def loss_fn(params, aa):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                [aa] + aligned[1:], aligned[0], lr_win[:, 1],
                method=model.fuse_from_features,
            )
            return jnp.mean(jnp.square(out))

        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.params, a0)
        return l + jnp.sum(jnp.abs(g[1]))

    record("aggregate+RDB+fuse fwd+bwd", fuse_vjp, aligned[0])

    # ---- RDB chain alone (the XLA f32 training formulation) ---------------- #
    from nerve_tpu.models.quantize import rdb_params_from_tree
    from nerve_tpu.ops import rdb

    params_list = rdb_params_from_tree(
        jax.tree_util.tree_map(lambda x: x, state.params["rdbs"]), args.blocks
    )
    agg = jnp.zeros((b, hw, hw, f), jnp.float32)

    def rdb_fwd(x):
        return rdb._rdb_chain_xla(x, params_list)

    record("rdb_chain (XLA f32) fwd", rdb_fwd, agg)

    def rdb_vjp(x):
        def loss_fn(xx):
            return jnp.mean(jnp.square(rdb._rdb_chain_xla(xx, params_list)))

        l, g = jax.value_and_grad(loss_fn)(x)
        return l + jnp.sum(jnp.abs(g))

    record("rdb_chain (XLA f32) fwd+bwd", rdb_vjp, agg)

    print(json.dumps({"dispatch_overhead_ms": round(overhead, 2), **results}))
    return results


if __name__ == "__main__":
    main()
