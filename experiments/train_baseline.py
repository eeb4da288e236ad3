#!/usr/bin/env python
"""Baseline supervised SR training (parity: experiments/train_baseline.py in
the reference, re-built on the jitted data-parallel substrate).

Differences from the reference loop (train_baseline.py:35-135):
  * one fused jitted forward-backward-update step, batch sharded over the mesh
    'data' axis instead of a single device;
  * config comes from the typed YAML tree (the reference's default.yaml is
    dead config — never loaded); CLI flags override dotted paths;
  * checkpointing via orbax with real resume (the reference has none).
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
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu import load_config, training
from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.parallel import best_data_mesh as make_mesh_for_batch
from nerve_tpu.utils import data as data_lib
from nerve_tpu.utils.checkpoint import CheckpointManager


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NERVE-TPU baseline SR training")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--num-features", type=int, default=32)
    p.add_argument("--num-blocks", type=int, default=4)
    p.add_argument("--temporal-window", type=int, default=1)
    p.add_argument("--train-samples", type=int, default=500)
    p.add_argument("--val-samples", type=int, default=100)
    p.add_argument("--lr-size", type=int, default=64)
    p.add_argument("--checkpoint-dir", default="checkpoints/baseline")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = load_config(
        args.config,
        overrides={
            "training.epochs": args.epochs,
            "training.batch_size": args.batch_size,
            "training.learning_rate": args.lr,
        },
    )

    print(f"devices: {jax.devices()}")
    mesh = make_mesh_for_batch(args.batch_size)

    # Synthetic datasets matching the reference's shapes
    # (scripts/download_data.sh:25-41: LR 64², HR 128², 500 train / 100 val).
    key = jax.random.PRNGKey(args.seed)
    k_train, k_val = jax.random.split(key)
    train_data = data_lib.make_sr_dataset(
        k_train, args.train_samples, lr_size=args.lr_size, scale=args.scale
    )
    val_data = data_lib.make_sr_dataset(
        k_val, args.val_samples, lr_size=args.lr_size, scale=args.scale
    )

    # The reference baseline config: feats=32, blocks=4, tw=1
    # (train_baseline.py:51-56).
    model = SuperResolutionNet(
        scale_factor=args.scale,
        num_features=args.num_features,
        num_residual_blocks=args.num_blocks,
        temporal_window=args.temporal_window,
        dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32,
    )
    num_frames = 2 * args.temporal_window + 1

    ckpt = CheckpointManager(args.checkpoint_dir, cfg.checkpoint.keep_last_n)
    state, history = training.fit_sr(
        model, train_data, val_data, cfg.training, num_frames, mesh=mesh,
        seed=args.seed, ckpt_manager=ckpt,
    )
    ckpt.close()

    print(json.dumps({"best_psnr": history["best_psnr"], "final_psnr": history["final_psnr"]}))
    return history


if __name__ == "__main__":
    main()
