#!/usr/bin/env python
"""Generate synthetic SR datasets on disk.

Counterpart of the reference's scripts/download_data.sh:25-41 (which fabricates
LR 64² / HR 128² `.pt` blobs): writes learnable {lr, hr} `.npz` datasets plus
per-content-type continual tasks under data/.
"""

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import os

import jax
import numpy as np

from nerve_tpu.utils import data as data_lib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data")
    p.add_argument("--train-samples", type=int, default=500)
    p.add_argument("--val-samples", type=int, default=100)
    p.add_argument("--lr-size", type=int, default=64)
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "val"), exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k_train, k_val = jax.random.split(key)
    train = data_lib.make_sr_dataset(k_train, args.train_samples, args.lr_size, args.scale)
    val = data_lib.make_sr_dataset(k_val, args.val_samples, args.lr_size, args.scale)
    np.savez_compressed(os.path.join(args.out, "train", "data.npz"), **train)
    np.savez_compressed(os.path.join(args.out, "val", "data.npz"), **val)

    tasks = data_lib.make_task_sequence(args.seed, 5, 64, args.lr_size // 2, args.scale)
    for name, d in tasks:
        np.savez_compressed(os.path.join(args.out, f"task_{name}.npz"), **d)
    print(f"wrote {args.train_samples} train / {args.val_samples} val samples "
          f"and {len(tasks)} continual tasks to {args.out}/")


if __name__ == "__main__":
    main()
