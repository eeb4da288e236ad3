#!/usr/bin/env python
"""Head-to-head inpainting quality: our FrameRecoveryNet vs the executed
torch reference (VERDICT r4 item #4 — the recovery path served by the
engine benchmark had speed numbers but no quality companion).

Protocol (mirrors scripts/ref_protocol.py's same-data SR head-to-head):

  1. one seeded synthetic VIDEO dataset (panning structured canvases,
     T=5 frames of real inter-frame motion, nerve_tpu.utils.data);
  2. corrupt the center frame with a random rectangle covering a target
     fraction of the frame (10-40 %, uniform per sample);
  3. train BOTH stacks with the identical recipe (AdamW 1e-3, wd 1e-5,
     cosine, full-frame MSE on the blended output — the blend
     ``out = frame·(1-mask) + recovered·mask`` confines the loss to the
     masked region by construction; reference forward:
     /root/reference/nerve_cl/models/frame_recovery.py:335-446);
  4. evaluate MASKED-REGION PSNR on held-out frames at fixed mask
     fractions {10, 20, 30, 40} %, plus the trivial zero-fill baseline.

Run: python scripts/recovery_protocol.py [--epochs 10] [--platform cpu]
Outputs one JSON line with both stacks' masked-PSNR-vs-fraction tables.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json
import time

import numpy as np


def make_masks(rng: np.random.Generator, n: int, h: int, w: int,
               frac) -> np.ndarray:
    """(N, H, W, 1) rectangle masks each covering ~``frac`` of the frame.

    ``frac`` may be a scalar or an (N,) array. Aspect and position are
    random; the rectangle is clipped-free (placed fully inside the frame).
    """
    frac = np.broadcast_to(np.asarray(frac, np.float64), (n,))
    masks = np.zeros((n, h, w, 1), np.float32)
    for i in range(n):
        area = frac[i] * h * w
        aspect = np.exp(rng.uniform(-0.7, 0.7))
        bh = int(np.clip(round(np.sqrt(area * aspect)), 1, h))
        bw = int(np.clip(round(area / bh), 1, w))
        y0 = rng.integers(0, h - bh + 1)
        x0 = rng.integers(0, w - bw + 1)
        masks[i, y0 : y0 + bh, x0 : x0 + bw, 0] = 1.0
    return masks


def masked_psnr(pred: np.ndarray, clean: np.ndarray, mask: np.ndarray) -> float:
    """PSNR over the masked region only (the pixels the net must invent)."""
    pred = np.clip(pred, 0.0, 1.0)
    se = ((pred - clean) ** 2) * mask
    mse = float(se.sum() / (mask.sum() * clean.shape[-1]))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def make_dataset(seed: int, n: int, size: int, num_frames: int):
    """{'frames': (N,T,s,s,3), 'clean': (N,s,s,3)} panning structured video."""
    import jax

    from nerve_tpu.utils import data as data_lib

    d = data_lib.make_video_sr_dataset(
        jax.random.PRNGKey(seed), n, lr_size=size, scale=1,
        num_frames=num_frames, max_shift=2,
    )
    return {"frames": np.asarray(d["lr_win"]), "clean": np.asarray(d["hr"])}


def train_ours_jax(train, test_sets, epochs, batch_size, lr, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from nerve_tpu.models import FrameRecoveryNet

    model = FrameRecoveryNet(base_channels=64, temporal_window=2)
    frames = jnp.asarray(train["frames"])  # (N, T, H, W, C)
    clean = jnp.asarray(train["clean"])
    n, t, h, w, c = frames.shape
    nb = n - n % batch_size
    steps_per_epoch = nb // batch_size

    rng = np.random.default_rng(seed + 7)
    key = jax.random.PRNGKey(seed)
    m0 = jnp.asarray(make_masks(rng, batch_size, h, w, 0.25))
    refs0 = frames[:batch_size]
    corrupted0 = clean[:batch_size] * (1.0 - m0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, corrupted0, refs0, m0, train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            lr, lr, 0, epochs * steps_per_epoch, lr * 0.01
        ),
        weight_decay=1e-5,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, corrupted, refs, mask, target):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                corrupted, refs, mask, True, mutable=["batch_stats"],
            )
            return jnp.mean((out - target) ** 2), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    t0 = time.time()
    for epoch in range(epochs):
        perm = rng.permutation(nb)
        last = float("nan")
        for i in range(steps_per_epoch):
            idx = jnp.asarray(perm[i * batch_size : (i + 1) * batch_size])
            fr = jnp.take(frames, idx, axis=0)
            cl = jnp.take(clean, idx, axis=0)
            m = jnp.asarray(make_masks(
                rng, batch_size, h, w, rng.uniform(0.1, 0.4, batch_size)
            ))
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, cl * (1.0 - m), fr, m, cl
            )
            last = float(loss)
        print(f"[jax]   epoch {epoch + 1}/{epochs}: loss={last:.5f}", flush=True)
    secs = time.time() - t0

    fwd = jax.jit(lambda cor, refs, m: model.apply(
        {"params": params, "batch_stats": batch_stats}, cor, refs, m
    ))
    table = {}
    for frac, (corrupted, refs, mask, cl) in test_sets.items():
        preds = []
        for i in range(0, cl.shape[0], batch_size):
            preds.append(np.asarray(fwd(
                jnp.asarray(corrupted[i : i + batch_size]),
                jnp.asarray(refs[i : i + batch_size]),
                jnp.asarray(mask[i : i + batch_size]),
            )))
        table[frac] = round(masked_psnr(np.concatenate(preds), cl, mask), 3)
    return table, secs


def train_reference_torch(train, test_sets, epochs, batch_size, lr, seed):
    import torch
    import torch.nn as nn

    _sys.path.insert(0, "/root/reference")
    from nerve_cl.models.frame_recovery import FrameRecoveryNet as TorchFR

    torch.manual_seed(seed)
    model = TorchFR(in_channels=3, base_channels=64, temporal_window=2)
    frames = train["frames"]  # (N, T, H, W, C)
    clean = train["clean"]
    n, t, h, w, c = frames.shape
    nb = n - n % batch_size
    steps_per_epoch = nb // batch_size
    rng = np.random.default_rng(seed + 7)

    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    crit = nn.MSELoss()

    def nchw(a):
        return torch.from_numpy(np.ascontiguousarray(
            np.moveaxis(a, -1, -3))).float()

    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        perm = rng.permutation(nb)
        last = float("nan")
        for i in range(steps_per_epoch):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            cl = clean[idx]
            m = make_masks(rng, batch_size, h, w, rng.uniform(0.1, 0.4, batch_size))
            corrupted = cl * (1.0 - m)
            opt.zero_grad()
            out = model(nchw(corrupted), nchw(frames[idx]), nchw(m))
            loss = crit(out, nchw(cl))
            loss.backward()
            opt.step()
            last = float(loss.item())
        sched.step()
        print(f"[torch] epoch {epoch + 1}/{epochs}: loss={last:.5f}", flush=True)
    secs = time.time() - t0

    model.eval()
    table = {}
    with torch.no_grad():
        for frac, (corrupted, refs, mask, cl) in test_sets.items():
            preds = []
            for i in range(0, cl.shape[0], batch_size):
                out = model(
                    nchw(corrupted[i : i + batch_size]),
                    nchw(refs[i : i + batch_size]),
                    nchw(mask[i : i + batch_size]),
                )
                preds.append(np.moveaxis(out.numpy(), 1, -1))
            table[frac] = round(masked_psnr(np.concatenate(preds), cl, mask), 3)
    return table, secs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train-samples", type=int, default=240)
    p.add_argument("--eval-samples", type=int, default=48)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default="cpu", choices=("cpu", "tpu"),
                   help="JAX platform for OUR side (torch is CPU either way)")
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    train = make_dataset(args.seed, args.train_samples, args.size, 5)
    test = make_dataset(args.seed + 1, args.eval_samples, args.size, 5)

    # Fixed eval masks per fraction (same arrays to both stacks).
    rng = np.random.default_rng(args.seed + 99)
    h = w = args.size
    test_sets = {}
    zero_fill = {}
    for frac in (0.1, 0.2, 0.3, 0.4):
        mask = make_masks(rng, args.eval_samples, h, w, frac)
        corrupted = test["clean"] * (1.0 - mask)
        test_sets[f"{int(frac * 100)}%"] = (
            corrupted, test["frames"], mask, test["clean"]
        )
        zero_fill[f"{int(frac * 100)}%"] = round(
            masked_psnr(corrupted, test["clean"], mask), 3
        )

    results = {
        "protocol": {
            "train_samples": args.train_samples,
            "eval_samples": args.eval_samples,
            "epochs": args.epochs, "batch_size": args.batch_size,
            "lr": args.lr, "optimizer": "adamw(wd=1e-5)+cosine",
            "loss": "full-frame MSE on the blended output",
            "data": f"seeded panning video, T=5 refs, {args.size}px, "
                    "rectangle masks 10-40% (identical arrays to both stacks)",
            "metric": "masked-region PSNR (dB) at fixed mask fractions",
        },
        "zero_fill_baseline": zero_fill,
    }
    if not args.skip_ours:
        ours, secs = train_ours_jax(
            train, test_sets, args.epochs, args.batch_size, args.lr, args.seed)
        results["nerve_tpu"] = ours
        results["nerve_tpu_train_seconds"] = round(secs, 1)
    if not args.skip_torch:
        ref, secs = train_reference_torch(
            train, test_sets, args.epochs, args.batch_size, args.lr, args.seed)
        results["reference_torch"] = ref
        results["reference_torch_train_seconds"] = round(secs, 1)
    if "nerve_tpu" in results and "reference_torch" in results:
        results["masked_psnr_delta_ours_minus_reference"] = {
            k: round(results["nerve_tpu"][k] - results["reference_torch"][k], 3)
            for k in results["nerve_tpu"]
        }

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
