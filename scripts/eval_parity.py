#!/usr/bin/env python
"""Quality-parity evaluation against the reference's README protocol.

The reference's headline quality numbers (README.md:355-370) are PSNR/SSIM/
MAE/MSE of SuperResolutionNet on synthetic 64→128 2× SR plus the bicubic
baseline (+4.66 dB over 20.90 dB bicubic). This script reproduces that
protocol on NERVE-TPU: train the baseline config (feats=32, blocks=4, tw=1 —
train_baseline.py:51-56) on synthetic data, evaluate on a held-out set, and
report the same metric table including the bicubic baseline delta.

Run: python scripts/eval_parity.py [--epochs 50]
Outputs one JSON line with the metric table.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json

import jax
import jax.numpy as jnp

from nerve_tpu import ops, training
from nerve_tpu.config.schema import TrainingConfig
from nerve_tpu.models import LightweightSuperResolution, SuperResolutionNet
from nerve_tpu.utils import data as data_lib
from nerve_tpu.utils.metrics import (
    mae, mse, msssim_levels_for, psnr, ssim, vmaf_proxy,
)


def _vmaf(pred, hr):
    return float(vmaf_proxy(pred, hr, levels=msssim_levels_for(
        int(hr.shape[1]), int(hr.shape[2]))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--train-samples", type=int, default=500)
    p.add_argument("--eval-samples", type=int, default=100)
    p.add_argument("--lr-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--motion", action="store_true",
        help="Train/evaluate on panning-camera video windows "
        "(data_lib.make_video_sr_dataset) instead of the reference's "
        "frame-repetition protocol. Required for the coarse-flow delta to "
        "be meaningful: on repeated frames flow is zero and "
        "flow_downsample changes nothing.",
    )
    p.add_argument(
        "--model", default="full", choices=("full", "lightweight"),
        help="'full' = SuperResolutionNet (the reference protocol); "
        "'lightweight' = LightweightSuperResolution, the single-frame "
        "60 fps serving config bench.py measures — this branch reports "
        "the PSNR of the SAME model the headline fps describes.",
    )
    p.add_argument(
        "--platform", default=None, choices=(None, "cpu", "tpu"),
        help="Pin the JAX platform (the axon TPU PJRT plugin ignores "
        "JAX_PLATFORMS; only jax.config.update binds — use --platform cpu "
        "when the TPU tunnel is unavailable).",
    )
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    key = jax.random.PRNGKey(args.seed)
    k_train, k_eval = jax.random.split(key)
    if args.model == "lightweight":
        return _eval_lightweight(args, k_train, k_eval)
    if args.motion:
        train = data_lib.make_video_sr_dataset(
            k_train, args.train_samples, args.lr_size, 2, num_frames=3
        )
        test = data_lib.make_video_sr_dataset(
            k_eval, args.eval_samples, args.lr_size, 2, num_frames=3
        )
    else:
        train = data_lib.make_sr_dataset(k_train, args.train_samples, args.lr_size, 2)
        test = data_lib.make_sr_dataset(k_eval, args.eval_samples, args.lr_size, 2)

    model = SuperResolutionNet(
        scale_factor=2, num_features=32, num_residual_blocks=4, temporal_window=1
    )
    cfg = TrainingConfig(
        epochs=args.epochs, batch_size=args.batch_size, learning_rate=args.lr,
        warmup_epochs=min(5, args.epochs // 10), scheduler="cosine",
    )
    state, _ = training.fit_sr(model, train, train, cfg, num_frames=3, seed=args.seed)

    hr_t = jnp.asarray(test["hr"])
    if args.motion:
        lr_win = jnp.asarray(test["lr_win"])
        lr_t = lr_win[:, lr_win.shape[1] // 2]  # center frame for bicubic
    else:
        lr_t = jnp.asarray(test["lr"])
        lr_win = data_lib.expand_temporal(lr_t, 3)

    def chunked(fn, x, bs: int = 20):
        """Eval forwards in fixed-size chunks: one whole-eval-set (B=100)
        program hung the tunnel's AOT compiler twice in round 4; the
        chunked program is ~5× smaller and each dispatch keeps session
        traffic flowing."""
        outs = []
        for i in range(0, x.shape[0], bs):
            outs.append(fn(x[i : i + bs]))
            print(f"# eval chunk {i + bs}/{x.shape[0]}", flush=True)
        return jnp.concatenate(outs, axis=0)

    variables0 = {"params": state.params, "batch_stats": state.batch_stats}
    pred = chunked(jax.jit(lambda x: model.apply(variables0, x)), lr_win)
    bicubic = jnp.clip(ops.upsample_bicubic(lr_t, 2), 0, 1)

    results = {
        "protocol": "motion" if args.motion else "repeat",
        "psnr": float(psnr(pred, hr_t)),
        "ssim": float(ssim(pred, hr_t)),
        "vmaf_proxy": _vmaf(pred, hr_t),
        "mae": float(mae(pred, hr_t)),
        "mse": float(mse(pred, hr_t)),
        "bicubic_psnr": float(psnr(bicubic, hr_t)),
        "bicubic_ssim": float(ssim(bicubic, hr_t)),
    }
    results["psnr_gain_over_bicubic"] = results["psnr"] - results["bicubic_psnr"]

    # Serving-config deltas on the SAME trained weights, so the headline fps
    # and headline dB describe the same model (VERDICT round 1, weak #3):
    # coarse flow (flow_downsample=2, what bench.py serves) and the int8 RDB
    # chain (the 394-TOPS path).
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    coarse = model.clone(flow_downsample=2)
    pred_coarse = chunked(jax.jit(lambda x: coarse.apply(variables, x)), lr_win)
    results["psnr_coarse_flow"] = float(psnr(pred_coarse, hr_t))
    results["psnr_delta_coarse_flow"] = results["psnr_coarse_flow"] - results["psnr"]

    from nerve_tpu.models.quantize import quantize_sr_variables

    qmodel = model.clone(flow_downsample=2, quantized=True)
    variables_q = quantize_sr_variables(qmodel, variables, lr_win[:8])
    pred_q = chunked(jax.jit(lambda x: qmodel.apply(variables_q, x)), lr_win)
    results["psnr_int8"] = float(psnr(pred_q, hr_t))
    results["psnr_delta_int8_vs_coarse"] = (
        results["psnr_int8"] - results["psnr_coarse_flow"]
    )

    # Full-chain int8 (RDB + head/flow/attention/gff/upsampler — the
    # quantized_chains serving path, VERDICT r3 item #2): the dB cost of
    # quantising EVERY fused conv-chain site.
    qfmodel = model.clone(
        flow_downsample=2, quantized=True, quantized_chains=True
    )
    variables_qf = quantize_sr_variables(qfmodel, variables, lr_win[:8])
    pred_qf = chunked(jax.jit(lambda x: qfmodel.apply(variables_qf, x)), lr_win)
    results["psnr_int8full"] = float(psnr(pred_qf, hr_t))
    results["psnr_delta_int8full_vs_coarse"] = (
        results["psnr_int8full"] - results["psnr_coarse_flow"]
    )

    print(json.dumps(
        {k: round(v, 4) if isinstance(v, float) else v for k, v in results.items()}
    ))
    return results


def _eval_lightweight(args, k_train, k_eval):
    """PSNR for the LightweightSuperResolution serving config.

    bench.py's headline fps is this model; VERDICT round 1 item #5 asks for
    the fps AND the PSNR of the same config. Single-frame model, so the
    frame-repetition vs motion protocol distinction is moot — train/eval on
    single (lr, hr) pairs (reference protocol, README.md:355-370).
    """
    train = data_lib.make_sr_dataset(k_train, args.train_samples, args.lr_size, 2)
    test = data_lib.make_sr_dataset(k_eval, args.eval_samples, args.lr_size, 2)

    model = LightweightSuperResolution(scale_factor=2)
    cfg = TrainingConfig(
        epochs=args.epochs, batch_size=args.batch_size, learning_rate=args.lr,
        warmup_epochs=min(5, args.epochs // 10), scheduler="cosine",
    )
    lr_all = jnp.asarray(train["lr"])
    hr_all = jnp.asarray(train["hr"])
    n = lr_all.shape[0] - lr_all.shape[0] % args.batch_size
    steps_per_epoch = n // args.batch_size
    tx = training.create_optimizer(cfg, steps_per_epoch)
    state = training.create_sr_state(model, lr_all[: args.batch_size], tx, args.seed)
    step = training.make_sr_train_step(model, loss_kind="mse")

    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        key, kp = jax.random.split(key)
        perm = jax.random.permutation(kp, n)
        last = None
        for i in range(steps_per_epoch):
            idx = perm[i * args.batch_size : (i + 1) * args.batch_size]
            state, last = step(state, lr_all[idx], hr_all[idx])
        print(
            f"epoch {epoch + 1}/{args.epochs}: loss={float(last['loss']):.5f} "
            f"train_psnr={float(last['psnr']):.2f}dB", flush=True,
        )

    hr_t = jnp.asarray(test["hr"])
    lr_t = jnp.asarray(test["lr"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # Serving forward (train=False): the fused-chain path bench.py times.
    pred = jax.jit(lambda x: model.apply(variables, x))(lr_t)
    bicubic = jnp.clip(ops.upsample_bicubic(lr_t, 2), 0, 1)
    results = {
        "model": "lightweight",
        "psnr": float(psnr(pred, hr_t)),
        "ssim": float(ssim(pred, hr_t)),
        "vmaf_proxy": _vmaf(pred, hr_t),
        "mae": float(mae(pred, hr_t)),
        "mse": float(mse(pred, hr_t)),
        "bicubic_psnr": float(psnr(bicubic, hr_t)),
        "bicubic_ssim": float(ssim(bicubic, hr_t)),
    }
    results["psnr_gain_over_bicubic"] = results["psnr"] - results["bicubic_psnr"]
    # The bf16 serving dtype bench.py runs at (weights + activations cast).
    bf16 = model.clone(dtype=jnp.bfloat16)
    pred_bf16 = jax.jit(lambda x: bf16.apply(variables, x))(lr_t).astype(jnp.float32)
    results["psnr_bf16"] = float(psnr(pred_bf16, hr_t))
    results["psnr_delta_bf16"] = results["psnr_bf16"] - results["psnr"]
    print(json.dumps(
        {k: round(v, 4) if isinstance(v, float) else v for k, v in results.items()}
    ))
    return results


if __name__ == "__main__":
    main()
