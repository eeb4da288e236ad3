#!/usr/bin/env python
"""Benchmark suite covering every BASELINE.json config (one JSON line each).

``bench.py`` remains the driver's single headline number (config #1, the
SuperResolutionNet 1080p→2160p streaming pipeline); this suite adds the rest:

  sr_full     — config #1 full pipeline: SuperResolutionNet (64 feats /
                8 RDBs) 1080p→2160p streaming fps, bf16
  sr_full_int8— the same pipeline with the int8 RDB chain (394-TOPS path)
  lightweight — LightweightSuperResolution 1080p→2160p streaming fps
                (the ≥60 fps north-star config on one chip; MXU packed-row
                output, every frame materialised in HBM; bench.py's
                headline is this config)
  engine      — config #2: FrameRecoveryNet + EnhancementEngine fused
                recovery→SR 4× windows/sec (270p → 1080p, mask active)
  train       — config #3: train_baseline fwd-bwd step (the reference's
                training config: 32 feats / 4 blocks / tw=1, batch 16 @64²),
                steps/sec + model-FLOPs MFU
  continual   — config #4: EWC-penalised distillation+replay train step
  federated   — config #5a: DP-clipped 8-client FedAvg round (mesh psum)
  abr         — config #5b: PPO update on a 2048-transition buffer + jitted
                vectorised rollout

Usage: bench_suite.py [config ...] (default: all).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _emit(metric: str, value: float, unit: str, vs_baseline: float | None = None):
    rec = {"metric": metric, "value": round(value, 3), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(vs_baseline, 4)
    print(json.dumps(rec), flush=True)


def _time_best(fn, n: int = 3) -> float:
    """Best wall time of n runs of an already-compiled callable (seconds)."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------------------- #
def bench_lightweight() -> None:
    # The headline config is measured by bench.py's shared harness — one
    # methodology, one metric name, two entry points.
    import bench

    print(json.dumps(bench.run_lightweight_bench()), flush=True)


# --------------------------------------------------------------------------- #
def bench_engine() -> None:
    from nerve_tpu.models.enhancement_engine import EngineConfig, EnhancementEngine

    on_tpu = jax.default_backend() == "tpu"
    h, w = (270, 480) if on_tpu else (32, 32)
    n_windows = 8 if on_tpu else 2
    cfg = EngineConfig(scale_factor=4)
    model = EnhancementEngine(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (1, 5, h, w, 3), jnp.float32)
    mask = (jax.random.uniform(key, (1, h, w, 1)) > 0.7).astype(jnp.float32)
    variables = jax.jit(model.init)(key, frames, None, mask)

    @jax.jit
    def run_n(v, x, m):
        def body(state, _):
            fr, acc = state
            out = model.apply(v, fr, None, m)["enhanced"]
            s = jnp.mean(out[0, :32, :32, 0], dtype=jnp.float32)
            bump = fr[:1, :1, :1, :1, :1] + (s * 1e-12).astype(fr.dtype)
            fr = jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0, 0))
            return (fr, acc + s), out

        (_, acc), ys = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n_windows)
        return acc + jnp.float32(ys[-1, 0, -1, -1, -1])

    float(run_n(variables, frames, mask))
    best = _time_best(lambda: float(run_n(variables, frames, mask)))
    _emit(
        "engine_recovery_sr4x_270p_fps" if on_tpu else "engine_proxy_fps_cpu",
        n_windows / best, "windows/sec/chip",
    )


# --------------------------------------------------------------------------- #
def bench_train() -> None:
    from nerve_tpu import training
    from nerve_tpu.config.schema import TrainingConfig
    from nerve_tpu.models import SuperResolutionNet
    from nerve_tpu.utils import data as data_lib

    on_tpu = jax.default_backend() == "tpu"
    bsz, lr_size = (16, 64) if on_tpu else (4, 16)
    n_steps = 20 if on_tpu else 2
    # The reference's training config: train_baseline.py:51-56. Mixed
    # precision as configured by ModelConfig.compute_dtype's default: bf16
    # conv stacks, f32 params/optimizer/loss (pixel_loss casts to f32).
    model = SuperResolutionNet(
        scale_factor=2, num_features=32, num_residual_blocks=4, temporal_window=1,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    data = data_lib.make_sr_dataset(key, bsz, lr_size=lr_size, scale=2)
    lr_win = data_lib.expand_temporal(jnp.asarray(data["lr"]), 3)
    hr = jnp.asarray(data["hr"])
    tx = training.create_optimizer(TrainingConfig(epochs=1), 1)
    state = training.create_sr_state(model, lr_win, tx, seed=0)
    step = training.make_sr_train_step(model)

    @jax.jit
    def run_n(s0, lr_b, hr_b):
        def body(s, _):
            s, metrics = step(s, lr_b, hr_b)
            return s, metrics["loss"]

        s_final, losses = jax.lax.scan(body, s0, None, length=n_steps)
        return s_final, jnp.sum(losses)

    def once():
        _s, tot = run_n(state, lr_win, hr)
        return float(tot)

    once()  # compile
    best = _time_best(once)
    step_ms = best / n_steps * 1000.0
    # MFU from the COMPILED program's own FLOP count (XLA cost analysis of
    # the n-step scan, divided by n) — the round-4 estimate reused the
    # reference's coarse get_flops parity formula, which models each
    # 5-dense-conv RDB as a single f→f conv and undercounted ~20×.
    try:
        cost = jax.jit(run_n).lower(state, lr_win, hr).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) / n_steps
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        flops = 0.0
    peak = 197e12 if on_tpu else 1e12  # v5e bf16 peak
    _emit("train_step_ms" if on_tpu else "train_step_ms_cpu", step_ms, "ms/step")
    _emit("train_throughput", bsz / (best / n_steps), "samples/sec")
    if on_tpu and flops:
        _emit("train_mfu", 100 * flops / (best / n_steps) / peak,
              "% of bf16 peak (XLA-counted FLOPs)")


# --------------------------------------------------------------------------- #
def bench_continual() -> None:
    import optax

    from nerve_tpu.continual.distillation import ContinualDistillation
    from nerve_tpu.continual.ewc import EWC, compute_fisher
    from nerve_tpu.models import SuperResolutionNet
    from nerve_tpu.utils import data as data_lib

    on_tpu = jax.default_backend() == "tpu"
    bsz, lr_size = (8, 64) if on_tpu else (2, 16)
    n_steps = 20 if on_tpu else 2
    # Same mixed-precision recipe as bench_train: bf16 conv compute, f32
    # params/Fisher/penalties (the EWC/SI state is f32 pytrees either way).
    model = SuperResolutionNet(
        scale_factor=2, num_features=32, num_residual_blocks=4, temporal_window=1,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    data = data_lib.make_sr_dataset(key, bsz, lr_size=lr_size, scale=2)
    lr_win = data_lib.expand_temporal(jnp.asarray(data["lr"]), 3)
    hr = jnp.asarray(data["hr"])
    variables = jax.jit(model.init)(key, lr_win)
    params = variables["params"]

    def apply_fn(p, x):
        return model.apply({**variables, "params": p}, x)

    def loss_fn(p, batch):
        x, y = batch
        return jnp.mean((apply_fn(p, x).astype(jnp.float32) - y) ** 2)

    # One task registered: Fisher + teacher snapshot, like train_continual.
    ewc = EWC(loss_fn, lam=1000.0)
    t0 = time.perf_counter()
    ewc.register_task(0, params, [(lr_win, hr)])
    fisher_s = time.perf_counter() - t0
    distill = ContinualDistillation(apply_fn)
    distill.register_task(params)

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def total_loss(p, x, y, rx, ry):
        task = distill.compute_loss(p, x, y)["total"]
        replay = jnp.mean((apply_fn(p, rx).astype(jnp.float32) - ry) ** 2)
        return task + 0.5 * replay + ewc.penalty(p)

    @jax.jit
    def run_n(p0, o0, x, y):
        def body(carry, _):
            p, o = carry
            loss, g = jax.value_and_grad(total_loss)(p, x, y, x, y)
            updates, o = tx.update(g, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(body, (p0, o0), None, length=n_steps)
        return jnp.sum(losses)

    float(run_n(params, opt_state, lr_win, hr))
    best = _time_best(lambda: float(run_n(params, opt_state, lr_win, hr)))
    _emit("continual_step_ms" if on_tpu else "continual_step_ms_cpu",
          best / n_steps * 1000.0, "ms/step (EWC+distill+replay)")
    _emit("continual_fisher_s", fisher_s, "s (one-batch Fisher, incl compile)")


# --------------------------------------------------------------------------- #
def bench_federated() -> None:
    from nerve_tpu.federated.privacy import PrivacyConfig
    from nerve_tpu.federated.simulation import MeshFederatedSimulation

    on_tpu = jax.default_backend() == "tpu"
    n_clients, dim, n_samples = 8, 512, 64

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w1": jax.random.normal(k1, (dim, dim)) * 0.02,
        "w2": jax.random.normal(k2, (dim, 1)) * 0.02,
    }
    xs = jax.random.normal(k3, (n_clients, n_samples, dim))
    ys = jnp.sum(xs[..., :4], axis=-1, keepdims=True)

    def loss_fn(p, batch):
        x, y = batch
        h = jax.nn.relu(x @ p["w1"])
        return jnp.mean((h @ p["w2"] - y) ** 2)

    sim = MeshFederatedSimulation(
        loss_fn, params, (xs, ys), local_steps=5,
        privacy=PrivacyConfig(max_grad_norm=1.0, noise_multiplier=0.5),
    )
    sim.run_round()  # compile
    best = _time_best(lambda: sim.run_round())
    _emit("fedavg_dp_round_ms" if on_tpu else "fedavg_dp_round_ms_cpu",
          best * 1000.0, f"ms/round ({n_clients} clients, 5 local steps, DP)")


# --------------------------------------------------------------------------- #
def bench_abr() -> None:
    from nerve_tpu.abr.agent import ABRConfig, PPOAgent
    from nerve_tpu.abr.environment import JaxStreamingEnv

    on_tpu = jax.default_backend() == "tpu"
    agent = PPOAgent(config=ABRConfig())
    env = JaxStreamingEnv()
    key = jax.random.PRNGKey(0)

    # Vectorised jitted rollout: 32 envs × 64 steps = 2048 transitions.
    n_envs, n_steps = 32, 64
    traj = agent.rollout_jax(env, num_envs=n_envs, num_steps=n_steps, key=key)
    jax.block_until_ready(jax.tree_util.tree_leaves(traj)[0])
    best_r = _time_best(
        lambda: jax.block_until_ready(
            jax.tree_util.tree_leaves(
                agent.rollout_jax(env, num_envs=n_envs, num_steps=n_steps, key=key)
            )[0]
        )
    )
    _emit("abr_rollout_steps_per_s" if on_tpu else "abr_rollout_steps_per_s_cpu",
          n_envs * n_steps / best_r, "env steps/sec (jitted vectorised)")

    batch = {
        k: jnp.reshape(v, (n_envs * n_steps,) + v.shape[2:]) for k, v in traj.items()
    }

    def once():
        p, o, metrics = agent._update(agent.params, agent.opt_state, batch)
        jax.block_until_ready(p)

    once()  # compile
    best_u = _time_best(once)
    _emit("abr_ppo_update_ms" if on_tpu else "abr_ppo_update_ms_cpu",
          best_u * 1000.0, f"ms/update ({n_envs * n_steps} transitions)")


# --------------------------------------------------------------------------- #
def bench_sr_full(quantized: bool = False, quantized_chains: bool = False,
                  pair: bool = False) -> None:
    """Config #1 full pipeline: SuperResolutionNet 1080p→2160p streaming.

    The flagship model's streaming serving path (feature-reuse carry, coarse
    flow, packed MXU depth-to-space, every frame materialised). With
    ``quantized`` the RDB chain runs the int8 path (nerve_tpu.ops.rdb_int8);
    ``pair`` runs the b2 schedule (two frames per scan step, batched tail —
    streaming.streaming_step_pair, +1 frame latency).
    """
    from nerve_tpu.models import SuperResolutionNet
    from nerve_tpu.models.quantize import quantize_sr_variables
    from nerve_tpu.models.streaming import (
        streaming_prime, streaming_step, streaming_step_pair,
    )

    on_tpu = jax.default_backend() == "tpu"
    h, w = (1080, 1920) if on_tpu else (72, 128)
    n_frames = 16 if on_tpu else 2

    model = SuperResolutionNet(
        scale_factor=2, num_features=64, num_residual_blocks=8,
        temporal_window=1, flow_downsample=2, quantized=quantized,
        quantized_chains=quantized_chains,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (1, 3, h, w, 3), jnp.float32)
    variables = jax.jit(
        model.clone(quantized=False, quantized_chains=False).init
    )(key, frames)
    if quantized or quantized_chains:
        # Calibrate on a downscaled window (cheap; per-tensor max-abs).
        variables = quantize_sr_variables(model, variables, frames[:, :, :270, :480])

    @jax.jit
    def run_n(v, x):
        carry0 = streaming_prime(model, v, x[:, 0])

        def body(state, _):
            carry, frame, acc = state
            carry, out = streaming_step(model, v, carry, frame, "packed")
            s = jnp.mean(out[0, :64, :64], dtype=jnp.float32)
            bump = frame[:1, :1, :1, :1] + (s * 1e-12).astype(frame.dtype)
            frame = jax.lax.dynamic_update_slice(frame, bump, (0, 0, 0, 0))
            return (carry, frame, acc + s), out

        (_, _, acc), ys = jax.lax.scan(
            body, (carry0, x[:, 1], jnp.float32(0)), None, length=n_frames
        )
        return acc + jnp.float32(ys[-1, 0, -1, -1])

    @jax.jit
    def run_n_pair(v, x):
        carry0 = streaming_prime(model, v, x[:, 0])

        def body(state, _):
            carry, frame, acc = state
            carry, (o1, o2) = streaming_step_pair(
                model, v, carry, frame, x[:, 2], "packed"
            )
            s = jnp.mean(o1[0, :64, :64], dtype=jnp.float32) + jnp.mean(
                o2[0, :64, :64], dtype=jnp.float32
            )
            bump = frame[:1, :1, :1, :1] + (s * 1e-12).astype(frame.dtype)
            frame = jax.lax.dynamic_update_slice(frame, bump, (0, 0, 0, 0))
            return (carry, frame, acc + s), (o1, o2)

        (_, _, acc), (y1, y2) = jax.lax.scan(
            body, (carry0, x[:, 1], jnp.float32(0)), None, length=n_frames // 2
        )
        return acc + jnp.float32(y1[-1, 0, -1, -1]) + jnp.float32(y2[-1, 0, -1, -1])

    run = run_n_pair if pair else run_n
    float(run(variables, frames))
    best = _time_best(lambda: float(run(variables, frames)))
    fps = n_frames / best
    tag = (
        "int8full" if quantized_chains else ("int8" if quantized else "bf16")
    ) + ("_b2" if pair else "")
    _emit(
        f"sr_full_1080p_2x_fps_{tag}" if on_tpu else f"sr_full_proxy_fps_cpu_{tag}",
        fps, "frames/sec/chip", fps / 60.0,
    )


def bench_sr_full_int8() -> None:
    bench_sr_full(quantized=True)


def bench_sr_full_int8_chains() -> None:
    """int8 everywhere the fused chains run: RDB stack + head/flow/attention/
    gff/upsampler (VERDICT r3 item #2 — extend int8 past the RDB chain)."""
    bench_sr_full(quantized=True, quantized_chains=True)


def bench_sr_full_b2() -> None:
    bench_sr_full(pair=True)


def bench_sr_full_int8_b2() -> None:
    bench_sr_full(quantized=True, pair=True)


ALL = {
    "sr_full": bench_sr_full,
    "sr_full_int8": bench_sr_full_int8,
    "sr_full_int8full": bench_sr_full_int8_chains,
    "sr_full_b2": bench_sr_full_b2,
    "sr_full_int8_b2": bench_sr_full_int8_b2,
    "lightweight": bench_lightweight,
    "engine": bench_engine,
    "train": bench_train,
    "continual": bench_continual,
    "federated": bench_federated,
    "abr": bench_abr,
}


def main() -> None:
    from nerve_tpu.utils.platform_guard import guard_against_wedged_tunnel

    guard_against_wedged_tunnel()
    names = sys.argv[1:] or list(ALL)
    for name in names:
        try:
            ALL[name]()
        except Exception as e:  # noqa: BLE001
            _emit(f"{name}_FAILED", 0.0, f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
