#!/usr/bin/env python
"""PPO training for the ABR streaming agent.

Parity with the reference's experiments/train_abr.py: step loop storing
transitions, update at episode end once the buffer holds ≥64 transitions,
and an eval mode running 10 deterministic episodes. The ``--vectorized`` flag
switches to the TPU-native path: rollouts of N parallel pure-JAX environments
collected in a single jitted scan.
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
import numpy as np

from nerve_tpu.abr import ABRConfig, JaxStreamingEnv, PPOAgent, StreamingEnv


def build_argparser():
    p = argparse.ArgumentParser(description="NERVE-TPU ABR PPO training")
    p.add_argument("--mode", choices=["train", "eval"], default="train")
    p.add_argument("--num-steps", type=int, default=5000)
    p.add_argument("--vectorized", action="store_true")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--checkpoint", default="checkpoints/abr_ppo.npz")
    p.add_argument("--seed", type=int, default=42)
    return p


def train_sequential(agent: PPOAgent, args) -> dict:
    env = StreamingEnv()
    obs, _ = env.reset(seed=args.seed)
    episode_reward, episode_rewards = 0.0, []
    for step in range(args.num_steps):
        action = agent.select_action(obs)
        obs, reward, term, trunc, info = env.step(action)
        agent.store_transition(reward, term or trunc)
        episode_reward += reward
        if term or trunc:
            episode_rewards.append(episode_reward)
            episode_reward = 0.0
            if agent.buffer_size >= 64:
                metrics = agent.update()
                print(
                    f"step {step}: episodes={len(episode_rewards)} "
                    f"mean_return={np.mean(episode_rewards[-10:]):.2f} "
                    f"loss={metrics.get('loss', float('nan')):.4f}"
                )
            obs, _ = env.reset()
    return {"episodes": len(episode_rewards),
            "mean_return_last10": float(np.mean(episode_rewards[-10:]))}


def train_vectorized(agent: PPOAgent, args) -> dict:
    """N parallel pure-JAX streams; each iteration = one jitted rollout scan
    followed by one fused PPO update."""
    env = JaxStreamingEnv()
    key = jax.random.PRNGKey(args.seed)
    steps_per_iter = agent.config.buffer_capacity // args.num_envs
    iters = max(1, args.num_steps // (steps_per_iter * args.num_envs))
    mean_reward = float("nan")
    for it in range(iters):
        key, sub = jax.random.split(key)
        traj = agent.rollout_jax(env, args.num_envs, steps_per_iter, sub)
        flat = {k: np.asarray(v).reshape((-1,) + v.shape[2:]) for k, v in traj.items()}
        n = len(flat["obs"])
        agent._buf = {k: np.asarray(v) for k, v in flat.items()}
        agent._size = n
        metrics = agent.update()
        mean_reward = float(np.mean(flat["reward"]))
        print(f"iter {it}: mean_step_reward={mean_reward:.3f} "
              f"loss={metrics['loss']:.4f} entropy={metrics['entropy']:.3f}")
    return {"iters": iters, "mean_step_reward": mean_reward}


def evaluate(agent: PPOAgent, args, episodes: int = 10) -> dict:
    env = StreamingEnv()
    returns, vmafs, rebuffers = [], [], []
    for ep in range(episodes):
        obs, _ = env.reset(seed=args.seed + ep)
        total, done = 0.0, False
        while not done:
            action = agent.select_action(obs, deterministic=True)
            obs, reward, term, trunc, info = env.step(action)
            total += reward
            vmafs.append(info["vmaf"])
            done = term or trunc
        rebuffers.append(env.total_rebuffer)
        returns.append(total)
    out = {
        "mean_return": float(np.mean(returns)),
        "mean_vmaf": float(np.mean(vmafs)),
        "mean_rebuffer": float(np.mean(rebuffers)),
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    args = build_argparser().parse_args(argv)
    agent = PPOAgent(config=ABRConfig(), seed=args.seed)
    if args.mode == "train":
        out = (train_vectorized if args.vectorized else train_sequential)(agent, args)
        import os

        os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)
        agent.save(args.checkpoint)
        print(json.dumps(out))
        return out
    try:
        agent.load(args.checkpoint)
    except FileNotFoundError:
        print("no checkpoint found; evaluating untrained agent")
    return evaluate(agent, args)


if __name__ == "__main__":
    main()
