"""PPO agent for adaptive bitrate control.

Re-design of nerve_cl/abr/agent.py:12-214:

  * :class:`ActorCritic` — shared MLP trunk, one categorical head per action
    dimension (quality, enhancement), scalar value head; log-probs summed
    across dimensions (parity: agent.py:24-89).
  * :class:`PPOAgent` — PPO with clipped surrogate + value MSE − entropy
    bonus, GAE(γ, λ) with zero bootstrap, advantage normalisation, gradient
    clipping (parity: agent.py:92-203) — but the whole update (GAE reverse
    pass as ``lax.scan`` + all epochs as an inner scan) is ONE jitted
    program, and the rollout buffer is preallocated fixed-shape numpy, so
    nothing reallocates per step.
  * :meth:`PPOAgent.rollout_jax` — the TPU-native extra: vectorised
    environment rollout where policy forward + env step for N parallel
    streams × T steps compile into a single ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerve_tpu.abr.environment import JaxStreamingEnv


@dataclasses.dataclass(frozen=True)
class ABRConfig:
    """Parity: agent.py:12-21."""

    hidden_dims: Tuple[int, ...] = (256, 256)
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_ratio: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    update_epochs: int = 10
    max_grad_norm: float = 0.5
    buffer_capacity: int = 2048


class ActorCritic(nn.Module):
    """Shared trunk → per-dimension categorical policy heads + value head."""

    action_dims: Tuple[int, ...] = (5, 5)
    hidden_dims: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = obs
        for i, h in enumerate(self.hidden_dims):
            x = nn.tanh(nn.Dense(h, name=f"trunk{i}")(x))
        logits = [
            nn.Dense(d, name=f"policy{i}")(x) for i, d in enumerate(self.action_dims)
        ]
        value = nn.Dense(1, name="value")(x)[..., 0]
        return logits, value


def _dist_stats(logits: Sequence[jnp.ndarray], actions: jnp.ndarray):
    """Sum of per-dimension log-probs and entropies for MultiDiscrete actions."""
    logp = jnp.zeros(actions.shape[:-1])
    entropy = jnp.zeros(actions.shape[:-1])
    for i, lg in enumerate(logits):
        log_probs = jax.nn.log_softmax(lg, axis=-1)
        logp = logp + jnp.take_along_axis(
            log_probs, actions[..., i : i + 1], axis=-1
        )[..., 0]
        probs = jnp.exp(log_probs)
        entropy = entropy - jnp.sum(probs * log_probs, axis=-1)
    return logp, entropy


class PPOAgent:
    """PPO over MultiDiscrete actions with a jitted fused update."""

    def __init__(
        self,
        obs_dim: int = 7,
        action_dims: Tuple[int, ...] = (5, 5),
        config: Optional[ABRConfig] = None,
        seed: int = 0,
    ):
        self.config = config or ABRConfig()
        self.obs_dim = obs_dim
        self.action_dims = tuple(action_dims)
        self.network = ActorCritic(self.action_dims, self.config.hidden_dims)
        key = jax.random.PRNGKey(seed)
        self.params = self.network.init(key, jnp.zeros((1, obs_dim)))["params"]
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.config.max_grad_norm),
            optax.adam(self.config.learning_rate),
        )
        self.opt_state = self.tx.init(self.params)
        self._key = jax.random.PRNGKey(seed + 1)

        # Preallocated fixed-shape rollout buffer (reference: python lists,
        # agent.py:113-117).
        cap = self.config.buffer_capacity
        self._buf = {
            "obs": np.zeros((cap, obs_dim), np.float32),
            "actions": np.zeros((cap, len(action_dims)), np.int32),
            "logp": np.zeros((cap,), np.float32),
            "value": np.zeros((cap,), np.float32),
            "reward": np.zeros((cap,), np.float32),
            "done": np.zeros((cap,), np.float32),
        }
        self._size = 0

        cfg = self.config
        network = self.network

        @jax.jit
        def act(params, key, obs, deterministic):
            logits, value = network.apply({"params": params}, obs[None])
            keys = jax.random.split(key, len(logits))
            actions = []
            for lg, k in zip(logits, keys):
                sampled = jax.random.categorical(k, lg[0])
                greedy = jnp.argmax(lg[0])
                actions.append(jnp.where(deterministic, greedy, sampled))
            action = jnp.stack(actions).astype(jnp.int32)
            logp, _ = _dist_stats([l[0] for l in logits], action)
            return action, logp, value[0]

        self._act = act

        def gae(rewards, values, dones):
            """GAE with zero bootstrap value (parity: agent.py:188-203)."""

            def backstep(carry, xs):
                adv_next, v_next = carry
                r, v, d = xs
                nonterminal = 1.0 - d
                delta = r + cfg.gamma * v_next * nonterminal - v
                adv = delta + cfg.gamma * cfg.gae_lambda * nonterminal * adv_next
                return (adv, v), adv

            (_, _), advs = jax.lax.scan(
                backstep,
                (jnp.float32(0.0), jnp.float32(0.0)),
                (rewards, values, dones),
                reverse=True,
            )
            return advs

        @jax.jit
        def update(params, opt_state, batch):
            rewards, values, dones = batch["reward"], batch["value"], batch["done"]
            advantages = gae(rewards, values, dones)
            returns = advantages + values
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

            def epoch_step(carry, _):
                p, o = carry

                def loss_fn(pp):
                    logits, value = network.apply({"params": pp}, batch["obs"])
                    logp, entropy = _dist_stats(logits, batch["actions"])
                    ratio = jnp.exp(logp - batch["logp"])
                    clipped = jnp.clip(ratio, 1 - cfg.clip_ratio, 1 + cfg.clip_ratio)
                    policy_loss = -jnp.mean(
                        jnp.minimum(ratio * advantages, clipped * advantages)
                    )
                    value_loss = jnp.mean((value - returns) ** 2)
                    ent = jnp.mean(entropy)
                    total = (
                        policy_loss
                        + cfg.value_coef * value_loss
                        - cfg.entropy_coef * ent
                    )
                    return total, (policy_loss, value_loss, ent)

                (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
                updates, o = self.tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), (total, *aux)

            (params, opt_state), losses = jax.lax.scan(
                epoch_step, (params, opt_state), None, length=cfg.update_epochs
            )
            metrics = {
                "loss": losses[0][-1],
                "policy_loss": losses[1][-1],
                "value_loss": losses[2][-1],
                "entropy": losses[3][-1],
            }
            return params, opt_state, metrics

        self._update = update

    # ------------------------------------------------------------------ #
    # Acting / experience
    # ------------------------------------------------------------------ #
    def select_action(
        self, obs: np.ndarray, deterministic: bool = False
    ) -> np.ndarray:
        """Sample (or argmax) an action; stores stats when stochastic
        (parity: agent.py:119-132)."""
        self._key, sub = jax.random.split(self._key)
        action, logp, value = self._act(
            self.params, sub, jnp.asarray(obs, jnp.float32), deterministic
        )
        action = np.asarray(action)
        if not deterministic:
            self._pending = (np.asarray(obs, np.float32), action, float(logp), float(value))
        return action

    def store_transition(self, reward: float, done: bool) -> None:
        """Append the last stochastic action's transition (parity: :134-137)."""
        if self._size >= self.config.buffer_capacity:
            return
        obs, action, logp, value = self._pending
        i = self._size
        self._buf["obs"][i] = obs
        self._buf["actions"][i] = action
        self._buf["logp"][i] = logp
        self._buf["value"][i] = value
        self._buf["reward"][i] = reward
        self._buf["done"][i] = float(done)
        self._size += 1

    @property
    def buffer_size(self) -> int:
        return self._size

    def update(self) -> Dict[str, float]:
        """Run the fused PPO update over the buffer, then clear it
        (parity: agent.py:139-186)."""
        if self._size == 0:
            return {}
        batch = {k: jnp.asarray(v[: self._size]) for k, v in self._buf.items()}
        self.params, self.opt_state, metrics = self._update(
            self.params, self.opt_state, batch
        )
        self._size = 0
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------ #
    # TPU-native vectorised rollout
    # ------------------------------------------------------------------ #
    def rollout_jax(
        self, env: JaxStreamingEnv, num_envs: int, num_steps: int, key: jax.Array
    ):
        """Collect (num_steps, num_envs) experience in ONE jitted scan.

        Returns stacked arrays shaped (T, N, ...) ready for :meth:`update`
        after flattening — or for a fully on-device PPO iteration.
        """
        network = self.network

        def run(params, key):
            keys = jax.random.split(key, num_envs)
            states, obs = jax.vmap(env.reset)(keys)

            def step_fn(carry, step_key):
                states, obs = carry
                logits, values = network.apply({"params": params}, obs)
                ks = jax.random.split(step_key, num_envs * (len(logits) + 1)).reshape(
                    num_envs, len(logits) + 1, 2
                )
                actions = jnp.stack(
                    [
                        jax.vmap(jax.random.categorical)(ks[:, i], lg)
                        for i, lg in enumerate(logits)
                    ],
                    axis=-1,
                ).astype(jnp.int32)
                logp, _ = _dist_stats(logits, actions)
                new_states, new_obs, rewards, dones, _ = jax.vmap(env.auto_reset_step)(
                    states, actions, ks[:, -1]
                )
                out = {
                    "obs": obs,
                    "actions": actions,
                    "logp": logp,
                    "value": values,
                    "reward": rewards,
                    "done": dones.astype(jnp.float32),
                }
                return (new_states, new_obs), out

            step_keys = jax.random.split(key, num_steps)
            _, traj = jax.lax.scan(step_fn, (states, obs), step_keys)
            return traj

        return jax.jit(run)(self.params, key)

    # ------------------------------------------------------------------ #
    # Checkpointing (parity: agent.py:205-214)
    # ------------------------------------------------------------------ #
    def save(self, path: str) -> None:
        leaves = jax.tree_util.tree_leaves((self.params, self.opt_state))
        np.savez(path, *[np.asarray(l) for l in leaves])

    def load(self, path: str) -> None:
        z = np.load(path)
        arrays = [z[k] for k in sorted(z.files, key=lambda s: int(s.split("_")[1]))]
        template = (self.params, self.opt_state)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = [
            jnp.asarray(a, l.dtype).reshape(l.shape) for a, l in zip(arrays, leaves)
        ]
        self.params, self.opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
