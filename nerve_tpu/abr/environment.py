"""Video-streaming simulator for ABR decision making.

Behavioural parity with the reference's ``StreamingEnv``
(nerve_cl/abr/environment.py:20-150):

  * obs (7,): [buffer/30, min(bw/20,1), battery, last_q/num_q, vmaf/100,
    content complexity ~ U(0.3,0.8) drawn fresh per observation (the
    reference does this too — environment.py:92 — we keep it for parity and
    document it), progress].
  * action MultiDiscrete([num_qualities, 5 enhancement levels]).
  * step: download_time = bitrate·4s / (bw·1000); rebuffer = max(0, −buffer);
    buffer ← min(max(buffer,0)+4, 30); VMAF = 50 + idx/num_q·40 + enh·10
    (cap 100); battery −= 0.01 + 0.02·enh; reward = vmaf/100 − 10·rebuffer −
    0.1·|Δq| + 0.1·battery; bandwidth ← clip(bw·U(0.8,1.2), 0.5, 50);
    terminated at max_steps, truncated at battery 0.

Two implementations:

  * :class:`StreamingEnv` — Gymnasium-API numpy env (drop-in for reference
    users; subclasses ``gymnasium.Env`` when gymnasium is installed).
  * :class:`JaxStreamingEnv` — the TPU-native functional twin: explicit state
    pytree, ``jit``/``vmap``-able ``reset``/``step``, so thousands of
    parallel streams advance in one XLA program (see PPOAgent.rollout_jax).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # gymnasium API when available (it is in the reference's dep set)
    import gymnasium as gym
    from gymnasium import spaces

    _GYM_BASE = gym.Env
except Exception:  # pragma: no cover - gymnasium always present in CI image
    gym = None
    spaces = None
    _GYM_BASE = object


@dataclasses.dataclass
class QualityLevel:
    """(resolution, bitrate kbps) — parity: environment.py:13-17."""

    resolution: int
    bitrate: float


DEFAULT_LADDER: Tuple[QualityLevel, ...] = (
    QualityLevel(360, 365),
    QualityLevel(480, 750),
    QualityLevel(720, 1500),
    QualityLevel(1080, 3000),
    QualityLevel(1440, 6000),
)


class StreamingEnv(_GYM_BASE):
    """Gymnasium-compatible ABR environment (numpy, single stream)."""

    metadata = {"render_modes": ["human"]}

    def __init__(
        self,
        quality_ladder: Optional[List[QualityLevel]] = None,
        segment_duration: float = 4.0,
        buffer_size: float = 30.0,
        max_steps: int = 100,
    ):
        self.quality_ladder = list(quality_ladder or DEFAULT_LADDER)
        self.segment_duration = segment_duration
        self.buffer_size = buffer_size
        self.max_steps = max_steps
        self.num_qualities = len(self.quality_ladder)
        self.enhancement_levels = 5

        if spaces is not None:
            self.action_space = spaces.MultiDiscrete(
                [self.num_qualities, self.enhancement_levels]
            )
            self.observation_space = spaces.Box(0.0, 1.0, shape=(7,), dtype=np.float32)

        self._np_random = np.random.default_rng()
        self.reset()

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        if seed is not None:
            self._np_random = np.random.default_rng(seed)
        self.buffer_level = 10.0
        self.bandwidth = float(self._np_random.uniform(2, 15))
        self.battery = 1.0
        self.last_quality = 2
        self.last_vmaf = 70.0
        self.step_count = 0
        self.total_rebuffer = 0.0
        return self._get_obs(), {}

    def _get_obs(self) -> np.ndarray:
        return np.array(
            [
                self.buffer_level / self.buffer_size,
                min(self.bandwidth / 20.0, 1.0),
                self.battery,
                self.last_quality / self.num_qualities,
                self.last_vmaf / 100.0,
                self._np_random.uniform(0.3, 0.8),  # fresh noise per obs (parity)
                self.step_count / self.max_steps,
            ],
            dtype=np.float32,
        )

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool, Dict[str, Any]]:
        quality_idx = int(action[0])
        enhancement = float(action[1]) / (self.enhancement_levels - 1)
        quality = self.quality_ladder[quality_idx]

        chunk_kbits = quality.bitrate * self.segment_duration
        download_time = chunk_kbits / (self.bandwidth * 1000.0)

        self.buffer_level -= download_time
        rebuffer = max(0.0, -self.buffer_level)
        self.total_rebuffer += rebuffer
        self.buffer_level = min(
            max(self.buffer_level, 0.0) + self.segment_duration, self.buffer_size
        )

        base_vmaf = 50.0 + (quality_idx / self.num_qualities) * 40.0
        self.last_vmaf = min(base_vmaf + enhancement * 10.0, 100.0)

        self.battery = max(0.0, self.battery - (0.01 + enhancement * 0.02))

        reward = (
            self.last_vmaf / 100.0
            - rebuffer * 10.0
            - abs(quality_idx - self.last_quality) * 0.1
            + self.battery * 0.1
        )

        self.last_quality = quality_idx
        self.step_count += 1
        self.bandwidth = float(
            np.clip(self.bandwidth * self._np_random.uniform(0.8, 1.2), 0.5, 50.0)
        )

        terminated = self.step_count >= self.max_steps
        truncated = self.battery <= 0.0
        info = {
            "vmaf": self.last_vmaf,
            "rebuffer": rebuffer,
            "bandwidth": self.bandwidth,
            "buffer": self.buffer_level,
        }
        return self._get_obs(), float(reward), terminated, truncated, info


def make_env(env_id: str = "Streaming-v0", **kwargs) -> StreamingEnv:
    """Factory (parity: environment.py:153-155)."""
    return StreamingEnv(**kwargs)


# --------------------------------------------------------------------------- #
# Pure-JAX vectorised environment
# --------------------------------------------------------------------------- #


class StreamState(NamedTuple):
    buffer_level: jnp.ndarray
    bandwidth: jnp.ndarray
    battery: jnp.ndarray
    last_quality: jnp.ndarray
    last_vmaf: jnp.ndarray
    step_count: jnp.ndarray
    total_rebuffer: jnp.ndarray


class JaxStreamingEnv:
    """Functional, jit/vmap-able twin of :class:`StreamingEnv`.

    All methods are pure: state in, state out. Batch by ``vmap`` over the
    state pytree and RNG keys; an entire PPO rollout then compiles into a
    single ``lax.scan``.
    """

    def __init__(
        self,
        quality_ladder: Optional[List[QualityLevel]] = None,
        segment_duration: float = 4.0,
        buffer_size: float = 30.0,
        max_steps: int = 100,
    ):
        ladder = list(quality_ladder or DEFAULT_LADDER)
        self.bitrates = jnp.asarray([q.bitrate for q in ladder], jnp.float32)
        self.num_qualities = len(ladder)
        self.enhancement_levels = 5
        self.segment_duration = segment_duration
        self.buffer_size = buffer_size
        self.max_steps = max_steps
        self.obs_dim = 7
        self.action_dims = (self.num_qualities, self.enhancement_levels)

    def reset(self, key: jax.Array) -> Tuple[StreamState, jnp.ndarray]:
        k_bw, k_obs = jax.random.split(key)
        state = StreamState(
            buffer_level=jnp.float32(10.0),
            bandwidth=jax.random.uniform(k_bw, (), jnp.float32, 2.0, 15.0),
            battery=jnp.float32(1.0),
            last_quality=jnp.int32(2),
            last_vmaf=jnp.float32(70.0),
            step_count=jnp.int32(0),
            total_rebuffer=jnp.float32(0.0),
        )
        return state, self._obs(state, k_obs)

    def _obs(self, s: StreamState, key: jax.Array) -> jnp.ndarray:
        return jnp.stack(
            [
                s.buffer_level / self.buffer_size,
                jnp.minimum(s.bandwidth / 20.0, 1.0),
                s.battery,
                s.last_quality.astype(jnp.float32) / self.num_qualities,
                s.last_vmaf / 100.0,
                jax.random.uniform(key, (), jnp.float32, 0.3, 0.8),
                s.step_count.astype(jnp.float32) / self.max_steps,
            ]
        )

    def step(
        self, state: StreamState, action: jnp.ndarray, key: jax.Array
    ) -> Tuple[StreamState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
        k_bw, k_obs = jax.random.split(key)
        q_idx = action[0].astype(jnp.int32)
        enh = action[1].astype(jnp.float32) / (self.enhancement_levels - 1)

        chunk_kbits = self.bitrates[q_idx] * self.segment_duration
        download_time = chunk_kbits / (state.bandwidth * 1000.0)

        buf = state.buffer_level - download_time
        rebuffer = jnp.maximum(0.0, -buf)
        buf = jnp.minimum(jnp.maximum(buf, 0.0) + self.segment_duration, self.buffer_size)

        vmaf = jnp.minimum(
            50.0 + (q_idx.astype(jnp.float32) / self.num_qualities) * 40.0 + enh * 10.0,
            100.0,
        )
        battery = jnp.maximum(0.0, state.battery - (0.01 + enh * 0.02))

        reward = (
            vmaf / 100.0
            - rebuffer * 10.0
            - jnp.abs(q_idx - state.last_quality).astype(jnp.float32) * 0.1
            + battery * 0.1
        )

        bandwidth = jnp.clip(
            state.bandwidth * jax.random.uniform(k_bw, (), jnp.float32, 0.8, 1.2),
            0.5,
            50.0,
        )
        new_state = StreamState(
            buffer_level=buf,
            bandwidth=bandwidth,
            battery=battery,
            last_quality=q_idx,
            last_vmaf=vmaf,
            step_count=state.step_count + 1,
            total_rebuffer=state.total_rebuffer + rebuffer,
        )
        terminated = new_state.step_count >= self.max_steps
        truncated = battery <= 0.0
        info = {"vmaf": vmaf, "rebuffer": rebuffer, "bandwidth": bandwidth, "buffer": buf}
        return new_state, self._obs(new_state, k_obs), reward, terminated, truncated, info

    def auto_reset_step(
        self, state: StreamState, action: jnp.ndarray, key: jax.Array
    ):
        """step() that resets finished streams — for continuous vmapped rollouts."""
        k_step, k_reset = jax.random.split(key)
        new_state, obs, reward, term, trunc, info = self.step(state, action, k_step)
        done = jnp.logical_or(term, trunc)
        reset_state, reset_obs = self.reset(k_reset)
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), reset_state, new_state
        )
        obs = jnp.where(done, reset_obs, obs)
        return merged, obs, reward, done, info
