"""Adaptive-bitrate (ABR) reinforcement-learning subsystem.

Parity with nerve_cl/abr (interface nerve_cl/abr/__init__.py:1-13):
``StreamingEnv`` / ``QualityLevel`` / ``make_env`` and ``PPOAgent`` /
``ActorCritic`` / ``ABRConfig`` — plus a pure-JAX vectorised environment
(:class:`JaxStreamingEnv`) so whole rollouts run as one jitted scan on TPU,
something the reference's eager numpy env + per-step torch forward cannot do.
"""

from nerve_tpu.abr.environment import (  # noqa: F401
    JaxStreamingEnv,
    QualityLevel,
    StreamingEnv,
    make_env,
)
from nerve_tpu.abr.agent import ABRConfig, ActorCritic, PPOAgent  # noqa: F401
