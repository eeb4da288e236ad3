"""Continual-learning subsystem.

Parity with the reference's ``nerve_cl/continual`` public interface
(nerve_cl/continual/__init__.py:1-23): episodic replay memory, EWC /
Online-EWC / Synaptic Intelligence, MAML / FOMAML / Reptile (+
ContentAdaptiveMAML), knowledge distillation — re-designed as jitted pytree
update rules: the reference's Python dict-of-parameter loops
(e.g. EWC.penalty, ewc.py:195-232) become single fused ``tree_map`` programs,
and MAML's deepcopy-based inner loop (maml.py:74-110) becomes a functional
unrolled-SGD transform differentiated by plain ``jax.grad`` (no ``higher``
dependency needed).
"""

from nerve_tpu.continual.memory import (  # noqa: F401
    EpisodicMemory,
    MemorySample,
    StreamingEpisodicMemory,
)
from nerve_tpu.continual.ewc import EWC, OnlineEWC, SynapticIntelligence  # noqa: F401
from nerve_tpu.continual.maml import (  # noqa: F401
    ContentAdaptiveMAML,
    FOMAML,
    MAML,
    Reptile,
)
from nerve_tpu.continual.distillation import (  # noqa: F401
    ContinualDistillation,
    DistillationLoss,
)
