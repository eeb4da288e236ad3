"""Knowledge distillation for continual learning.

Re-design of nerve_cl/continual/distillation.py:13-71. The reference freezes a
deepcopy of the student module as teacher (:48-54); here the "teacher" is just
a frozen parameter pytree and the combined loss is a pure function that slots
straight into any jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

Params = Any
ApplyFn = Callable[[Params, Any], jnp.ndarray]


class DistillationLoss:
    """MSE distillation with optional task-loss blending.

    Parity: distillation.py:13-36 — loss = α·MSE(student, stop_grad(teacher))
    + (1-α)·task_loss when a target is given, else pure distillation. The
    ``temperature`` is held for API parity; like the reference it is unused by
    the MSE formulation (it matters for logit distillation).
    """

    def __init__(self, temperature: float = 4.0, alpha: float = 0.5):
        self.temperature = temperature
        self.alpha = alpha

    def __call__(
        self,
        student_out: jnp.ndarray,
        teacher_out: jnp.ndarray,
        target: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        distill = jnp.mean(
            (student_out.astype(jnp.float32) - jax.lax.stop_gradient(teacher_out).astype(jnp.float32)) ** 2
        )
        if target is None:
            return distill
        task = jnp.mean((student_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        return self.alpha * distill + (1.0 - self.alpha) * task


class ContinualDistillation:
    """Teacher-snapshot distillation across tasks (parity: distillation.py:39-71)."""

    def __init__(self, apply_fn: ApplyFn, temperature: float = 4.0, alpha: float = 0.5):
        self.apply_fn = apply_fn
        self.loss = DistillationLoss(temperature, alpha)
        self.teacher_params: Optional[Params] = None
        self.num_tasks = 0

    def register_task(self, student_params: Params) -> None:
        """Snapshot the student as the frozen teacher (parity: :48-54)."""
        self.teacher_params = jax.lax.stop_gradient(student_params)
        self.num_tasks += 1

    def compute_loss(
        self, student_params: Params, inputs: Any, target: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """{'task', 'distill', 'total'} (parity: :56-71)."""
        student_out = self.apply_fn(student_params, inputs)
        task = jnp.mean((student_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        if self.teacher_params is None:
            zero = jnp.float32(0.0)
            return {"task": task, "distill": zero, "total": task}
        teacher_out = self.apply_fn(self.teacher_params, inputs)
        distill = self.loss(student_out, teacher_out)
        total = self.loss.alpha * distill + (1.0 - self.loss.alpha) * task
        return {"task": task, "distill": distill, "total": total}
