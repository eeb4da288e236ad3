"""Elastic Weight Consolidation and Synaptic Intelligence as pytree rules.

Re-design of nerve_cl/continual/ewc.py:19-379. The reference iterates Python
dicts of named parameters for Fisher accumulation and penalties (ewc.py:73-149,
:195-232); here Fisher, optimal params, and path-integral importances are
plain pytrees living beside the train state, and every operation — Fisher
accumulation, EMA merge, penalty — is a single jitted ``tree_map`` program
that XLA fuses into the training step.

Improvement over the reference: the reference's EWC cannot drive the real
video models at all (its ``compute_fisher`` assumes a 4-D single-tensor
forward and crashes on EnhancementEngine — verified defect, SURVEY.md §7).
Here Fisher is computed through an arbitrary user-supplied
``loss_fn(params, batch)``, so it works against any model's true temporal
forward. A ``per_sample=True`` mode computes the proper per-example empirical
Fisher via ``vmap(grad)`` (the reference squares *batch* gradients).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp

Params = Any
LossFn = Callable[[Params, Any], jnp.ndarray]


def _zeros_like_tree(tree: Params) -> Params:
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def compute_fisher(
    loss_fn: LossFn,
    params: Params,
    batches: Iterable[Any],
    per_sample: bool = False,
) -> Params:
    """Diagonal empirical Fisher: mean of squared gradients over batches.

    Parity: EWC.compute_fisher (ewc.py:73-149) — accumulate grad² of the task
    loss over a data pass, normalised by batch count.

    Args:
        loss_fn: (params, batch) → scalar loss. For per_sample=True it must
            accept a batch of ONE sample (leading dim 1) and reduce over it.
        params: parameter pytree θ.
        batches: iterable of batches.
        per_sample: True computes E[∇log p per-sample ²] via vmap(grad) — the
            statistically correct Fisher the reference approximates.
    """
    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def batch_sq_grads(p, batch):
        g = grad_fn(p, batch)
        return jax.tree_util.tree_map(lambda x: x * x, g)

    @jax.jit
    def per_sample_sq_grads(p, batch):
        def single(one):
            one = jax.tree_util.tree_map(lambda x: x[None], one)
            return grad_fn(p, one)

        gs = jax.vmap(single)(batch)
        return jax.tree_util.tree_map(lambda x: jnp.mean(x * x, axis=0), gs)

    fisher = _zeros_like_tree(params)
    n = 0
    for batch in batches:
        sq = per_sample_sq_grads(params, batch) if per_sample else batch_sq_grads(params, batch)
        fisher = jax.tree_util.tree_map(jnp.add, fisher, sq)
        n += 1
    if n == 0:
        return fisher
    return jax.tree_util.tree_map(lambda f: f / n, fisher)


@jax.jit
def ewc_quadratic(params: Params, fisher: Params, optimal: Params) -> jnp.ndarray:
    """Σ F · (θ - θ*)² as one fused tree reduction."""
    sq = jax.tree_util.tree_map(
        lambda p, f, o: jnp.sum(f * (p - o) ** 2), params, fisher, optimal
    )
    return jax.tree_util.tree_reduce(jnp.add, sq, jnp.float32(0.0))


class EWC:
    """Elastic Weight Consolidation (parity: ewc.py:19-288).

    Modes:
      * 'online' (default): one running Fisher/optimal pair, EMA-merged with
        ``decay`` at each task registration (parity: :151-193).
      * 'separate': per-task Fisher + optimal kept; penalty sums over tasks.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        lam: float = 5000.0,
        mode: str = "online",
        decay: float = 0.999,
        per_sample_fisher: bool = False,
    ):
        if mode not in ("online", "separate"):
            raise ValueError(f"mode must be online|separate, got {mode!r}")
        self.loss_fn = loss_fn
        self.lam = lam
        self.mode = mode
        self.decay = decay
        self.per_sample_fisher = per_sample_fisher
        self.num_tasks = 0
        # online state
        self._fisher: Optional[Params] = None
        self._optimal: Optional[Params] = None
        # separate-mode state
        self._task_fisher: Dict[int, Params] = {}
        self._task_optimal: Dict[int, Params] = {}

    def register_task(self, task_id: int, params: Params, batches: Iterable[Any]) -> None:
        """Consolidate after finishing a task (parity: :151-193)."""
        fisher = compute_fisher(self.loss_fn, params, batches, self.per_sample_fisher)
        if self.mode == "online":
            if self._fisher is None:
                self._fisher = fisher
            else:
                d = self.decay
                self._fisher = jax.tree_util.tree_map(
                    lambda old, new: d * old + new, self._fisher, fisher
                )
            self._optimal = params
        else:
            self._task_fisher[task_id] = fisher
            self._task_optimal[task_id] = params
        self.num_tasks += 1

    def penalty(self, params: Params) -> jnp.ndarray:
        """λ/2 · Σ F (θ-θ*)² (parity: :195-232); 0 before any registration."""
        if self.num_tasks == 0:
            return jnp.float32(0.0)
        if self.mode == "online":
            return self.lam / 2.0 * ewc_quadratic(params, self._fisher, self._optimal)
        total = jnp.float32(0.0)
        for tid in self._task_fisher:
            total = total + ewc_quadratic(
                params, self._task_fisher[tid], self._task_optimal[tid]
            )
        return self.lam / 2.0 * total

    def get_importance_stats(self) -> Dict[str, float]:
        """Summary stats of the current Fisher (parity: :234-257)."""
        if self._fisher is None and not self._task_fisher:
            return {"mean": 0.0, "max": 0.0, "num_tasks": 0}
        fisher = self._fisher if self._fisher is not None else next(iter(self._task_fisher.values()))
        leaves = jax.tree_util.tree_leaves(fisher)
        flat = jnp.concatenate([l.reshape(-1) for l in leaves])
        return {
            "mean": float(jnp.mean(flat)),
            "max": float(jnp.max(flat)),
            "num_tasks": self.num_tasks,
        }

    def state_dict(self) -> Dict[str, Any]:
        """Checkpointable state incl. Fisher tensors (parity: :259-288)."""
        return {
            "num_tasks": self.num_tasks,
            "mode": self.mode,
            "fisher": self._fisher,
            "optimal": self._optimal,
            "task_fisher": self._task_fisher,
            "task_optimal": self._task_optimal,
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.num_tasks = sd["num_tasks"]
        self._fisher = sd["fisher"]
        self._optimal = sd["optimal"]
        self._task_fisher = sd.get("task_fisher", {})
        self._task_optimal = sd.get("task_optimal", {})


class OnlineEWC(EWC):
    """Convenience subclass pinning mode='online' (parity: ewc.py:290-303)."""

    def __init__(self, loss_fn: LossFn, lam: float = 5000.0, decay: float = 0.999, **kw):
        super().__init__(loss_fn, lam, mode="online", decay=decay, **kw)


class SynapticIntelligence:
    """Path-integral importance (parity: ewc.py:306-379).

    Call :meth:`update_importance` after every optimizer step with the
    pre-step params, post-step params, and the gradients used — it accumulates
    w ← w + (−g · Δθ) as a jitted tree op. :meth:`register_task` converts the
    path integral into importances ω = w / (Δθ_task² + damping) and snapshots
    the anchor parameters.
    """

    def __init__(self, lam: float = 1.0, damping: float = 0.1):
        self.lam = lam
        self.damping = damping
        self._w: Optional[Params] = None
        self._omega: Optional[Params] = None
        self._anchor: Optional[Params] = None
        self._task_start: Optional[Params] = None
        self.num_tasks = 0

        @jax.jit
        def _acc(w, grads, old_p, new_p):
            return jax.tree_util.tree_map(
                lambda wi, g, po, pn: wi + (-g) * (pn - po), w, grads, old_p, new_p
            )

        self._acc = _acc

    def start_task(self, params: Params) -> None:
        self._task_start = params
        self._w = _zeros_like_tree(params)

    def update_importance(self, old_params: Params, new_params: Params, grads: Params) -> None:
        """Accumulate per-step path integral (parity: :342-352)."""
        if self._w is None:
            self._w = _zeros_like_tree(old_params)
        self._w = self._acc(self._w, grads, old_params, new_params)

    def register_task(self, params: Params) -> None:
        """ω += w / (Δθ² + damping); snapshot anchor (parity: :354-366)."""
        if self._task_start is None:
            self._task_start = params
        damping = self.damping

        delta_sq = jax.tree_util.tree_map(
            lambda p, s: (p - s) ** 2, params, self._task_start
        )
        new_omega = jax.tree_util.tree_map(
            lambda w, d: jnp.maximum(w, 0.0) / (d + damping), self._w, delta_sq
        )
        if self._omega is None:
            self._omega = new_omega
        else:
            self._omega = jax.tree_util.tree_map(jnp.add, self._omega, new_omega)
        self._anchor = params
        self._task_start = params
        self._w = _zeros_like_tree(params)
        self.num_tasks += 1

    def penalty(self, params: Params) -> jnp.ndarray:
        """λ · Σ ω (θ - θ_anchor)² (parity: :368-379)."""
        if self._omega is None:
            return jnp.float32(0.0)
        return self.lam * ewc_quadratic(params, self._omega, self._anchor)
