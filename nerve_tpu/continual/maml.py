"""Meta-learning: MAML / FOMAML / Reptile / ContentAdaptiveMAML.

Re-design of nerve_cl/continual/maml.py:23-442. The reference's inner loop
deep-copies the model and runs a torch SGD object (maml.py:74-110), and its
second-order path needs the optional ``higher`` library (:145-162). Here the
inner loop is a pure function — ``lax.scan`` of SGD updates over a params
copy — and second-order MAML is plain ``jax.grad`` through that unrolled
computation: JAX gives full MAML natively. FOMAML applies
``stop_gradient`` to the inner gradients, which reduces the meta-gradient to
the query gradient at the adapted parameters (the first-order approximation).

All transforms are generic over a user loss: ``loss_fn(params, batch) →
scalar``, so they wrap any model (SR net, enhancement engine, toy MLP).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Any
LossFn = Callable[[Params, Any], jnp.ndarray]


def make_inner_sgd(
    loss_fn: LossFn, inner_lr: float, inner_steps: int, first_order: bool = False
) -> Callable[[Params, Any], Params]:
    """Pure inner-loop adaptation: θ' = SGD^k(θ; support batch).

    Differentiable through ``jax.grad`` (second-order MAML); with
    ``first_order=True`` the inner gradients are stop_gradient-ed.
    """

    def adapt(params: Params, batch: Any) -> Params:
        def step(p, _):
            g = jax.grad(loss_fn)(p, batch)
            if first_order:
                g = jax.lax.stop_gradient(g)
            p = jax.tree_util.tree_map(lambda pi, gi: pi - inner_lr * gi, p, g)
            return p, None

        params, _ = jax.lax.scan(step, params, None, length=inner_steps)
        return params

    return adapt


class MAML:
    """Model-Agnostic Meta-Learning (parity: maml.py:23-228).

    Task batches are pytrees with leading task axis handled by ``vmap``: the
    reference's Python loop over tasks (maml.py:134-144) becomes one batched
    program.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        params: Params,
        inner_lr: float = 0.01,
        outer_lr: float = 1e-3,
        inner_steps: int = 5,
        first_order: bool = False,
    ):
        self.loss_fn = loss_fn
        self.params = params
        self.inner_lr = inner_lr
        self.outer_lr = outer_lr
        self.inner_steps = inner_steps
        self.first_order = first_order
        self.tx = optax.adam(outer_lr)
        self.opt_state = self.tx.init(params)

        adapt = make_inner_sgd(loss_fn, inner_lr, inner_steps, first_order)
        self._adapt = jax.jit(adapt)

        def meta_loss(p, support_batch, query_batch):
            adapted = adapt(p, support_batch)
            return loss_fn(adapted, query_batch)

        def meta_step(p, opt_state, support_batches, query_batches):
            # vmap over the task axis; mean query loss drives the meta-update.
            losses_fn = jax.vmap(meta_loss, in_axes=(None, 0, 0))

            def mean_loss(pp):
                return jnp.mean(losses_fn(pp, support_batches, query_batches))

            loss, grads = jax.value_and_grad(mean_loss)(p)
            updates, opt_state = self.tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, loss

        self._meta_step = jax.jit(meta_step)

    def adapt(self, batch: Any, params: Optional[Params] = None) -> Params:
        """Deployment-time fast adaptation → new adapted params
        (parity: maml.py:169-186; returns params, not a model copy)."""
        return self._adapt(self.params if params is None else params, batch)

    def train_step(self, support_batches: Any, query_batches: Any) -> float:
        """One meta-update over a batch of tasks (parity: maml.py:188-208).

        ``support_batches``/``query_batches``: pytrees whose leaves have a
        leading task axis.
        """
        self.params, self.opt_state, loss = self._meta_step(
            self.params, self.opt_state, support_batches, query_batches
        )
        return float(loss)

    def state_dict(self) -> Dict[str, Any]:
        return {"params": self.params, "opt_state": self.opt_state}

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.params = sd["params"]
        self.opt_state = sd["opt_state"]


class FOMAML(MAML):
    """First-order MAML (parity: maml.py:231-244)."""

    def __init__(self, loss_fn, params, inner_lr=0.01, outer_lr=1e-3, inner_steps=5):
        super().__init__(loss_fn, params, inner_lr, outer_lr, inner_steps, first_order=True)


class Reptile:
    """Reptile meta-learning (parity: maml.py:247-372).

    Meta-update: θ ← θ + outer_lr · (mean_task(θ'_task) − θ), with the
    per-task inner SGD vmapped over the task axis.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        params: Params,
        inner_lr: float = 0.01,
        outer_lr: float = 0.1,
        inner_steps: int = 5,
    ):
        self.loss_fn = loss_fn
        self.params = params
        self.inner_lr = inner_lr
        self.outer_lr = outer_lr
        self.inner_steps = inner_steps
        adapt = make_inner_sgd(loss_fn, inner_lr, inner_steps, first_order=True)
        self._adapt = jax.jit(adapt)

        def reptile_step(p, task_batches):
            adapted = jax.vmap(adapt, in_axes=(None, 0))(p, task_batches)
            mean_adapted = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), adapted)
            new_p = jax.tree_util.tree_map(
                lambda pi, m: pi + self.outer_lr * (m - pi), p, mean_adapted
            )
            return new_p

        self._reptile_step = jax.jit(reptile_step)

    def train_step(self, task_batches: Any) -> None:
        """One meta-update over stacked task batches (leading task axis)."""
        self.params = self._reptile_step(self.params, task_batches)

    def adapt(self, batch: Any, params: Optional[Params] = None) -> Params:
        return self._adapt(self.params if params is None else params, batch)

    def state_dict(self) -> Dict[str, Any]:
        return {"params": self.params}

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.params = sd["params"]


class ContentAdaptiveMAML(MAML):
    """MAML with per-content-type learnable inner learning rates
    (parity: maml.py:375-442, the unexported ContentAdaptiveMAML).

    Keeps a log-LR scalar per content type (positivity via exp); the
    content-specific LR scales the inner SGD during adaptation and is itself
    meta-learned through the second-order path.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        params: Params,
        content_types: Sequence[str] = ("sports", "animation", "movie", "news", "gaming"),
        inner_lr: float = 0.01,
        outer_lr: float = 1e-3,
        inner_steps: int = 5,
        first_order: bool = False,
    ):
        super().__init__(loss_fn, params, inner_lr, outer_lr, inner_steps, first_order)
        self.content_types = tuple(content_types)
        self.log_inner_lrs = {
            ct: jnp.asarray(jnp.log(inner_lr), jnp.float32) for ct in self.content_types
        }

        def adapt_with_lr(p, batch, log_lr):
            lr = jnp.exp(log_lr)

            def step(pp, _):
                g = jax.grad(self.loss_fn)(pp, batch)
                if first_order:
                    g = jax.lax.stop_gradient(g)
                return jax.tree_util.tree_map(lambda pi, gi: pi - lr * gi, pp, g), None

            p, _ = jax.lax.scan(step, p, None, length=inner_steps)
            return p

        self._adapt_with_lr = jax.jit(adapt_with_lr)

    def adapt_to_content(self, batch: Any, content_type: str) -> Params:
        """Fast adaptation with the content-specific LR (parity: :403-442)."""
        log_lr = self.log_inner_lrs.get(
            content_type, jnp.asarray(jnp.log(self.inner_lr), jnp.float32)
        )
        return self._adapt_with_lr(self.params, batch, log_lr)

    def meta_update_content_lr(self, content_type: str, support: Any, query: Any) -> float:
        """Meta-learn the content LR by descending the post-adaptation query loss."""
        log_lr = self.log_inner_lrs[content_type]

        def q_loss(ll):
            adapted = self._adapt_with_lr(self.params, support, ll)
            return self.loss_fn(adapted, query)

        loss, g = jax.value_and_grad(q_loss)(log_lr)
        self.log_inner_lrs[content_type] = log_lr - self.outer_lr * g
        return float(loss)
