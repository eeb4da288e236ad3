"""Federated client: local training + evaluation on private data.

Re-design of nerve_cl/federated/client.py:27-160 (a Flower NumPyClient).
Same contract — ``fit(parameters, config) → (parameters, num_samples,
metrics)`` and ``evaluate(parameters, config) → (loss, num_samples, metrics)``
over the numpy wire format — but the local loop is one jitted
forward-backward-update step (AdamW + MSE, with optional DP gradient
clipping/noise) instead of an eager per-batch loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerve_tpu.federated.common import tree_from_arrays, tree_to_arrays
from nerve_tpu.federated.privacy import PrivacyConfig, make_private
from nerve_tpu.utils import data as data_lib

Params = Any


class VideoEnhancementClient:
    """A federated participant training an SR model on local videos.

    Args:
        model: flax module with ``apply({'params': p}, lr_window) → sr``.
        train_data / val_data: {'lr': (N,H,W,C), 'hr': ...} local datasets.
        num_frames: temporal window the model expects.
        local_epochs: default local epochs per round (reference default 5).
        learning_rate: AdamW LR (reference uses AdamW, client.py:77).
        privacy: optional DP config → clipped+noised gradients.
    """

    def __init__(
        self,
        model,
        train_data: Dict[str, np.ndarray],
        val_data: Optional[Dict[str, np.ndarray]] = None,
        num_frames: int = 3,
        local_epochs: int = 5,
        batch_size: int = 8,
        learning_rate: float = 1e-4,
        privacy: Optional[PrivacyConfig] = None,
        seed: int = 0,
    ):
        self.model = model
        self.train_data = train_data
        self.val_data = val_data if val_data is not None else train_data
        self.num_frames = num_frames
        self.local_epochs = local_epochs
        # Clamp each loop to ITS OWN split size so tiny clients still
        # train/eval: batches() drops partial batches (fixed shapes for the
        # jitted steps), and a split smaller than the batch size would
        # otherwise yield ZERO batches and nan metrics. Train and eval are
        # clamped independently — a tiny validation split must not shrink
        # training batches (different optimization dynamics, more DP rounds).
        self.batch_size = max(1, min(batch_size, len(train_data["lr"])))
        self.eval_batch_size = max(1, min(batch_size, len(self.val_data["lr"])))
        self._rng = np.random.default_rng(seed)

        def prep(lr: jnp.ndarray) -> jnp.ndarray:
            # Single-frame models (LightweightSuperResolution) take (B,H,W,C);
            # temporal models take (B,T,H,W,C).
            return data_lib.expand_temporal(lr, num_frames) if num_frames > 1 else lr

        self._prep = prep
        example = prep(jnp.asarray(train_data["lr"][:1]))
        variables = model.init(jax.random.PRNGKey(seed), example)
        self.params: Params = variables["params"]
        # BatchNorm statistics stay client-local (FedBN-style); only trainable
        # params cross the wire, matching the reference's state_dict exchange
        # granularity for learnable weights.
        self.batch_stats = variables.get("batch_stats", {})

        tx = optax.adamw(learning_rate)
        if privacy is not None:
            # The CLAMPED batch size: DP noise scales with the sensitivity of
            # an actual batch — scaling for the requested-but-never-used size
            # would add ~requested/actual× too little noise.
            tx = make_private(tx, privacy, batch_size=self.batch_size, seed=seed)
        self.tx = tx
        self.opt_state = tx.init(self.params)

        @jax.jit
        def train_step(p, stats, opt_state, lr_win, hr):
            def loss_fn(pp):
                out, mutated = model.apply(
                    {"params": pp, "batch_stats": stats}, lr_win, True,
                    mutable=["batch_stats"],
                )
                loss = jnp.mean(
                    (out.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2
                )
                return loss, mutated["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), new_stats, opt_state, loss

        @jax.jit
        def eval_step(p, stats, lr_win, hr):
            out = model.apply({"params": p, "batch_stats": stats}, lr_win)
            return jnp.mean((out.astype(jnp.float32) - hr.astype(jnp.float32)) ** 2)

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------ #
    # Wire-format API (parity: client.py:45-134)
    # ------------------------------------------------------------------ #
    def get_parameters(self) -> List[np.ndarray]:
        return tree_to_arrays(self.params)

    def set_parameters(self, arrays: Sequence[np.ndarray]) -> None:
        self.params = tree_from_arrays(self.params, arrays)

    def fit(
        self, parameters: Sequence[np.ndarray], config: Optional[Dict[str, Any]] = None
    ) -> Tuple[List[np.ndarray], int, Dict[str, float]]:
        """Local training round → (new parameters, num samples, metrics)."""
        config = config or {}
        self.set_parameters(parameters)
        epochs = int(config.get("local_epochs", self.local_epochs))
        losses = []
        for _ in range(epochs):
            for batch in data_lib.batches(self.train_data, self.batch_size, rng=self._rng):
                lr_win = self._prep(jnp.asarray(batch["lr"]))
                self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                    self.params, self.batch_stats, self.opt_state, lr_win,
                    jnp.asarray(batch["hr"]),
                )
                losses.append(loss)
        n = len(self.train_data["lr"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return self.get_parameters(), n, {"train_loss": train_loss}

    def evaluate(
        self, parameters: Sequence[np.ndarray], config: Optional[Dict[str, Any]] = None
    ) -> Tuple[float, int, Dict[str, float]]:
        """Validation MSE on local data → (loss, num samples, metrics)."""
        self.set_parameters(parameters)
        losses = []
        for batch in data_lib.batches(self.val_data, self.eval_batch_size):
            lr_win = self._prep(jnp.asarray(batch["lr"]))
            losses.append(
                self._eval_step(self.params, self.batch_stats, lr_win, jnp.asarray(batch["hr"]))
            )
        n = len(self.val_data["lr"])
        loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return loss, n, {"mse": loss}


def create_client(
    model,
    train_lr: np.ndarray,
    train_hr: np.ndarray,
    val_lr: Optional[np.ndarray] = None,
    val_hr: Optional[np.ndarray] = None,
    **kwargs,
) -> VideoEnhancementClient:
    """Factory from raw tensors (parity: client.py:137-160)."""
    train = {"lr": np.asarray(train_lr), "hr": np.asarray(train_hr)}
    val = (
        {"lr": np.asarray(val_lr), "hr": np.asarray(val_hr)}
        if val_lr is not None
        else None
    )
    return VideoEnhancementClient(model, train, val, **kwargs)
