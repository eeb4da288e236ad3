"""Checkpoint / resume via orbax.

The reference has ad-hoc ``torch.save`` dicts and **no resume logic** in any
training loop (SURVEY.md §5: train_baseline.py:122-129 saves a best-model dict,
nothing restores mid-run). Here a single train-state pytree (params, optimizer
state, BatchNorm stats, step, plus arbitrary extras like EWC Fisher or replay
metadata) is checkpointed atomically with retention, and every entry point can
resume from the latest step.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with keep-last-N retention."""

    def __init__(self, directory: str, keep_last_n: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_last_n, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (shapes/dtypes)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore the saved pytree as-is (numpy leaves), no template needed.

        For consumers that only want a subtree (e.g. serving loads just the
        params out of a training checkpoint) and don't hold the optimizer
        state structure required by :meth:`restore`.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()
