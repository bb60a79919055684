"""Checkpointing: Orbax-backed save/restore of the full train state.

Covers the reference's three mechanisms (SURVEY §5 / train.py:80-90):
* per-epoch weight checkpoints (``ModelCheckpoint`` → ``save(step=...)``),
* mid-training resume (``BackupAndRestore`` → ``latest_step``/``restore``),
* warm start from weights only (``load_weights`` → ``restore_params``).

Orbax writes atomically and asynchronously; state is a pure pytree so the
whole thing (params + Adam moments + step) round-trips losslessly.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from telugu_asr_tpu.train.state import TrainState

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state_like))
        )
        return TrainState(**restored)

    def restore_raw(self, step: Optional[int] = None) -> dict:
        """Restore the raw saved pytree (no target tree needed)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step)

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Weights-only warm start (reference by-name h5 load analog)."""
        restored = self.restore_raw(step)
        return jax.tree_util.tree_map(jax.numpy.asarray, restored["params"])

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def _to_pytree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "model_state": state.model_state,
    }
