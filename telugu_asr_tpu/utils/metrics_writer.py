"""Structured metric logging: CSV + TensorBoard + optional W&B.

Covers the reference's observability stack (SURVEY §5): CSVLogger
(train/loop.py keeps the epoch CSV byte-compatible), TensorBoard scalars
(lazily via tf.summary — TensorFlow is an optional backend here, never a
runtime dependency of the compute path), and Weights & Biases when the
package exists (train_optuna.py:24-25 used it for HPO runs).
"""
from __future__ import annotations

import csv
import os
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


class _TensorBoardBackend:
    def __init__(self, log_dir: str):
        import tensorflow as tf  # optional, lazily imported

        self._tf = tf
        self._writer = tf.summary.create_file_writer(log_dir)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        with self._writer.as_default():
            for key, value in metrics.items():
                self._tf.summary.scalar(key, float(value), step=step)
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


class _WandbBackend:
    def __init__(self, project: str, config: Optional[dict]):
        import wandb  # optional

        self._run = wandb.init(project=project, config=config or {})

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self._run.log(dict(metrics), step=step)

    def close(self) -> None:
        self._run.finish()


class MetricsLogger:
    """Fan-out metric logger; every backend is optional and fail-soft."""

    def __init__(
        self,
        csv_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        wandb_config: Optional[dict] = None,
    ):
        self._csv_path = csv_path
        self._csv_fields: Optional[list] = None
        self._backends = []
        if tensorboard_dir:
            try:
                self._backends.append(_TensorBoardBackend(tensorboard_dir))
            except Exception:
                pass
        if wandb_project:
            try:
                self._backends.append(_WandbBackend(wandb_project, wandb_config))
            except Exception:
                pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._csv_path:
            fields = ["step"] + sorted(metrics)
            new_file = not os.path.exists(self._csv_path) or self._csv_fields != fields
            if self._csv_fields is None and os.path.exists(self._csv_path):
                new_file = False  # appending to an existing run's file
            self._csv_fields = fields
            os.makedirs(os.path.dirname(os.path.abspath(self._csv_path)), exist_ok=True)
            with open(self._csv_path, "a", newline="", encoding="utf-8") as f:
                writer = csv.writer(f)
                if new_file:
                    writer.writerow(fields)
                writer.writerow([step] + [metrics[k] for k in sorted(metrics)])
        for backend in self._backends:
            try:
                backend.log(step, metrics)
            except Exception:
                pass

    def close(self) -> None:
        for backend in self._backends:
            try:
                backend.close()
            except Exception:
                pass
