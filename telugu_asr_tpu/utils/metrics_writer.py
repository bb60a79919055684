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


class _CsvBackend:
    """Single-file CSV with ONE stable header (a growing column superset).

    The previous design re-emitted a header row whenever the metric field set
    alternated (train vs val groups), producing an unparseable interleaved
    file; and a resumed run appended steps that duplicated rows already
    present. Now: the header is the union of all fields ever seen (missing
    values render as ``""``); when a new field first appears, the whole file
    is rewritten once with the widened header (metric CSVs are small text);
    and ``truncate_after(step)`` drops rows from an abandoned future so a
    resume never leaves two conflicting records for one step.
    """

    def __init__(self, path: str):
        self.path = path
        self._fields: list = []
        if os.path.exists(path) and os.path.getsize(path) > 0:
            with open(path, "r", newline="", encoding="utf-8") as f:
                header = next(csv.reader(f), None)
            if header and header[0] == "step":
                self._fields = header[1:]

    def _rewrite(self, rows: list) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            writer.writerow(["step"] + self._fields)
            writer.writerows(rows)
        os.replace(tmp, self.path)

    def _read_rows(self) -> list:
        """Existing data rows as dicts keyed by the file's own header."""
        if not os.path.exists(self.path) or os.path.getsize(self.path) == 0:
            return []
        with open(self.path, "r", newline="", encoding="utf-8") as f:
            reader = csv.reader(f)
            header = next(reader, None)
            if not header or header[0] != "step":
                return []
            return [dict(zip(header, row)) for row in reader if row]

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        new_fields = [k for k in sorted(metrics) if k not in self._fields]
        if new_fields:
            old_rows = self._read_rows()
            self._fields = self._fields + new_fields
            self._rewrite(
                [[r.get("step", "")] + [r.get(k, "") for k in self._fields] for r in old_rows]
            )
        fresh = not os.path.exists(self.path) or os.path.getsize(self.path) == 0
        with open(self.path, "a", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            if fresh:
                writer.writerow(["step"] + self._fields)
            writer.writerow([step] + [metrics.get(k, "") for k in self._fields])

    def truncate_after(self, step: int) -> None:
        rows = self._read_rows()
        kept = [r for r in rows if r.get("step", "").lstrip("-").isdigit() and int(r["step"]) <= step]
        if len(kept) != len(rows):
            self._rewrite([[r.get("step", "")] + [r.get(k, "") for k in self._fields] for r in kept])


class MetricsLogger:
    """Fan-out metric logger; every backend is optional and fail-soft."""

    def __init__(
        self,
        csv_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        wandb_config: Optional[dict] = None,
    ):
        self._csv = _CsvBackend(csv_path) if csv_path else None
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
        if self._csv is not None:
            self._csv.log(step, metrics)
        for backend in self._backends:
            try:
                backend.log(step, metrics)
            except Exception:
                pass

    def truncate_after(self, step: int) -> None:
        """Drop CSV rows logged past ``step`` (stale future from a resumed run)."""
        if self._csv is not None:
            self._csv.truncate_after(step)

    def close(self) -> None:
        for backend in self._backends:
            try:
                backend.close()
            except Exception:
                pass
