"""Training orchestration: the ``fit`` loop with logging, checkpointing,
auto-resume and validation.

Functional replacement for the reference's Keras ``model.fit`` + callback
stack (train.py:86-104): per-epoch checkpoints, crash-resume from the latest
state (BackupAndRestore parity), CSV epoch log (``epoch,loss,val_loss`` —
byte-compatible with the committed training.log), optional per-step metric
hook, and host-side prefetch feeding the jitted DP-sharded step.
"""
from __future__ import annotations

import csv
import logging
import os
import shutil
import time
from typing import Callable, Optional

import jax
import numpy as np

from telugu_asr_tpu.data.dataset import ASRDataset
from telugu_asr_tpu.data.loader import PrefetchLoader
from telugu_asr_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_multiple,
    replicated_sharding,
    shard_batch,
)
from telugu_asr_tpu.train.checkpoint import CheckpointManager
from telugu_asr_tpu.train.state import TrainState

logger = logging.getLogger("telugu_asr_tpu")

__all__ = ["fit", "CSVLogger"]


class CSVLogger:
    """Epoch CSV log: ``epoch,loss,val_loss`` (reference training.log format)."""

    def __init__(self, path: str):
        self.path = path
        self._wrote_header = os.path.exists(path) and os.path.getsize(path) > 0

    def log(self, epoch: int, loss: float, val_loss: Optional[float]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "a", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            if not self._wrote_header:
                writer.writerow(["epoch", "loss", "val_loss"])
                self._wrote_header = True
            writer.writerow([epoch, f"{loss:.6f}", "" if val_loss is None else f"{val_loss:.6f}"])

    def truncate_from(self, epoch: int) -> None:
        """Drop rows with epoch >= ``epoch`` (re-run epochs after a resume)."""
        if not os.path.exists(self.path):
            return
        with open(self.path, "r", newline="", encoding="utf-8") as f:
            rows = [r for r in csv.reader(f) if r]
        kept = [r for r in rows if not (r[0].lstrip("-").isdigit() and int(r[0]) >= epoch)]
        if len(kept) != len(rows):
            with open(self.path, "w", newline="", encoding="utf-8") as f:
                csv.writer(f).writerows(kept)


def _latest_step_in_dir(directory: str) -> Optional[int]:
    """Largest numeric step subdir of an Orbax checkpoint dir, without
    constructing a CheckpointManager (which spins up writer threads)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None


def _best_val_from_log(path: str) -> Optional[float]:
    """Lowest val_loss in a (possibly resumed+truncated) training.log CSV."""
    if not os.path.exists(path):
        return None
    best = None
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            try:
                v = float(row.get("val_loss") or "")
            except ValueError:
                continue
            if best is None or v < best:
                best = v
    return best


def fit(
    *,
    train_step: Callable,
    eval_step: Optional[Callable],
    state: TrainState,
    train_dataset: ASRDataset,
    valid_dataset: Optional[ASRDataset],
    batch_size: int,
    num_epochs: int,
    run_dir: str,
    seed: int = 42,
    mesh=None,
    steps_per_epoch: Optional[int] = None,
    checkpoint_max_to_keep: Optional[int] = 3,
    on_step: Optional[Callable[[int, dict], None]] = None,
    on_epoch: Optional[Callable[[TrainState, int], Optional[dict]]] = None,
    metrics_logger=None,
    log_every: int = 50,
) -> TrainState:
    """Run (or resume) training; returns the final state.

    ``run_dir`` layout mirrors the reference's Hydra run dir: ``checkpoints/``
    (epoch-stamped), ``states/`` is implicit in the same manager (full state
    incl. optimizer → BackupAndRestore parity), ``training.log`` CSV.
    """
    os.makedirs(run_dir, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"), checkpoint_max_to_keep)
    # Best-val retention, SEPARATE from the recency window: with a bounded
    # max_to_keep a late-training collapse silently deletes the best model
    # (observed: synth20k HPO-winner run fell out of its val-1.5 minimum into
    # the val-19 text-LM basin at epochs 48-60 and only post-collapse
    # checkpoints survived).  ``checkpoints_best/`` always holds the lowest
    # val_loss epoch; resume keeps using the recency window.  The manager is
    # created lazily at first save — most epochs don't set a new best, and
    # manager construction is not free (async writer threads + barrier sync).
    best_dir = os.path.join(run_dir, "checkpoints_best")
    best_mgr: list = [None]

    def best_ckpt_mgr() -> CheckpointManager:
        if best_mgr[0] is None:
            best_mgr[0] = CheckpointManager(best_dir, 1)
        return best_mgr[0]

    csv_logger = CSVLogger(os.path.join(run_dir, "training.log"))
    if mesh is None:
        mesh = make_mesh(("data",))
    state = jax.device_put(state, replicated_sharding(mesh))

    steps_per_epoch = steps_per_epoch or train_dataset.num_batches(batch_size)
    latest = ckpt.latest_step()
    start_epoch = 0
    if latest is not None:
        state = ckpt.restore(state)
        start_epoch = latest
        logger.info("resumed from epoch %d (step %d)", latest, int(state.step))
        if metrics_logger is not None and hasattr(metrics_logger, "truncate_after"):
            # Drop step rows from an abandoned future (crash past the restored
            # checkpoint) so the metrics CSV never holds conflicting records.
            metrics_logger.truncate_after(int(state.step))
        csv_logger.truncate_from(start_epoch)

    best_val = _best_val_from_log(csv_logger.path)
    best_step = _latest_step_in_dir(best_dir)
    if best_step is not None and best_step > start_epoch:
        # best checkpoint from an abandoned future (crash + resume from an
        # older recency checkpoint): epoch numbering will be reused, so the
        # stale entry must go.
        shutil.rmtree(best_dir, ignore_errors=True)
        best_step = None
    if best_step is None:
        # No checkpoint backs the CSV's historical minimum (fresh run,
        # stale-best rewind above, or a manually cleared best dir).  Seeding
        # best_val from the CSV would mean a rerun that only *ties* that
        # minimum never re-saves and checkpoints_best/ stays empty — so the
        # tracker re-seeds from the first post-resume epoch instead.
        best_val = None

    rng = jax.random.PRNGKey(seed)
    n_data = int(mesh.shape.get("data", 1))

    def to_device(item):
        # Runs in the prefetch thread: pad rows (PAD targets contribute zero
        # CE) so the batch divides the data axis, then start the upload —
        # batch N+1 crosses the host→device link while step N computes.
        inputs, labels, _ = item
        batch, _ = pad_batch_to_multiple({**inputs, **labels}, n_data)
        return shard_batch(mesh, batch)

    train_iter = PrefetchLoader(
        train_dataset.infinite_batches(batch_size), num_prefetch=2,
        transform=to_device,
    )

    for epoch in range(start_epoch, num_epochs):
        t0 = time.perf_counter()
        losses = []
        for _ in range(steps_per_epoch):
            batch = next(train_iter)
            state, metrics = train_step(state, batch, rng)
            losses.append(metrics["loss"])
            if on_step is not None:
                on_step(int(state.step), metrics)
            if metrics_logger is not None and int(state.step) % log_every == 0:
                metrics_logger.log(
                    int(state.step), {k: float(v) for k, v in metrics.items()}
                )
        train_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")

        val_loss = None
        if eval_step is not None and valid_dataset is not None and len(valid_dataset):
            vlosses = []
            for inputs, labels, _ in valid_dataset.batches(batch_size):
                batch, _ = pad_batch_to_multiple({**inputs, **labels}, n_data)
                batch = shard_batch(mesh, batch)
                vmetrics = eval_step(state, batch)
                vlosses.append(float(vmetrics["loss"]))
            val_loss = float(np.mean(vlosses)) if vlosses else None

        dt = time.perf_counter() - t0
        logger.info(
            "epoch %d: loss=%.4f val_loss=%s (%.1fs, %d steps)",
            epoch + 1, train_loss, f"{val_loss:.4f}" if val_loss is not None else "n/a",
            dt, steps_per_epoch,
        )
        csv_logger.log(epoch, train_loss, val_loss)
        epoch_metrics = {"epoch_loss": train_loss}
        if val_loss is not None:
            epoch_metrics["val_loss"] = val_loss
        if on_epoch is not None:
            extra = on_epoch(state, epoch + 1)
            if extra:
                epoch_metrics.update(extra)
                logger.info("epoch %d extras: %s", epoch + 1, extra)
        if metrics_logger is not None:
            metrics_logger.log(int(state.step), epoch_metrics)
        ckpt.save(epoch + 1, state)
        if val_loss is not None and (best_val is None or val_loss < best_val):
            best_val = val_loss
            best_ckpt_mgr().save(epoch + 1, state)

    if best_mgr[0] is not None:
        best_mgr[0].wait()
    ckpt.wait()
    train_iter.close()
    return state
