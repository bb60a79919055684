"""Tracing / profiling / debug hooks (SURVEY §5 auxiliary subsystems).

Replaces the reference's TensorBoard callback profiling (train.py:91,
``profile_batch=2``) with first-class JAX tools:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing an
  XPlane trace viewable in TensorBoard/XProf;
* :func:`profile_step` — capture exactly N steps of a step function (the
  ``profile_batch`` analog);
* :func:`start_server` — live profiling endpoint for ``tensorboard --logdir``
  capture;
* :func:`annotate` — ``jax.named_scope`` passthrough for readable traces;
* :func:`enable_debug` — NaN tripwires (``jax_debug_nans``) and disabled jit
  for step-through debugging — the JAX stand-in for sanitizers (SURVEY §5
  "race detection": XLA's functional model has no data races; numeric
  tripwires are the analogous failure detector);
* :class:`StepTimer` — per-step wall-clock and throughput accounting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = [
    "trace",
    "profile_step",
    "start_server",
    "annotate",
    "enable_debug",
    "StepTimer",
]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    with jax.profiler.trace(log_dir):
        yield


def start_server(port: int = 9999):
    import jax

    return jax.profiler.start_server(port)


def annotate(name: str):
    import jax

    return jax.named_scope(name)


def profile_step(step_fn, args, log_dir: str, num_steps: int = 1):
    """Run ``step_fn(*args)`` under a trace for ``num_steps`` iterations."""
    import jax

    out = None
    with trace(log_dir):
        for _ in range(num_steps):
            out = step_fn(*args)
        jax.block_until_ready(out)
    return out


def enable_debug(nans: bool = True, disable_jit: bool = False) -> None:
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


class StepTimer:
    """Rolling step-time / throughput meter for train loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_seconds(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None

    def steps_per_second(self) -> Optional[float]:
        mean = self.mean_step_seconds
        return (1.0 / mean) if mean else None
