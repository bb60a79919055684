"""Checksum-synchronized device timing for the remote (axon) TPU backend.

``jax.block_until_ready`` RETURNS EARLY on this image's tunneled backend, so
any honest timing must synchronize through a DATA dependency: the timed
function returns a device scalar, ``inner`` back-to-back calls device-
serialize through it, and one ``float()`` readback per trial fences the
batch.  The ~30 ms host↔device dispatch round-trip is measured once on a
trivial jitted reduction and subtracted from every trial.

Shared by ``bench.py`` (the driver metric), ``tools/bench_decode_fused.py``
and ``tools/bench_stages.py`` — the subtraction recipe encodes a platform
quirk and must stay identical across tools for their numbers to be
comparable.
"""
from __future__ import annotations

import time

__all__ = ["round_trip_baseline", "sync_timer"]


def round_trip_baseline(probe_array, trials: int = 5) -> float:
    """Measured seconds per host→device dispatch + scalar readback."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _scalar(x):
        return jnp.sum(x)

    float(_scalar(probe_array))  # compile outside the timed loop
    start = time.perf_counter()
    for _ in range(trials):
        float(_scalar(probe_array))
    return (time.perf_counter() - start) / trials


def sync_timer(fn, *args, trials: int = 5, inner: int = 4,
               round_trip: float = 0.0) -> float:
    """Median seconds per ``fn(*args)`` call.

    ``fn`` must return a device scalar (its checksum); ``inner``
    back-to-back calls serialize on the device and are fenced by ONE
    ``float()`` readback, so the tunnel round-trip (passed as
    ``round_trip``) amortizes away.
    """
    times = []
    for _ in range(trials):
        start = time.perf_counter()
        checksum = None
        for _ in range(inner):
            checksum = fn(*args)
        float(checksum)
        times.append(max(time.perf_counter() - start - round_trip, 1e-9) / inner)
    return sorted(times)[len(times) // 2]
