"""Host-side bench.py logic: watchdog pass-path and previous-capture lookup."""
import sys

sys.path.insert(0, ".")

import bench


def test_backend_watchdog_passes_on_healthy_backend():
    # On a healthy (CPU) backend the probe finishes well inside the window
    # and the watchdog returns without the os._exit(3) diagnostic path.
    bench._backend_watchdog(timeout_s=120.0)


def test_prev_bench_reads_committed_captures():
    prev = bench._prev_bench("rtfx")
    # BENCH_r01-r03.json are committed; the latest file with metric rtfx wins
    assert prev is not None
    assert prev["file"].startswith("BENCH_r")
    assert prev["value"] > 0


def test_prev_bench_unknown_metric_is_none():
    assert bench._prev_bench("no_such_metric") is None
