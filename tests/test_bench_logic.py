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


def test_trained_lane_preflight(tmp_path):
    # no checkpoint dir -> lane off silently (the worst-case bench is the
    # canonical number; the trained lane is additive)
    ok, block = bench._trained_lane_preflight(str(tmp_path / "absent"), "nope.tsv")
    assert (ok, block) == (False, None)

    # checkpoint + TSV present but the referenced wav wiped (fresh
    # workspace): lane must SKIP with the regeneration hint, never crash
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    tsv = tmp_path / "test.tsv"
    tsv.write_text("PATH\tDURATION\tTRANSCRIPT\n/gone/x.wav\t1.0\tఅ\n")
    ok, block = bench._trained_lane_preflight(str(ckpt), str(tsv))
    assert not ok
    assert block["skipped"] == "corpus wavs absent"
    assert "make_synthetic_corpus" in block["regenerate"]

    # wav actually present -> lane runs
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"RIFF")
    tsv.write_text(f"PATH\tDURATION\tTRANSCRIPT\n{wav}\t1.0\tఅ\n")
    ok, block = bench._trained_lane_preflight(str(ckpt), str(tsv))
    assert (ok, block) == (True, None)
