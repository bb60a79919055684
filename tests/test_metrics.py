from telugu_asr_tpu.metrics import ErrorRate, cer, edit_distance, wer


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance(["a", "b"], ["a", "b"]) == 0


def test_wer_accumulation():
    n, d = wer(["a b c"], ["a x c"])
    assert (n, d) == (1, 3)
    n, d = wer(["", "a b"], ["a", "a b"])
    assert (n, d) == (1, 3)


def test_cer_accumulation():
    n, d = cer(["abc"], ["abd"])
    assert (n, d) == (1, 3)


def test_error_rate_streaming():
    m = ErrorRate(wer)
    m.update_state(["a b"], ["a b"])
    m.update_state(["a"], ["a b"])
    assert abs(m.result() - 1 / 4) < 1e-9
    m.reset_state()
    assert m.result() == 0.0


def test_telugu_cer():
    ref = "కరెంటు బిల్లు"
    hyp = "కరెంటు బిల్లా"
    n, d = cer([hyp], [ref])
    assert n == 1 and d == len(ref)


import os
import pytest


REFERENCE_ARTIFACT = "/root/reference/data/logs/model/2025-09-04/output.tsv"


@pytest.mark.skipif(not os.path.exists(REFERENCE_ARTIFACT), reason="reference artifact not mounted")
def test_metrics_match_jiwer_on_reference_artifact():
    """Our pure-python WER/CER reproduce jiwer's values on the reference's
    committed 2,224-row inference artifact (SURVEY §6: 0.664 / 0.364)."""
    from telugu_asr_tpu.eval.harness import evaluate_results

    metrics = evaluate_results(REFERENCE_ARTIFACT)
    assert abs(metrics["greedy_wer"] - 0.664091) < 1e-4
    assert abs(metrics["greedy_cer"] - 0.363993) < 1e-4


import json as _json

_STUDY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "data", "synth95k", "precision_study", "results.json")
_STUDY_RP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "data", "synth95k", "precision_study_rp13", "results.json")


@pytest.mark.skipif(not os.path.exists(_STUDY), reason="study artifact absent")
def test_serving_precision_deltas_pinned():
    """Pin the acceptable WER delta of every serving fast path vs the f32
    parity baseline (VERDICT r4 #2), as measured on the trained synth95k
    checkpoint (data/synth95k/precision_study/RESULTS.md).  A rerun of
    tools/precision_wer_study.py that regresses any mode past these bounds
    fails here."""
    results = _json.load(open(_STUDY))
    base = results["f32"]["wer"]
    for mode, rec in results.items():
        if mode.startswith("beam"):
            continue  # beam vs greedy differ by search, not precision
        assert abs(rec["wer"] - base) <= 0.005, (mode, rec["wer"], base)
    if "beam4_f32" in results and "beam4_bf16" in results:
        assert abs(results["beam4_bf16"]["wer"] - results["beam4_f32"]["wer"]) <= 0.005


@pytest.mark.skipif(not os.path.exists(_STUDY_RP), reason="study artifact absent")
def test_serving_precision_deltas_pinned_production_point():
    """Same pin at the production decode (beam-4 + repetition penalty,
    WER 0.0018): every fast path within 0.002 absolute WER of f32."""
    results = _json.load(open(_STUDY_RP))
    base = results["beam4_f32_rp13"]["wer"]
    assert base < 0.01  # the trained model really is near-perfect here
    for mode, rec in results.items():
        assert abs(rec["wer"] - base) <= 0.002, (mode, rec["wer"], base)
