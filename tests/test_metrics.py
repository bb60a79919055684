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
