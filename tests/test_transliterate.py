"""EDA transliteration batch pipeline (reference EDA/batch.py:14-263 parity):
request/results JSONL formats, field-fallback and skip laws, and the offline
rule romanizer."""
import json
import sys

sys.path.insert(0, "tools")

from transliterate_batch import (  # noqa: E402
    RuleBackend,
    merge_results,
    prepare_batch_requests,
    process_file,
    romanize_telugu,
)


def test_romanizer_basics():
    # consonant+matra composition, virama conjuncts, anusvara
    assert romanize_telugu("కరెంటు") == "karemtu"
    assert romanize_telugu("వారం") == "vaaram"
    # virama suppresses the leading consonant's inherent vowel: క్ష = k+sha
    assert romanize_telugu("క్ష") == "ksha"
    # independent vowels and passthrough of non-Telugu text
    assert romanize_telugu("ఆధార్ card 12") == "aadhaar card 12"
    out = romanize_telugu("టర్మ్ సేవింగ్స్")
    assert out.isascii() and " " in out


def test_request_format_matches_reference(tmp_path):
    rows = [
        {"wav_path": "a.wav", "duration": 1.5, "telugu_text": "వారం"},
        {"wav_path": "b.wav", "duration": 2.0},           # skipped: no text
        {"wav_path": "c.wav", "duration": 2.5, "text": "కరెంటు"},
        {"wav_path": "d.wav", "duration": 3.0, "transcript": "తిండి"},
    ]
    src = tmp_path / "meta.jsonl"
    src.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows),
                   encoding="utf-8")
    req_path = tmp_path / "requests.jsonl"
    n = prepare_batch_requests(str(src), str(req_path))
    assert n == 3
    reqs = [json.loads(l) for l in req_path.read_text(encoding="utf-8").splitlines()]
    # custom_id keeps the ORIGINAL line index (the merge join key)
    assert [r["custom_id"] for r in reqs] == ["request_0", "request_2", "request_3"]
    for r in reqs:
        assert r["method"] == "POST" and r["url"] == "/v1/chat/completions"
        body = r["body"]
        assert body["messages"][0]["role"] == "system"
        assert body["messages"][1]["content"].startswith(
            "Transliterate this Telugu text to English: ")
        assert body["temperature"] == 0.1


def test_pipeline_end_to_end(tmp_path):
    rows = [
        {"wav_path": "a.wav", "duration": 1.5, "telugu_text": "వారం"},
        {"wav_path": "b.wav", "duration": 2.0},
        {"wav_path": "c.wav", "duration": 2.5, "transcript": "కరెంటు"},
    ]
    src = tmp_path / "meta.jsonl"
    src.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows),
                   encoding="utf-8")
    out = tmp_path / "out.jsonl"
    n = process_file(str(src), str(out), backend=RuleBackend(),
                     temp_dir=str(tmp_path / "tmp"))
    assert n == 2
    got = [json.loads(l) for l in out.read_text(encoding="utf-8").splitlines()]
    # the reference's result schema (EDA/transliterated_results.jsonl)
    assert list(got[0].keys()) == ["wav_path", "duration", "telugu_text", "english_text"]
    assert got[0] == {"wav_path": "a.wav", "duration": 1.5,
                      "telugu_text": "వారం", "english_text": "vaaram"}
    assert got[1]["telugu_text"] == "కరెంటు"
    # temp requests file cleaned up
    assert not (tmp_path / "tmp" / "batch_requests.jsonl").exists()


def test_merge_missing_response_becomes_empty(tmp_path):
    src = tmp_path / "meta.jsonl"
    src.write_text(json.dumps({"wav_path": "a.wav", "duration": 1.0,
                               "telugu_text": "వారం"}, ensure_ascii=False),
                   encoding="utf-8")
    out = tmp_path / "out.jsonl"
    merge_results(str(src), {}, str(out))
    got = json.loads(out.read_text(encoding="utf-8"))
    assert got["english_text"] == ""
