#!/usr/bin/env python
"""Telugu→Latin transliteration batch pipeline (EDA parity).

The reference's offline EDA step (`EDA/batch.py:14-263`) drives the OpenAI
Batch API over a metadata JSONL (one utterance per line) and merges the
model's romanizations back into a results JSONL
(`EDA/transliterated_results.jsonl`:
``{"wav_path", "duration", "telugu_text", "english_text"}``).

This port keeps the same pipeline stages and artifact formats with a
pluggable transliteration backend:

* ``rule`` (default, offline) — a deterministic Unicode-walk romanizer over
  the Telugu block (U+0C00–U+0C7F): consonant + matra composition, virama
  conjuncts, anusvara/visarga.  Runs with zero network egress.
* ``openai`` — the reference's remote batch flow (prepare-requests JSONL →
  upload → poll → merge), available only when the ``openai`` package and an
  API key exist; the request/response JSONL formats match the reference so
  artifacts interoperate.

Stages (mirroring the reference class surface):

1. ``prepare_batch_requests(input, requests_path)`` — request-per-line JSONL
   with ``custom_id = request_{i}``, skipping rows without Telugu text
   (field fallback law: ``telugu_text`` → ``text`` → ``transcript``).
2. backend execution — ``rule`` answers locally; ``openai`` uploads/polls.
3. ``merge_results(input, results_by_id, output)`` — joins responses back to
   the original rows by ``custom_id`` position, emitting the reference's
   result schema (missing/errored responses become ``""``).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, Optional

logger = logging.getLogger("telugu_asr_tpu.transliterate")

_TEXT_FIELDS = ("telugu_text", "text", "transcript")

SYSTEM_PROMPT = (
    "You are a Telugu to English transliteration expert. Transliterate the "
    "given Telugu text to English using only standard Latin characters "
    "(a-z, A-Z) without diacritics or special symbols. Maintain the phonetic "
    "pronunciation as closely as possible. Only return the transliterated "
    "text, no explanations."
)


# ---------------------------------------------------------------------------
# rule-based romanizer (offline backend)
# ---------------------------------------------------------------------------

# independent vowels
_VOWELS = {
    "అ": "a", "ఆ": "aa", "ఇ": "i", "ఈ": "ee", "ఉ": "u", "ఊ": "oo",
    "ఋ": "ru", "ౠ": "ruu", "ఎ": "e", "ఏ": "e", "ఐ": "ai", "ఒ": "o",
    "ఓ": "o", "ఔ": "au",
}

# consonants with inherent 'a' suppressed (base sound only)
_CONSONANTS = {
    "క": "k", "ఖ": "kh", "గ": "g", "ఘ": "gh", "ఙ": "ng",
    "చ": "ch", "ఛ": "chh", "జ": "j", "ఝ": "jh", "ఞ": "gn",
    "ట": "t", "ఠ": "th", "డ": "d", "ఢ": "dh", "ణ": "n",
    "త": "t", "థ": "th", "ద": "d", "ధ": "dh", "న": "n",
    "ప": "p", "ఫ": "ph", "బ": "b", "భ": "bh", "మ": "m",
    "య": "y", "ర": "r", "ల": "l", "వ": "v",
    "శ": "sh", "ష": "sh", "స": "s", "హ": "h",
    "ళ": "l", "ఱ": "r", "ఴ": "zh",
}

# dependent vowel signs (matras)
_MATRAS = {
    "ా": "aa", "ి": "i", "ీ": "ee", "ు": "u", "ూ": "oo",
    "ృ": "ru", "ౄ": "ruu", "ె": "e", "ే": "e", "ై": "ai",
    "ొ": "o", "ో": "o", "ౌ": "au",
}

_VIRAMA = "్"
_ANUSVARA = "ం"
_VISARGA = "ః"
_CANDRABINDU = "ఁ"

# Telugu digits U+0C66–0C6F
_DIGITS = {chr(0x0C66 + i): str(i) for i in range(10)}


def romanize_telugu(text: str) -> str:
    """Deterministic phonetic Telugu→Latin romanization.

    A consonant carries the inherent 'a' unless followed by a matra (which
    replaces it) or a virama (which suppresses it, forming a conjunct).
    Anusvara nasalizes as 'm'; visarga aspirates as 'h'.  Characters outside
    the Telugu block pass through unchanged, so mixed-script text (the RESPIN
    corpus has English loanwords) survives.
    """
    out = []
    chars = list(text)
    i = 0
    n = len(chars)
    while i < n:
        c = chars[i]
        if c in _CONSONANTS:
            out.append(_CONSONANTS[c])
            nxt = chars[i + 1] if i + 1 < n else ""
            if nxt in _MATRAS:
                out.append(_MATRAS[nxt])
                i += 2
                continue
            if nxt == _VIRAMA:
                i += 2
                continue
            out.append("a")
            i += 1
            continue
        if c in _VOWELS:
            out.append(_VOWELS[c])
        elif c == _ANUSVARA or c == _CANDRABINDU:
            out.append("m")
        elif c == _VISARGA:
            out.append("h")
        elif c in _DIGITS:
            out.append(_DIGITS[c])
        elif c in _MATRAS or c == _VIRAMA:
            # stray combining mark (malformed input): drop it
            pass
        else:
            out.append(c)
        i += 1
    return "".join(out)


class RuleBackend:
    """Offline backend: answers every request with the rule romanizer."""

    def run(self, requests_path: str) -> Dict[str, str]:
        results: Dict[str, str] = {}
        with open(requests_path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                req = json.loads(line)
                # the user message embeds the Telugu text after the prompt
                # prefix — identical request schema to the reference
                content = req["body"]["messages"][1]["content"]
                telugu = content.split(": ", 1)[1]
                results[req["custom_id"]] = romanize_telugu(telugu)
        return results


class OpenAIBackend:
    """The reference's remote flow: upload requests, poll, download.

    Requires the ``openai`` package and ``OPENAI_API_KEY``; unavailable in
    zero-egress images (this module degrades to the rule backend there).
    """

    def __init__(self, api_key: Optional[str] = None, poll_seconds: int = 60):
        from openai import OpenAI  # raises ImportError offline

        self.client = OpenAI(api_key=api_key)
        self.poll_seconds = poll_seconds

    def run(self, requests_path: str) -> Dict[str, str]:
        import time

        with open(requests_path, "rb") as f:
            batch_file = self.client.files.create(file=f, purpose="batch")
        job = self.client.batches.create(
            input_file_id=batch_file.id,
            endpoint="/v1/chat/completions",
            completion_window="24h",
        )
        logger.info("created batch job %s", job.id)
        while True:
            job = self.client.batches.retrieve(job.id)
            if job.status == "completed":
                break
            if job.status in ("failed", "cancelled"):
                raise RuntimeError(f"batch {job.id} {job.status}")
            time.sleep(self.poll_seconds)
        content = self.client.files.content(job.output_file_id)
        results: Dict[str, str] = {}
        for line in content.text.splitlines():
            if not line.strip():
                continue
            item = json.loads(line)
            body = (item.get("response") or {}).get("body")
            if body:
                results[item["custom_id"]] = (
                    body["choices"][0]["message"]["content"].strip()
                )
            else:
                logger.warning("error for %s: %s", item["custom_id"],
                               item.get("error", "unknown"))
                results[item["custom_id"]] = ""
        return results


# ---------------------------------------------------------------------------
# pipeline stages
# ---------------------------------------------------------------------------


def _extract_text(row: dict) -> Optional[str]:
    for field in _TEXT_FIELDS:
        if row.get(field):
            return row[field]
    return None


def prepare_batch_requests(input_jsonl: str, requests_path: str,
                           model: str = "gpt-4o-mini") -> int:
    """Write the request-per-line JSONL; returns the number of requests."""
    count = 0
    with open(input_jsonl, encoding="utf-8") as fin, \
            open(requests_path, "w", encoding="utf-8") as fout:
        for i, line in enumerate(fin):
            if not line.strip():
                continue
            row = json.loads(line)
            telugu = _extract_text(row)
            if not telugu:
                logger.warning("no Telugu text in line %d, skipping", i + 1)
                continue
            request = {
                "custom_id": f"request_{i}",
                "method": "POST",
                "url": "/v1/chat/completions",
                "body": {
                    "model": model,
                    "messages": [
                        {"role": "system", "content": SYSTEM_PROMPT},
                        {"role": "user",
                         "content": f"Transliterate this Telugu text to English: {telugu}"},
                    ],
                    "max_tokens": 1000,
                    "temperature": 0.1,
                },
            }
            fout.write(json.dumps(request, ensure_ascii=False) + "\n")
            count += 1
    logger.info("prepared %d batch requests", count)
    return count


def merge_results(input_jsonl: str, results_by_id: Dict[str, str],
                  output_jsonl: str) -> int:
    """Join responses to original rows, emitting the reference result schema."""
    count = 0
    with open(input_jsonl, encoding="utf-8") as fin, \
            open(output_jsonl, "w", encoding="utf-8") as fout:
        for i, line in enumerate(fin):
            if not line.strip():
                continue
            row = json.loads(line)
            telugu = _extract_text(row)
            if not telugu:
                continue
            fout.write(json.dumps({
                "wav_path": row.get("wav_path", ""),
                "duration": row.get("duration", ""),
                "telugu_text": telugu,
                "english_text": results_by_id.get(f"request_{i}", ""),
            }, ensure_ascii=False) + "\n")
            count += 1
    logger.info("saved %d transliterated results to %s", count, output_jsonl)
    return count


def process_file(input_jsonl: str, output_jsonl: str, backend=None,
                 temp_dir: Optional[str] = None) -> int:
    """Full pipeline: prepare → execute → merge.  Returns rows written."""
    backend = backend or RuleBackend()
    temp_dir = temp_dir or os.path.dirname(os.path.abspath(output_jsonl))
    os.makedirs(temp_dir, exist_ok=True)
    requests_path = os.path.join(temp_dir, "batch_requests.jsonl")
    try:
        prepare_batch_requests(input_jsonl, requests_path)
        results = backend.run(requests_path)
        return merge_results(input_jsonl, results, output_jsonl)
    finally:
        if os.path.exists(requests_path):
            os.remove(requests_path)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("input", help="metadata JSONL (telugu_text/text/transcript rows)")
    parser.add_argument("output", help="results JSONL path")
    parser.add_argument("--backend", choices=["rule", "openai"], default="rule")
    parser.add_argument("--poll-seconds", type=int, default=60)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.backend == "openai":
        backend = OpenAIBackend(poll_seconds=args.poll_seconds)
    else:
        backend = RuleBackend()
    process_file(args.input, args.output, backend=backend)


if __name__ == "__main__":
    main()
