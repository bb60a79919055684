"""TSV datasets with duration-bucketed, static-shape batching.

The reference's pipeline (moonshine/dataset.py:142-267) is fully dynamic:
``padded_batch(None)`` pads every batch to its own max — fine on GPU, a
recompile storm on TPU.  Here batches are duration-bucketed and padded up to
quantized boundaries so the jitted step sees a SMALL, FIXED set of shapes:

* entries sorted by duration and grouped, so same-batch utterances are close
  in length (less padding waste than the reference's random batching);
* audio padded to the next multiple of ``audio_quantum`` samples, token
  sequences to the next multiple of ``text_quantum``;
* train-time shuffling permutes the bucketed batches (and jitters bucket
  membership windows), preserving static shapes while decorrelating order.

Transcripts are tokenized ONCE up front on the host (the reference escapes
into a ``tf.py_function`` per sample per epoch, dataset.py:175-179).
TSV schema: ``PATH\tDURATION\tTRANSCRIPT`` with a header row
(dataset.py:148-151 splits on the first two tabs only).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from telugu_asr_tpu.audio.io import read_wav_file
from telugu_asr_tpu.data.schemas import TargetLabels, TrainInput

__all__ = ["DatasetSpec", "ASRDataset", "read_tsv_entries"]


def read_tsv_entries(data_paths: Sequence[str]) -> List[tuple]:
    """Read ``(path, duration, transcript)`` rows, skipping each header."""
    entries = []
    for file_path in data_paths:
        with open(file_path, "r", encoding="utf-8") as f:
            lines = f.read().splitlines()
        for line in lines[1:]:
            parts = line.split("\t", 2)
            if len(parts) == 3:
                entries.append((parts[0], float(parts[1]), parts[2]))
    return entries


@dataclasses.dataclass
class DatasetSpec:
    """Mirrors the reference DatasetConfig keys (configs.py:39-52)."""

    data_paths: Sequence[str]
    stage: str = "train"
    shuffle: bool = False
    drop_remainder: bool = True
    cache: bool = False
    indefinite: bool = False
    buffer_size: int = 1000  # shuffle window, reference semantics
    sample_rate: int = 16000
    enabled: bool = True

    @classmethod
    def from_config(cls, dataset_config, base_dir: str = ".") -> "DatasetSpec":
        d = dict(dataset_config)
        paths = [
            p if os.path.isabs(p) else os.path.join(base_dir, p)
            for p in (d.get("data_paths") or [])
        ]
        return cls(
            data_paths=paths,
            stage=d.get("stage") or "train",
            shuffle=bool(d.get("shuffle", False)),
            drop_remainder=bool(d.get("drop_remainder", True)),
            cache=bool(d.get("cache", False)),
            indefinite=bool(d.get("indefinite", False)),
            buffer_size=int(d.get("buffer_size", 1000)),
            enabled=bool(d.get("enabled", True)),
        )


def _round_up(n: int, quantum: int) -> int:
    return ((n + quantum - 1) // quantum) * quantum


class ASRDataset:
    """Seq2seq dataset: raw audio + ``[BOS]+tokens`` / ``tokens+[EOS]`` pairs."""

    def __init__(
        self,
        spec: DatasetSpec,
        tokenizer,
        *,
        audio_quantum: int = 16000,
        text_quantum: int = 16,
        max_audio_seconds: float = 30.0,
        seed: int = 42,
        use_native: str = "auto",
        transfer_dtype: Optional[str] = None,
    ):
        self.spec = spec
        self.tokenizer = tokenizer
        self.audio_quantum = audio_quantum
        self.text_quantum = text_quantum
        # "int16": emit audio batches as PCM16 (rint(x·32768)) — HALF the
        # host→device bytes; the featurizer dequantizes in-graph.  Bit-exact
        # for WAV (PCM16) sources, ~3e-5 rounding otherwise.
        if transfer_dtype not in (None, "float32", "int16"):
            raise ValueError(f"transfer_dtype must be int16/float32, got {transfer_dtype}")
        self.transfer_dtype = transfer_dtype
        self.max_audio_samples = int(max_audio_seconds * spec.sample_rate)
        self._rng = np.random.default_rng(seed)
        self._audio_cache: Optional[dict] = {} if spec.cache else None
        self._native = None
        if use_native in ("auto", "always"):
            try:
                from telugu_asr_tpu.runtime import NativeAudioDecoder

                self._native = NativeAudioDecoder(num_threads=4)
            except Exception:
                if use_native == "always":
                    raise
                self._native = None

        self.entries = read_tsv_entries(spec.data_paths) if spec.enabled else []
        # Tokenize once: ids = [BOS] + subwords + [EOS] (dataset.py:169-190).
        self._token_ids = [
            np.asarray(tokenizer.encode(t, add_special_tokens=True), np.int32)
            for _, _, t in self.entries
        ]
        # Fail fast on ids outside the embedding table — an out-of-bounds
        # lookup is a silent NaN on TPU, not an error.
        for ids, (path, _, _) in zip(self._token_ids, self.entries):
            if ids.size and int(ids.max()) >= tokenizer.vocab_size:
                raise ValueError(
                    f"token id {int(ids.max())} >= vocab_size {tokenizer.vocab_size} "
                    f"for {path}"
                )
        # Duration-sorted index for bucketing.
        self._sorted_idx = np.argsort([d for _, d, _ in self.entries], kind="stable")
        self.total_steps: Optional[int] = None

    def __len__(self) -> int:
        return len(self.entries)

    def num_batches(self, batch_size: int) -> int:
        n = len(self.entries)
        return n // batch_size if self.spec.drop_remainder else -(-n // batch_size)

    # -- loading -------------------------------------------------------------
    def _load_audio(self, index: int) -> np.ndarray:
        if self._audio_cache is not None and index in self._audio_cache:
            return self._audio_cache[index]
        path = self.entries[index][0]
        wave, sr = read_wav_file(path)
        # Reference tensor path never resamples (data_util.py:30-33);
        # sources are expected at the target rate.
        wave = wave[: self.max_audio_samples]
        if self._audio_cache is not None:
            self._audio_cache[index] = wave
        return wave

    def _load_batch_audio(self, indices: np.ndarray):
        """Decode a batch of utterances → (audio [n, max_samples], lengths).

        Uses the native multithreaded decoder when available (one C call per
        batch, rows land directly in the padded buffer); Python fallback per
        file.  ``max_samples`` is estimated from the TSV DURATION column and
        quantized for static XLA shapes.
        """
        if self._native is not None and self._audio_cache is None:
            sr = self.spec.sample_rate
            est = [
                min(int(round(self.entries[i][1] * sr)) + sr // 4, self.max_audio_samples)
                for i in indices
            ]
            max_samples = _round_up(max(max(est), 1), self.audio_quantum)
            paths = [self.entries[i][0] for i in indices]
            audio, lengths, failures = self._native.decode_batch(paths, max_samples)
            if failures == 0:
                return audio, lengths, max_samples
            # fall through to the Python path on any decode failure
        waves = [self._load_audio(i) for i in indices]
        max_samples = _round_up(max(len(w) for w in waves), self.audio_quantum)
        audio = np.zeros((len(indices), max_samples), np.float32)
        lengths = np.zeros((len(indices),), np.int32)
        for row, w in enumerate(waves):
            audio[row, : len(w)] = w
            lengths[row] = len(w)
        return audio, lengths, max_samples

    def _quantize_audio(self, audio: np.ndarray) -> np.ndarray:
        if self.transfer_dtype == "int16":
            return np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
        return audio

    def _make_batch(self, indices: np.ndarray) -> tuple:
        audio, audio_lengths, _ = self._load_batch_audio(indices)
        audio = self._quantize_audio(audio)
        tokens = [self._token_ids[i] for i in indices]
        # shifted = ids[:-1], targets = ids[1:] (dataset.py:187-190)
        max_tokens = _round_up(max(len(t) - 1 for t in tokens), self.text_quantum)
        pad_id = self.tokenizer.pad_token_id

        shifted = np.full((len(indices), max_tokens), pad_id, np.int32)
        targets = np.full((len(indices), max_tokens), pad_id, np.int32)
        for row, t in enumerate(tokens):
            n = len(t) - 1
            shifted[row, :n] = t[:-1]
            targets[row, :n] = t[1:]
        return (
            TrainInput(audio, audio_lengths, shifted),
            TargetLabels(targets),
            indices,
        )

    def _batch_indices(self, batch_size: int) -> List[np.ndarray]:
        """Duration-bucketed batch index lists."""
        order = self._sorted_idx.copy()
        if self.spec.shuffle:
            # Jitter within a window to vary bucket membership across epochs,
            # keeping near-sorted order (so padding waste stays low).
            window = max(batch_size * 4, 1)
            jitter = self._rng.uniform(0, window, size=len(order))
            order = order[np.argsort(np.arange(len(order)) + jitter, kind="stable")]
        batches = [
            order[i : i + batch_size] for i in range(0, len(order), batch_size)
        ]
        if self.spec.drop_remainder and batches and len(batches[-1]) < batch_size:
            batches.pop()
        if self.spec.shuffle:
            self._rng.shuffle(batches)
        return batches

    def batches(self, batch_size: int) -> Iterator[tuple]:
        """One epoch of ``(TrainInput, TargetLabels, entry_indices)``."""
        self.total_steps = self.num_batches(batch_size)
        for idx in self._batch_indices(batch_size):
            yield self._make_batch(idx)

    def infinite_batches(self, batch_size: int) -> Iterator[tuple]:
        while True:
            yield from self.batches(batch_size)


class TransducerASRDataset(ASRDataset):
    """Transducer schema (src/dataset.py:18-281): labels are the plain token
    sequence (no BOS/EOS — the [BLANK]-based tokenizer, src/tokenizer.py:26),
    ``prediction`` is the blank-prepended sequence, with explicit lengths."""

    def __init__(self, spec, tokenizer, blank_id: int = 0, **kwargs):
        self.blank_id = blank_id
        super().__init__(spec, tokenizer, **kwargs)
        # re-tokenize without specials
        self._token_ids = [
            np.asarray(tokenizer.encode(t, add_special_tokens=False), np.int32)
            for _, _, t in self.entries
        ]

    def _make_batch(self, indices: np.ndarray) -> tuple:
        from telugu_asr_tpu.data.schemas import TransducerTargetLabels, TransducerTrainInput

        audio, audio_lengths, _ = self._load_batch_audio(indices)
        audio = self._quantize_audio(audio)
        tokens = [self._token_ids[i] for i in indices]
        max_labels = _round_up(max(len(t) for t in tokens), self.text_quantum)

        n = len(indices)
        labels = np.full((n, max_labels), self.blank_id, np.int32)
        labels_length = np.zeros((n,), np.int32)
        prediction = np.full((n, max_labels + 1), self.blank_id, np.int32)
        for row, t in enumerate(tokens):
            labels[row, : len(t)] = t
            labels_length[row] = len(t)
            prediction[row, 1 : len(t) + 1] = t  # [BLANK] + labels
        return (
            TransducerTrainInput(audio, audio_lengths, prediction, labels_length + 1),
            TransducerTargetLabels(labels, labels_length),
            indices,
        )
