"""Evaluation harness: batched recognition → reference-format TSV → WER/CER.

Byte-compatible with the reference artifacts (exec_helpers.py:12-38,
app_util.py:11-34): a ``PATH\tDURATION\tGROUNDTRUTH\tGREEDY`` file (header
included) written in entry order, then WER/CER recomputed FROM THE FILE.
Ground truth follows the reference's round-trip law — it is the decoded
tokenization of the transcript (base_model.py:133-181 decodes
``text_targets``), so characters outside the vocabulary fall out as ``[UNK]``
drops on both sides of the metric.

Decoding is batched over duration-bucketed batches with quantized padded
shapes (one XLA program per bucket shape, compiled once and reused).
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from telugu_asr_tpu.audio.featurizer import SpeechFeaturizer
from telugu_asr_tpu.data.dataset import ASRDataset
from telugu_asr_tpu.decode.greedy import default_max_length, greedy_decode
from telugu_asr_tpu.metrics import ErrorRate, cer, wer
from telugu_asr_tpu.models.moonshine.model import ASRModel

logger = logging.getLogger("telugu_asr_tpu")

__all__ = ["run_testing", "evaluate_results", "predict_batches"]

_SENTINEL = object()


def _prefetch(iterable, transform, depth: int):
    """Yield ``transform(item)`` for each item, computed in a background
    thread up to ``depth`` items ahead.

    The eval pipeline's host work — disk read + WAV decode + bucketing in
    ``dataset.batches`` and the host→device PCM transfer in ``transform`` —
    runs in the producer thread while the main thread dispatches device
    decode and blocks on token readbacks, so IO, transfer and compute all
    overlap (the transfer is the end-to-end bound on tunneled deployments:
    ~21 MB/s vs a device pipeline at ~17,000× real time).  Producer
    exceptions re-raise in the consumer."""
    out: "queue.Queue" = queue.Queue(maxsize=depth)
    errors: list = []
    stop = threading.Event()

    def worker() -> None:
        try:
            for item in iterable:
                data = transform(item)
                # bounded put that notices consumer abandonment: an early
                # break upstream (e.g. quick_val_wer's max_batches) must not
                # leave this thread blocked forever pinning device buffers
                # and the dataset iterator (observed as a per-epoch host
                # memory leak under --val-wer-every)
                while not stop.is_set():
                    try:
                        out.put(data, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
                del data
        except BaseException as exc:  # re-raised below, never swallowed
            errors.append(exc)
        finally:
            # The sentinel must actually LAND: a dropped sentinel (full
            # queue at producer exit) deadlocks the consumer's final get().
            # Bounded puts so consumer abandonment still lets us exit.
            while not stop.is_set():
                try:
                    out.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=worker, name="eval-prefetch", daemon=True)
    thread.start()
    try:
        while True:
            item = out.get()
            if item is _SENTINEL:
                thread.join()
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # unblock a waiting put and drop pinned buffers
            try:
                out.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5.0)


def predict_batches(
    model: ASRModel,
    params: dict,
    featurizer: SpeechFeaturizer,
    dataset: ASRDataset,
    batch_size: int,
    *,
    tokens_per_second: float = 24.0,
    parity_unmasked_cross: bool = False,
    max_length_quantum: int = 8,
    cache_dtype=None,
    cross_cache_dtype=None,
    fast_segments: bool = False,
    beam_size: int = 1,
    decode_opts: dict = None,
    prefetch_depth: int = 2,
):
    """Yield ``(entry_indices, hypothesis_texts, groundtruth_texts)`` per batch.

    ``beam_size > 1`` decodes with beam search (fused kernel on TPU when it
    fits, decode/beam.py auto-resolve) — a capability extension over the
    reference's greedy-only eval.

    Host→device audio ships as int16 (half the bytes of float32 — the
    transfer, not compute, bounds end-to-end eval throughput), and a
    ``prefetch_depth``-deep producer thread keeps the disk IO + transfer
    of upcoming batches running underneath device decode and token
    readback (``_prefetch``), so the wall time approaches
    max(transfer, compute) instead of their sum.
    """
    tokenizer = dataset.tokenizer
    decode_opts = dict(decode_opts or {})  # beam-only exposure-bias knobs
    if beam_size > 1 and (cross_cache_dtype is not None or fast_segments):
        raise ValueError("cross_cache_dtype / fast_segments are greedy "
                         "fused-kernel modes; beam search takes cache_dtype "
                         "and decode_opts only")
    if beam_size == 1:
        bad = {k: v for k, v in decode_opts.items()
               if k in ("length_penalty", "no_repeat_ngram") and v}
        if bad:
            raise ValueError(f"{sorted(bad)} are beam-search options; greedy "
                             "decode supports repetition_penalty only")

    def to_device(inputs):
        # PCM is inherently 16-bit; ship int16 and rescale on device.
        pcm = np.clip(inputs["audio"] * 32768.0, -32768, 32767).astype(np.int16)
        return jax.device_put(pcm), jax.device_put(inputs["audio_lengths"])

    @partial(jax.jit, static_argnames=("max_len",))
    def run(params, audio_i16, lengths, max_len):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        features, feat_lengths = featurizer(audio, lengths)
        encoder_out, encoder_mask = model.encode(params, features, feat_lengths)
        if beam_size > 1:
            from telugu_asr_tpu.decode.beam import beam_search_decode

            tokens, _ = beam_search_decode(
                model, params, encoder_out, encoder_mask,
                max_length=max_len, beam_size=beam_size,
                bos_id=tokenizer.bos_token_id,
                eos_id=tokenizer.eos_token_id,
                pad_id=tokenizer.pad_token_id,
                cache_dtype=cache_dtype,
                **decode_opts,
            )
            return tokens
        tokens, _ = greedy_decode(
            model,
            params,
            encoder_out,
            encoder_mask,
            max_length=max_len,
            bos_id=tokenizer.bos_token_id,
            eos_id=tokenizer.eos_token_id,
            pad_id=tokenizer.pad_token_id,
            parity_unmasked_cross=parity_unmasked_cross,
            cache_dtype=cache_dtype,
            cross_cache_dtype=cross_cache_dtype,
            fast_segments=fast_segments,
            repetition_penalty=float(
                decode_opts.get("repetition_penalty", 1.0)),
        )
        return tokens

    def launch(audio_i16, lengths):
        num_frames = featurizer.get_nframes(audio_i16.shape[-1])
        max_len = default_max_length(
            int(num_frames), tokens_per_second=tokens_per_second
        )
        max_len = ((max_len + max_length_quantum - 1) // max_length_quantum) * max_length_quantum
        return run(params, audio_i16, lengths, max_len=max_len)

    def ship(batch):
        inputs, labels, indices = batch
        return to_device(inputs), labels, indices

    pending = None  # (indices, labels, tokens) awaiting readback
    for device_batch, labels, indices in _prefetch(
        dataset.batches(batch_size), ship, depth=prefetch_depth
    ):
        # dispatch THIS batch's decode (async) before blocking on the
        # previous batch's token readback: the device stays busy through
        # the readback and the producer thread refills the queue meanwhile
        tokens = launch(*device_batch)
        if pending is not None:
            yield _finish(tokenizer, *pending)
        pending = (indices, labels, tokens)
    if pending is not None:
        yield _finish(tokenizer, *pending)


def _finish(tokenizer, indices, labels, tokens):
    hyp = tokenizer.batch_decode(np.asarray(tokens).tolist(), skip_special_tokens=True)
    ref = tokenizer.batch_decode(
        np.asarray(labels["text_targets"]).tolist(), skip_special_tokens=True
    )
    return indices, hyp, ref


def transducer_predict_batches(
    model,
    params: dict,
    model_state: dict,
    featurizer: SpeechFeaturizer,
    dataset,
    batch_size: int,
):
    """Greedy transducer decode per batch → (indices, hyp texts, ref texts)."""
    tokenizer = dataset.tokenizer
    for inputs, labels, indices in _prefetch(
        dataset.batches(batch_size), lambda b: b, depth=2
    ):
        features, feat_lengths = featurizer(inputs["audio"], inputs["audio_lengths"])
        frame_tokens, _ = model.recognize(params, model_state, features, feat_lengths)
        stripped = model.strip_blanks(frame_tokens, model.cfg.blank_id)
        hyp = [tokenizer.decode(seq, skip_special_tokens=True) for seq in stripped]
        ref = []
        for row, n in zip(np.asarray(labels["labels"]), np.asarray(labels["labels_length"])):
            ref.append(tokenizer.decode(row[: int(n)], skip_special_tokens=True))
        yield indices, hyp, ref


def run_testing(
    model: ASRModel,
    params: dict,
    featurizer: SpeechFeaturizer,
    dataset: ASRDataset,
    batch_size: int,
    output: str,
    *,
    tokens_per_second: float = 24.0,
    parity_unmasked_cross: bool = False,
    family: str = "moonshine",
    model_state: dict = None,
    beam_size: int = 1,
    decode_opts: dict = None,
    cache_dtype=None,
    cross_cache_dtype=None,
    fast_segments: bool = False,
) -> Dict[str, float]:
    """Predict the whole dataset, write the TSV artifact, return metrics."""
    rows: dict = {}
    start = time.perf_counter()
    audio_seconds = 0.0
    if family == "conformer":
        batch_iter = transducer_predict_batches(
            model, params, model_state or {}, featurizer, dataset, batch_size
        )
    else:
        batch_iter = predict_batches(
            model,
            params,
            featurizer,
            dataset,
            batch_size,
            tokens_per_second=tokens_per_second,
            parity_unmasked_cross=parity_unmasked_cross,
            beam_size=beam_size,
            decode_opts=decode_opts,
            cache_dtype=cache_dtype,
            cross_cache_dtype=cross_cache_dtype,
            fast_segments=fast_segments,
        )
    batch_seconds = []
    tick = start
    for indices, hyps, refs in batch_iter:
        now = time.perf_counter()
        batch_seconds.append(now - tick)
        tick = now
        for i, hyp, ref in zip(indices, hyps, refs):
            path, duration, _ = dataset.entries[i]
            rows[int(i)] = (path, duration, ref, hyp)
            audio_seconds += float(duration)
    elapsed = time.perf_counter() - start

    with open(output, "w", encoding="utf-8") as f:
        f.write("PATH\tDURATION\tGROUNDTRUTH\tGREEDY\n")
        for i in sorted(rows):
            path, duration, ref, hyp = rows[i]
            f.write(f"{path}\t{duration}\t{ref}\t{hyp}\n")

    metrics = evaluate_results(output)
    metrics["rtfx"] = audio_seconds / elapsed if elapsed > 0 else float("inf")
    metrics["utterances_per_second"] = len(rows) / elapsed if elapsed > 0 else float("inf")
    metrics["elapsed_seconds"] = elapsed
    if batch_seconds:
        # Pacing attribution: on tunneled deployments the transport exhibits
        # sporadic one-sided stalls (observed up to minutes) that can dominate
        # wall time without any pipeline regression.  Report the median-paced
        # wall alongside the raw one so runs self-diagnose: a healthy pipeline
        # shows steady_state_elapsed ≈ elapsed; a stalled transport shows the
        # gap concentrated in a few batches (stall_seconds).
        paced = sorted(batch_seconds)
        median = paced[len(paced) // 2]
        steady = median * len(batch_seconds)
        metrics["batch_seconds_median"] = median
        metrics["batch_seconds_max"] = paced[-1]
        metrics["steady_state_elapsed"] = steady
        metrics["stall_seconds"] = max(0.0, elapsed - steady)
        logger.info(
            "batch pacing: n=%d median=%.3fs p95=%.3fs max=%.3fs "
            "(steady-state wall %.1fs vs raw %.1fs)",
            len(paced), median, paced[int(len(paced) * 0.95)], paced[-1],
            steady, elapsed,
        )
    logger.info("run_testing: %s", metrics)
    return metrics


def quick_val_wer(
    model: ASRModel,
    params: dict,
    featurizer: SpeechFeaturizer,
    dataset: ASRDataset,
    batch_size: int,
    max_batches: int = 2,
) -> Dict[str, float]:
    """Greedy WER/CER over a few validation batches — the per-epoch quality
    signal the reference lacked (it tracked only val_loss, SURVEY §5)."""
    import contextlib

    wer_m = ErrorRate(wer, "val_wer")
    cer_m = ErrorRate(cer, "val_cer")
    # closing() shuts the prefetch producer down deterministically at the
    # early break — without it each epoch's tick leaked the blocked thread
    # plus its pinned device batches for the life of the training process
    with contextlib.closing(
        predict_batches(model, params, featurizer, dataset, batch_size)
    ) as batches:
        for n, (_, hyps, refs) in enumerate(batches):
            wer_m.update_state(hyps, refs)
            cer_m.update_state(hyps, refs)
            if n + 1 >= max_batches:
                break
    return {"val_wer": wer_m.result(), "val_cer": cer_m.result()}


def evaluate_results(filepath: str) -> Dict[str, float]:
    """Recompute WER/CER from a result TSV (app_util.py:11-34)."""
    metrics = {
        "greedy_wer": ErrorRate(wer, name="greedy_wer"),
        "greedy_cer": ErrorRate(cer, name="greedy_cer"),
    }
    with open(filepath, "r", encoding="utf-8") as f:
        lines = f.read().splitlines()[1:]
    for line in lines:
        _, _, groundtruth, greedy = line.split("\t")
        metrics["greedy_wer"].update_state([greedy], [groundtruth])
        metrics["greedy_cer"].update_state([greedy], [groundtruth])
    return {name: m.result() for name, m in metrics.items()}
