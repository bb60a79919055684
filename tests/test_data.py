"""Data pipeline: TSV parsing, bucketing, static-shape batching, schemas."""
import os

import numpy as np
import pytest

from telugu_asr_tpu.audio.io import read_wav_file, write_wav_file
from telugu_asr_tpu.data import ASRDataset, DatasetSpec, PrefetchLoader, read_tsv_entries
from telugu_asr_tpu.text import make_default_tokenizer

TEXTS = [
    "కరెంటు బిల్లు",
    "ఒక వారం నుంచి భోజనం",
    "తిన్న తిండి చక్కగా అరుగుతంది",
    "నియమాలు",
]


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for i, text in enumerate(TEXTS):
        n = 16000 + i * 4000
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = str(root / f"utt{i}.wav")
        write_wav_file(path, wave, 16000)
        rows.append(f"{path}\t{n/16000:.2f}\t{text}")
    tsv = root / "data.tsv"
    tsv.write_text("\n".join(rows), encoding="utf-8")
    return str(tsv)


def test_wav_roundtrip(tmp_path):
    wave = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav_file(path, wave, 16000)
    back, sr = read_wav_file(path)
    assert sr == 16000
    np.testing.assert_allclose(back, wave, atol=1 / 32768)


def test_read_tsv(tiny_corpus):
    entries = read_tsv_entries([tiny_corpus])
    assert len(entries) == 4
    assert entries[0][2] == TEXTS[0]


def test_batches_shapes_and_schema(tiny_corpus):
    tok = make_default_tokenizer()
    ds = ASRDataset(
        DatasetSpec(data_paths=[tiny_corpus], stage="test", drop_remainder=False),
        tok,
        audio_quantum=8000,
        text_quantum=4,
    )
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 2
    inputs, labels, indices = batches[0]
    assert inputs["audio"].shape[0] == 2
    assert inputs["audio"].shape[1] % 8000 == 0
    assert inputs["shifted_right_text_inputs"].shape == labels["text_targets"].shape
    assert inputs["shifted_right_text_inputs"].shape[1] % 4 == 0
    # shifted/target relation: shifted starts with BOS, target ends with EOS
    for row in range(2):
        entry_idx = indices[row]
        ids = tok.encode(ds.entries[entry_idx][2], add_special_tokens=True)
        n = len(ids) - 1
        np.testing.assert_array_equal(inputs["shifted_right_text_inputs"][row, :n], ids[:-1])
        np.testing.assert_array_equal(labels["text_targets"][row, :n], ids[1:])
        assert inputs["shifted_right_text_inputs"][row, 0] == tok.bos_token_id
        assert labels["text_targets"][row, n - 1] == tok.eos_token_id
        # padding is PAD
        assert np.all(labels["text_targets"][row, n:] == tok.pad_token_id)


def test_bucketing_sorts_by_duration(tiny_corpus):
    tok = make_default_tokenizer()
    ds = ASRDataset(
        DatasetSpec(data_paths=[tiny_corpus], stage="test", drop_remainder=False),
        tok,
    )
    batches = list(ds.batches(batch_size=2))
    # batches are in duration order when not shuffled
    d0 = max(ds.entries[i][1] for i in batches[0][2])
    d1 = min(ds.entries[i][1] for i in batches[1][2])
    assert d0 <= d1


def test_drop_remainder(tiny_corpus):
    tok = make_default_tokenizer()
    ds = ASRDataset(
        DatasetSpec(data_paths=[tiny_corpus], stage="train", drop_remainder=True), tok
    )
    assert len(list(ds.batches(batch_size=3))) == 1
    assert ds.num_batches(3) == 1


def test_prefetch_loader(tiny_corpus):
    tok = make_default_tokenizer()
    ds = ASRDataset(
        DatasetSpec(data_paths=[tiny_corpus], stage="test", drop_remainder=False), tok
    )
    items = list(PrefetchLoader(ds.batches(batch_size=2)))
    assert len(items) == 2


def test_prefetch_loader_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    loader = PrefetchLoader(gen())
    assert next(loader) == 1
    with pytest.raises(ValueError):
        next(loader)
        next(loader)


def test_prefetch_loader_transform_runs_in_worker():
    loader = PrefetchLoader(iter([1, 2, 3]), transform=lambda x: x * 10)
    assert list(loader) == [10, 20, 30]


def test_int16_transfer_bit_exact_for_pcm16(tiny_corpus):
    """int16 transfer (train.py default) must reproduce the float pipeline
    BIT-exactly for PCM16 wav sources: rint(x*32768)/32768 == x."""
    import jax.numpy as jnp

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer

    tok = make_default_tokenizer()
    spec = DatasetSpec(data_paths=[tiny_corpus], stage="test", drop_remainder=False)
    ds_f32 = ASRDataset(spec, tok)
    ds_i16 = ASRDataset(spec, tok, transfer_dtype="int16")
    (in_f, _, _), (in_i, _, _) = next(ds_f32.batches(4)), next(ds_i16.batches(4))
    assert in_i["audio"].dtype == np.int16
    feat = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))
    f_ref, _ = feat(jnp.asarray(in_f["audio"]), jnp.asarray(in_f["audio_lengths"]))
    f_q, _ = feat(jnp.asarray(in_i["audio"]), jnp.asarray(in_i["audio_lengths"]))
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_q))
