"""Native C++ audio runtime: build, decode parity with the Python reader,
batch decode, and dataset integration."""
import numpy as np
import pytest

from telugu_asr_tpu.audio.io import read_wav_file, write_wav_file
from telugu_asr_tpu.runtime import build_native_library, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable or native build failed"
)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        n = 8000 + i * 2000
        wave = (rng.standard_normal(n) * 0.3).astype(np.float32)
        p = str(root / f"n{i}.wav")
        write_wav_file(p, wave, 16000)
        paths.append((p, n))
    return paths


def test_native_single_decode_matches_python(wavs):
    from telugu_asr_tpu.runtime import NativeAudioDecoder

    dec = NativeAudioDecoder()
    for path, n in wavs:
        native, sr = dec.decode(path, 20000)
        python, sr2 = read_wav_file(path)
        assert sr == sr2 == 16000
        assert len(native) == len(python) == n
        np.testing.assert_allclose(native, python, atol=1e-7)


def test_native_batch_decode(wavs):
    from telugu_asr_tpu.runtime import NativeAudioDecoder

    dec = NativeAudioDecoder(num_threads=3)
    paths = [p for p, _ in wavs]
    audio, lengths, failures = dec.decode_batch(paths, 16000)
    assert failures == 0
    assert audio.shape == (4, 16000)
    for row, (path, n) in enumerate(wavs):
        expect = read_wav_file(path)[0][:16000]
        assert lengths[row] == min(n, 16000)
        np.testing.assert_allclose(audio[row, : lengths[row]], expect, atol=1e-7)
        assert np.all(audio[row, lengths[row]:] == 0.0)


def test_native_batch_failure_isolated(wavs, tmp_path):
    from telugu_asr_tpu.runtime import NativeAudioDecoder

    dec = NativeAudioDecoder()
    bogus = str(tmp_path / "missing.wav")
    paths = [wavs[0][0], bogus]
    audio, lengths, failures = dec.decode_batch(paths, 16000)
    assert failures == 1
    assert lengths[0] > 0 and lengths[1] == 0


def test_dataset_uses_native_path(wavs, tmp_path):
    from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
    from telugu_asr_tpu.text import make_default_tokenizer

    rows = ["PATH\tDURATION\tTRANSCRIPT"]
    for p, n in wavs:
        rows.append(f"{p}\t{n/16000:.2f}\tఒక వారం")
    tsv = tmp_path / "native.tsv"
    tsv.write_text("\n".join(rows), encoding="utf-8")
    ds = ASRDataset(
        DatasetSpec(data_paths=[str(tsv)], stage="test", drop_remainder=False, cache=False),
        make_default_tokenizer(),
        audio_quantum=4000,
        use_native="always",
    )
    assert ds._native is not None
    inputs, _, indices = next(ds.batches(4))
    for row, i in enumerate(indices):
        expect = read_wav_file(ds.entries[i][0])[0]
        n = int(inputs["audio_lengths"][row])
        assert n == len(expect)
        np.testing.assert_allclose(inputs["audio"][row, :n], expect, atol=1e-7)
