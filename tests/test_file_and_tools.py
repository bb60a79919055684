import os
import subprocess
import sys

import numpy as np

from telugu_asr_tpu.audio.io import write_wav_file
from telugu_asr_tpu.utils.file import is_hdf5_filepath, preprocess_paths

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_preprocess_paths(tmp_path):
    p = preprocess_paths(str(tmp_path / "sub" / "x.txt"))
    assert os.path.isabs(p)
    assert os.path.isdir(os.path.dirname(p))
    assert preprocess_paths(None) is None
    out = preprocess_paths([str(tmp_path / "a"), str(tmp_path / "b")])
    assert len(out) == 2


def test_is_hdf5():
    assert is_hdf5_filepath("x.h5")
    assert not is_hdf5_filepath("x.ckpt")


def test_prepare_dataset_cli(tmp_path):
    audio_dir = tmp_path / "wavs"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    trans_lines = []
    for i in range(4):
        n = 8000 + i * 1000
        write_wav_file(str(audio_dir / f"utt{i}.wav"), (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)
        # includes decomposed unicode that NFC must normalize
        trans_lines.append(f"utt{i}\tకరెంటు  బిల్లు {i}")
    trans = tmp_path / "trans.tsv"
    trans.write_text("\n".join(trans_lines), encoding="utf-8")
    out = tmp_path / "all.tsv"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_dataset.py"),
         "--audio-dir", str(audio_dir), "--transcripts", str(trans), "--output", str(out)],
        capture_output=True, text=True, timeout=120,
    )
    assert result.returncode == 0, result.stderr
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines[0] == "PATH\tDURATION\tTRANSCRIPT"
    assert len(lines) == 5
    # double space collapsed by normalization
    assert "కరెంటు బిల్లు 0" in lines[1] or "కరెంటు బిల్లు" in lines[1]
