import os

from telugu_asr_tpu.configs import load_config
from telugu_asr_tpu.helpers import debug_tokenizer, prepare_featurizers

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prepare_featurizers_from_config():
    cfg = load_config(os.path.join(REPO, "config", "model.yaml"))
    featurizer, tokenizer = prepare_featurizers(cfg)
    assert featurizer.config.num_feature_bins == 80
    assert featurizer.config.frame_length == 400
    assert featurizer.config.frame_step == 160
    assert tokenizer.vocab_size == 242


def test_debug_tokenizer_roundtrip(capsys):
    from telugu_asr_tpu.text import make_default_tokenizer

    assert debug_tokenizer(make_default_tokenizer())
    out = capsys.readouterr().out
    assert "round-trip ok: True" in out


def test_conformer_config_loads():
    cfg = load_config(os.path.join(REPO, "config", "conformer.yaml"))
    assert cfg.model_config.family == "conformer"
    assert cfg.model_config.d_model == 144
    assert cfg.model_config.encoder_config.num_blocks == 16
