import os
import textwrap

from telugu_asr_tpu.configs import Config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_repo_model_config():
    cfg = load_config(os.path.join(REPO, "config", "model.yaml"))
    assert cfg.speech_config.sample_rate == 16000
    assert cfg.speech_config["num_feature_bins"] == 80
    assert cfg.model_config.d_model == 192
    assert cfg.model_config.encoder_config.num_blocks == 4
    assert cfg.model_config.decoder_config.num_blocks == 6
    assert cfg.learning_config.running_config.batch_size == 8
    sched = cfg.learning_config.optimizer_config["config"]["learning_rate"]["config"]
    assert sched["warmup_steps"] == 11174


def test_defaults_composition(tmp_path):
    (tmp_path / "base.yaml").write_text(
        textwrap.dedent(
            """
            speech_config: {sample_rate: 16000}
            model_config: {d_model: 100}
            """
        )
    )
    (tmp_path / "main.yaml").write_text(
        textwrap.dedent(
            """
            defaults: [base, _self_]
            model_config: {d_model: 192}
            """
        )
    )
    cfg = load_config(str(tmp_path / "main.yaml"))
    assert cfg.model_config.d_model == 192
    assert cfg.speech_config.sample_rate == 16000


def test_section_defaults():
    cfg = Config({})
    assert cfg.speech_config.preemphasis == 0.97
    assert cfg.data_config.train_dataset_config.drop_remainder is True
    assert cfg.learning_config == {}
    cfg2 = Config({}, training=False)
    assert cfg2.learning_config is None
