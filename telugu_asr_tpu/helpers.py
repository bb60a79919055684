"""Preparation helpers — the L13 orchestration layer (src/helpers/).

``prepare_featurizers`` mirrors dataset_helpers.py:64-84 but resolves the
tokenizer OFFLINE from the vendored vocabulary snapshot (the reference mines
google/gemma-2-2b over the network at startup).  Dataset/dataloader helpers
mirror dataset_helpers.py:87-140 including global-batch DP scaling.
"""
from __future__ import annotations

from typing import Tuple

from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
from telugu_asr_tpu.configs import Config
from telugu_asr_tpu.data.dataset import ASRDataset, DatasetSpec
from telugu_asr_tpu.text import TeluguTokenizer, make_default_tokenizer

__all__ = [
    "prepare_featurizers",
    "prepare_training_datasets",
    "prepare_testing_datasets",
    "debug_tokenizer",
]


def prepare_featurizers(config: Config) -> Tuple[SpeechFeaturizer, TeluguTokenizer]:
    featurizer = SpeechFeaturizer(FeaturizerConfig.from_dict(config.speech_config))
    tokenizer = make_default_tokenizer()
    return featurizer, tokenizer


def prepare_training_datasets(
    config: Config, tokenizer, base_dir: str = ".", seed: int = 42,
    transfer_dtype: str = None,
) -> Tuple[ASRDataset, ASRDataset]:
    train = ASRDataset(
        DatasetSpec.from_config(config.data_config["train_dataset_config"], base_dir),
        tokenizer,
        seed=seed,
        transfer_dtype=transfer_dtype,
    )
    valid = ASRDataset(
        DatasetSpec.from_config(config.data_config["eval_dataset_config"], base_dir),
        tokenizer,
        seed=seed,
        transfer_dtype=transfer_dtype,
    )
    return train, valid


def prepare_testing_datasets(config: Config, tokenizer, base_dir: str = ".") -> ASRDataset:
    return ASRDataset(
        DatasetSpec.from_config(config.data_config["test_dataset_config"], base_dir),
        tokenizer,
    )


def debug_tokenizer(tokenizer, sample_tokens=(185, 49, 218, 237, 240, 237, 166, 58, 165, 102)):
    """Diagnostic dump + round-trip check (dataset_helpers.py:11-62)."""
    print(f"Tokenizer vocab size: {tokenizer.vocab_size}")
    print(f"  BOS: {tokenizer.bos_token_id}  EOS: {tokenizer.eos_token_id}  "
          f"PAD: {tokenizer.pad_token_id}  UNK: {tokenizer.unk_token_id}")
    for tid in sample_tokens:
        token = tokenizer._vocab_int_to_str.get(int(tid), "OUT_OF_VOCAB")
        print(f"  {tid}: '{token}'")
    ground_truth = (
        "కరెంటు బిల్లుల్ని కూడా సులువుగా ఆండ్రాయిడ్ ఫోన్ ఉంటే జీపే ద్వారా చెయ్యొచ్చు"
    )
    encoded = tokenizer.encode(ground_truth)
    decoded = tokenizer.batch_decode([encoded], skip_special_tokens=True)[0]
    print(f"  round-trip ok: {decoded == ground_truth}")
    return decoded == ground_truth
