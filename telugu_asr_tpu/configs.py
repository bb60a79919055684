"""Config system: YAML → typed config tree, reference-schema compatible.

The reference (src/configs.py:15-99, config/model.yaml) composes Hydra YAML into
a ``Config`` with four sections — ``speech_config``, ``model_config``,
``data_config``, ``learning_config`` — and downstream code accesses them as
plain dicts (SURVEY §8.5).  We keep the exact YAML key schema so reference
configs load unchanged, but replace Hydra with plain PyYAML plus an explicit
``defaults`` composition step, and expose every section through ``AttrDict``
(attribute *and* item access, so both styles used in the reference work).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Mapping, Optional

import yaml

__all__ = ["AttrDict", "Config", "load_yaml", "load_config"]


class AttrDict(dict):
    """Dict with attribute access; nests recursively; deep-copy safe."""

    def __init__(self, data: Optional[Mapping[str, Any]] = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = self._wrap(value)

    @classmethod
    def _wrap(cls, value: Any) -> Any:
        if isinstance(value, Mapping) and not isinstance(value, AttrDict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:  # keep AttributeError semantics for hasattr()
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._wrap(value)

    def __deepcopy__(self, memo) -> "AttrDict":
        return AttrDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, AttrDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return {k: unwrap(v) for k, v in self.items()}


# --------------------------------------------------------------------------
# Section defaults.  Values mirror the reference dataclasses' defaults
# (src/configs.py:16-78) so partially-specified YAML behaves identically.
# --------------------------------------------------------------------------

_SPEECH_DEFAULTS = dict(
    sample_rate=16000,
    frame_ms=25,
    stride_ms=10,
    num_feature_bins=80,
    feature_type="log_mel_spectrogram",
    preemphasis=0.97,
    pad_end=False,
    lower_edge_hertz=0.0,
    upper_edge_hertz=8000.0,
    output_floor=1e-9,
    log_base="10",
    nfft=512,
    normalize_signal=True,
    normalize_zscore=False,
    normalize_min_max=False,
    padding=0.0,
)

_DATASET_DEFAULTS = dict(
    enabled=True,
    stage=None,
    data_paths=None,
    shuffle=False,
    cache=False,
    drop_remainder=True,
    buffer_size=1000,
    metadata=None,
    indefinite=True,
)

_RUNNING_DEFAULTS = dict(batch_size=32, num_epochs=10)


def _with_defaults(defaults: dict, config: Optional[Mapping]) -> AttrDict:
    merged = dict(defaults)
    merged.update(dict(config or {}))
    return AttrDict(merged)


class Config:
    """Top-level config tree (reference: src/configs.py:80-99).

    ``speech_config`` / ``model_config`` / ``data_config`` / ``learning_config``
    are ``AttrDict``s supporting both ``cfg.speech_config.sample_rate`` and
    ``cfg.speech_config["sample_rate"]``.
    """

    def __init__(self, config: Mapping[str, Any], training: bool = True):
        config = dict(config)
        self.speech_config = _with_defaults(_SPEECH_DEFAULTS, config.get("speech_config"))
        self.model_config = AttrDict(config.get("model_config", {}))
        data = dict(config.get("data_config", {}))
        self.data_config = AttrDict(
            {
                "train_dataset_config": _with_defaults(
                    _DATASET_DEFAULTS, data.get("train_dataset_config")
                ),
                "eval_dataset_config": _with_defaults(
                    _DATASET_DEFAULTS, data.get("eval_dataset_config")
                ),
                "test_dataset_config": _with_defaults(
                    _DATASET_DEFAULTS, data.get("test_dataset_config")
                ),
            }
        )
        learning = dict(config.get("learning_config", {}))
        if "running_config" in learning:
            learning["running_config"] = _with_defaults(
                _RUNNING_DEFAULTS, learning["running_config"]
            )
        self.learning_config = AttrDict(learning) if training else None
        # Expose any extra top-level keys, mirroring the reference's setattr loop.
        for key, value in config.items():
            if key not in (
                "speech_config",
                "model_config",
                "data_config",
                "learning_config",
            ):
                setattr(self, key, AttrDict._wrap(value))

    def to_dict(self) -> dict:
        out = {
            "speech_config": self.speech_config.to_dict(),
            "model_config": self.model_config.to_dict(),
            "data_config": self.data_config.to_dict(),
        }
        if self.learning_config is not None:
            out["learning_config"] = self.learning_config.to_dict()
        return out


def load_yaml(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def load_config(path: str, training: bool = True) -> Config:
    """Load a YAML config, composing Hydra-style ``defaults`` lists.

    The reference's top-level config (config/config.yaml:1-3) is
    ``defaults: [conformer, _self_]``: entries name sibling YAML files merged
    in order, with ``_self_`` marking where the file's own keys apply.
    """
    raw = load_yaml(path)
    if "defaults" in raw:
        base_dir = os.path.dirname(os.path.abspath(path))
        merged: dict = {}
        own = {k: v for k, v in raw.items() if k not in ("defaults", "hydra")}
        for entry in raw["defaults"]:
            if entry == "_self_":
                _deep_merge(merged, own)
                own = None
            else:
                sub = load_yaml(os.path.join(base_dir, f"{entry}.yaml"))
                sub.pop("hydra", None)
                _deep_merge(merged, sub)
        if own is not None:
            _deep_merge(merged, own)
        raw = merged
    raw.pop("hydra", None)
    return Config(raw, training=training)


def _deep_merge(dst: dict, src: Mapping) -> dict:
    for key, value in src.items():
        if isinstance(value, Mapping) and isinstance(dst.get(key), dict):
            _deep_merge(dst[key], value)
        else:
            dst[key] = copy.deepcopy(value)
    return dst
