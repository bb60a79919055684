#!/usr/bin/env python3
"""Convert a reference Keras ``.h5`` weight checkpoint into this framework's
parameter pytree (SURVEY §5 checkpoint/resume: "checkpoint format documented
so reference-trained weights can be converted").

The reference saves weights-only HDF5 via ``ModelCheckpoint`` (train.py:89)
with hierarchical Keras names.  This converter walks every dataset in the
file, classifies each weight by its name path, and places it at the matching
pytree path with a shape assertion:

reference weight (name fragments)            → pytree path
-------------------------------------------------------------------------
text_embedding / embeddings                  → text_embedding.table
classifier / kernel|bias                     → classifier.kernel|bias
*conv_subsampling*conv_{i} depthwise_kernel  → encoder.subsampling.layers[i-1].depthwise  ([k,C,1]→[k,C])
  … pointwise_kernel                         → .pointwise  ([1,C,F]→[C,F])
  … bias                                     → .bias
*encoder*block_{i}* mhsa … {query|key|value|projection}_kernel
                                             → encoder.blocks[i-1].mhsa.mha.*
  … rope … inv_freq                          → encoder.blocks[i-1].mhsa.mha.rope_inv_freq
  … mhsa … ln gamma|beta                     → encoder.blocks[i-1].mhsa.ln.*
  … ffn dense1|dense2 kernel|bias            → encoder.blocks[i-1].ffn.dense*
  … ffn ln gamma|beta                        → encoder.blocks[i-1].ffn.ln.*
*decoder*block_{i}* masked_mhsa …            → decoder.blocks[i-1].masked_mhsa.*
  … cross_attention …                        → decoder.blocks[i-1].cross_attention.*
  … ffn …                                    → decoder.blocks[i-1].ffn.*

Usage:
    python tools/convert_reference_checkpoint.py --h5 ckpt.h5 \
        --config config/model.yaml --output converted/
The output directory is an Orbax checkpoint loadable by ``test.py
--checkpoint-dir``.
"""
from __future__ import annotations

import argparse
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

BLOCK_RE = re.compile(r"block_(\d+)")
CONV_RE = re.compile(r"conv_(\d+)")


def collect_h5_weights(path: str) -> Dict[str, np.ndarray]:
    import h5py

    weights: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            weights[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return weights


def classify(name: str) -> Tuple:
    """Map an h5 dataset name to a pytree address tuple, or None to skip."""
    low = name.lower()
    leaf = low.rsplit("/", 1)[-1].split(":")[0]

    if "text_embedding" in low and "embedding" in leaf:
        return ("text_embedding", "table")
    if "classifier" in low:
        if "kernel" in leaf:
            return ("classifier", "kernel")
        if "bias" in leaf:
            return ("classifier", "bias")

    if "conv_subsampling" in low:
        m = CONV_RE.search(low)
        if m:
            idx = int(m.group(1)) - 1
            if "depthwise" in leaf:
                return ("encoder", "subsampling", "layers", idx, "depthwise")
            if "pointwise" in leaf:
                return ("encoder", "subsampling", "layers", idx, "pointwise")
            if "bias" in leaf:
                return ("encoder", "subsampling", "layers", idx, "bias")

    m = BLOCK_RE.search(low)
    if m:
        block = int(m.group(1)) - 1
        side = "decoder" if "decoder" in low else "encoder"
        if "cross_attention" in low:
            module = ("cross_attention",)
        elif "masked_mhsa" in low or ("mhsa" in low and side == "decoder"):
            module = ("masked_mhsa",)
        elif "mhsa" in low:
            module = ("mhsa",)
        elif "ffn" in low:
            module = ("ffn",)
        else:
            return None

        if module[0] == "ffn":
            if "dense1" in low or "dense_1" in low:
                part = "dense1"
            elif "dense2" in low or "dense_2" in low:
                part = "dense2"
            elif leaf in ("gamma", "beta"):
                return (side, "blocks", block, "ffn", "ln", leaf)
            else:
                return None
            if "kernel" in leaf:
                return (side, "blocks", block, "ffn", part, "kernel")
            if "bias" in leaf:
                return (side, "blocks", block, "ffn", part, "bias")
            return None

        # attention modules
        if "inv_freq" in leaf:
            return (side, "blocks", block, *module, "mha", "rope_inv_freq")
        if leaf in ("gamma", "beta"):
            return (side, "blocks", block, *module, "ln", leaf)
        for key in ("query_kernel", "key_kernel", "value_kernel", "projection_kernel"):
            if key in leaf:
                return (side, "blocks", block, *module, "mha", key)
    return None


def _reshape_for_target(value: np.ndarray, address: Tuple) -> np.ndarray:
    if address[-1] == "depthwise" and value.ndim == 3:  # [k, C, 1] → [k, C]
        return value[:, :, 0]
    if address[-1] == "pointwise" and value.ndim == 3:  # [1, C, F] → [C, F]
        return value[0]
    return value


def _set_in(tree, address: Tuple, value: np.ndarray, name: str) -> None:
    node = tree
    for key in address[:-1]:
        node = node[key]
    target = node[address[-1]]
    value = _reshape_for_target(value, address)
    if tuple(np.shape(target)) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch for {name} → {address}: "
            f"h5 {value.shape} vs target {np.shape(target)}"
        )
    node[address[-1]] = value.astype(np.float32)


def convert(h5_path: str, params: dict, strict: bool = False) -> Tuple[dict, List[str], List[str]]:
    """Place every classifiable h5 weight into a copy of ``params``.

    Returns (new_params, converted_names, skipped_names).
    """
    import copy

    import jax

    new_params = jax.tree_util.tree_map(np.asarray, copy.deepcopy(params))
    converted, skipped = [], []
    for name, value in collect_h5_weights(h5_path).items():
        address = classify(name)
        if address is None:
            skipped.append(name)
            continue
        _set_in(new_params, address, value, name)
        converted.append(name)
    if strict and skipped:
        raise ValueError(f"unmapped weights: {skipped}")
    return new_params, converted, skipped


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--h5", required=True)
    parser.add_argument("--config", default="config/model.yaml")
    parser.add_argument("--output", required=True, help="Orbax checkpoint dir")
    parser.add_argument("--strict", action="store_true")
    args = parser.parse_args()

    import jax

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.text import make_default_tokenizer
    from telugu_asr_tpu.train import TrainState
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    tokenizer = make_default_tokenizer()
    model = ASRModel(MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size))
    params = model.init(jax.random.PRNGKey(0))

    new_params, converted, skipped = convert(args.h5, params, strict=args.strict)
    print(f"converted {len(converted)} weights; skipped {len(skipped)}")
    for name in skipped[:20]:
        print(f"  skipped: {name}")

    optimizer, _ = make_optimizer(config.learning_config["optimizer_config"])
    state = TrainState.create(jax.tree_util.tree_map(np.asarray, new_params), optimizer)
    ckpt = CheckpointManager(args.output)
    ckpt.save(0, state)
    ckpt.wait()
    print(f"saved Orbax checkpoint to {args.output}")


if __name__ == "__main__":
    main()
