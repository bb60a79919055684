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
from typing import Dict, List, Optional, Tuple

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


CONF_BLOCK_RE = re.compile(r"conformer_encoder_block_(\d+)")
PRED_LAYER_RE = re.compile(r"(?:lstm|gru)_(\d+)|(?:^|/)ln_(\d+)|projection_(\d+)")


def classify_conformer(name: str) -> Optional[Tuple[str, Tuple]]:
    """Map a conformer-transducer h5 dataset name to (``"param"``/``"state"``,
    pytree address).  Name layout: the reference ``Conformer``
    (conformer/model.py:19-79) saves three towers — ``conformer_encoder``,
    ``conformer_transducer_prediction``, ``conformer_transducer_joint``."""
    low = name.lower()
    leaf = low.rsplit("/", 1)[-1].split(":")[0]

    # ---- encoder ----------------------------------------------------------
    if "conv2dsubsampling" in low:
        conv = "conv1" if "subsampling_1" in low else "conv2"
        if leaf in ("kernel", "bias"):
            return ("param", ("encoder", "subsampling", conv, leaf))
        return None
    if "conformer_encoder_linear" in low and leaf in ("kernel", "bias"):
        return ("param", ("encoder", "linear", leaf))

    m = CONF_BLOCK_RE.search(low)
    if m:
        block = int(m.group(1))  # reference blocks are 0-indexed (encoder.py:316)
        base = ("encoder", "blocks", block)
        if "_conv_module" in low:
            if "_bn/" in low or low.endswith("_bn"):
                if leaf in ("gamma", "beta"):
                    return ("param", (*base, "conv", "bn", leaf))
                if leaf == "moving_mean":
                    return ("state", ("encoder", "blocks", block, "mean"))
                if leaf == "moving_variance":
                    return ("state", ("encoder", "blocks", block, "var"))
                return None
            if "_dw_conv" in low:
                if "depthwise" in leaf:
                    return ("param", (*base, "conv", "dw_conv", "kernel"))
                if leaf == "bias":
                    return ("param", (*base, "conv", "dw_conv", "bias"))
                return None
            for pw in ("pw_conv_1", "pw_conv_2"):
                if pw in low and leaf in ("kernel", "bias"):
                    return ("param", (*base, "conv", pw, leaf))
            if "_ln" in low and leaf in ("gamma", "beta"):
                return ("param", (*base, "conv", "ln", leaf))
            return None
        for tag, mine in (("_ffm1", "ffm1"), ("_ff_module2", "ffm2")):
            if tag in low:
                if "ffn1" in low and leaf in ("kernel", "bias"):
                    return ("param", (*base, mine, "ffn1", leaf))
                if "dense2" in low and leaf in ("kernel", "bias"):
                    return ("param", (*base, mine, "ffn2", leaf))
                if leaf in ("gamma", "beta"):
                    return ("param", (*base, mine, "ln", leaf))
                return None
        if "_mhsa_module" in low:
            if leaf in ("gamma", "beta"):
                return ("param", (*base, "mhsa", "ln", leaf))
            for key in (
                "query_kernel", "key_kernel", "value_kernel", "projection_kernel",
                "pos_kernel", "pos_bias_u", "pos_bias_v",
            ):
                if key in leaf:
                    return ("param", (*base, "mhsa", "mha", key))
            return None
        if leaf in ("gamma", "beta"):  # block-final LN
            return ("param", (*base, "ln", leaf))
        return None

    # ---- prediction network ------------------------------------------------
    if "prediction" in low:
        if "embedding" in low and "embedding" in leaf:
            return ("param", ("prediction", "embedding", "table"))
        m = PRED_LAYER_RE.search(low)
        if m:
            idx = int(next(g for g in m.groups() if g is not None))
            if "lstm" in low or "gru" in low:
                if leaf in ("kernel", "recurrent_kernel", "bias"):
                    return ("param", ("prediction", "layers", idx, "rnn", leaf))
                return None
            if "projection" in low and leaf in ("kernel", "bias"):
                return ("param", ("prediction", "layers", idx, "projection", leaf))
            if leaf in ("gamma", "beta"):
                return ("param", ("prediction", "layers", idx, "ln", leaf))
        return None

    # ---- joint network -----------------------------------------------------
    if "joint" in low:
        for tag, mine in (
            ("joint_enc", "ffn_enc"), ("joint_pred", "ffn_pred"),
            ("joint_ffn", "ffn"), ("joint_vocab", "ffn_out"),
        ):
            if tag in low and leaf in ("kernel", "bias"):
                return ("param", ("joint", mine, leaf))
    return None


def _reshape_for_target(value: np.ndarray, address: Tuple) -> np.ndarray:
    if address[-1] == "depthwise" and value.ndim == 3:  # [k, C, 1] → [k, C]
        return value[:, :, 0]
    if address[-1] == "pointwise" and value.ndim == 3:  # [1, C, F] → [C, F]
        return value[0]
    if len(address) >= 2 and address[-1] == "kernel" and value.ndim == 3:
        if address[-2] == "dw_conv":  # DepthwiseConv1D [k, C, 1] → [k, C]
            return value[:, :, 0]
        if address[-2] in ("pw_conv_1", "pw_conv_2"):  # Conv1D k=1 [1, C, F] → [C, F]
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


def convert_conformer(
    h5_path: str, params: dict, state: dict, strict: bool = False
) -> Tuple[dict, dict, List[str], List[str]]:
    """Conformer twin of :func:`convert`: places trainable weights into
    ``params`` and the BatchNorm moving statistics into the model-state tree
    (my BN threads running stats as explicit state, ops/norm.py:49-85).

    Returns (new_params, new_state, converted_names, skipped_names).
    """
    import copy

    import jax

    new_params = jax.tree_util.tree_map(np.asarray, copy.deepcopy(params))
    new_state = jax.tree_util.tree_map(np.asarray, copy.deepcopy(state))
    converted, skipped = [], []
    for name, value in collect_h5_weights(h5_path).items():
        kind_address = classify_conformer(name)
        if kind_address is None:
            skipped.append(name)
            continue
        kind, address = kind_address
        _set_in(new_params if kind == "param" else new_state, address, value, name)
        converted.append(name)
    if strict and skipped:
        raise ValueError(f"unmapped weights: {skipped}")
    return new_params, new_state, converted, skipped


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
    parser.add_argument("--family", default="moonshine", choices=("moonshine", "conformer"))
    parser.add_argument("--output", required=True, help="Orbax checkpoint dir")
    parser.add_argument("--strict", action="store_true")
    args = parser.parse_args()

    import jax

    from telugu_asr_tpu.configs import load_config
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.train import TrainState
    from telugu_asr_tpu.train.checkpoint import CheckpointManager

    config = load_config(args.config)
    if args.family == "conformer":
        from telugu_asr_tpu.models.conformer.model import Conformer, ConformerConfig
        from telugu_asr_tpu.text import make_transducer_tokenizer

        tokenizer = make_transducer_tokenizer()
        model = Conformer(
            ConformerConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
        params, model_state = model.init(jax.random.PRNGKey(0))
        new_params, new_state, converted, skipped = convert_conformer(
            args.h5, params, model_state, strict=args.strict
        )
    else:
        from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
        from telugu_asr_tpu.text import make_default_tokenizer

        tokenizer = make_default_tokenizer()
        model = ASRModel(
            MoonshineConfig.from_model_config(config.model_config, tokenizer.vocab_size)
        )
        params = model.init(jax.random.PRNGKey(0))
        new_params, converted, skipped = convert(args.h5, params, strict=args.strict)
        new_state = {}
    print(f"converted {len(converted)} weights; skipped {len(skipped)}")
    for name in skipped[:20]:
        print(f"  skipped: {name}")

    optimizer, _ = make_optimizer(config.learning_config["optimizer_config"])
    state = TrainState.create(
        jax.tree_util.tree_map(np.asarray, new_params), optimizer,
        model_state=jax.tree_util.tree_map(np.asarray, new_state),
    )
    ckpt = CheckpointManager(args.output)
    ckpt.save(0, state)
    ckpt.wait()
    print(f"saved Orbax checkpoint to {args.output}")


if __name__ == "__main__":
    main()
