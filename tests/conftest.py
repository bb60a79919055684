"""Test harness: force an 8-device virtual CPU mesh.

This is the JAX-native fake backend for exercising DP/pjit sharding without a
TPU pod (SURVEY §4).  Note: this environment's sitecustomize registers a TPU
('axon') PJRT backend in every interpreter and exports JAX_PLATFORMS=axon, so
overriding the env var alone is not enough — we must also flip the jax config
after import (before any backend is initialized).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    devices = jax.devices()
    assert devices[0].platform == "cpu", devices
    assert len(devices) == 8, devices
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# -- quick/slow lanes ---------------------------------------------------------
# Measured on the 1-CPU judging host (pytest --durations); everything >= ~8 s
# is marked slow so `pytest -m "not slow"` is a fast regression lane.
# tests/test_reference_parity.py marks itself slow (module-level pytestmark).
_SLOW_TESTS = {
    "test_fit_checkpoint_resume_and_eval",      # 183 s
    "test_greedy_matches_reference_style",      # 103 s
    "test_mixed_precision_step",                # 81 s
    "test_dp_sharded_step_matches_single_device",  # 67 s
    "test_transducer_train_and_eval",           # 55 s
    "test_int8_decode_fidelity_flagship",       # 41 s
    "test_loss_decreases",                      # 35 s
    "test_sharded_greedy_decode_matches_unsharded",  # 28 s
    "test_finalize_matches_offline",            # 27 s
    "test_forward_shapes",                      # 26 s
    "test_concurrent_workers_merge_storage",    # 24 s
    "test_conformer_rnnt_training_step",        # 23 s
    "test_param_budget_enforced",               # 18 s
    "test_kv_cache_matches_full_decoder",       # 15 s
    "test_parallel_launcher_end_to_end",        # 14 s
    "test_gradients_finite_difference",         # 12 s
    "test_conv1d_subsampling_shapes_and_lengths",  # 12 s
    "test_tiled_greedy_token_parity",           # 11 s (each param)
    "test_greedy_early_exit_on_eos",            # 11 s
    "test_decoder_causality",                   # 11 s
    "test_staged_decode_matches_plain",         # 11 s
    "test_quick_val_wer",                       # 10 s
    "test_fused_parity_across_seeds",           # 10 s
    "test_padding_invariance",                  # 9 s
    "test_flagship_param_budget",               # 9 s
    "test_greedy_matches_reference_style_parity_mode",  # 9 s
    "test_prepare_dataset_cli",                 # 9 s
    "test_greedy_parity_across_seeds",          # 9 s
    "test_greedy_transducer_matches_eager_reference",  # 8 s
    "test_rope_absolute_positions",             # 7 s
    "test_zero_length_rows_contribute_nothing", # 7 s
    "test_gradients_zero_outside_valid_region", # 6 s
    "test_fused_token_parity",                  # 6 s (each param)
    "test_jit_forward",                         # 8 s
    "test_beam_size_one_equals_greedy",         # 10 s setup
    "test_conformer_forward_shapes",            # 10 s setup
    "test_objective_writes_per_trial_metrics",  # 39 s
    "test_fused_eos_law",                       # 14 s
    "test_fused_partial_rope_token_parity",     # 10 s
    "test_fused_int8_token_parity",             # 7 s
    "test_fused_pad_rows_born_finished",        # 7 s
    "test_fused_fast_segments_high_agreement",  # 26 s
    "test_recognize_long_form_stitches",        # 17 s
    "test_fused_multisegment_parity",           # 16 s
    "test_fused_int8_cache_token_parity",       # 7 s
    "test_fused_mixed_cache_token_parity",      # 15 s
    "test_fused_deflated_scores_token_parity",  # 20 s
    "test_fused_deflated_multisegment_parity",  # 16 s
    "test_fused_combined_kv_token_parity",      # 40 s
    "test_fused_combined_kv_multisegment_parity",  # 16 s
    "test_fused_deflate_with_fast_segments_runs",  # 8 s
    # round-2 additions (measured on the 1-CPU host, --durations)
    "test_tp_dp_sharded_step_matches_dp",       # 56 s
    "test_relmha_pos_stream_lengths",           # 24 s
    "test_relative_shift_sliced_matches_padded",  # 23 s
    "test_fused_beam_group_padding",            # 22 s
    "test_committed_reference_h5_zero_skip_and_token_identical",  # 22 s
    "test_fused_beam_bf16_cache_close",         # 20 s
    "test_fused_beam_matches_xla",              # 11-16 s each param
    "test_mha_causal",                          # 16 s
    "test_mha_padding_invariance",              # 15 s
    "test_pipeline_moonshine_encoder_blocks",   # 14 s
    "test_fused_bf16_cache_runs",               # 13 s
    "test_pipeline_gradient_matches_sequential",  # 12 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
