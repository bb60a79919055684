"""Worker for the 2-process DP cluster test (run by tests/test_multihost.py).

Each process: joins the cluster via ``distributed_initialize``, builds the
same tiny Moonshine model from the same seed, lifts its HALF of a
deterministic global batch into global arrays, and runs two sharded train
steps over a mesh spanning both processes — proving the DCN claim in
``parallel/mesh.py`` (the reference analog is ``MultiWorkerMirroredStrategy``
construction, env_util.py:36-40).  Prints ``LOSS0/LOSS1`` and ``NDEV`` for
the parent to assert on.

Usage: python tests/multihost_worker.py <coordinator> <num_procs> <proc_id>
Env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from telugu_asr_tpu.parallel.mesh import (
        distributed_initialize,
        make_global_batch,
        make_global_replicated,
        make_mesh,
    )

    distributed_initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    devices = jax.devices()
    print(f"NDEV {len(devices)}", flush=True)

    import jax.numpy as jnp  # noqa: F401

    from telugu_asr_tpu.audio.featurizer import FeaturizerConfig, SpeechFeaturizer
    from telugu_asr_tpu.models.moonshine.decoder import DecoderConfig
    from telugu_asr_tpu.models.moonshine.encoder import EncoderConfig
    from telugu_asr_tpu.models.moonshine.model import ASRModel, MoonshineConfig
    from telugu_asr_tpu.optim import make_optimizer
    from telugu_asr_tpu.train import TrainState, make_train_step

    cfg = MoonshineConfig(
        vocab_size=59,
        d_model=32,
        encoder=EncoderConfig(d_model=32, num_blocks=1, num_heads=2, head_dim=16),
        decoder=DecoderConfig(d_model=32, num_blocks=1, num_heads=2, head_dim=16),
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(
        {"class_name": "Adam", "config": {"learning_rate": 1e-3}}
    )
    featurizer = SpeechFeaturizer(FeaturizerConfig(normalize_signal=True))

    global_batch = 4
    step = make_train_step(
        model, optimizer, featurizer, global_batch_size=global_batch, donate=False
    )

    # deterministic GLOBAL batch; this process ships rows [proc_id*2, proc_id*2+2)
    rng = np.random.default_rng(0)
    batch = {
        "audio": rng.standard_normal((global_batch, 8000)).astype(np.float32),
        "audio_lengths": np.full((global_batch,), 8000, np.int32),
        "shifted_right_text_inputs": rng.integers(4, 59, (global_batch, 8)).astype(np.int32),
        "text_targets": rng.integers(4, 59, (global_batch, 8)).astype(np.int32),
    }
    rows = global_batch // num_procs
    local = {k: v[proc_id * rows : (proc_id + 1) * rows] for k, v in batch.items()}

    mesh = make_mesh(("data",), (len(devices),))
    with mesh:
        sharded = make_global_batch(mesh, local)
        state = make_global_replicated(mesh, TrainState.create(params, optimizer))
        for i in range(2):
            state, metrics = step(state, sharded, jax.random.PRNGKey(1))
            print(f"LOSS{i} {float(metrics['loss']):.6f}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
