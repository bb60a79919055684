"""Trial-parallel HPO launcher: one worker process per device subset.

SURVEY §2.2 (trial parallelism row): the reference's HPO is a single
sequential ``study.optimize`` process (train_optuna.py:159-178) even though
its SQLite storage could serve several.  The TPU-native way to scale HPO for
a 3.26M-param model is NOT to shard the model — it's to fan independent
trials out across chips.  This launcher spawns N copies of the study CLI,
each pinned to its own device subset, all sharing one merge-safe JSON
storage file (``study.Study`` locks + unions on every save, and re-syncs
before sampling, so TPE/pruning condition on every worker's results and
``n_trials`` is a global budget).

Device pinning:
* TPU hosts: ``TPU_VISIBLE_DEVICES=<chip ids>`` plus singleton
  ``TPU_PROCESS_BOUNDS`` / ``TPU_CHIPS_PER_PROCESS_BOUNDS`` so each process
  initializes only its chips (the standard libtpu recipe for independent
  same-host processes).
* CPU (tests / dev): ``JAX_PLATFORMS=cpu`` with
  ``--xla_force_host_platform_device_count=<k>`` per worker.

The launcher itself never imports jax — initializing the TPU in the parent
would hold the chip lock and starve the children; the platform is probed in
a throwaway subprocess instead.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict, List, Optional, Sequence

__all__ = ["probe_devices", "worker_env", "launch_workers"]


def probe_devices(timeout: float = 120.0) -> tuple:
    """Return ``(platform, device_count)`` probed in a subprocess so the
    parent process never initializes an accelerator backend."""
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, check=True,
    ).stdout.strip().split("\n")[-1]
    platform, count = out.split()
    return platform, int(count)


def worker_env(
    worker_id: int,
    platform: str,
    device_ids: Optional[Sequence[int]] = None,
    devices_per_worker: int = 1,
    base_env: Optional[Dict[str, str]] = None,
) -> Dict[str, str]:
    """Environment for worker ``worker_id`` pinned to ``device_ids``."""
    env = dict(base_env if base_env is not None else os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        flags = " ".join(
            f for f in flags.split() if "xla_force_host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={devices_per_worker}".strip()
        )
    else:
        if device_ids:
            env["TPU_VISIBLE_DEVICES"] = ",".join(str(i) for i in device_ids)
            env["TPU_PROCESS_BOUNDS"] = "1,1,1"
            # Bounds must agree with the number of chips this worker sees —
            # a hardcoded 1,1,1 with multiple TPU_VISIBLE_DEVICES makes
            # libtpu init fail (or use only one chip).
            env["TPU_CHIPS_PER_PROCESS_BOUNDS"] = f"{len(device_ids)},1,1"
    env["TELUGU_ASR_HPO_WORKER"] = str(worker_id)
    return env


def launch_workers(
    argv_per_worker: List[List[str]],
    envs: List[Dict[str, str]],
    log_dir: str = "data/hpo/workers",
) -> List[int]:
    """Spawn one subprocess per (argv, env) pair, tee output to
    ``<log_dir>/worker<i>.log``, wait for all, and return exit codes."""
    os.makedirs(log_dir, exist_ok=True)
    procs = []
    logs = []
    for i, (argv, env) in enumerate(zip(argv_per_worker, envs)):
        log = open(os.path.join(log_dir, f"worker{i}.log"), "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(argv, env=env, stdout=log, stderr=subprocess.STDOUT)
        )
    codes = []
    try:
        for p in procs:
            codes.append(p.wait())
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for log in logs:
            log.close()
    return codes
