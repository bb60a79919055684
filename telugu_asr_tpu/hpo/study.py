"""Hyperparameter optimization engine — Optuna-compatible surface, no Optuna.

The reference runs a 21-trial Optuna TPE study with successive-halving
pruning and SQLite storage (train_optuna.py:158-178).  This module provides
the same capabilities self-contained:

* ``Trial`` with ``suggest_float / suggest_int / suggest_categorical`` and
  ``report``/``should_prune`` (the Optuna API surface the reference uses);
* ``TPESampler``: Tree-structured Parzen Estimator — completed trials are
  split into good/bad by the γ-quantile of the objective; candidates are
  drawn from a Parzen (Gaussian-mixture) model of the good set and ranked by
  the density ratio l(x)/g(x) per parameter (Bergstra et al. 2011).  Falls
  back to random sampling for the first ``n_startup_trials``;
* ``SuccessiveHalvingPruner``: at rungs ``min_resource * rf^k`` a trial is
  pruned unless its intermediate value is within the top ``1/rf`` fraction of
  values reported at that rung (train_optuna.py:160-164 parameters);
* JSON-file storage with ``load_if_exists`` resume semantics (stands in for
  the reference's ``sqlite:///`` URL).

Trial parallelism: trials are independent, so scaling over TPU devices means
running one ``Study`` process per device/slice against the SAME shared
storage file — the TPU-native answer to scaling this tiny model's HPO
(SURVEY §2.2 "trial parallelism"); the reference's sequential
``study.optimize`` maps to a single process.  Storage is safe for that:
every save takes an exclusive ``flock`` on a sidecar lock file, re-reads the
file, and merges by per-trial UID (union, own trials win), so concurrent
workers never clobber each other; ``optimize`` re-syncs from disk before
each trial so the TPE sampler and pruner see every worker's finished trials
and ``n_trials`` acts as a GLOBAL budget across workers.  See
``telugu_asr_tpu.hpo.launcher`` for the process launcher that pins workers
to device subsets.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import math
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

try:  # POSIX file locking (this image is linux; degrade gracefully elsewhere)
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None

__all__ = [
    "TrialPruned",
    "Trial",
    "RandomSampler",
    "TPESampler",
    "SuccessiveHalvingPruner",
    "Study",
    "create_study",
]


class TrialPruned(Exception):
    """Raised inside an objective to abort a trial (optuna.TrialPruned)."""


@dataclasses.dataclass
class _ParamSpec:
    kind: str  # "float" | "int" | "categorical"
    low: Any = None
    high: Any = None
    log: bool = False
    step: Any = None
    choices: Optional[list] = None


class Trial:
    def __init__(self, number: int, study: "Study", params: Optional[dict] = None,
                 uid: Optional[str] = None, created_at: Optional[float] = None):
        self.number = number
        self.study = study
        # Cross-process identity: `number` is display-order only and is
        # globally RENUMBERED on every merge (workers number locally, so raw
        # numbers collide); `uid` never collides and is the real key.
        self.uid = uid or f"{os.getpid()}-{os.urandom(4).hex()}"
        self.created_at = time.time() if created_at is None else float(created_at)
        self.params: Dict[str, Any] = dict(params or {})
        self.intermediate: Dict[int, float] = {}
        self.state = "running"
        self.value: Optional[float] = None
        self.user_attrs: Dict[str, Any] = {}

    # -- suggest API ---------------------------------------------------------
    def _suggest(self, name: str, spec: _ParamSpec):
        self.study._register_spec(name, spec)
        if name not in self.params:
            self.params[name] = self.study.sampler.sample(self.study, name, spec)
        return self.params[name]

    def suggest_float(self, name, low, high, *, log=False, step=None):
        return float(self._suggest(name, _ParamSpec("float", low, high, log, step)))

    def suggest_int(self, name, low, high, *, step=1, log=False):
        return int(self._suggest(name, _ParamSpec("int", low, high, log, step)))

    def suggest_categorical(self, name, choices):
        return self._suggest(name, _ParamSpec("categorical", choices=list(choices)))

    # -- pruning -------------------------------------------------------------
    def report(self, value: float, step: int) -> None:
        self.intermediate[int(step)] = float(value)

    def should_prune(self) -> bool:
        return self.study.pruner.should_prune(self.study, self)

    def set_user_attr(self, key: str, value) -> None:
        self.user_attrs[key] = value


class RandomSampler:
    def __init__(self, seed: int = 42):
        self.rng = np.random.default_rng(seed)

    def _draw(self, spec: _ParamSpec):
        if spec.kind == "categorical":
            return spec.choices[int(self.rng.integers(len(spec.choices)))]
        if spec.kind == "int":
            if spec.step and spec.step > 1:
                n = (spec.high - spec.low) // spec.step
                return int(spec.low + spec.step * self.rng.integers(n + 1))
            return int(self.rng.integers(spec.low, spec.high + 1))
        if spec.log:
            return float(np.exp(self.rng.uniform(np.log(spec.low), np.log(spec.high))))
        value = float(self.rng.uniform(spec.low, spec.high))
        if spec.step:
            value = spec.low + round((value - spec.low) / spec.step) * spec.step
        return float(value)

    def sample(self, study: "Study", name: str, spec: _ParamSpec):
        return self._draw(spec)


class TPESampler(RandomSampler):
    def __init__(self, seed: int = 42, n_startup_trials: int = 10, gamma: float = 0.25,
                 n_candidates: int = 24):
        super().__init__(seed)
        self.n_startup_trials = n_startup_trials
        self.gamma = gamma
        self.n_candidates = n_candidates

    def sample(self, study: "Study", name: str, spec: _ParamSpec):
        done = [t for t in study.trials if t.state == "complete" and name in t.params]
        if len(done) < self.n_startup_trials:
            return self._draw(spec)
        done.sort(key=lambda t: t.value)
        n_good = max(1, int(math.ceil(self.gamma * len(done))))
        good = [t.params[name] for t in done[:n_good]]
        bad = [t.params[name] for t in done[n_good:]] or good

        if spec.kind == "categorical":
            # weighted by smoothed category counts in the good/bad sets
            def probs(values):
                counts = np.array(
                    [sum(v == c for v in values) + 1.0 for c in spec.choices]
                )
                return counts / counts.sum()

            ratio = probs(good) / probs(bad)
            return spec.choices[int(np.argmax(ratio * self.rng.dirichlet(np.ones(len(spec.choices)))))]

        def transform(v):
            return np.log(v) if spec.log else float(v)

        g = np.asarray([transform(v) for v in good])
        b = np.asarray([transform(v) for v in bad])
        lo, hi = transform(spec.low), transform(spec.high)
        width = (hi - lo) or 1.0
        bw_g = max(np.std(g) * 1.06 * len(g) ** -0.2 if len(g) > 1 else width / 4, width / 20)
        bw_b = max(np.std(b) * 1.06 * len(b) ** -0.2 if len(b) > 1 else width / 4, width / 20)

        def logpdf(x, centers, bw):
            d = (x[:, None] - centers[None, :]) / bw
            return np.log(np.mean(np.exp(-0.5 * d * d), axis=1) / (bw * np.sqrt(2 * np.pi)) + 1e-12)

        # candidates from the good mixture, clipped to bounds
        idx = self.rng.integers(len(g), size=self.n_candidates)
        cands = np.clip(g[idx] + self.rng.normal(0, bw_g, self.n_candidates), lo, hi)
        score = logpdf(cands, g, bw_g) - logpdf(cands, b, bw_b)
        best = float(cands[int(np.argmax(score))])
        value = float(np.exp(best)) if spec.log else best
        if spec.kind == "int":
            step = spec.step or 1
            return int(np.clip(round((value - spec.low) / step) * step + spec.low, spec.low, spec.high))
        if spec.step:
            value = spec.low + round((value - spec.low) / spec.step) * spec.step
        return float(np.clip(value, spec.low, spec.high))


class SuccessiveHalvingPruner:
    def __init__(self, min_resource: int = 8, reduction_factor: int = 3):
        self.min_resource = min_resource
        self.reduction_factor = reduction_factor

    def _rungs(self, step: int) -> List[int]:
        rungs = []
        r = self.min_resource
        while r <= step:
            rungs.append(r)
            r *= self.reduction_factor
        return rungs

    def should_prune(self, study: "Study", trial: Trial) -> bool:
        if not trial.intermediate:
            return False
        step = max(trial.intermediate)
        for rung in self._rungs(step):
            mine = trial.intermediate.get(rung)
            if mine is None:
                # use the closest report at/after the rung
                later = [v for s, v in trial.intermediate.items() if s >= rung]
                if not later:
                    continue
                mine = later[0]
            peers = []
            for other in study.trials:
                if other.uid == trial.uid or not other.intermediate:
                    continue
                vals = [v for s, v in other.intermediate.items() if s >= rung]
                if vals:
                    peers.append(min(vals))
            if len(peers) < self.reduction_factor:
                continue
            keep = max(1, len(peers) // self.reduction_factor)
            threshold = sorted(peers)[keep - 1]
            if mine > threshold:
                return True
        return False


class Study:
    def __init__(
        self,
        study_name: str,
        storage: Optional[str] = None,
        sampler=None,
        pruner=None,
        direction: str = "minimize",
    ):
        assert direction == "minimize"
        self.study_name = study_name
        self.storage = storage
        self.sampler = sampler or TPESampler()
        self.pruner = pruner or SuccessiveHalvingPruner()
        self.trials: List[Trial] = []
        self._specs: Dict[str, _ParamSpec] = {}
        if storage:
            self._load()

    # -- storage -------------------------------------------------------------
    @contextlib.contextmanager
    def _lock(self):
        """Exclusive advisory lock on a sidecar file, serializing the
        read-merge-write cycle across concurrent worker processes."""
        if not (self.storage and fcntl):
            yield
            return
        os.makedirs(os.path.dirname(os.path.abspath(self.storage)) or ".", exist_ok=True)
        with open(self.storage + ".lock", "a+") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    def _merge_from_disk(self) -> None:
        """Fold trials other processes persisted into memory (union by uid;
        in-memory versions win for uids this process owns)."""
        if not (self.storage and os.path.exists(self.storage)):
            return
        with open(self.storage, "r", encoding="utf-8") as f:
            try:
                data = json.load(f)
            except json.JSONDecodeError:  # mid-write without flock (non-POSIX)
                return
        known = {t.uid for t in self.trials}
        for td in data.get("trials", []):
            uid = td.get("uid") or f"legacy-{td['number']}"
            if uid in known:
                continue
            t = Trial(td["number"], self, td["params"], uid=uid,
                      created_at=td.get("created_at"))
            t.state = td["state"]
            t.value = td.get("value")
            t.intermediate = {int(k): v for k, v in td.get("intermediate", {}).items()}
            t.user_attrs = td.get("user_attrs", {})
            self.trials.append(t)
        self._renumber()

    def _renumber(self) -> None:
        """Globally renumber trials 0..n-1 in deterministic start order.

        Workers number trials locally, so merged studies held colliding
        ``number``s (round-3 sweep: four distinct trials all "#0").  Numbers
        are display-order only — uid is the key — so every merge re-derives
        them from (created_at, uid), which is identical in every process that
        merged the same trial set."""
        self.trials.sort(key=lambda t: (t.created_at, t.uid))
        for i, t in enumerate(self.trials):
            t.number = i

    def _load(self) -> None:
        with self._lock():
            self._merge_from_disk()

    def sync(self) -> None:
        """Pick up trials completed by concurrent workers (no-op when alone)."""
        self._load()

    def _save(self) -> None:
        if not self.storage:
            return
        with self._lock():
            # union with whatever other workers wrote since our last look
            self._merge_from_disk()
            data = {
                "study_name": self.study_name,
                "trials": [
                    {
                        "number": t.number,
                        "uid": t.uid,
                        "created_at": t.created_at,
                        "state": t.state,
                        "value": t.value,
                        "params": t.params,
                        "intermediate": t.intermediate,
                        "user_attrs": t.user_attrs,
                    }
                    for t in self.trials
                ],
            }
            tmp = f"{self.storage}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(data, f, indent=1)
            os.replace(tmp, self.storage)

    def _register_spec(self, name: str, spec: _ParamSpec) -> None:
        self._specs.setdefault(name, spec)

    # -- optimize ------------------------------------------------------------
    @property
    def best_trial(self) -> Optional[Trial]:
        done = [t for t in self.trials if t.state == "complete" and t.value is not None]
        return min(done, key=lambda t: t.value) if done else None

    @property
    def best_value(self) -> Optional[float]:
        best = self.best_trial
        return best.value if best else None

    @property
    def best_params(self) -> Optional[dict]:
        best = self.best_trial
        return dict(best.params) if best else None

    def optimize(
        self,
        objective: Callable[[Trial], float],
        n_trials: int,
        callbacks: Sequence[Callable] = (),
        catch: tuple = (),
    ) -> None:
        """Run trials until the study holds ``n_trials`` finished ones.

        With shared storage the count is GLOBAL: concurrent workers' finished
        trials (synced from disk before every new trial, so TPE/pruning also
        condition on them) count toward the budget, mirroring Optuna's
        distributed ``study.optimize`` semantics over RDB storage.
        """
        while True:
            self.sync()
            done = sum(1 for t in self.trials if t.state in ("complete", "pruned", "failed"))
            if done >= n_trials:
                break
            number = max((t.number for t in self.trials), default=-1) + 1
            trial = Trial(number, self)
            self.trials.append(trial)
            try:
                value = objective(trial)
                trial.value = float(value)
                trial.state = "complete"
            except TrialPruned:
                trial.state = "pruned"
                if trial.intermediate:
                    trial.value = min(trial.intermediate.values())
            except catch:
                trial.state = "failed"
            self._save()
            for cb in callbacks:
                cb(self, trial)


def create_study(
    study_name: str,
    storage: Optional[str] = None,
    sampler=None,
    pruner=None,
    direction: str = "minimize",
    load_if_exists: bool = True,
) -> Study:
    if not load_if_exists and storage and os.path.exists(storage):
        raise FileExistsError(storage)
    return Study(study_name, storage, sampler, pruner, direction)
