"""Structured metrics / tracing / debugging hooks.

The reference's observability is ad-hoc prints and tqdm bars
(SURVEY.md §5); here sweeps and online steps can record structured
timing + ELBO metrics, and jax-native debugging toggles replace torch's
deterministic/NaN sentinels:

* determinism: jax programs are deterministic by construction;
* NaN detection: ``debug_nans()`` context enables jax_debug_nans;
* profiling: ``trace()`` wraps jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class SweepMetrics:
    """Per-sweep record: ELBO pieces, cluster counts, wall time."""

    iteration: int = 0
    elbo: float = float("nan")
    q_obs: float = float("nan")
    elbo_linear: float = float("nan")
    n_clusters: int = 0
    resp_counts: List[int] = field(default_factory=list)
    seconds: float = 0.0

    def to_dict(self) -> Dict:
        return dict(iteration=self.iteration, elbo=self.elbo,
                    q_obs=self.q_obs, elbo_linear=self.elbo_linear,
                    n_clusters=self.n_clusters,
                    resp_counts=self.resp_counts, seconds=self.seconds)


class MetricsLog:
    def __init__(self):
        self.records: List[Dict] = []

    def append(self, **kw):
        kw.setdefault("t_wall", time.time())
        self.records.append(kw)

    def dump(self, path: str):
        with open(path, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on the first NaN produced inside jitted code (replaces the
    reference's isnan print sentinels, GPI_HDP.py:625-626, :3605)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax profiler trace around a block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.t0 = time.time()
        self.laps: Dict[str, float] = {}

    def lap(self, name: str):
        now = time.time()
        self.laps[name] = self.laps.get(name, 0.0) + now - self.t0
        self.t0 = now
        return self.laps[name]
