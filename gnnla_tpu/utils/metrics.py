"""Throughput counters and timing — the observability the reference lacks
(SURVEY.md §5: only MATLAB tic/toc exists, train_jacobi_find_d.m:119,129).

`edges_per_second` is the BASELINE.json headline counter; `Timer` is a
minimal wall-clock context that forces device completion so TPU async
dispatch can't fake the numbers.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class Timer:
    """Wall-clock timer that blocks on device work before stopping."""

    elapsed_s: float = 0.0
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        jax.effects_barrier()
        self.elapsed_s = time.perf_counter() - self._t0
        return False


def edges_per_second(nnz: int, n_applications: int, seconds: float) -> float:
    """Message-passing throughput: edges (nonzeros) processed per second."""
    return nnz * n_applications / max(seconds, 1e-12)


@dataclass
class MetricsLogger:
    """Append-only JSONL metrics sink (stand-in for TensorBoard logging,
    reference DiffCoeffs/train.py:172-173)."""

    path: Optional[str] = None
    history: List[Dict] = field(default_factory=list)

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
