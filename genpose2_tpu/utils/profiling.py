"""Tracing / profiling: first-class here, absent in the reference
(SURVEY.md §5: only tqdm bars and unused time imports there).

- ``trace_context`` wraps a block in a jax.profiler trace (view in
  TensorBoard/XProf or Perfetto);
- ``StageTimer`` collects per-stage wall-clock with device sync, for the
  pipeline-level counters the reference never had.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str] = None):
    """jax.profiler trace around a block; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage. ``sync`` blocks on a jax array
    (and materializes one element — required on remote backends where
    block_until_ready alone does not imply remote completion)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                import numpy as np

                arr = jax.tree.leaves(sync_on)[0]
                _ = np.asarray(arr).ravel()[:1]
            dt = time.perf_counter() - start
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
