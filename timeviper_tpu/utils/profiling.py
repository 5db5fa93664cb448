"""Profiling + debug tripwires — first-class (SURVEY.md §5.1-5.2).

The reference has only wall-clock timers (evaluate.py:681-693) and an
always-on `torch.autograd.set_detect_anomaly` (train.py:50, a known perf
bug). Here:

* `profile_ctx` wraps a region in a `jax.profiler` trace (view in
  TensorBoard / xprof),
* `phase_timer` accumulates per-phase (encode/prefill/decode/step)
  wall-clock with device sync,
* `nan_debug` enables `jax_debug_nans` as an opt-in context — the debug
  mode the reference left permanently on.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax


@contextmanager
def profile_ctx(logdir: str = "/tmp/timeviper_profile"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def nan_debug(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class PhaseTimer:
    """Accumulates wall-clock per named phase; `sync=True` fetches a scalar
    from the given array to force device completion (block_until_ready is
    unreliable through RPC tunnels — see bench.py)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 4),
            }
            for name in self.totals
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
