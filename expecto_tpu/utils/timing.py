"""Wall-clock instrumentation for the speed-of-light benchmark harness.

The reference has no profiling beyond tqdm bars (SURVEY §5); this provides
per-stage counters and a `block_until_ready`-accurate timer used by bench.py.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; ``sync`` is an optional callable run before stopping
        the clock (e.g. ``lambda: jax.block_until_ready(out)``)."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync()
        self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0)

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.stages.items())
