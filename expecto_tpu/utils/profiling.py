"""Profiling and structured logging (SURVEY §5 tracing plan).

The reference's only observability is tqdm bars and prints. This provides:
- ``trace(log_dir)``: a context manager around ``jax.profiler`` traces
  (viewable in TensorBoard / Perfetto);
- ``StageLogger``: wall-clock + item-throughput counters per pipeline stage,
  emitted as single-line JSON records (machine-parseable logs).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageLogger:
    """Per-stage throughput counters with JSON-line output."""

    def __init__(self, stream=None, run_id: str | None = None):
        self.stream = stream or sys.stderr
        self.run_id = run_id

    @contextlib.contextmanager
    def stage(self, name: str, n_items: int | None = None, unit: str = "items"):
        t0 = time.perf_counter()
        record: dict = {"stage": name}
        try:
            yield record
        finally:
            dt = time.perf_counter() - t0
            record["seconds"] = round(dt, 4)
            if n_items is not None:
                record["n"] = n_items
                record["per_sec"] = round(n_items / dt, 2) if dt > 0 else None
                record["unit"] = unit
            if self.run_id:
                record["run_id"] = self.run_id
            print(json.dumps(record), file=self.stream, flush=True)
