"""Profiling / step-timing utilities.

The reference has no profiling infrastructure (SURVEY.md §5.1: ad-hoc
timeit in a notebook).  Here:
  * ``trace(dir)`` — context manager around jax.profiler for TensorBoard-
    format device traces.
  * ``StepTimer`` — rolling wall-clock stats for jitted step functions with
    JSONL export (the train CLI's metrics.jsonl counterpart for sim loops).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
  """Capture a device trace: view with TensorBoard or xprof."""
  import jax
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Rolling throughput stats for a hot loop."""

  def __init__(self, name: str = 'step', window: int = 50,
               jsonl_path: Optional[str] = None):
    self.name = name
    self.window = window
    self.times: List[float] = []
    self._t0: Optional[float] = None
    self._jsonl = open(jsonl_path, 'a') if jsonl_path else None
    self._count = 0

  def __enter__(self):
    self._t0 = time.perf_counter()
    return self

  def __exit__(self, *a):
    dt = time.perf_counter() - self._t0
    self.times.append(dt)
    self._count += 1
    if len(self.times) > self.window:
      self.times.pop(0)
    if self._jsonl:
      self._jsonl.write(json.dumps(
          {'name': self.name, 'n': self._count, 'dt': dt}) + '\n')

  def stats(self) -> Dict[str, float]:
    if not self.times:
      return {}
    ts = sorted(self.times)
    return {
        'mean_s': sum(ts) / len(ts),
        'p50_s': ts[len(ts) // 2],
        'p95_s': ts[int(len(ts) * 0.95)],
        'rate_hz': len(ts) / max(sum(ts), 1e-12),
    }

  def report(self) -> str:
    s = self.stats()
    if not s:
      return f'{self.name}: no samples'
    return (f'{self.name}: {s["mean_s"] * 1e3:.1f} ms mean, '
            f'{s["p95_s"] * 1e3:.1f} ms p95, {s["rate_hz"]:.1f} Hz')

  def close(self):
    if self._jsonl:
      self._jsonl.close()
