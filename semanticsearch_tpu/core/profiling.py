"""Step timers and profiler hooks.

The reference logs wall-clock + throughput per config
(``simple_chunk_controller.py:1347-1352``) and samples host RAM with psutil
(``rank_chunks_optimized.py:364-404``). Here timing is first-class: a
``StepTimer`` accumulates named phases, and ``trace`` wraps
``jax.profiler.trace`` for TensorBoard-viewable device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StepTimer:
    """Accumulates per-phase wall times; blocks on device work for accuracy."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            elapsed = time.perf_counter() - start
            self.totals[name] += elapsed
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device trace context (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
