"""Tracing / profiling utilities.

The reference's observability story is VCD waveform dumps + free-running
cycle counters (TOTAL_CYCLES, CompressionAccelerator.scala:36-38; busyCycles,
ScratchpadTest.scala:44-50; Treadle VCD, TestUtils.scala:16-18). The TPU
equivalents here:

  * `trace(path)`    — jax.profiler trace context (the waveform dump: view
                       in TensorBoard / Perfetto for per-op device timing).
  * `Timer`          — wall-clock stage timer with device sync (the cycle
                       counter; ns resolution, RTT-aware sync-once pattern).
  * `device_bench()` — robust device-time measurement that amortizes the
                       dispatch round-trip (the tunnel adds O(10ms) per sync
                       and an unreliable block_until_ready, so per-call host
                       timing measures the link, not the chip).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(path: str = "/tmp/tpu_snappy_trace"):
    """jax.profiler trace context; open the result in TensorBoard/Perfetto."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force device completion by fetching one scalar per output leaf
    (block_until_ready is unreliable on the tunneled axon backend)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(jax.numpy.ravel(leaf)[0])


@dataclasses.dataclass
class Timer:
    """Named wall-clock sections with device sync at section end."""
    sections: dict = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter_ns()
        yield
        if result is not None:
            sync(result)
        self.sections[name] = self.sections.get(name, 0) + \
            time.perf_counter_ns() - t0

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{k:24s} {v/1e6:9.2f} ms ({100*v/max(1,total):4.1f}%)"
                 for k, v in self.sections.items()]
        return "\n".join(lines)


def sync1(tree) -> None:
    """Minimal completion barrier: fetch ONE scalar from the first leaf.
    A program's outputs only materialize when the whole program finishes and
    the per-device queue is in-order, so one scalar of the latest dispatch
    bounds every prior dispatch — each extra leaf fetched would add a full
    tunnel round-trip (~3-30 ms) of pure measurement bias."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def device_bench(fn, *args, iters: int = 30, trials: int = 3) -> float:
    """Best-of-trials seconds per call: dispatch `iters` calls, then sync
    once on a single scalar of the last output (see sync1 — syncing every
    leaf would bias multi-output stages by leaves x RTT / iters)."""
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync1(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
