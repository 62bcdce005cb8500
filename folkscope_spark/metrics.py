"""Kernel-time accumulators for the Arrow-batched Python kernels.

The three expensive ``mapInPandas`` stages (parse, match, conceptualize) are
opaque to Spark's own metrics: the stage wall conflates pure-Python compute
with framework cost (Arrow decode/encode, shuffle, scheduling, cache
materialization).  A :class:`KernelTimers` hands each kernel a Spark
accumulator; the kernel adds its per-batch compute seconds (measured after
the batch is decoded, before it is re-encoded), so after the stage's action
completes ``timers.seconds()`` reports **summed CPU-seconds across all
cores**.  ``wall - kernel_cpu / n_cores`` is then the stage's framework
overhead — the number the scaling-efficiency attribution needs per stage.

Caveat: an accumulator sums every execution, so a recomputed (cache-evicted)
stage double-counts.  The pipeline caches both kernel stages before their
first action, making the sum single-execution in practice; treat the values
as attribution evidence, not an invariant.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class KernelTimers:
    """Named float accumulators, one per kernel stage."""

    def __init__(self, spark):
        self._acc = {
            name: spark.sparkContext.accumulator(0.0)
            for name in ("parse", "match", "conceptualize", "concept_text")
        }

    def __getitem__(self, name):
        return self._acc[name]

    def seconds(self) -> dict[str, float]:
        return {k: round(v.value, 3) for k, v in self._acc.items() if v.value > 0}


@contextmanager
def batch_timer(acc):
    """Time one decoded batch's compute; no-op when ``acc`` is None."""
    if acc is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        acc.add(time.perf_counter() - t0)
