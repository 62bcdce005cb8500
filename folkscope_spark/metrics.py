"""Kernel-time accumulators for the Arrow-batched Python kernels.

The three expensive ``mapInPandas`` stages (parse, match, conceptualize) are
opaque to Spark's own metrics: the stage wall conflates pure-Python compute
with framework cost (Arrow decode/encode, shuffle, scheduling, cache
materialization).  A :class:`KernelTimers` hands each kernel a
:class:`StageTimer` (a wall + CPU accumulator pair); the kernel adds its
per-batch compute seconds (measured after the batch is decoded, before it is
re-encoded), so after the stage's action completes ``timers.seconds()``
reports **summed in-kernel seconds across all cores**, wall and cputime.
``stage_wall - kernel_wall / n_cores`` is the stage's framework overhead;
the wall/cputime divergence separates CPU steal from memory-system
contention (see :class:`StageTimer`) — the numbers the scaling-efficiency
attribution needs per stage.

Caveat: an accumulator sums every execution, so a recomputed (cache-evicted)
stage double-counts.  The pipeline caches both kernel stages before their
first action, making the sum single-execution in practice; treat the values
as attribution evidence, not an invariant.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class StageTimer:
    """Wall + CPU accumulator pair for one kernel stage.

    ``wall`` (perf_counter) counts everything the worker experiences inside
    the batch — including involuntary preemption when the host oversubscribes.
    ``cpu`` (process_time) counts only cycles the worker actually ran —
    memory-stall cycles included, preemption excluded.  Their divergence
    separates the two contention mechanisms: wall >> cpu → CPU steal
    (co-tenant/oversubscription); cpu itself rising with parallelism →
    memory-system contention (stalled cycles still burn CPU time)."""

    def __init__(self, spark):
        self.wall = spark.sparkContext.accumulator(0.0)
        self.cpu = spark.sparkContext.accumulator(0.0)


class KernelTimers:
    """Named StageTimer per Python-kernel stage."""

    def __init__(self, spark):
        self._t = {
            name: StageTimer(spark)
            for name in ("parse", "match", "conceptualize", "concept_text")
        }

    def __getitem__(self, name) -> StageTimer:
        return self._t[name]

    def seconds(self) -> dict[str, dict[str, float]]:
        return {
            k: {"wall": round(t.wall.value, 3), "cpu": round(t.cpu.value, 3)}
            for k, t in self._t.items()
            if t.wall.value > 0
        }


@contextmanager
def batch_timer(timer: StageTimer | None):
    """Time one decoded batch's compute; no-op when ``timer`` is None."""
    if timer is None:
        yield
        return
    t0 = time.perf_counter()
    c0 = time.process_time()
    try:
        yield
    finally:
        timer.cpu.add(time.process_time() - c0)
        timer.wall.add(time.perf_counter() - t0)
