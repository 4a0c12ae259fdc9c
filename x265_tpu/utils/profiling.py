"""Stage tracing (x265 analog: the ProfileScopeEvent X-macro system,
profile/cpuEvents.h + DETAILED_CU_STATS accumulators, SURVEY.md §5.1).

One canonical stage list; each scope both feeds jax.profiler traces
(named TraceAnnotation) and an always-on wall-clock accumulator the
encoder can print (the m_totalWorkerElapsedTime analog).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

# the cpuEvents.h-style canonical stage list
STAGES = ("frame_read", "lookahead", "analysis", "motion", "finalize",
          "loopfilter", "sao_analyze", "bitstream_write")

_acc = defaultdict(float)
_cnt = defaultdict(int)


@contextlib.contextmanager
def scope(stage: str):
    """Time a stage and annotate the jax profiler trace when active."""
    try:
        import jax.profiler
        ctx = jax.profiler.TraceAnnotation(stage)
    except Exception:
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    _acc[stage] += dt
    _cnt[stage] += 1


def report() -> dict:
    """Per-stage totals (seconds) and call counts."""
    return {s: {"seconds": _acc[s], "calls": _cnt[s]}
            for s in _acc}


def reset() -> None:
    _acc.clear()
    _cnt.clear()
