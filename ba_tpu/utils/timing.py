"""Scoped wall-clock timers + profiler hooks.

Parity with the reference's timing macros (`StartTimer/PrintTimer`,
/root/reference/include/ba/Utils.h:51-62,102-110) and its instrumented solver
spans (SURVEY.md §5.1).  On TPU the finer-grained story is
`jax.profiler.trace` — `trace_to` wraps a region and writes a TensorBoard
trace with per-kernel device timings.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_accum: dict[str, float] = defaultdict(float)
_count: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def span(name: str, sync=None):
    """Accumulate wall time of a region.  Pass `sync=jax.block_until_ready`
    target (any array/pytree) to time device work, not just dispatch."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync() if callable(sync) else sync)
        _accum[name] += time.perf_counter() - t0
        _count[name] += 1


def report(reset: bool = True) -> str:
    lines = ["timing spans (total s / calls / mean ms):"]
    for k in sorted(_accum, key=lambda k: -_accum[k]):
        n = max(_count[k], 1)
        lines.append(f"  {k:32s} {_accum[k]:8.3f}  {n:6d}  "
                     f"{_accum[k] / n * 1e3:8.2f}")
    if reset:
        _accum.clear()
        _count.clear()
    return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace region (TensorBoard-viewable device trace)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
