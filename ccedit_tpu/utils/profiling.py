"""Tracing / profiling built in from day one (SURVEY.md §5: the reference has
only ad-hoc benchmark scripts; here every pipeline phase is timed and XLA
traces are one flag away).

Usage:
    from ccedit_tpu.utils.profiling import phase, tracing, report

    with tracing("/tmp/jax-trace"):          # optional TensorBoard trace
        with phase("encode"):
            z = engine.encode_first_stage(...)
        with phase("sample"):
            x = engine.sample(...)
    print(report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

_TIMES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase(name: str, sync: bool = True) -> Iterator[None]:
    """Wall-time a pipeline phase; blocks on device work when sync=True so the
    number means what it says."""
    t0 = time.perf_counter()
    yield
    if sync:
        # barrier: wait for all outstanding device work
        jax.effects_barrier()
    _TIMES[name].append(time.perf_counter() - t0)


@contextlib.contextmanager
def tracing(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (TensorBoard / xprof viewable) when logdir given."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report(reset: bool = False) -> str:
    lines = []
    for name, vals in _TIMES.items():
        lines.append(
            f"{name}: n={len(vals)} total={sum(vals):.3f}s "
            f"mean={sum(vals) / len(vals):.3f}s min={min(vals):.3f}s"
        )
    if reset:
        _TIMES.clear()
    return "\n".join(lines)


def annotate(name: str):
    """Named XLA region (shows up in profiler traces)."""
    return jax.named_scope(name)
