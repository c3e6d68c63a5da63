"""Profiling / tracing hooks.

The reference's observability is FST waveforms + SRAM traffic counters
(SURVEY.md §5: TestSpAtten.scala:116-147, MultiBankRAM.scala:58-63).  The
TPU equivalents: `jax.profiler` device traces (viewable in XProf/
TensorBoard, including per-Pallas-kernel timing and HBM counters) and named
trace annotations around engine phases (prefill / decode / prune), plus the
per-request `universal_id`-style tagging carried by the metrics layer."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into `log_dir` (no-op if None).

    Usage:
        with profile_trace("/tmp/spatten-trace"):
            engine.decode_step(...)
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation context for a region (shows up in the trace
    timeline), e.g. `with annotate("prefill-chunk"): ...`."""
    return jax.profiler.TraceAnnotation(name)
