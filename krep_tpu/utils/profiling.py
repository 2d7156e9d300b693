"""Tracing / observability (SURVEY.md §5: the reference has only get_time()
timings; the TPU equivalent is jax.profiler traces + per-scan GB/s logs).

Enable with:
  KREP_TPU_PROFILE=1            — per-scan wall-time + GB/s lines on stderr
  KREP_TPU_TRACE_DIR=/some/dir  — write a jax.profiler trace around scans
                                  (view with TensorBoard / xprof)

Wall-clock numbers include host-side staging and any device-sync latency;
for kernel-only numbers use bench.py's chained methodology.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

ENABLED = os.environ.get("KREP_TPU_PROFILE") == "1"
TRACE_DIR = os.environ.get("KREP_TPU_TRACE_DIR")


@contextlib.contextmanager
def scan_span(what: str, n_bytes: int):
    """Wrap one device scan; logs duration + effective GB/s when enabled."""
    if not ENABLED and not TRACE_DIR:
        yield
        return
    ctx = contextlib.nullcontext()
    if TRACE_DIR:
        import jax

        ctx = jax.profiler.trace(TRACE_DIR)
    t0 = time.perf_counter()
    with ctx:
        yield
    if ENABLED:
        dt = time.perf_counter() - t0
        gbps = n_bytes / dt / 1e9 if dt > 0 else float("inf")
        sys.stderr.write(
            f"krep-tpu: {what}: {n_bytes} bytes in {dt*1e3:.2f} ms ({gbps:.2f} GB/s wall)\n"
        )
