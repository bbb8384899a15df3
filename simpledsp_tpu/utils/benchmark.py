"""Benchmark / profiling harness (SURVEY.md §5 "tracing/profiling" plan).

The reference's closest artifact is Catch2 BENCHMARK micro-timing
(reference: test/testFFT.cpp:241-253, test/testIIR.cpp:482-556); here the
equivalents are `block_until_ready`-bracketed wall timing with the two
patterns that matter on a TPU runtime:

* `time_blocked`  — per-call latency (sync every call): what a request/
  response user sees, includes dispatch latency.
* `time_streaming` — pipelined throughput (state chained, sync once): what
  a streaming pipeline sees; device compute hides dispatch latency.

`emit_metric` prints the BASELINE.json-style one-line JSON record.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Callable, Dict, Optional

import jax

__all__ = ["time_blocked", "time_streaming", "emit_metric", "trace"]


def _force(out) -> None:
    """Synchronize by FETCHING a value data-dependent on the result.

    `jax.block_until_ready` can return before execution completes on some
    runtimes (this environment's TPU tunnel — see PERF.md); a value fetch
    cannot lie.  Devices execute in order, so forcing the last result
    bounds everything enqueued before it.
    """
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.abs(leaf.ravel()[:8])))  # abs: complex-safe


def time_blocked(fn: Callable, *args, iters: int = 10,
                 warmup: int = 1) -> float:
    """Mean seconds per call, forcing every call's result (includes
    per-call dispatch latency — the request/response view)."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def time_streaming(step: Callable, x, state, iters: int = 16,
                   warmup: int = 1) -> float:
    """Mean seconds per call for a streaming step (y, state') = step(x, state),
    chaining state and syncing once at the end (minus one calibrated fetch
    round-trip) — dispatch latency hidden, the pipeline view."""
    out, s = step(x, state)
    for _ in range(warmup - 1):
        out, s = step(x, s)
    _force((out, s))
    s = state
    t0 = time.perf_counter()
    for _ in range(iters):
        out, s = step(x, s)
    _force((out, s))
    t_loop = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force((out, s))
    t_fetch = time.perf_counter() - t0
    return max(t_loop - t_fetch, 1e-9) / iters


def emit_metric(metric: str, value: float, unit: str,
                baseline: Optional[float] = None,
                detail: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Print (and return) the one-line JSON record the driver collects."""
    rec: Dict[str, Any] = {"metric": metric, "value": round(value, 2),
                           "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(value / baseline, 2)
    if detail:
        rec["detail"] = detail
    print(json.dumps(rec))
    return rec


@contextlib.contextmanager
def trace(dirname: str = "/tmp/simpledsp_tpu_trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()
