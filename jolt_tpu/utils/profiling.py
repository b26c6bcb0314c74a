"""Tracing spans + cumulative timing (aux-subsystem parity).

Reference: `#[tracing::instrument]` spans on every significant function and
the `CumulativeTimingLayer` that sums same-name span durations
(jolt-core/src/benches/sum_timer.rs:12-118), plus labeled memory deltas
(utils/profiling.rs:17-74).

Usage:
    with span("prove_grand_product"):
        ...
    print_cumulative()      # name, calls, total seconds (sorted)

Spans nest; each span also emits a `jax.named_scope` so device work shows up
under the same labels in the JAX/XLA profiler trace viewer.
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

_lock = threading.Lock()
_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_enabled = False


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()


@contextlib.contextmanager
def span(name: str):
    """Time a region (cumulative per name) + tag device ops for the profiler."""
    if not _enabled:
        yield
        return
    import jax
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _totals[name] += dt
        _counts[name] += 1


def cumulative() -> list[tuple[str, int, float]]:
    with _lock:
        rows = [(k, _counts[k], _totals[k]) for k in _totals]
    return sorted(rows, key=lambda r: -r[2])


def print_cumulative() -> None:
    rows = cumulative()
    if not rows:
        return
    width = max(len(r[0]) for r in rows)
    print(f"{'span'.ljust(width)}  calls  total_s")
    for name, calls, total in rows:
        print(f"{name.ljust(width)}  {calls:5d}  {total:8.3f}")


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a JAX profiler trace (Perfetto-compatible) for the region —
    the reference's tracing-chrome layer analog (jolt-core/src/main.rs:96)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
