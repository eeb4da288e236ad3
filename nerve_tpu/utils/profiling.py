"""Profiling and timing harness.

The reference has no tracing/profiling beyond wall-clock prints and a FLOPs
estimator (SURVEY.md §5). This module is the first-class replacement:

  * :func:`timed_scan` — the dispatch-amortised timer: chains N invocations
    of a function inside ONE jitted ``lax.scan`` with a data dependence, so
    per-call device time is measured even when the host↔device round trip
    (30 ms on tunnelled setups) dwarfs the kernel.
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory.
  * :class:`Timer` — simple wall-clock section timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def timed_scan(
    fn: Callable,
    *args: Any,
    iters: int = 10,
    warmup: int = 1,
    dispatch_overhead_ms: float = 0.0,
) -> Dict[str, float]:
    """Measure per-call device time of ``fn(*args)`` amortised over a scan.

    ``fn``'s first argument is threaded through the scan with a vanishing
    data dependence (+= tiny scalar) so XLA cannot elide repeated calls; a
    scalar reduction of each output is fetched to force execution.

    Returns {'ms_per_call', 'total_ms'}.
    """

    @jax.jit
    def run(*a):
        def body(carry, _):
            x, acc = carry
            out = fn(x, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            flat = leaf.reshape(-1)
            s = jnp.sum(flat[: min(flat.shape[0], 1024)], dtype=jnp.float32)
            return (x + (s * 1e-20).astype(x.dtype), acc + s), None

        (_, acc), _ = jax.lax.scan(body, (a[0], jnp.float32(0)), None, length=iters)
        return acc

    for _ in range(warmup):
        float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    total_ms = (time.perf_counter() - t0) * 1000.0
    return {
        "ms_per_call": max(total_ms - dispatch_overhead_ms, 0.0) / iters,
        "total_ms": total_ms,
    }


def measure_dispatch_overhead(iters: int = 5) -> float:
    """Round-trip cost of a trivial dispatch + scalar fetch (ms)."""
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda x: jnp.sum(x) + 1.0)
    float(f(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x))
        times.append((time.perf_counter() - t0) * 1000.0)
    return min(times)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nerve_tpu_trace"):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock section timer."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0
