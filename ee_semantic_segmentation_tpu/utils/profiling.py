"""Tracing / profiling utilities.

The reference's "profiling" is pthflops probe runs + ``time.perf_counter``
epoch timing (SURVEY.md §5).  TPU-native equivalents:

* analytic FLOPs tables (models expose ``flops_table``; zero runtime cost),
* :func:`timed` — wall-clock with ``block_until_ready`` (device-accurate),
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable xplane trace of the XLA execution,
* :func:`device_memory_stats` — HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time

import jax


def timed(fn, *args, iters: int = 1, warmup: int = 1, **kwargs):
    """Run fn iters times after warmup; returns (last_result, secs_per_iter)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) / max(iters, 1)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ee_tpu_trace"):
    """``with trace('/tmp/t'):`` captures a jax.profiler trace of the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats or {})
