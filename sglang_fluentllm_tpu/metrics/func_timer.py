"""Decorator-based function latency histograms.

Analog of the reference's ``srt/metrics/func_timer.py``: wrap sync or
async callables so every invocation lands in a Prometheus histogram
(shared ``sglang_fluentllm_tpu_func_latency_seconds`` series, labeled by
function name) on the same registry ``/metrics`` serves.
"""

from __future__ import annotations

import asyncio
import functools
import time
from typing import Callable, Optional

from prometheus_client import Histogram

from sglang_fluentllm_tpu.metrics.collector import (
    LATENCY_BUCKETS,
    REGISTRY,
    _NS,
)

_histogram: Optional[Histogram] = None


def _get_histogram() -> Histogram:
    global _histogram
    if _histogram is None:
        _histogram = Histogram(
            f"{_NS}_func_latency_seconds",
            "Function latency by name",
            labelnames=("name",),
            buckets=LATENCY_BUCKETS,
            registry=REGISTRY,
        )
    return _histogram


def time_func(func: Callable = None, *, name: str = None) -> Callable:
    """``@time_func`` / ``@time_func(name="...")`` for sync and async
    functions alike (reference ``func_timer.time_func`` behavior)."""

    def decorate(f: Callable) -> Callable:
        label = name or f.__qualname__

        if asyncio.iscoroutinefunction(f):
            @functools.wraps(f)
            async def awrap(*args, **kwargs):
                t0 = time.monotonic()
                try:
                    return await f(*args, **kwargs)
                finally:
                    _get_histogram().labels(name=label).observe(
                        time.monotonic() - t0)
            return awrap

        @functools.wraps(f)
        def wrap(*args, **kwargs):
            t0 = time.monotonic()
            try:
                return f(*args, **kwargs)
            finally:
                _get_histogram().labels(name=label).observe(
                    time.monotonic() - t0)
        return wrap

    return decorate(func) if func is not None else decorate
