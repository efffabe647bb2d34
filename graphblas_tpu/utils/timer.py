"""Timing + profiling utilities.

Reference: ``Demo/Source/simple_timer.c`` (the only profiling tool the
reference ships) plus the per-matrix ``AxB_method_used`` introspection.
Here: the same tic/toc surface, a context-manager timer that blocks on
device completion (so device work is actually inside the interval), and
a hook into the JAX profiler for trace capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["simple_tic", "simple_toc", "device_timer", "trace"]

_tic = [0.0]


def simple_tic() -> float:
    """Start the global timer (``simple_tic``)."""
    _tic[0] = time.perf_counter()
    return _tic[0]


def simple_toc() -> float:
    """Seconds since the last :func:`simple_tic` (``simple_toc``)."""
    return time.perf_counter() - _tic[0]


@contextlib.contextmanager
def device_timer(result_holder: Optional[dict] = None):
    """Times a block including device completion:

        with device_timer() as t: y = f(x).block_until_ready()
        print(t["s"])
    """
    holder = result_holder if result_holder is not None else {}
    t0 = time.perf_counter()
    yield holder
    holder["s"] = time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace capture (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
