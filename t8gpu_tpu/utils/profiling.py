"""Wall-clock and device profiling helpers.

TPU-native counterpart of the reference stderr timing macros
(`t8gpu/utils/profiling.h:7-36`, `T8GPU_TIME` / `T8GPU_TIMER_START/STOP`):
the same scoped wall-clock timers, plus integration with `jax.profiler`
trace annotations so timeline captures show framework phases.
"""

from __future__ import annotations

import contextlib
import functools
import sys
import time
from typing import Callable, TypeVar

import jax

F = TypeVar("F", bound=Callable)


class Timer:
    """Scoped wall-clock timer printing to stderr (ref profiling.h:22-36).

    >>> with Timer("flux kernel"):
    ...     run()
    """

    def __init__(self, name: str, sync: bool = False, stream=None):
        self.name = name
        self.sync = sync
        self.stream = stream if stream is not None else sys.stderr
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            # Block until all dispatched device work is done so the reading is
            # honest (the analogue of the reference's cudaDeviceSynchronize
            # in Debug builds, cuda.h:17-30).
            jax.block_until_ready(jax.device_put(0.0))
        self.elapsed = time.perf_counter() - self._t0
        print(f"[t8gpu_tpu] {self.name}: {self.elapsed:.6f}s", file=self.stream)
        return False


def timed(fn: F) -> F:
    """Decorator version of Timer (ref `T8GPU_TIME(expr)` profiling.h:7-15)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with Timer(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper  # type: ignore[return-value]


@contextlib.contextmanager
def trace_scope(name: str):
    """Annotate a region in jax.profiler timeline captures."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a full device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
