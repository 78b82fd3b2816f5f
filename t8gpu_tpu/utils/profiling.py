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


# -- accumulating phase stats (adapt-cycle breakdown) -------------------------
#
# The reference's timers print one line per event (profiling.h:22-36); for
# long AMR runs we instead accumulate wall time per named phase so a 20k-step
# endurance run can report WHERE its adapt cycles spend time (host face walk
# vs criteria D2H vs remap dispatch) without drowning stderr.

_phase_acc: dict[str, tuple[float, int]] = {}


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time under `name` (see phase_snapshot/phase_reset)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        total, count = _phase_acc.get(name, (0.0, 0))
        _phase_acc[name] = (total + dt, count + 1)


def phase_snapshot() -> dict[str, tuple[float, int]]:
    """{phase: (total_seconds, n_calls)} accumulated since phase_reset()."""
    return dict(_phase_acc)


def phase_reset() -> None:
    _phase_acc.clear()


def phase_report(stream=None) -> None:
    """Print the accumulated phase table (one line per phase) to stderr."""
    stream = stream if stream is not None else sys.stderr
    for name, (total, count) in sorted(_phase_acc.items(),
                                       key=lambda kv: -kv[1][0]):
        print(f"[t8gpu_tpu] phase {name}: {total:.3f}s / {count} calls "
              f"({total / max(count, 1):.3f}s each)", file=stream)


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
