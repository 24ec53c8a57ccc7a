"""Small utilities: scoped wall-clock timing (the reference utils/Timer.hpp
analog, gated by SZT_DEBUG_TIMINGS like the reference's SZ3_DEBUG_TIMINGS
CMake option) and a device-trace helper over jax.profiler."""

from __future__ import annotations

import contextlib
import os
import time


def timings_enabled() -> bool:
    return os.environ.get("SZT_DEBUG_TIMINGS", "0") not in ("", "0", "false")


class Timer:
    """Scoped timer; prints '<name> time = X.XXXXXX' only when
    SZT_DEBUG_TIMINGS is set (reference utils/Timer.hpp:30-36)."""

    def __init__(self, start: bool = False):
        self._t0 = time.perf_counter() if start else None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, name: str = "") -> float:
        if self._t0 is None:
            raise RuntimeError("Timer.stop() before start()")
        dt = time.perf_counter() - self._t0
        self._t0 = None
        if timings_enabled() and name:
            print(f"{name} time = {dt:.6f}")
        return dt


@contextlib.contextmanager
def timed(name: str):
    """with timed('stage'): ...  — prints when SZT_DEBUG_TIMINGS is set."""
    t = Timer(start=True)
    try:
        yield t
    finally:
        t.stop(name)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/szt-trace"):
    """Capture a jax.profiler trace around the block (TPU timeline in
    TensorBoard / xprof). No-op if jax is unavailable."""
    try:
        import jax
        with jax.profiler.trace(log_dir):
            yield
    except ImportError:
        yield
