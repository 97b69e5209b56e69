"""Tracing, profiling, memory and logging utilities.

TPU-native equivalents of the reference's observability kit (SURVEY.md
section 5): TAU selective instrumentation becomes ``jax.profiler`` traces
(reference: Makefile:43-55 'tau' compiler personality); the coarse
setup/total CPU timers become phase timers (reference:
Drivers/monteCarloDriver.f95:634-642,1180-1185); the ``memcheck`` RSS probe
reading /proc/self/statm is reproduced directly and extended with device
memory stats (reference: src/ErrorMessages.f95:92-101).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("mcbrat3d_tpu")


def memcheck_rss_kb() -> int:
    """Resident set size in kB from /proc/self/statm
    (reference: ErrorMessages.f95:92-101 memcheck)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGESIZE") // 1024
    except (OSError, ValueError, IndexError):
        return -1


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {k: s[k] for k in
                               ("bytes_in_use", "peak_bytes_in_use")
                               if k in s}
        except (RuntimeError, AttributeError, TypeError):
            pass
    return out


class PhaseTimers:
    """Named wall-clock phase timers ('Setup CPU time' / 'Total CPU time'
    equivalents; reference: Drivers/monteCarloDriver.f95:634-642)."""

    def __init__(self):
        self.totals: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return "\n".join(f"{k}: {v:.3f} s" for k, v in self.totals.items())


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace around a code region (TAU equivalent).

    View with TensorBoard or xprof. No-op if the profiler cannot start
    (e.g. unsupported backend).
    """
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend-specific
        logger.warning("profiler trace unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("profiler stop failed: %s", e)


def configure_logging(level=logging.INFO, master_only: bool = True):
    """Structured logging; on multi-host runs only process 0 emits by
    default (the reference gates PRINTs on MasterProc)."""
    import jax
    if master_only and jax.process_index() != 0:
        level = logging.ERROR
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s"))
    logger.handlers[:] = [handler]
    logger.setLevel(level)
    return logger
