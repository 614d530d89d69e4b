"""Profiling & debugging aids (SURVEY.md section 5: the reference has none;
here jax.profiler traces and NaN guards are first-class).

Usage:
    with trace("/tmp/rca-trace"):          # view in XProf/TensorBoard
        trainer.train(updates=3)

    with nan_debug():                      # raise on first NaN-producing op
        trainer.train(updates=1)
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (TPU timeline) for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug():
    """Enable jax_debug_nans inside the block (recompiles affected fns)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock EMA of step latency; env-steps/s is the north-star metric."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int) -> float:
        dt = time.perf_counter() - self._t0
        rate = n_steps / dt
        self.ema = rate if self.ema is None else (
            self.alpha * rate + (1 - self.alpha) * self.ema)
        return rate
