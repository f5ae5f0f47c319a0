"""Tracing / profiling / numerics-debug helpers (SURVEY.md §5.1-5.2).

The reference has no tracing beyond TensorBoard scalars and nothing to
race-check (single-threaded eager PyTorch); the TPU-native equivalents are
the XLA profiler (device traces viewable in TensorBoard's profile plugin)
and jax's NaN-checking + chex shape/dtype assertions for the pure-functional
step.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace into `logdir` (open with TensorBoard's
    profile plugin): with profile_trace(d): run_steps()."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on the first NaN produced inside jitted code (CI use;
    SURVEY.md §5.2)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Lightweight wall-clock step timer with EMA, for throughput logging."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._t is not None:
            dt = now - self._t
            self.ema = dt if self.ema is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema
            )
        self._t = now
        return self.ema


def assert_finite_tree(tree) -> None:
    """chex-based finiteness assertion over a pytree (test/CI helper)."""
    import chex

    chex.assert_tree_all_finite(tree)
