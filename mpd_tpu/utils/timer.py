"""Device-synchronized timing + profiler hooks.

Counterpart of torch_robotics' TimerCUDA (consumed at reference
scripts/inference/inference.py:248,258 and mpd/trainer/trainer.py:178-275):
a context manager whose elapsed time brackets `block_until_ready` on the
given outputs, so async dispatch doesn't undercount. `profile_trace` wraps
jax.profiler for on-demand XLA traces (SURVEY section 5.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class TimerDevice:
    """with TimerDevice() as t: out = fn(); t.sync(out)  ->  t.elapsed"""

    def __init__(self):
        self.elapsed: float = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, *outputs):
        for o in outputs:
            jax.block_until_ready(o)
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    def __exit__(self, *exc):
        if self.elapsed == 0.0 and self._t0 is not None:
            self.elapsed = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
