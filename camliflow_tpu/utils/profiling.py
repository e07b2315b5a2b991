"""Tracing / profiling utilities.

The TPU-native replacement for the reference's Timer singleton
(models/utils.py:23-58, cuda.synchronize-based per-module timing):

- `ScopeTimer`: wall-clock accumulator per named scope with an explicit
  device sync (a tiny scalar device_get, which drains the in-order execution
  queue — `block_until_ready` alone does not synchronise through remote TPU
  tunnels). Disabled by default, like the reference.
- `trace` context manager around `jax.profiler` for full XLA traces viewable
  in TensorBoard/Perfetto.
- `named_scope` re-export: annotates HLO so profiler traces show model-level
  module names.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

named_scope = jax.named_scope


def device_sync():
    """Force completion of all queued device work."""
    # fetching any freshly-computed scalar drains the in-order queue
    jax.device_get(jnp.zeros(()) + 0.0)


class ScopeTimer:
    """Accumulate wall-clock ms per qualified name (Timer parity)."""

    def __init__(self):
        self.enabled = False
        self.timing_stat: dict[str, float] = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        if not self.enabled:
            yield
            return
        device_sync()
        t1 = time.perf_counter()
        yield
        device_sync()
        t2 = time.perf_counter()
        self.timing_stat[name] = self.timing_stat.get(name, 0.0) + (t2 - t1) * 1000

    def timer_func(self, func):
        def wrapped(*args, **kwargs):
            with self.scope(func.__qualname__):
                return func(*args, **kwargs)

        return wrapped

    def clear_timing_stat(self):
        self.timing_stat = {}

    def get_timing_stat(self):
        return dict(self.timing_stat)

    def set_enabled(self, enabled: bool):
        self.enabled = enabled


timer = ScopeTimer()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace for TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        device_sync()
        jax.profiler.stop_trace()


class BadLossChecker:
    """NaN/inf/threshold loss streak detector.

    The reference defines this but never wires it in (utils.py:39-56); we use
    it inside the Trainer to abort cleanly on divergence instead of training
    through garbage.
    """

    def __init__(self, threshold: float = 1e5, patience: int = 20):
        self.threshold = threshold
        self.patience = patience
        self.streak = 0

    def check(self, loss: float) -> bool:
        """Returns True when training should abort."""
        import math

        bad = (not math.isfinite(loss)) or abs(loss) > self.threshold
        self.streak = self.streak + 1 if bad else 0
        return self.streak >= self.patience
